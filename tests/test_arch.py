"""Architecture registry and VGG16 backbone (models/arch.py).

The reference supports only torchvision VGG19 (core_model.py:103-117);
the framework generalizes the flat-index layer addressing across the
VGG family, deriving layer tables from params pytrees so the feature
sweep adapts to whatever weights it is handed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F  # noqa: N812

from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.arch import (
    ARCHITECTURES,
    CONV,
    POOL,
    RELU,
    VGG16,
    VGG19,
    get_architecture,
    layer_table_from_params,
    pools_before_in,
)


class TestRegistry:
    def test_vgg19_matches_module_constants(self) -> None:
        assert VGG19.layer_table == vgg19.LAYER_TABLE
        assert VGG19.conv_indices == vgg19.CONV_INDICES
        assert VGG19.num_layers == vgg19.NUM_LAYERS == 37

    def test_vgg16_layout_matches_torchvision_numbering(self) -> None:
        # torchvision.models.vgg16().features: 31 layers, pools at
        # 4/9/16/23/30, convs at the indices below.
        assert VGG16.num_layers == 31
        assert VGG16.conv_indices == (
            0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28,
        )
        pools = tuple(
            i for i, (k, _, _) in enumerate(VGG16.layer_table) if k == POOL
        )
        assert pools == (4, 9, 16, 23, 30)

    def test_vgg16_default_taps_are_named_layers(self) -> None:
        # conv1_1, conv2_1, conv3_1, conv4_1, conv5_1 / conv4_2.
        for idx in VGG16.default_style_layers:
            assert VGG16.layer_table[idx][0] == CONV
        assert VGG16.default_content_layers == (19,)
        assert VGG16.layer_table[19][0] == CONV
        # The deepest default tap crosses the same 4 pools as VGG19's,
        # so divisibility requirements match across backbones.
        assert pools_before_in(VGG16.layer_table, 24) == 4
        assert pools_before_in(VGG19.layer_table, 28) == 4

    def test_lookup(self) -> None:
        assert get_architecture("vgg16") is VGG16
        assert set(ARCHITECTURES) == {"vgg19", "vgg16"}
        with pytest.raises(ValueError, match="Unknown model"):
            get_architecture("resnet50")


class TestTableDerivation:
    @pytest.mark.parametrize("arch", [VGG19, VGG16], ids=lambda a: a.name)
    def test_roundtrip_from_random_params(self, arch) -> None:
        params = vgg19.init_random_params(jax.random.key(0), arch=arch)
        assert layer_table_from_params(params) == arch.layer_table

    def test_empty_params_rejected(self) -> None:
        with pytest.raises(ValueError, match="empty params"):
            layer_table_from_params({})

    def test_grammar_reconstruction(self) -> None:
        # conv@0, relu@1, conv@2, relu@3, pool@4, conv@5, relu@6, pool@7.
        params = {
            0: {"w": jnp.zeros((3, 3, 3, 8))},
            2: {"w": jnp.zeros((3, 3, 8, 8))},
            5: {"w": jnp.zeros((3, 3, 8, 16))},
        }
        table = layer_table_from_params(params)
        assert [k for k, _, _ in table] == [
            CONV, RELU, CONV, RELU, POOL, CONV, RELU, POOL,
        ]
        assert table[5] == (CONV, 8, 16)

    def test_leading_pool_defaults_to_input_channels(self) -> None:
        """A table whose first layer is a pool carries 3 RGB channels."""
        params = {1: {"w": jnp.zeros((3, 3, 3, 8))}}
        table = layer_table_from_params(params)
        assert table[0] == (POOL, 3, 3)
        assert table[1] == (CONV, 3, 8)

    @pytest.mark.parametrize("arch", [VGG19, VGG16], ids=lambda a: a.name)
    def test_pools_before_method_matches_helper(self, arch) -> None:
        for idx in (0, 5, arch.num_layers - 1):
            assert arch.pools_before(idx) == pools_before_in(
                arch.layer_table, idx,
            )

    def test_vgg19_module_pools_before_uses_its_table(self) -> None:
        assert vgg19.pools_before(0) == 0
        assert vgg19.pools_before(36) == 5


class TestVgg16Weights:
    def test_random_params_shapes(self) -> None:
        params = vgg19.init_random_params(jax.random.key(0), arch=VGG16)
        assert set(params) == set(VGG16.conv_indices)
        assert params[28]["w"].shape == (3, 3, 512, 512)

    def test_state_dict_conversion_and_npz_roundtrip(self, tmp_path) -> None:
        sd = {}
        for idx in VGG16.conv_indices:
            _, cin, cout = VGG16.layer_table[idx]
            sd[f"features.{idx}.weight"] = np.random.default_rng(idx).normal(
                size=(cout, cin, 3, 3),
            ).astype(np.float32)
            sd[f"features.{idx}.bias"] = np.zeros((cout,), np.float32)
        params = vgg19.convert_torch_state_dict(sd, VGG16)
        path = tmp_path / "vgg16_imagenet.npz"
        vgg19.save_params_npz(params, path)
        loaded = vgg19.load_params_npz(path)
        assert set(loaded) == set(VGG16.conv_indices)
        np.testing.assert_array_equal(
            np.asarray(loaded[17]["w"]),
            sd["features.17.weight"].transpose(2, 3, 1, 0),
        )

    def test_load_pretrained_uses_arch_cache_name(
        self, tmp_path, caplog,
    ) -> None:
        params = vgg19.init_random_params(jax.random.key(0), arch=VGG16)
        vgg19.save_params_npz(params, tmp_path / VGG16.cache_filename)
        loaded = vgg19.load_pretrained_params(VGG16, tmp_path)
        assert "cached VGG16 weights" in caplog.text
        assert set(loaded) == set(VGG16.conv_indices)

    def test_random_fallback_names_model(self, tmp_path, caplog) -> None:
        params = vgg19.load_pretrained_params(
            VGG16, tmp_path / "empty", allow_random=True,
        )
        assert "Pretrained VGG16 weights unavailable" in caplog.text
        assert set(params) == set(VGG16.conv_indices)


class TestVgg16EndToEnd:
    def test_full_pipeline_final_only(
        self, tmp_path, content_image, style_image,
    ) -> None:
        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )
        from style_transfer_visualizer_tpu.main import style_transfer
        from style_transfer_visualizer_tpu.type_defs import InputPaths

        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "model": "vgg16", "steps": 2, "optimizer": "adam",
                "lr": 0.1, "allow_random_weights": True,
            },
            "video": {"final_only": True},
            "hardware": {"device": "cpu"},
            "output": {
                "output": str(tmp_path / "out"), "plot_losses": False,
            },
        })
        assert cfg.optimization.content_layers == [19]
        result = style_transfer(
            InputPaths(str(content_image), str(style_image)), cfg,
        )
        assert result.shape[3] == 3
        assert np.all(np.isfinite(np.asarray(result)))
        produced = list((tmp_path / "out").glob("stylized_*"))
        assert len(produced) == 1


class TestVgg16TorchParity:
    def test_feature_parity_through_first_pool(self) -> None:
        """Our VGG16 sweep matches a torch mirror layer-for-layer.

        Uses a narrow random VGG16-shaped prefix (blocks 1-2) — same
        conv/relu/pool semantics the full net composes.
        """
        torch.manual_seed(3)
        convs = {
            0: torch.nn.Conv2d(3, 64, 3, padding=1),
            2: torch.nn.Conv2d(64, 64, 3, padding=1),
            5: torch.nn.Conv2d(64, 128, 3, padding=1),
        }
        params = {
            idx: {
                "w": jnp.asarray(
                    c.weight.detach().numpy().transpose(2, 3, 1, 0),
                ),
                "b": jnp.asarray(c.bias.detach().numpy()),
            }
            for idx, c in convs.items()
        }
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)

        from style_transfer_visualizer_tpu.models.features import (
            extract_features,
        )

        jax_acts = extract_features(
            params, jnp.asarray(x), (0, 5, 6),
            precision=jax.lax.Precision.HIGHEST,
        )

        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        t0 = convs[0](t)
        t_relu1 = F.relu(t0)
        t2 = F.relu(convs[2](t_relu1))
        t_pool = F.max_pool2d(t2, 2)
        t5 = convs[5](t_pool)
        t6 = F.relu(t5)
        for idx, ref in ((0, t0), (5, t5), (6, t6)):
            np.testing.assert_allclose(
                np.asarray(jax_acts[idx]).transpose(0, 3, 1, 2),
                ref.detach().numpy(),
                rtol=1e-4, atol=1e-5,
            )
