"""Model core: VGG19 structure, gram, losses — with torch parity checks.

Parity tests construct the same tiny conv stack in torch (CPU) and JAX
with identical weights and compare losses and input gradients; this is
the contract gate the full pipeline relies on (identical loss curves to
1e-3 relative per BASELINE.md).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.features import (
    Targets,
    compute_targets,
    extract_features,
    initialize_input,
    style_content_losses,
    total_loss,
)
from style_transfer_visualizer_tpu.ops.gram import gram_matrix

HIGH = jax.lax.Precision.HIGHEST


class TestLayerTable:
    def test_torchvision_numbering(self) -> None:
        table = vgg19.LAYER_TABLE
        assert len(table) == 37
        assert vgg19.CONV_INDICES == (
            0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34,
        )
        pools = tuple(
            i for i, (k, _, _) in enumerate(table) if k == vgg19.POOL
        )
        assert pools == (4, 9, 18, 27, 36)

    def test_channel_progression(self) -> None:
        assert vgg19.LAYER_TABLE[0][1:] == (3, 64)
        assert vgg19.LAYER_TABLE[28][1:] == (512, 512)


class TestParams:
    def test_random_init_shapes(self) -> None:
        params = vgg19.init_random_params(jax.random.key(0))
        assert set(params) == set(vgg19.CONV_INDICES)
        assert params[0]["w"].shape == (3, 3, 3, 64)
        assert params[34]["w"].shape == (3, 3, 512, 512)
        assert params[0]["b"].shape == (64,)

    def test_npz_roundtrip(self, tmp_path) -> None:
        params = vgg19.init_random_params(jax.random.key(1))
        path = tmp_path / "w.npz"
        vgg19.save_params_npz(params, path)
        loaded = vgg19.load_params_npz(path)
        np.testing.assert_array_equal(
            np.asarray(params[5]["w"]), np.asarray(loaded[5]["w"]),
        )

    def test_convert_torch_state_dict(self) -> None:
        rng = np.random.default_rng(0)
        sd = {}
        for idx in vgg19.CONV_INDICES:
            _, cin, cout = vgg19.LAYER_TABLE[idx]
            sd[f"features.{idx}.weight"] = rng.normal(
                size=(cout, cin, 3, 3),
            ).astype(np.float32)
            sd[f"features.{idx}.bias"] = rng.normal(size=cout).astype(
                np.float32,
            )
        params = vgg19.convert_torch_state_dict(sd)
        # OIHW -> HWIO
        np.testing.assert_array_equal(
            np.asarray(params[0]["w"]),
            sd["features.0.weight"].transpose(2, 3, 1, 0),
        )

    def test_convert_rejects_bad_shapes(self) -> None:
        sd = {"features.0.weight": np.zeros((8, 3, 3, 3), np.float32),
              "features.0.bias": np.zeros(8, np.float32)}
        with pytest.raises((ValueError, KeyError)):
            vgg19.convert_torch_state_dict(sd)

    def test_load_cache_hit_logs(self, tmp_path, caplog) -> None:
        params = vgg19.init_random_params(jax.random.key(0))
        vgg19.save_params_npz(params, tmp_path / vgg19.CACHE_FILENAME)
        loaded = vgg19.load_vgg19_params(tmp_path)
        assert "Using cached VGG19 weights" in caplog.text
        assert set(loaded) == set(vgg19.CONV_INDICES)

    def test_load_random_fallback_warns(
        self, tmp_path, caplog, monkeypatch,
    ) -> None:
        monkeypatch.setattr(
            vgg19, "_find_torch_checkpoint", lambda _a=None: None,
        )
        vgg19.load_vgg19_params(tmp_path / "empty", allow_random=True)
        assert "seeded random weights" in caplog.text

    def test_load_raises_without_fallback(
        self, tmp_path, monkeypatch,
    ) -> None:
        monkeypatch.setattr(
            vgg19, "_find_torch_checkpoint", lambda _a=None: None,
        )
        with pytest.raises(FileNotFoundError, match="VGG19 weights"):
            vgg19.load_vgg19_params(tmp_path / "empty")

    def test_checkpoint_conversion_path(
        self, tmp_path, monkeypatch, caplog,
    ) -> None:
        # Fabricate a torch checkpoint file and point discovery at it.
        sd = {}
        for idx in vgg19.CONV_INDICES:
            _, cin, cout = vgg19.LAYER_TABLE[idx]
            sd[f"features.{idx}.weight"] = torch.zeros(cout, cin, 3, 3)
            sd[f"features.{idx}.bias"] = torch.zeros(cout)
        ckpt = tmp_path / "vgg19-test.pth"
        torch.save(sd, ckpt)
        monkeypatch.setattr(
            vgg19, "_find_torch_checkpoint", lambda _a=None: ckpt,
        )
        cache_dir = tmp_path / "cache"
        params = vgg19.load_vgg19_params(cache_dir)
        assert "Converting VGG19 weights" in caplog.text
        assert (cache_dir / vgg19.CACHE_FILENAME).exists()
        assert float(np.abs(np.asarray(params[0]["w"])).sum()) == 0.0


def _tiny_table() -> tuple[tuple[str, int, int], ...]:
    """conv-relu-conv-relu-pool-conv-relu mini stack (indices 0..6)."""
    return (
        (vgg19.CONV, 3, 8), (vgg19.RELU, 8, 8),
        (vgg19.CONV, 8, 8), (vgg19.RELU, 8, 8),
        (vgg19.POOL, 8, 8),
        (vgg19.CONV, 8, 16), (vgg19.RELU, 16, 16),
    )


@pytest.fixture
def tiny_stack():
    """Build matched torch/JAX tiny nets.

    No table patching needed: the feature sweep derives the layer table
    from the params pytree itself (models.arch.layer_table_from_params),
    so handing it grammar-consistent tiny params IS the configuration.
    """
    torch.manual_seed(0)
    convs = {
        0: torch.nn.Conv2d(3, 8, 3, padding=1),
        2: torch.nn.Conv2d(8, 8, 3, padding=1),
        5: torch.nn.Conv2d(8, 16, 3, padding=1),
    }
    params = {
        idx: {
            "w": jnp.asarray(
                conv.weight.detach().numpy().transpose(2, 3, 1, 0),
            ),
            "b": jnp.asarray(conv.bias.detach().numpy()),
        }
        for idx, conv in convs.items()
    }
    return convs, params


def _torch_forward(convs, x: torch.Tensor, taps: set[int]):
    """Reference-semantics torch forward for the tiny stack."""
    acts = {}
    table = _tiny_table()
    for idx, (kind, _, _) in enumerate(table):
        if kind == vgg19.CONV:
            x = convs[idx](x)
        elif kind == vgg19.RELU:
            x = F.relu(x)
        else:
            x = F.max_pool2d(x, 2)
        if idx in taps:
            acts[idx] = x
    return acts


def _torch_gram(t: torch.Tensor) -> torch.Tensor:
    b, c, h, w = t.shape
    feats = t.reshape(b * c, h * w)
    g = torch.mm(feats, feats.t()).clamp(max=5e5)
    return g / (b * c * h * w)


class TestTorchParity:
    def test_feature_parity(self, tiny_stack) -> None:
        convs, params = tiny_stack
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
        jax_acts = extract_features(
            params, jnp.asarray(x), (0, 3, 6), precision=HIGH,
        )
        torch_acts = _torch_forward(
            convs, torch.from_numpy(x.transpose(0, 3, 1, 2)), {0, 3, 6},
        )
        for idx in (0, 3, 6):
            ours = np.asarray(jax_acts[idx]).transpose(0, 3, 1, 2)
            theirs = torch_acts[idx].detach().numpy()
            np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_gram_parity(self) -> None:
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 8, 9, 5)).astype(np.float32) * 10
        ours = np.asarray(gram_matrix(jnp.asarray(x), precision=HIGH))
        theirs = _torch_gram(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
        ).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)

    def test_gram_clamp_applied(self) -> None:
        x = jnp.full((1, 4, 4, 2), 100.0)
        # raw gram entries are 100*100*16 = 160000 < 5e5 -> unclamped
        g1 = gram_matrix(x)
        np.testing.assert_allclose(
            np.asarray(g1), 160000.0 / (2 * 16), rtol=1e-6,
        )
        x2 = jnp.full((1, 8, 8, 2), 100.0)  # raw = 640000 > 5e5 -> clamped
        g2 = gram_matrix(x2)
        np.testing.assert_allclose(
            np.asarray(g2), 5e5 / (2 * 64), rtol=1e-6,
        )

    def test_loss_and_gradient_parity(self, tiny_stack) -> None:
        convs, params = tiny_stack
        rng = np.random.default_rng(2)
        content = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
        style = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
        x0 = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
        style_layers, content_layers = (0, 5), (3,)
        style_w, content_w = 1e3, 1.0

        # --- torch side (reference semantics) ---
        def torch_losses(xt):
            acts = _torch_forward(
                convs, xt, set(style_layers) | set(content_layers),
            )
            t_style = _torch_forward(
                convs,
                torch.from_numpy(style.transpose(0, 3, 1, 2)),
                set(style_layers),
            )
            t_content = _torch_forward(
                convs,
                torch.from_numpy(content.transpose(0, 3, 1, 2)),
                set(content_layers),
            )
            s = sum(
                F.mse_loss(_torch_gram(acts[i]), _torch_gram(t_style[i]))
                for i in style_layers
            )
            c = sum(
                F.mse_loss(acts[i], t_content[i]) for i in content_layers
            )
            return style_w * s + content_w * c, s, c

        xt = torch.from_numpy(x0.transpose(0, 3, 1, 2)).requires_grad_(True)
        t_total, t_s, t_c = torch_losses(xt)
        t_total.backward()
        t_grad = xt.grad.numpy().transpose(0, 2, 3, 1)
        t_total, t_s, t_c = (t.detach() for t in (t_total, t_s, t_c))

        # --- JAX side ---
        targets = compute_targets(
            params, jnp.asarray(style), jnp.asarray(content),
            style_layers, content_layers, precision=HIGH,
        )

        def jax_total(x):
            return total_loss(
                params, x, targets, style_w, content_w,
                style_layers, content_layers, HIGH,
            )

        (j_total, (j_s, j_c)), j_grad = jax.value_and_grad(
            jax_total, has_aux=True,
        )(jnp.asarray(x0))

        np.testing.assert_allclose(
            float(j_s), float(t_s), rtol=1e-4,
        )
        np.testing.assert_allclose(
            float(j_c), float(t_c), rtol=1e-4,
        )
        np.testing.assert_allclose(
            float(j_total), float(t_total), rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(j_grad), t_grad, rtol=1e-3, atol=1e-6,
        )


class TestFeatureMechanics:
    def test_empty_taps(self) -> None:
        assert extract_features({}, jnp.zeros((1, 8, 8, 3)), ()) == {}

    def test_bad_tap_index(self) -> None:
        params = vgg19.init_random_params(jax.random.key(0))
        with pytest.raises(ValueError, match="out of range"):
            extract_features(params, jnp.zeros((1, 8, 8, 3)), (99,))

    def test_empty_params_rejected(self) -> None:
        with pytest.raises(ValueError, match="empty params"):
            extract_features({}, jnp.zeros((1, 8, 8, 3)), (0,))

    def test_real_vgg_tap_shapes(self) -> None:
        params = vgg19.init_random_params(jax.random.key(0))
        x = jnp.zeros((1, 64, 64, 3))
        acts = extract_features(params, x, (0, 5, 10, 19, 21, 28))
        assert acts[0].shape == (1, 64, 64, 64)
        assert acts[5].shape == (1, 32, 32, 128)
        assert acts[10].shape == (1, 16, 16, 256)
        assert acts[19].shape == (1, 8, 8, 512)
        assert acts[21].shape == (1, 8, 8, 512)
        assert acts[28].shape == (1, 4, 4, 512)

    def test_zero_layers_gives_zero_scores(self) -> None:
        params = vgg19.init_random_params(jax.random.key(0))
        x = jnp.ones((1, 64, 64, 3)) * 0.5
        targets = Targets(style_grams={}, content_feats={})
        total, (s, c) = total_loss(params, x, targets, 1.0, 1.0, (), ())
        assert float(total) == 0.0
        assert float(s) == 0.0
        assert float(c) == 0.0


class TestInitializeInput:
    def test_content(self) -> None:
        content = jnp.full((1, 4, 4, 3), 0.3)
        out = initialize_input(content, "content")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(content))

    def test_random_seeded(self) -> None:
        content = jnp.zeros((1, 4, 4, 3))
        a = initialize_input(content, "random", jax.random.key(7))
        b = initialize_input(content, "random", jax.random.key(7))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(jnp.std(a)) > 0.5  # standard normal

    def test_random_requires_key(self) -> None:
        with pytest.raises(ValueError, match="PRNG key"):
            initialize_input(jnp.zeros((1, 4, 4, 3)), "random")

    def test_white(self) -> None:
        out = initialize_input(jnp.zeros((1, 2, 2, 3)), "white")
        assert float(out.min()) == 1.0

    def test_unsupported(self) -> None:
        with pytest.raises(ValueError, match="Unsupported"):
            initialize_input(jnp.zeros((1, 2, 2, 3)), "zeros")


class TestRemat:
    def test_remat_matches_plain_forward(self) -> None:
        params = vgg19.init_random_params(jax.random.key(0))
        x = jnp.asarray(
            np.random.default_rng(0).uniform(
                size=(1, 64, 64, 3),
            ).astype(np.float32),
        )
        taps = (0, 5, 10, 19, 21, 28)
        plain = extract_features(params, x, taps)
        remat = extract_features(params, x, taps, remat=True)
        for idx in taps:
            np.testing.assert_allclose(
                np.asarray(remat[idx]), np.asarray(plain[idx]),
                rtol=1e-6, atol=1e-7,
            )

    def test_remat_gradient_matches(self) -> None:
        params = vgg19.init_random_params(jax.random.key(1))
        rng = np.random.default_rng(1)
        content = jnp.asarray(
            rng.uniform(size=(1, 64, 64, 3)).astype(np.float32),
        )
        style = jnp.asarray(
            rng.uniform(size=(1, 64, 64, 3)).astype(np.float32),
        )
        x = jnp.asarray(
            rng.normal(size=(1, 64, 64, 3)).astype(np.float32),
        )
        sl, cl = (0, 5), (2,)
        targets = compute_targets(params, style, content, sl, cl)

        def loss_plain(x):
            return total_loss(params, x, targets, 10.0, 1.0, sl, cl)

        def loss_remat(x):
            return total_loss(
                params, x, targets, 10.0, 1.0, sl, cl, None, True,
            )

        (lp, _), gp = jax.value_and_grad(loss_plain, has_aux=True)(x)
        (lr_, _), gr = jax.value_and_grad(loss_remat, has_aux=True)(x)
        np.testing.assert_allclose(float(lr_), float(lp), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gp), rtol=1e-5, atol=1e-8,
        )


class TestFrozenConvVJP:
    """The pre-flipped-kernel backward matches XLA autodiff exactly."""

    def test_gradient_matches_autodiff(self) -> None:
        import jax
        import jax.numpy as jnp

        from style_transfer_visualizer_tpu.models import vgg19
        from style_transfer_visualizer_tpu.models.features import total_loss
        from style_transfer_visualizer_tpu.models.vgg19 import (
            add_flipped_kernels,
        )

        params = vgg19.init_random_params(jax.random.key(0))
        flipped = add_flipped_kernels(params)
        sl, cl = (0, 5), (2,)
        key = jax.random.key(1)
        x = jax.random.uniform(key, (1, 32, 32, 3), jnp.float32)
        from style_transfer_visualizer_tpu.models.features import (
            compute_targets,
        )

        targets = compute_targets(params, x * 0.5, x, sl, cl)

        def loss_with(p):
            def f(img):
                return total_loss(p, img, targets, 1e5, 1.0, sl, cl)

            return jax.grad(f, has_aux=True)(x)[0]

        g_std = loss_with(params)
        g_frozen = loss_with(flipped)
        import numpy as np

        np.testing.assert_allclose(
            np.asarray(g_frozen), np.asarray(g_std), rtol=2e-5, atol=1e-7,
        )

    def test_add_flipped_idempotent(self) -> None:
        import jax

        from style_transfer_visualizer_tpu.models import vgg19
        from style_transfer_visualizer_tpu.models.vgg19 import (
            add_flipped_kernels,
        )

        params = vgg19.init_random_params(jax.random.key(0))
        once = add_flipped_kernels(params)
        twice = add_flipped_kernels(once)
        assert all(
            once[i]["w_flip"] is twice[i]["w_flip"]
            for i in once
            if "w_flip" in once[i]
        )
        # Originals untouched.
        assert all("w_flip" not in layer for layer in params.values())


class TestRandomInitSeedForms:
    def test_int_seed_accepted(self) -> None:
        import numpy as np

        a = vgg19.init_random_params(7)
        b = vgg19.init_random_params(7)
        np.testing.assert_array_equal(
            np.asarray(a[0]["w"]), np.asarray(b[0]["w"]),
        )

    def test_int_and_key_agree_on_same_seed(self) -> None:
        import numpy as np

        from_key = vgg19.init_random_params(jax.random.key(11))
        from_int = vgg19.init_random_params(
            int(jax.random.key_data(jax.random.key(11))[-1]),
        )
        np.testing.assert_array_equal(
            np.asarray(from_key[0]["w"]), np.asarray(from_int[0]["w"]),
        )


class TestStateDictConversionErrors:
    def test_missing_conv_layer_raises(self) -> None:
        import numpy as np

        state = {}
        for idx in vgg19.CONV_INDICES:
            if idx == 10:
                continue  # drop one conv's tensors
            _, in_ch, out_ch = vgg19.LAYER_TABLE[idx]
            state[f"features.{idx}.weight"] = np.zeros(
                (out_ch, in_ch, 3, 3), np.float32,
            )
            state[f"features.{idx}.bias"] = np.zeros((out_ch,), np.float32)
        with pytest.raises(KeyError, match="missing conv layer 10"):
            vgg19.convert_torch_state_dict(state)


class TestTorchCheckpointDiscovery:
    def test_torch_home_is_searched_first(
        self, tmp_path, monkeypatch,
    ) -> None:
        hub = tmp_path / "hub" / "checkpoints"
        hub.mkdir(parents=True)
        hit = hub / "vgg19-dcbb9e9d.pth"
        hit.touch()
        monkeypatch.setenv("TORCH_HOME", str(tmp_path))
        assert vgg19._find_torch_checkpoint() == hit

    def test_no_checkpoint_anywhere(self, tmp_path, monkeypatch) -> None:
        monkeypatch.setenv("TORCH_HOME", str(tmp_path / "void"))
        monkeypatch.setenv("HOME", str(tmp_path))
        assert vgg19._find_torch_checkpoint() is None


class TestBranchDirections:
    """One-way branch directions flagged by the branch coverage tool."""

    def test_negative_layer_index_rejected(self) -> None:
        from style_transfer_visualizer_tpu.models.features import (
            _validate_layers,
        )

        with pytest.raises(ValueError, match="out of range"):
            _validate_layers((-1,), vgg19.LAYER_TABLE)

    def test_find_torch_checkpoint_exhausts_then_hits(
        self, tmp_path, monkeypatch,
    ) -> None:
        from pathlib import Path

        from style_transfer_visualizer_tpu.models import vgg19

        home = tmp_path / "home"
        (home / ".cache").mkdir(parents=True)
        monkeypatch.setattr(Path, "home", lambda: home)
        ckpt_dir = tmp_path / "torch" / "hub" / "checkpoints"
        ckpt_dir.mkdir(parents=True)
        monkeypatch.setenv("TORCH_HOME", str(tmp_path / "torch"))

        # Empty cache dir: every glob pattern exhausts.
        assert vgg19._find_torch_checkpoint() is None

        # A file matching only the SECOND pattern: the first exhausts,
        # the second returns it.
        hit = ckpt_dir / "vgg19.pth"
        hit.write_bytes(b"x")
        assert vgg19._find_torch_checkpoint() == hit
