"""Multi-style blending: Gram interpolation, wiring, and CLI contract.

The reference sets targets from exactly one style image
(core_model.py:218-232); ``--style-blend`` is a TPU-framework addition
that mixes per-style Gram targets by weight into one objective.
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import style_transfer_visualizer_tpu.cli as stv_cli
import style_transfer_visualizer_tpu.main as stv_main
from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.features import (
    Targets,
    blend_targets,
    compute_targets,
    targets_maybe_blended,
)

HIGH = jax.lax.Precision.HIGHEST
STYLE_LAYERS = (0, 5)
CONTENT_LAYERS = (2,)


@pytest.fixture(scope="module")
def tiny_params():
    return vgg19.init_random_params(jax.random.key(0))


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(11)
    def make():
        return jnp.asarray(
            rng.uniform(size=(1, 32, 32, 3)).astype(np.float32),
        )
    return make(), make(), make()  # content, style_a, style_b


class TestBlendTargets:
    def test_grams_blend_by_weight_content_from_first(
        self, tiny_params, imgs,
    ) -> None:
        content, style_a, style_b = imgs
        ta = compute_targets(
            tiny_params, style_a, content, STYLE_LAYERS, CONTENT_LAYERS,
            precision=HIGH,
        )
        tb = compute_targets(
            tiny_params, style_b, content, STYLE_LAYERS, (),
            precision=HIGH,
        )
        blended = blend_targets([ta, tb], [0.75, 0.25])
        for idx in STYLE_LAYERS:
            np.testing.assert_allclose(
                np.asarray(blended.style_grams[idx]),
                0.75 * np.asarray(ta.style_grams[idx])
                + 0.25 * np.asarray(tb.style_grams[idx]),
                rtol=1e-6,
            )
        assert blended.content_feats is ta.content_feats

    def test_degenerate_weight_reproduces_single_style(
        self, tiny_params, imgs,
    ) -> None:
        """Weights (1, 0) must equal the unblended targets bit-for-bit."""
        content, style_a, style_b = imgs
        ta = compute_targets(
            tiny_params, style_a, content, STYLE_LAYERS, CONTENT_LAYERS,
            precision=HIGH,
        )
        tb = compute_targets(
            tiny_params, style_b, content, STYLE_LAYERS, (),
            precision=HIGH,
        )
        blended = blend_targets([ta, tb], [1.0, 0.0])
        for idx in STYLE_LAYERS:
            np.testing.assert_array_equal(
                np.asarray(blended.style_grams[idx]),
                np.asarray(ta.style_grams[idx]),
            )

    def test_length_mismatch_rejected(self) -> None:
        t = Targets(style_grams={}, content_feats={})
        with pytest.raises(ValueError, match="one weight per"):
            blend_targets([t], [0.5, 0.5])
        with pytest.raises(ValueError, match="one weight per"):
            blend_targets([], [])


class TestTargetsMaybeBlended:
    def test_none_passes_through_single_style(
        self, tiny_params, imgs,
    ) -> None:
        content, style_a, _ = imgs
        calls: list[tuple[int, tuple[int, ...]]] = []

        def one_targets(s_img, content_layers):
            calls.append((id(s_img), content_layers))
            return compute_targets(
                tiny_params, s_img, content, STYLE_LAYERS, content_layers,
                precision=HIGH,
            )

        got = targets_maybe_blended(
            one_targets, style_a, CONTENT_LAYERS, None,
        )
        assert calls == [(id(style_a), CONTENT_LAYERS)]
        assert set(got.style_grams) == set(STYLE_LAYERS)

    def test_blend_computes_content_once(self, tiny_params, imgs) -> None:
        """Only the first style's pass carries content layers."""
        content, style_a, style_b = imgs
        seen_layers: list[tuple[int, ...]] = []

        def one_targets(s_img, content_layers):
            seen_layers.append(content_layers)
            return compute_targets(
                tiny_params, s_img, content, STYLE_LAYERS, content_layers,
                precision=HIGH,
            )

        got = targets_maybe_blended(
            one_targets, style_a, CONTENT_LAYERS,
            [(style_a, 0.5), (style_b, 0.5)],
        )
        assert seen_layers == [CONTENT_LAYERS, ()]
        assert set(got.content_feats) == set(CONTENT_LAYERS)


class TestBlendedRunWiring:
    def _run(self, tmp_path, content_image, style_image, make_image_file,
             style_blend, cfg_overrides=None):
        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )
        from style_transfer_visualizer_tpu.type_defs import InputPaths

        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 2, "optimizer": "adam", "lr": 0.1,
                "allow_random_weights": True,
                **(cfg_overrides or {}),
            },
            "video": {"final_only": True},
            "hardware": {"device": "cpu"},
            "output": {"output": str(tmp_path / "out"), "plot_losses": False},
        })
        primary = max(style_blend, key=lambda pair: pair[1])[0]
        return stv_main.style_transfer(
            InputPaths(str(content_image), str(primary)), cfg,
            style_blend=[(str(p), w) for p, w in style_blend],
        )

    def test_blended_output_named_with_joined_stems(
        self, tmp_path, content_image, style_image, make_image_file,
    ) -> None:
        other = make_image_file("other.png", color=(200, 40, 10))
        self._run(
            tmp_path, content_image, style_image, make_image_file,
            [(style_image, 0.6), (other, 0.4)],
        )
        out = tmp_path / "out"
        produced = {p.name for p in out.glob("stylized_*")}
        c = content_image.stem
        assert produced == {f"stylized_{c}_x_{style_image.stem}+other.png"}

    def test_weight_one_matches_single_style_run(
        self, tmp_path, content_image, style_image, make_image_file,
    ) -> None:
        """Blend weights (1, 0) reproduce the plain single-style image."""
        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )
        from style_transfer_visualizer_tpu.type_defs import InputPaths

        other = make_image_file("other.png", color=(200, 40, 10))
        blended = self._run(
            tmp_path, content_image, style_image, make_image_file,
            [(style_image, 1.0), (other, 0.0)],
        )
        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 2, "optimizer": "adam", "lr": 0.1,
                "allow_random_weights": True,
            },
            "video": {"final_only": True},
            "hardware": {"device": "cpu"},
            "output": {
                "output": str(tmp_path / "out_single"),
                "plot_losses": False,
            },
        })
        single = stv_main.style_transfer(
            InputPaths(str(content_image), str(style_image)), cfg,
        )
        np.testing.assert_array_equal(
            np.asarray(blended), np.asarray(single),
        )


class TestBlendCli:
    def _parse(self, argv):
        return stv_cli.build_arg_parser().parse_args(argv)

    def test_blend_without_styles_exits(self) -> None:
        args = self._parse([
            "--content", "c.png", "--style", "s.png",
            "--style-blend", "0.5,0.5",
        ])
        with pytest.raises(SystemExit, match="requires --styles"):
            stv_cli.run_from_args(args)

    @pytest.mark.parametrize(
        ("spec", "match"),
        [
            ("0.5", "2 --styles entries"),
            ("0.5,x", "comma-separated numbers"),
            ("-1,2", "non-negative"),
            ("0,0", "not all be zero"),
        ],
    )
    def test_bad_weights_rejected(self, spec, match) -> None:
        with pytest.raises(SystemExit, match=match):
            stv_cli._parse_blend_weights(spec, ["a.png", "b.png"])

    def test_weights_normalize_and_pair_in_order(self) -> None:
        got = stv_cli._parse_blend_weights("3,1", ["a.png", "b.png"])
        assert got == [("a.png", 0.75), ("b.png", 0.25)]

    def test_trailing_comma_tolerated(self) -> None:
        """Empty segments are dropped before pairing, like --styles."""
        got = stv_cli._parse_blend_weights("1,3,", ["a.png", "b.png"])
        assert got == [("a.png", 0.25), ("b.png", 0.75)]

    def test_blend_compare_result_targets_joined_stem(
        self, monkeypatch, tmp_path, content_image, style_image,
        make_image_file,
    ) -> None:
        """--compare-result on a blended run points at the joined-stem
        PNG and fronts the highest-weight style."""
        other = make_image_file("other.png", color=(200, 40, 10))
        monkeypatch.setattr(
            stv_cli.stv_main,
            "style_transfer",
            lambda paths, cfg, style_blend=None: None,
        )
        recorded: dict = {}

        def fake_render(**kwargs):
            recorded.update(kwargs)
            return []

        monkeypatch.setattr(
            stv_cli, "render_requested_comparisons", fake_render,
        )
        args = self._parse([
            "--content", str(content_image),
            "--styles", f"{style_image},{other}",
            "--style-blend", "1,3",
            "--output", str(tmp_path), "--device", "cpu",
            "--compare-result",
        ])
        stv_cli.run_from_args(args)
        assert recorded["style_path"] == Path(other)
        assert recorded["request"].include_result is True
        assert recorded["request"].include_inputs is False
        expected = (
            tmp_path
            / f"stylized_{content_image.stem}_x_{style_image.stem}+other.png"
        )
        assert recorded["request"].result_path == expected

    def test_dispatch_runs_blend_with_primary_style(
        self, monkeypatch, tmp_path, content_image, style_image,
        make_image_file,
    ) -> None:
        other = make_image_file("other.png", color=(200, 40, 10))
        seen: dict = {}

        def fake_style_transfer(paths, cfg, style_blend=None):
            seen["paths"] = paths
            seen["blend"] = style_blend

        monkeypatch.setattr(
            stv_cli.stv_main, "style_transfer", fake_style_transfer,
        )
        args = self._parse([
            "--content", str(content_image),
            "--styles", f"{style_image},{other}",
            "--style-blend", "1,3",
            "--device", "cpu",
        ])
        stv_cli.run_from_args(args)
        # Highest weight (other) fronts the gallery panels.
        assert seen["paths"].style_path == str(other)
        assert seen["blend"] == [
            (str(style_image), 0.25), (str(other), 0.75),
        ]
