"""Scan-tiled loss vs the whole-image loss: exactness, not approximation.

The band tiling with receptive-field margins must reproduce the plain
path bit-for-bit in exact arithmetic (same convs, same pooling grid,
same clamp-then-normalize order); these tests allow only float
accumulation-order noise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.features import (
    compute_targets,
    total_loss,
)
from style_transfer_visualizer_tpu.ops.tiled import (
    auto_tile_rows,
    compute_tiled_targets,
    receptive_margin,
    tiled_total_loss,
    validate_tiling,
)

HIGH = jax.lax.Precision.HIGHEST

DEFAULT_STYLE = (0, 5, 10, 19, 28)
DEFAULT_CONTENT = (21,)


@pytest.fixture(scope="module")
def params():
    return vgg19.init_random_params(jax.random.key(0))


def _images(h, w, key=3):
    k = jax.random.key(key)
    content = jax.random.uniform(k, (1, h, w, 3), jnp.float32)
    style = jax.random.uniform(
        jax.random.fold_in(k, 1), (1, h, w, 3), jnp.float32,
    )
    return content, style


def test_receptive_margin_default_taps() -> None:
    taps = tuple(sorted(set(DEFAULT_STYLE) | set(DEFAULT_CONTENT)))
    margin, align = receptive_margin(taps)
    # convs 0,2 at scale 1 (2) + 5,7 at 2 (4) + 10,12,14,16 at 4 (16)
    # + 19,21,23,25 at 8 (32) + 28 at 16 (16) = 70, rounded to 16 -> 80.
    assert align == 16
    assert margin == 80


def test_validate_tiling_rejects_bad_shapes() -> None:
    taps = (0, 5)
    with pytest.raises(ValueError, match="divisible by 2"):
        validate_tiling(33, 8, taps)
    with pytest.raises(ValueError, match="divisible by tile_rows"):
        validate_tiling(40, 16, taps)
    with pytest.raises(ValueError, match="exceeds the"):
        validate_tiling(8, 8, taps)


def test_auto_tile_rows_respects_constraints() -> None:
    taps = tuple(sorted(set(DEFAULT_STYLE) | set(DEFAULT_CONTENT)))
    rows = auto_tile_rows(2160, 3840, taps)
    assert rows == 720  # 3 bands; measured-fastest valid choice
    margin, _ = receptive_margin(taps)
    assert (rows + 2 * margin) * 3840 <= 3_500_000
    # A tighter budget forces narrower bands, still exact/aligned.
    small = auto_tile_rows(2160, 3840, taps, max_band_pixels=1536 * 2048)
    assert small == 432


def test_tiled_loss_matches_plain_shallow(params) -> None:
    """Shallow taps, several bands, margins interact with both edges."""
    style_layers, content_layers = (0, 5), (2,)
    content, style = _images(64, 32)
    targets = compute_targets(
        params, style, content, style_layers, content_layers,
        precision=HIGH,
    )

    plain = total_loss(
        params, content, targets, 100.0, 1.0,
        style_layers, content_layers, HIGH,
    )
    tiled = tiled_total_loss(
        params, content, targets, 100.0, 1.0,
        style_layers, content_layers, tile_rows=16, precision=HIGH,
    )
    np.testing.assert_allclose(
        np.asarray(tiled[0]), np.asarray(plain[0]), rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tiled[1][0]), np.asarray(plain[1][0]), rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tiled[1][1]), np.asarray(plain[1][1]), rtol=1e-5,
    )


@pytest.mark.slow
def test_tiled_loss_matches_plain_default_taps(params) -> None:
    """The production tap set (taps to 28, 4 pools, margin 80)."""
    content, style = _images(240, 64)
    targets = compute_targets(
        params, style, content, DEFAULT_STYLE, DEFAULT_CONTENT,
        precision=HIGH,
    )
    plain = total_loss(
        params, content, targets, 1e5, 1.0,
        DEFAULT_STYLE, DEFAULT_CONTENT, HIGH,
    )
    tiled = tiled_total_loss(
        params, content, targets, 1e5, 1.0,
        DEFAULT_STYLE, DEFAULT_CONTENT, tile_rows=48, precision=HIGH,
    )
    np.testing.assert_allclose(
        np.asarray(tiled[0]), np.asarray(plain[0]), rtol=1e-4,
    )


def test_tiled_gradient_matches_plain(params) -> None:
    style_layers, content_layers = (0, 5), (2,)
    content, style = _images(48, 24, key=9)
    targets = compute_targets(
        params, style, content, style_layers, content_layers,
        precision=HIGH,
    )

    def loss_plain(img):
        return total_loss(
            params, img, targets, 50.0, 1.0,
            style_layers, content_layers, HIGH,
        )[0]

    def loss_tiled(img):
        return tiled_total_loss(
            params, img, targets, 50.0, 1.0,
            style_layers, content_layers, tile_rows=16, precision=HIGH,
        )[0]

    g_plain = jax.grad(loss_plain)(content)
    g_tiled = jax.grad(loss_tiled)(content)
    np.testing.assert_allclose(
        np.asarray(g_tiled), np.asarray(g_plain), rtol=1e-4, atol=1e-7,
    )


def test_tiled_targets_match_plain(params) -> None:
    style_layers, content_layers = (0, 5), (2,)
    content, style = _images(64, 32, key=5)
    plain = compute_targets(
        params, style, content, style_layers, content_layers,
        precision=HIGH,
    )
    tiled = compute_tiled_targets(
        params, style, content, style_layers, content_layers,
        tile_rows_style=16, tile_rows_content=16, precision=HIGH,
    )
    for idx in style_layers:
        np.testing.assert_allclose(
            np.asarray(tiled.style_grams[idx]),
            np.asarray(plain.style_grams[idx]),
            rtol=1e-5, atol=1e-7,
        )
    for idx in content_layers:
        np.testing.assert_allclose(
            np.asarray(tiled.content_feats[idx]),
            np.asarray(plain.content_feats[idx]),
            rtol=1e-5, atol=1e-6,
        )


def test_style_transfer_with_forced_tiling(
    make_style_transfer_config, make_input_paths,
) -> None:
    """End-to-end run through the orchestrator with --tile-rows."""
    from style_transfer_visualizer_tpu.main import style_transfer

    cfg = make_style_transfer_config(
        optimization={
            "tile_rows": 16,
            "style_layers": [0, 5],
            "content_layers": [2],
            "allow_random_weights": True,
            "optimizer": "adam",
            "steps": 2,
        },
        video={"final_only": True},
    )
    result = style_transfer(make_input_paths(), cfg)
    assert result.shape == (1, 64, 64, 3)
    assert bool(jnp.all(jnp.isfinite(result)))


def test_resolve_tile_rows_validates_forced_value(
    make_style_transfer_config,
) -> None:
    from style_transfer_visualizer_tpu.main import _resolve_tile_rows

    cfg = make_style_transfer_config(
        optimization={
            "tile_rows": 24,  # not divisible into 64 -> invalid
            "style_layers": [0, 5],
            "content_layers": [2],
        },
    )
    with pytest.raises(ValueError, match="divisible"):
        _resolve_tile_rows(cfg, 64, 64)
    # Small inputs never auto-tile.
    cfg.optimization.tile_rows = -1
    assert _resolve_tile_rows(cfg, 64, 64) == 0
    # 4K-class inputs auto-tile to a valid band height.
    rows = _resolve_tile_rows(cfg, 2160, 3840)
    assert rows and 2160 % rows == 0
    # 0 is an explicit off-switch, even at 4K.
    cfg.optimization.tile_rows = 0
    assert _resolve_tile_rows(cfg, 2160, 3840) == 0


def test_tiled_targets_mixed_modes(params) -> None:
    """Tile only one of the two images; the other runs whole."""
    style_layers, content_layers = (0, 5), (2,)
    content, style = _images(64, 32, key=6)
    plain = compute_targets(
        params, style, content, style_layers, content_layers,
        precision=HIGH,
    )
    tiled = compute_tiled_targets(
        params, style, content, style_layers, content_layers,
        tile_rows_style=None, tile_rows_content=32, precision=HIGH,
    )
    for idx in style_layers:
        np.testing.assert_allclose(
            np.asarray(tiled.style_grams[idx]),
            np.asarray(plain.style_grams[idx]),
            rtol=1e-6,
        )
    for idx in content_layers:
        np.testing.assert_allclose(
            np.asarray(tiled.content_feats[idx]),
            np.asarray(plain.content_feats[idx]),
            rtol=1e-5, atol=1e-6,
        )


def test_chunked_checkpoint_resume_end_to_end(
    make_style_transfer_config, make_input_paths,
) -> None:
    """Checkpoints land on chunk-aligned steps and resume continues."""
    from style_transfer_visualizer_tpu.main import style_transfer
    from style_transfer_visualizer_tpu.runtime.checkpoint import (
        load_checkpoint,
    )

    cfg = make_style_transfer_config(
        optimization={
            "style_layers": [0, 5],
            "content_layers": [2],
            "allow_random_weights": True,
            "optimizer": "adam",
            "steps": 8,
        },
        video={"final_only": True},
        output={"checkpoint_every": 4},
    )
    style_transfer(make_input_paths(), cfg)
    ckpt_path = f"{cfg.output.output}/checkpoint.npz"
    import numpy as _np

    meta = load_checkpoint(
        ckpt_path,
        # opt_state template: adam over 64*64*3 pixels
        __import__(
            "style_transfer_visualizer_tpu.engine.optimizers",
            fromlist=["adam_init"],
        ).adam_init(64 * 64 * 3),
    )
    assert meta.step == 8

    cfg2 = make_style_transfer_config(
        optimization={
            "style_layers": [0, 5],
            "content_layers": [2],
            "allow_random_weights": True,
            "optimizer": "adam",
            "steps": 12,
        },
        video={"final_only": True},
        output={"checkpoint_every": 4, "resume_from": ckpt_path},
    )
    result = style_transfer(make_input_paths(), cfg2)
    assert result.shape == (1, 64, 64, 3)
    assert bool(_np.all(_np.isfinite(_np.asarray(result))))


class TestTilingEdges:
    def test_receptive_margin_no_taps(self) -> None:
        assert receptive_margin(()) == (0, 1)

    def test_auto_tile_rows_none_when_budget_too_small(self) -> None:
        assert auto_tile_rows(64, 64, (0,), max_band_pixels=10) is None

    def test_auto_tile_rows_skips_unaligned_divisors(self) -> None:
        # Taps (0, 5) need align=2; h=50 rejects n_tiles=2 (25 rows,
        # unaligned) before accepting n_tiles=5 (10 rows).
        rows = auto_tile_rows(50, 32, (0, 5))
        assert rows == 10

    def test_compute_tiled_targets_passthrough_when_untiled(self) -> None:
        params = vgg19.init_random_params(jax.random.key(0))
        rng = np.random.default_rng(1)
        style = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
        content = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
        tiled = compute_tiled_targets(
            params, style, content, (0,), (2,), None, None, precision=HIGH,
        )
        plain = compute_targets(
            params, style, content, (0,), (2,), precision=HIGH,
        )
        np.testing.assert_allclose(
            np.asarray(tiled.style_grams[0]),
            np.asarray(plain.style_grams[0]),
        )

    def test_tiled_style_with_untiled_content(self) -> None:
        params = vgg19.init_random_params(jax.random.key(0))
        rng = np.random.default_rng(2)
        style = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
        content = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
        tiled = compute_tiled_targets(
            params, style, content, (0,), (2,),
            16, None, precision=HIGH,
        )
        plain = compute_targets(
            params, style, content, (0,), (2,), precision=HIGH,
        )
        np.testing.assert_allclose(
            np.asarray(tiled.style_grams[0]),
            np.asarray(plain.style_grams[0]),
            rtol=1e-5, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(tiled.content_feats[2]),
            np.asarray(plain.content_feats[2]),
            rtol=1e-5, atol=1e-6,
        )

    def test_tiled_style_without_content_layers(self) -> None:
        params = vgg19.init_random_params(jax.random.key(0))
        rng = np.random.default_rng(3)
        style = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
        content = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
        tiled = compute_tiled_targets(
            params, style, content, (0,), (),
            16, None, precision=HIGH,
        )
        assert tiled.content_feats == {}


def test_tiled_loss_with_single_objective_sides(params) -> None:
    """Style-only and content-only objectives zero the absent term."""
    content, style = _images(64, 32)

    style_only = compute_targets(params, style, content, (0, 5), ())
    total_s, (s_score, c_score) = tiled_total_loss(
        params, content, style_only, 100.0, 1.0,
        (0, 5), (), tile_rows=16, precision=HIGH,
    )
    assert float(c_score) == 0.0
    np.testing.assert_allclose(float(total_s), 100.0 * float(s_score))

    content_only = compute_targets(params, style, content, (), (2,))
    total_c, (s2, c2) = tiled_total_loss(
        params, content, content_only, 100.0, 1.0,
        (), (2,), tile_rows=16, precision=HIGH,
    )
    assert float(s2) == 0.0
    np.testing.assert_allclose(float(total_c), float(c2))
