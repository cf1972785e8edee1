"""Color-preservation transforms (ops/color.py).

The reference has no color controls; these cover the TPU framework's
``--preserve-color`` additions (Gatys et al. 2016, arXiv:1606.05897):
YIQ round trips, luminance-only recombination, and the host-side
style-to-content color-statistics matching.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_visualizer_tpu.ops.color import (
    luminance_transfer,
    match_color_distribution,
    maybe_restore_color,
    rgb_to_yiq,
    yiq_to_rgb,
)


def _rand_img(seed: int, shape: tuple[int, ...]) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # Mid-range values so YIQ->RGB stays inside [0,1] (no clipping in
    # the exactness assertions).
    return (0.25 + 0.5 * rng.random(shape)).astype(np.float32)


class TestYIQ:
    def test_round_trip_is_identity(self) -> None:
        rgb = jnp.asarray(_rand_img(0, (5, 7, 3)))
        back = yiq_to_rgb(rgb_to_yiq(rgb))
        np.testing.assert_allclose(back, rgb, rtol=0, atol=1e-6)

    def test_luma_row_is_rec601(self) -> None:
        rgb = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                           [0.0, 0.0, 1.0]])
        y = np.asarray(rgb_to_yiq(rgb))[:, 0]
        np.testing.assert_allclose(y, [0.299, 0.587, 0.114], atol=1e-6)

    def test_gray_has_zero_chroma(self) -> None:
        gray = jnp.full((4, 4, 3), 0.42)
        yiq = np.asarray(rgb_to_yiq(gray))
        np.testing.assert_allclose(yiq[..., 1:], 0.0, atol=1e-6)


class TestLuminanceTransfer:
    def test_keeps_stylized_luma_and_content_chroma(self) -> None:
        stylized = jnp.asarray(_rand_img(1, (1, 6, 6, 3)))
        content = jnp.asarray(_rand_img(2, (1, 6, 6, 3)))
        out = luminance_transfer(stylized, content)
        out_yiq = np.asarray(rgb_to_yiq(out))
        np.testing.assert_allclose(
            out_yiq[..., 0], np.asarray(rgb_to_yiq(stylized))[..., 0],
            atol=1e-5,
        )
        np.testing.assert_allclose(
            out_yiq[..., 1:], np.asarray(rgb_to_yiq(content))[..., 1:],
            atol=1e-5,
        )

    def test_gray_content_yields_gray_output(self) -> None:
        stylized = jnp.asarray(_rand_img(3, (1, 4, 4, 3)))
        content = jnp.full((1, 4, 4, 3), 0.5)
        out = np.asarray(luminance_transfer(stylized, content))
        # All channels equal: the output carries no chrominance.
        np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-5)
        np.testing.assert_allclose(out[..., 0], out[..., 2], atol=1e-5)

    def test_identity_when_inputs_match(self) -> None:
        img = jnp.asarray(_rand_img(4, (1, 5, 5, 3)))
        np.testing.assert_allclose(
            luminance_transfer(img, img), img, atol=1e-5,
        )

    def test_broadcasts_style_batch_over_one_content(self) -> None:
        stylized = jnp.asarray(_rand_img(5, (3, 1, 4, 4, 3)))
        content = jnp.asarray(_rand_img(6, (1, 4, 4, 3)))
        out = luminance_transfer(stylized, content)
        assert out.shape == (3, 1, 4, 4, 3)
        one = luminance_transfer(stylized[1], content)
        np.testing.assert_allclose(out[1], one, atol=1e-6)

    def test_output_clipped_to_unit_range(self) -> None:
        stylized = jnp.ones((1, 4, 4, 3))
        content = jnp.asarray(
            np.stack(
                [np.ones((4, 4)), np.zeros((4, 4)), np.zeros((4, 4))],
                axis=-1,
            )[None],
            dtype=jnp.float32,
        )
        out = np.asarray(luminance_transfer(stylized, content))
        assert out.min() >= 0.0
        assert out.max() <= 1.0

    def test_maybe_restore_color_none_is_identity(self) -> None:
        img = jnp.asarray(_rand_img(7, (1, 4, 4, 3)))
        assert maybe_restore_color(img, None) is img

    def test_maybe_restore_color_applies_transfer(self) -> None:
        img = jnp.asarray(_rand_img(8, (1, 4, 4, 3)))
        chroma = jnp.asarray(_rand_img(9, (1, 4, 4, 3)))
        np.testing.assert_allclose(
            maybe_restore_color(img, chroma),
            luminance_transfer(img, chroma),
            atol=0,
        )


class TestMatchColorDistribution:
    def test_matched_stats_equal_content_stats(self) -> None:
        style = _rand_img(10, (1, 32, 32, 3))
        # Content with a distinct, well-conditioned palette.
        rng = np.random.default_rng(11)
        base = rng.random((1, 32, 32, 3)).astype(np.float32)
        content = (0.3 + 0.4 * base * [0.9, 0.5, 0.2]).astype(np.float32)
        matched = match_color_distribution(style, content)
        m_flat = matched.reshape(-1, 3).astype(np.float64)
        c_flat = content.reshape(-1, 3).astype(np.float64)
        np.testing.assert_allclose(
            m_flat.mean(axis=0), c_flat.mean(axis=0), atol=2e-3,
        )
        np.testing.assert_allclose(
            np.cov(m_flat.T), np.cov(c_flat.T), atol=2e-3,
        )

    def test_preserves_shape_and_dtype(self) -> None:
        style = _rand_img(12, (1, 8, 8, 3))
        content = _rand_img(13, (1, 6, 10, 3))
        matched = match_color_distribution(style, content)
        assert matched.shape == style.shape
        assert matched.dtype == style.dtype

    def test_degenerate_solid_style_is_finite(self) -> None:
        style = np.full((1, 8, 8, 3), 0.5, dtype=np.float32)
        content = _rand_img(14, (1, 8, 8, 3))
        matched = match_color_distribution(style, content)
        assert np.isfinite(matched).all()
        assert matched.min() >= 0.0
        assert matched.max() <= 1.0

    def test_degenerate_gray_content_is_finite(self) -> None:
        style = _rand_img(15, (1, 8, 8, 3))
        gray = np.full((1, 8, 8, 3), 0.25, dtype=np.float32)
        matched = match_color_distribution(style, gray)
        assert np.isfinite(matched).all()
        # Matching onto a zero-variance palette collapses to its mean.
        np.testing.assert_allclose(matched, 0.25, atol=1e-2)

    def test_output_clipped_to_unit_range(self) -> None:
        rng = np.random.default_rng(16)
        style = rng.random((1, 16, 16, 3)).astype(np.float32)
        content = (rng.random((1, 16, 16, 3)) ** 3).astype(np.float32)
        matched = match_color_distribution(style, content)
        assert matched.min() >= 0.0
        assert matched.max() <= 1.0

    @pytest.mark.parametrize("seed", [20, 21])
    def test_matching_content_to_itself_is_near_identity(
        self, seed: int,
    ) -> None:
        img = _rand_img(seed, (1, 16, 16, 3))
        matched = match_color_distribution(img, img)
        np.testing.assert_allclose(matched, img, atol=1e-4)
