"""Native frameops: build, bindings, and parity with the numpy path."""
from __future__ import annotations

import numpy as np
import pytest

pytest.importorskip(
    "style_transfer_visualizer_tpu.native.frameops",
    reason="no C compiler available",
)

from style_transfer_visualizer_tpu.native import frameops  # noqa: E402


class TestBlend:
    def test_endpoints(self) -> None:
        a = np.full((8, 8, 3), 10, np.uint8)
        b = np.full((8, 8, 3), 250, np.uint8)
        np.testing.assert_array_equal(frameops.blend_u8(a, b, 0.0), a)
        np.testing.assert_array_equal(frameops.blend_u8(a, b, 1.0), b)

    def test_midpoint(self) -> None:
        a = np.zeros((4, 4, 3), np.uint8)
        b = np.full((4, 4, 3), 200, np.uint8)
        out = frameops.blend_u8(a, b, 0.5)
        assert int(out[0, 0, 0]) == 100

    def test_matches_float_reference_within_one(self) -> None:
        rng = np.random.default_rng(0)
        a = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        b = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        for alpha in (0.1, 0.33, 0.5, 0.77):
            ours = frameops.blend_u8(a, b, alpha).astype(np.int16)
            ref = np.rint(
                a.astype(np.float32) * (1 - alpha)
                + b.astype(np.float32) * alpha,
            ).astype(np.int16)
            assert np.abs(ours - ref).max() <= 1  # fixed-point LSB

    def test_shape_mismatch(self) -> None:
        with pytest.raises(ValueError, match="share shape"):
            frameops.blend_u8(
                np.zeros((2, 2, 3), np.uint8),
                np.zeros((3, 3, 3), np.uint8),
                0.5,
            )


class TestPack:
    def test_pack_and_clamp(self) -> None:
        src = np.asarray([[-0.5, 0.0, 0.5, 1.0, 2.0]], np.float32)
        out = frameops.pack_f32_to_u8(src)
        assert list(out[0]) == [0, 0, 128, 255, 255]


def test_segments_use_native_when_available() -> None:
    from style_transfer_visualizer_tpu.media.segments import blend_frames

    a = np.zeros((4, 4, 3), np.uint8)
    b = np.full((4, 4, 3), 100, np.uint8)
    out = blend_frames(a, b, 0.25)
    assert int(out[0, 0, 0]) == 25
