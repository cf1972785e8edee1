"""Image I/O: decode, validation, device-side transforms, frame packing."""
from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from style_transfer_visualizer_tpu import image_io
from style_transfer_visualizer_tpu.constants import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)


class TestLoadImage:
    def test_loads_rgb(self, make_image_file) -> None:
        path = make_image_file("x.png", (70, 80), (10, 20, 30))
        img = image_io.load_image(str(path))
        assert img.mode == "RGB"
        assert img.size == (70, 80)

    def test_converts_rgba(self, tmp_path: Path) -> None:
        p = tmp_path / "a.png"
        Image.new("RGBA", (64, 64), (1, 2, 3, 128)).save(p)
        assert image_io.load_image(str(p)).mode == "RGB"

    def test_missing_file(self) -> None:
        with pytest.raises(FileNotFoundError, match="not found"):
            image_io.load_image("/nope/missing.png")

    def test_corrupt_file(self, tmp_path: Path) -> None:
        p = tmp_path / "bad.png"
        p.write_bytes(b"not an image")
        with pytest.raises(OSError, match="Error loading image"):
            image_io.load_image(str(p))


class TestValidateDimensions:
    def test_too_small(self) -> None:
        img = Image.new("RGB", (32, 100))
        with pytest.raises(ValueError, match="too small"):
            image_io.validate_image_dimensions(img)

    def test_large_warns(self, caplog: pytest.LogCaptureFixture) -> None:
        img = Image.new("RGB", (3200, 64))
        image_io.validate_image_dimensions(img)
        assert "large" in caplog.text

    def test_ok(self) -> None:
        image_io.validate_image_dimensions(Image.new("RGB", (64, 64)))


class TestTransforms:
    def test_load_to_array_shape_and_range(self, make_image_file) -> None:
        path = make_image_file("x.png", (70, 80), (255, 0, 0))
        arr = image_io.load_image_to_array(str(path))
        assert arr.shape == (1, 80, 70, 3)
        assert float(arr.max()) <= 1.0
        np.testing.assert_allclose(
            np.asarray(arr)[0, 0, 0], [1.0, 0.0, 0.0], atol=1e-6,
        )

    def test_normalize_roundtrip(self, make_image_file) -> None:
        path = make_image_file()
        raw = image_io.load_image_to_array(str(path), normalize=False)
        norm = image_io.load_image_to_array(str(path), normalize=True)
        back = image_io.denormalize(norm)
        np.testing.assert_allclose(
            np.asarray(back), np.asarray(raw), atol=1e-6,
        )

    def test_normalize_values(self) -> None:
        x = jnp.ones((1, 2, 2, 3), dtype=jnp.float32)
        out = np.asarray(image_io.normalize_image(x))
        expected = (1.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-6)


class TestPrepareForOutput:
    def test_scrubs_nonfinite(self) -> None:
        x = jnp.asarray(
            [[[[np.nan, np.inf, -np.inf]]]], dtype=jnp.float32,
        )
        out = np.asarray(image_io.prepare_image_for_output(x, normalize=False))
        np.testing.assert_allclose(out[0, 0, 0], [0.0, 1.0, 0.0])

    def test_clips_range(self) -> None:
        x = jnp.asarray([[[[-0.5, 0.5, 1.5]]]], dtype=jnp.float32)
        out = np.asarray(image_io.prepare_image_for_output(x, normalize=False))
        np.testing.assert_allclose(out[0, 0, 0], [0.0, 0.5, 1.0])

    def test_denormalizes_when_requested(self) -> None:
        x = jnp.zeros((1, 1, 1, 3), dtype=jnp.float32)
        out = np.asarray(image_io.prepare_image_for_output(x, normalize=True))
        np.testing.assert_allclose(out[0, 0, 0], IMAGENET_MEAN, rtol=1e-5)


class TestFramePacking:
    def test_pack_uint8(self) -> None:
        x = jnp.asarray([[[[0.0, 0.5, 1.0]]]], dtype=jnp.float32)
        frame = np.asarray(image_io.pack_uint8_frame(x))
        assert frame.dtype == np.uint8
        assert frame.shape == (1, 1, 3)
        assert list(frame[0, 0]) == [0, 128, 255]

    def test_array_to_uint8_frame(self) -> None:
        x = jnp.full((1, 4, 5, 3), 0.25, dtype=jnp.float32)
        frame = image_io.array_to_uint8_frame(x, normalize=False)
        assert frame.shape == (4, 5, 3)
        assert frame.dtype == np.uint8
        assert int(frame[0, 0, 0]) == 64


class TestSave:
    def test_save_roundtrip(self, tmp_path: Path) -> None:
        x = jnp.full((1, 8, 6, 3), 0.5, dtype=jnp.float32)
        out = tmp_path / "img.png"
        image_io.save_array_as_image(x, out)
        with Image.open(out) as img:
            assert img.size == (6, 8)
            assert img.getpixel((0, 0)) == (128, 128, 128)


def test_save_falls_back_to_numpy_without_native(
    tmp_path, monkeypatch,
) -> None:
    """PNG save uses the numpy pack path when the C library is absent."""
    import sys

    from PIL import Image

    from style_transfer_visualizer_tpu import native as native_pkg

    monkeypatch.setitem(
        sys.modules, "style_transfer_visualizer_tpu.native.frameops", None,
    )
    monkeypatch.delattr(native_pkg, "frameops", raising=False)
    arr = jnp.full((1, 4, 4, 3), 0.5, jnp.float32)
    path = tmp_path / "img.png"
    image_io.save_array_as_image(arr, path)
    with Image.open(path) as im:
        assert im.size == (4, 4)
        assert im.getpixel((0, 0)) == (128, 128, 128)


class TestStyleLoadingAndChroma:
    """Color-preservation hooks in the I/O layer (ops/color.py callers)."""

    def test_load_style_matches_content_palette(
        self, make_image_file,
    ) -> None:
        style_path = make_image_file("s.png", (64, 64), (0, 0, 200))
        content = np.full((1, 64, 64, 3), 0.0, dtype=np.float32)
        content[..., 1] = 0.7  # solid green palette
        arr = image_io.load_style_image_to_array(
            str(style_path), match_to=content,
        )
        # A solid style matched onto a solid palette collapses to the
        # content's mean color.
        np.testing.assert_allclose(
            np.asarray(arr).mean(axis=(0, 1, 2)), [0.0, 0.7, 0.0],
            atol=1e-2,
        )

    def test_load_style_without_match_is_plain_load(
        self, make_image_file,
    ) -> None:
        style_path = make_image_file("s.png", (64, 64), (0, 0, 200))
        plain = image_io.load_image_to_array(str(style_path))
        loaded = image_io.load_style_image_to_array(str(style_path))
        np.testing.assert_allclose(
            np.asarray(loaded), np.asarray(plain), atol=0,
        )

    def test_frame_packing_with_chroma_source(self) -> None:
        from style_transfer_visualizer_tpu.ops.color import rgb_to_yiq

        rng = np.random.default_rng(0)
        stylized = jnp.asarray(
            0.25 + 0.5 * rng.random((1, 8, 8, 3)), dtype=jnp.float32,
        )
        chroma = jnp.asarray(
            0.25 + 0.5 * rng.random((1, 8, 8, 3)), dtype=jnp.float32,
        )
        frame = image_io.array_to_uint8_frame(
            stylized, normalize=False, chroma_source=chroma,
        )
        assert frame.shape == (8, 8, 3)
        assert frame.dtype == np.uint8
        out_iq = np.asarray(rgb_to_yiq(frame.astype(np.float32) / 255.0))
        src_iq = np.asarray(rgb_to_yiq(chroma))[0]
        np.testing.assert_allclose(
            out_iq[..., 1:], src_iq[..., 1:], atol=0.01,
        )

    def test_frame_packing_without_chroma_is_unchanged(self) -> None:
        x = jnp.asarray(
            np.linspace(0, 1, 8 * 8 * 3, dtype=np.float32).reshape(
                1, 8, 8, 3,
            ),
        )
        plain = image_io.array_to_uint8_frame(x, normalize=False)
        same = image_io.array_to_uint8_frame(
            x, normalize=False, chroma_source=None,
        )
        np.testing.assert_array_equal(plain, same)
