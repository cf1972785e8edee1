"""Pixel-level parity of gallery rendering against the actual reference.

The reference's gallery subsystem is pure PIL (no torchvision/tomlkit
imports), so when the reference repo is mounted we can import it and
compare outputs directly. The flat grid path is fully deterministic and
must match pixel-for-pixel; the gallery wall uses PIL's unseeded
``Image.effect_noise`` (reference image_grid/core.py:484-554), so those
comparisons use tight statistical tolerances instead.
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

_REF_SRC = Path("/root/reference/src")
if not _REF_SRC.is_dir():  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)
sys.path.insert(0, str(_REF_SRC))

ref_layouts = pytest.importorskip(
    "style_transfer_visualizer.image_grid.layouts",
)
ref_core = pytest.importorskip("style_transfer_visualizer.image_grid.core")

from style_transfer_visualizer_tpu.image_grid import core as our_core  # noqa: E402
from style_transfer_visualizer_tpu.image_grid import (  # noqa: E402
    layouts as our_layouts,
)

pytestmark = pytest.mark.visual


def _gradient_image(size, seed) -> Image.Image:
    rng = np.random.default_rng(seed)
    h, w = size[1], size[0]
    base = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
    img = np.broadcast_to(base, (h, w, 3)) + rng.uniform(0, 40, (h, w, 3))
    return Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))


@pytest.fixture
def panels():
    return (
        _gradient_image((120, 90), 0),
        _gradient_image((80, 100), 1),
        _gradient_image((120, 90), 2),
    )


class TestGridExactParity:
    def test_tight_grid_pixel_identical(self, panels) -> None:
        ours = our_layouts.make_horizontal_grid(
            list(panels), target_height=64, pad=12, border_px=2,
        )
        theirs = ref_layouts.make_horizontal_grid(
            list(panels), target_height=64, pad=12, border_px=2,
        )
        np.testing.assert_array_equal(
            np.asarray(ours), np.asarray(theirs),
        )

    def test_fixed_canvas_pixel_identical(self, panels) -> None:
        ours = our_layouts.make_horizontal_grid(
            list(panels), target_size=(400, 200),
        )
        theirs = ref_layouts.make_horizontal_grid(
            list(panels), target_size=(400, 200),
        )
        np.testing.assert_array_equal(
            np.asarray(ours), np.asarray(theirs),
        )


class TestWallStatisticalParity:
    @pytest.mark.parametrize(
        "layout", ["gallery-two-across", "gallery-stacked-left"],
    )
    def test_gallery_wall_close(self, panels, layout) -> None:
        content, style, result = panels
        kwargs = dict(
            target_size=(480, 270),
            layout=layout,
            wall_color=(60, 67, 74),
        )
        ours = np.asarray(
            our_layouts.make_gallery_comparison(
                content, style, result,
                frame=our_core.FrameParams(frame_tone="gold", label="on"),
                **kwargs,
            ),
            dtype=np.float32,
        )
        theirs = np.asarray(
            ref_layouts.make_gallery_comparison(
                content, style, result,
                frame=ref_core.FrameParams(frame_tone="gold", label="on"),
                **kwargs,
            ),
            dtype=np.float32,
        )
        assert ours.shape == theirs.shape
        # Unseeded PIL noise differs between runs; everything else
        # (geometry, frames, labels, gradients, vignette) must align.
        mean_abs = float(np.abs(ours - theirs).mean())
        assert mean_abs < 4.0, f"mean abs diff {mean_abs}"
        # Block means kill the per-pixel noise: geometry must match
        # almost exactly.
        block = lambda a: a.reshape(27, 10, 48, 10, 3).mean(  # noqa: E731
            axis=(1, 3),
        )
        block_diff = float(np.abs(block(ours) - block(theirs)).max())
        assert block_diff < 8.0, f"max block diff {block_diff}"

    def test_reference_noise_is_nondeterministic_baseline(
        self, panels,
    ) -> None:
        """Reference vs itself has nonzero diff — bounds our tolerance."""
        content, style, _ = panels
        a = np.asarray(
            ref_layouts.make_gallery_comparison(
                content, style, None, target_size=(480, 270),
            ),
            dtype=np.float32,
        )
        b = np.asarray(
            ref_layouts.make_gallery_comparison(
                content, style, None, target_size=(480, 270),
            ),
            dtype=np.float32,
        )
        self_noise = float(np.abs(a - b).mean())
        assert self_noise > 0.0  # unseeded noise exists
        assert self_noise < 4.0  # and our tolerance comfortably covers it
