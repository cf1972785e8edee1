"""Gallery/grid rendering: geometry, panels, walls, labels, persistence."""
from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from style_transfer_visualizer_tpu.image_grid import core, layouts, naming
from style_transfer_visualizer_tpu.image_grid.core import (
    FrameParams,
    Rect,
)


def _img(size=(60, 40), color=(200, 50, 50), mode="RGB") -> Image.Image:
    return Image.new(mode, size, color)


class TestToRgb:
    def test_rgb_passthrough(self) -> None:
        img = _img()
        assert core.to_rgb(img, bg_color=(0, 0, 0)) is img

    def test_rgba_composited(self) -> None:
        img = Image.new("RGBA", (10, 10), (255, 0, 0, 128))
        out = core.to_rgb(img, bg_color=(0, 0, 255))
        assert out.mode == "RGB"
        r, g, b = out.getpixel((5, 5))
        assert r > 100 and b > 100  # both layers contribute

    def test_l_converted(self) -> None:
        out = core.to_rgb(Image.new("L", (8, 8), 77), bg_color=(0, 0, 0))
        assert out.mode == "RGB"


class TestGeometry:
    def test_resize_to_height(self) -> None:
        out = core.resize_to_height(_img((100, 50)), 25)
        assert out.size == (50, 25)

    def test_resize_zero_height_raises(self) -> None:
        with pytest.raises(ValueError, match="zero height"):
            core.resize_to_height(Image.new("RGB", (10, 0)), 20)

    def test_rect_helpers(self) -> None:
        r = Rect(10, 20, 50, 60)
        assert r.size() == (40, 40)
        assert r.move_to(0, 0) == Rect(0, 0, 40, 40)
        assert r.inset(5, 5) == Rect(15, 25, 45, 55)

    def test_content_dimensions(self) -> None:
        imgs = [_img((10, 20)), _img((30, 15))]
        w, h, widths, heights = core.content_dimensions(imgs, 4)
        assert w == 10 + 4 + 30
        assert h == 20
        assert widths == [10, 30]

    def test_fit_box_matches_aspect(self) -> None:
        box = Rect(0, 0, 400, 300)
        img = _img((200, 100))  # 2:1
        fitted = core.fit_box_by_inner_aspect(
            box, img, FrameParams(), 0.0,
        )
        margin = core._margin_px(FrameParams(), fitted.w, fitted.h)
        inner_w = fitted.w - 2 * margin
        inner_h = fitted.h - 2 * margin
        assert abs(inner_w / inner_h - 2.0) < 0.1

    def test_fit_box_bad_image(self) -> None:
        with pytest.raises(ValueError, match="positive"):
            core.fit_box_by_inner_aspect(
                Rect(0, 0, 100, 100), Image.new("RGB", (10, 0)),
                FrameParams(), 0.0,
            )


class TestFramedPanel:
    def test_panel_size_and_mode(self) -> None:
        panel, anchor = core.build_framed_panel(
            _img(), (120, 90), FrameParams(), wall_color=(60, 67, 74),
        )
        assert panel.size == (120, 90)
        assert panel.mode == "RGB"
        assert anchor == (60, 90)

    @pytest.mark.parametrize("tone", ["gold", "oak", "black", "unknown"])
    def test_tones(self, tone: str) -> None:
        panel, _ = core.build_framed_panel(
            _img(), (80, 80), FrameParams(frame_tone=tone),
            wall_color=(0, 0, 0),
        )
        assert panel.size == (80, 80)

    def test_contain_mode_letterboxes(self) -> None:
        wide = _img((200, 20), (0, 255, 0))
        panel, _ = core.build_framed_panel(
            wide, (100, 100),
            FrameParams(fit_mode="contain", frame_texture_strength=0),
            wall_color=(0, 0, 0),
        )
        arr = np.asarray(panel)
        beige_mask = np.all(
            np.abs(arr.astype(int) - (240, 236, 226)) < 10, axis=-1,
        )
        assert beige_mask.any()  # letterbox matte visible

    def test_texture_disabled(self) -> None:
        img = Image.new("RGBA", (50, 50), (10, 10, 10, 255))
        out = core.add_frame_texture(img, 0)
        assert out is img


class TestWall:
    def test_wall_gradient_and_vignette(self) -> None:
        wall = core.make_wall_canvas((64, 64), (60, 67, 74))
        arr = np.asarray(wall)
        # vignette: corners darker than center
        assert arr[32, 32].sum() > arr[1, 1].sum()

    def test_wall_noise(self) -> None:
        a = core.make_wall_canvas(
            (40, 40), (100, 100, 100), noise=True,
        )
        assert a.size == (40, 40)


class TestHorizontalGrid:
    def test_empty_raises(self) -> None:
        with pytest.raises(ValueError, match="No images"):
            layouts.make_horizontal_grid([])

    def test_tight_layout_size(self) -> None:
        grid = layouts.make_horizontal_grid(
            [_img((40, 20)), _img((40, 20))],
            target_height=20, pad=10,
        )
        # two 40x20 panels + 10 gap + 2*10 outer pad
        assert grid.size == (40 + 10 + 40 + 20, 20 + 20)

    def test_exact_canvas(self) -> None:
        grid = layouts.make_horizontal_grid(
            [_img(), _img(), _img()],
            target_size=(320, 240), target_height=None,
        )
        assert grid.size == (320, 240)

    def test_border(self) -> None:
        grid = layouts.make_horizontal_grid(
            [_img((20, 20), (255, 255, 255))],
            target_height=20, pad=0, border_px=2,
        )
        arr = np.asarray(grid)
        assert tuple(arr[0, 0]) == (0, 0, 0)  # black border ring
        assert tuple(arr[12, 12]) == (255, 255, 255)  # panel interior


class TestGalleryComparison:
    def test_two_across_when_no_result(self) -> None:
        out = layouts.make_gallery_comparison(
            _img(), _img((40, 60), (0, 0, 255)), None,
            target_size=(320, 200),
        )
        assert out.size == (320, 200)

    def test_stacked_left_with_result(self) -> None:
        out = layouts.make_gallery_comparison(
            _img(), _img(), _img((64, 64), (0, 255, 0)),
            target_size=(320, 200),
            frame=FrameParams(label="on"),
        )
        assert out.size == (320, 200)

    def test_two_across_ignores_result(self) -> None:
        a = layouts.make_gallery_comparison(
            _img(), _img(), _img(),
            target_size=(200, 120), layout="gallery-two-across",
        )
        assert a.size == (200, 120)

    def test_bad_target_size(self) -> None:
        with pytest.raises(ValueError, match="positive"):
            layouts.make_gallery_comparison(
                _img(), _img(), None, target_size=(0, 100),
            )

    def test_texture_strength_clamped(self) -> None:
        out = layouts.make_gallery_comparison(
            _img(), _img(), None,
            target_size=(160, 100),
            frame=FrameParams(frame_texture_strength=9999),
        )
        assert out.size == (160, 100)


class TestNaming:
    def test_default_name_spaces(self) -> None:
        p = naming.default_comparison_name(
            Path("/in/my cat.png"), Path("/in/star night.jpg"), Path("/o"),
        )
        assert p.name == "comparison_my_cat_x_star_night.png"

    def test_save_grid(self, tmp_path: Path) -> None:
        for name in ("c.png", "s.png", "r.png"):
            _img((40, 30)).save(tmp_path / name)
        out = naming.save_comparison_grid(
            tmp_path / "c.png", tmp_path / "s.png", tmp_path / "r.png",
            tmp_path / "grid.png", target_height=30,
        )
        assert out.exists()
        with Image.open(out) as im:
            assert im.height == 30 + 32  # panel height + padding

    def test_save_grid_requires_path(self, tmp_path: Path) -> None:
        with pytest.raises(TypeError, match="pathlib.Path"):
            naming.save_comparison_grid(
                tmp_path / "c.png", tmp_path / "s.png", tmp_path / "r.png",
                "string_path.png",  # type: ignore[arg-type]
            )

    def test_save_gallery(self, tmp_path: Path) -> None:
        for name in ("c.png", "s.png"):
            _img((64, 64)).save(tmp_path / name)
        out = naming.save_gallery_comparison(
            tmp_path / "c.png", tmp_path / "s.png", None,
            tmp_path / "wall.png", target_size=(200, 120),
        )
        with Image.open(out) as im:
            assert im.size == (200, 120)


class TestFontFallback:
    def test_missing_truetype_falls_back_to_default(
        self, monkeypatch,
    ) -> None:
        from PIL import ImageFont

        real_truetype = core.ImageFont.truetype

        def no_dejavu(font=None, *a, **k):
            # Only the named system font is missing; Pillow's
            # load_default() may itself route through truetype for its
            # embedded font and must keep working.
            if font == "DejaVuSans.ttf":
                raise OSError("font not found")
            return real_truetype(font, *a, **k)

        monkeypatch.setattr(core.ImageFont, "truetype", no_dejavu)
        font = core._cached_font(997)  # unique px: bypass the lru cache
        assert isinstance(
            font, (ImageFont.ImageFont, ImageFont.FreeTypeFont),
        )


class TestFrameTextureAlpha:
    def test_rgba_frame_keeps_alpha_channel(self) -> None:
        frame = Image.new("RGBA", (32, 32), (120, 90, 40, 200))
        out = core.add_frame_texture(frame, strength=20)
        assert out.mode == "RGBA"
        assert out.getchannel("A").getpixel((5, 5)) == 200


def test_frame_texture_preserves_rgb_mode() -> None:
    """No alpha channel in -> plain RGB blend out."""
    from PIL import Image

    from style_transfer_visualizer_tpu.image_grid.core import (
        add_frame_texture,
    )

    out = add_frame_texture(Image.new("RGB", (32, 24), (120, 90, 40)))
    assert out.mode == "RGB"
    assert out.size == (32, 24)


class TestBranchDirections:
    """Remaining one-way branch directions flagged by the branch tool."""

    def test_scale_images_to_target_default_height(self) -> None:
        from PIL import Image

        from style_transfer_visualizer_tpu.image_grid.core import (
            DEFAULT_HEIGHT,
            scale_images_to_target,
        )

        out = scale_images_to_target(
            [Image.new("RGB", (100, 50))], None, None,
        )
        assert out[0].size[1] == DEFAULT_HEIGHT

    def test_content_dimensions_empty_list(self) -> None:
        from style_transfer_visualizer_tpu.image_grid.core import (
            content_dimensions,
        )

        row_w, row_h, widths, heights = content_dimensions([], 4)
        assert row_h == 0
        assert widths == [] and heights == []

    def test_framed_panel_without_bevel(self) -> None:
        from PIL import Image

        from style_transfer_visualizer_tpu.image_grid.core import (
            FrameParams,
            build_framed_panel,
        )

        panel, _anchor = build_framed_panel(
            Image.new("RGB", (64, 64), (200, 10, 10)),
            (140, 120),
            FrameParams(bevel_px=0),
            wall_color=(40, 40, 40),
        )
        assert panel.size == (140, 120)

    def test_wall_canvas_without_vignette(self) -> None:
        from style_transfer_visualizer_tpu.image_grid.core import (
            make_wall_canvas,
        )

        wall = make_wall_canvas((64, 48), (90, 90, 90), vignette=False)
        assert wall.size == (64, 48)
