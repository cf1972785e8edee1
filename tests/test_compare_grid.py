"""Gallery API validators, render dispatch, and compare-grid CLI."""
from __future__ import annotations

from pathlib import Path

import pytest
from PIL import Image

from style_transfer_visualizer_tpu.gallery import (
    ComparisonRenderOptions,
    parse_wall_color,
    positive_int,
    render_comparison,
    size_2d,
)
from style_transfer_visualizer_tpu.gallery.cli import build_parser, main


class TestValidators:
    def test_positive_int(self) -> None:
        assert positive_int("5") == 5

    @pytest.mark.parametrize("bad", ["0", "-1", "abc"])
    def test_positive_int_rejects(self, bad: str) -> None:
        with pytest.raises(ValueError, match="must be"):
            positive_int(bad)

    def test_size_2d(self) -> None:
        assert size_2d("1920x1080") == (1920, 1080)
        assert size_2d("640X480") == (640, 480)

    @pytest.mark.parametrize("bad", ["1920", "ax b", "0x100", "1x2x3"])
    def test_size_2d_rejects(self, bad: str) -> None:
        with pytest.raises(ValueError, match="must"):
            size_2d(bad)

    def test_wall_color(self) -> None:
        assert parse_wall_color("#3c434a") == (0x3C, 0x43, 0x4A)
        assert parse_wall_color("ffffff") == (255, 255, 255)

    @pytest.mark.parametrize("bad", ["#fff", "#gggggg", "12345"])
    def test_wall_color_rejects(self, bad: str) -> None:
        with pytest.raises(ValueError, match="wall color"):
            parse_wall_color(bad)


@pytest.fixture
def three_images(tmp_path: Path) -> dict[str, Path]:
    paths = {}
    for name, color in (
        ("content", (0, 200, 0)), ("style", (0, 0, 200)),
        ("result", (200, 0, 0)),
    ):
        p = tmp_path / f"{name}.png"
        Image.new("RGB", (64, 48), color).save(p)
        paths[name] = p
    return paths


class TestRenderComparison:
    def test_grid_mode(self, three_images, tmp_path: Path) -> None:
        out = render_comparison(ComparisonRenderOptions(
            content_path=three_images["content"],
            style_path=three_images["style"],
            result_path=three_images["result"],
            out_path=tmp_path / "grid.png",
            target_height=48,
        ))
        assert out.exists()

    def test_grid_mode_requires_result(self, three_images, tmp_path) -> None:
        with pytest.raises(ValueError, match="result_path is required"):
            render_comparison(ComparisonRenderOptions(
                content_path=three_images["content"],
                style_path=three_images["style"],
                out_path=tmp_path / "grid.png",
            ))

    def test_gallery_mode_two_across(self, three_images, tmp_path) -> None:
        out = render_comparison(ComparisonRenderOptions(
            content_path=three_images["content"],
            style_path=three_images["style"],
            out_path=tmp_path / "wall",
            layout="gallery-two-across",
            target_size=(200, 120),
        ))
        assert out.suffix == ".png"
        with Image.open(out) as im:
            assert im.size == (200, 120)

    def test_gallery_stacked_left(self, three_images, tmp_path) -> None:
        out = render_comparison(ComparisonRenderOptions(
            content_path=three_images["content"],
            style_path=three_images["style"],
            result_path=three_images["result"],
            out_path=tmp_path / "wall3.png",
            layout="gallery-stacked-left",
            target_size=(220, 140),
            show_labels=True,
        ))
        assert out.exists()

    def test_default_naming(self, three_images, tmp_path, monkeypatch) -> None:
        monkeypatch.chdir(tmp_path)
        out = render_comparison(ComparisonRenderOptions(
            content_path=three_images["content"],
            style_path=three_images["style"],
            layout="gallery-two-across",
            target_size=(120, 80),
        ))
        assert out.name == "comparison_content_x_style.png"


class TestCli:
    def test_parser_requires_content_style(self) -> None:
        with pytest.raises(SystemExit):
            build_parser().parse_args([])

    def test_result_required_without_layout(self, three_images) -> None:
        with pytest.raises(SystemExit):
            main([
                "--content", str(three_images["content"]),
                "--style", str(three_images["style"]),
            ])

    def test_end_to_end_gallery(self, three_images, tmp_path) -> None:
        out = tmp_path / "cli_wall.png"
        rc = main([
            "--content", str(three_images["content"]),
            "--style", str(three_images["style"]),
            "--layout", "gallery-two-across",
            "--target-size", "160x100",
            "--out", str(out),
            "--show-labels",
            "--wall", "#112233",
            "--frame-style", "oak",
        ])
        assert rc == 0
        assert out.exists()

    def test_end_to_end_grid(self, three_images, tmp_path) -> None:
        out = tmp_path / "cli_grid.png"
        rc = main([
            "--content", str(three_images["content"]),
            "--style", str(three_images["style"]),
            "--result", str(three_images["result"]),
            "--out", str(out),
            "--target-height", "32",
        ])
        assert rc == 0
        assert out.exists()

    def test_invalid_size_argument(self, three_images) -> None:
        with pytest.raises(SystemExit):
            main([
                "--content", str(three_images["content"]),
                "--style", str(three_images["style"]),
                "--layout", "gallery-two-across",
                "--target-size", "bogus",
            ])

    def test_tools_wrapper_exports(self) -> None:
        from style_transfer_visualizer_tpu.tools import compare_grid

        assert compare_grid.build_parser is build_parser
        assert compare_grid.main is main


def test_render_valueerror_becomes_parser_error(
    monkeypatch, tmp_path,
) -> None:
    """Runtime ValueErrors from rendering exit with argparse's code 2."""
    import style_transfer_visualizer_tpu.gallery.cli as gallery_cli

    def boom(options):
        msg = "synthetic render failure"
        raise ValueError(msg)

    monkeypatch.setattr(gallery_cli, "render_comparison", boom)
    img = tmp_path / "a.png"
    Image.new("RGB", (32, 32), "red").save(img)
    with pytest.raises(SystemExit) as excinfo:
        main([
            "--content", str(img), "--style", str(img),
            "--layout", "gallery-two-across",
            "--out", str(tmp_path / "o.png"),
        ])
    assert excinfo.value.code == 2


class TestBranchDirections:
    """One-way branch directions flagged by the branch coverage tool."""

    def test_grid_mode_with_exact_canvas_size(
        self, three_images, tmp_path,
    ) -> None:
        """target_size supersedes the height-normalized grid layout."""
        out = render_comparison(ComparisonRenderOptions(
            content_path=three_images["content"],
            style_path=three_images["style"],
            result_path=three_images["result"],
            out_path=tmp_path / "grid_sized.png",
            target_height=48,
            target_size=(200, 100),
        ))
        with Image.open(out) as im:
            assert im.size == (200, 100)

    def test_gallery_mode_defaults_to_full_hd(
        self, three_images, tmp_path,
    ) -> None:
        out = render_comparison(ComparisonRenderOptions(
            content_path=three_images["content"],
            style_path=three_images["style"],
            out_path=tmp_path / "wall_hd.png",
            layout="gallery-two-across",
        ))
        with Image.open(out) as im:
            assert im.size == (1920, 1080)
