"""Comparison rendering API shared by the CLI, tools, and the pipeline.

One entry point (``render_comparison``) dispatches between the flat
three-panel grid (no layout given, result required) and the gallery-wall
layouts; validators parse CLI-style option strings (reference
gallery/api.py:38-195).
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Literal

from style_transfer_visualizer_tpu.constants import (
    COLOR_GREY,
    RESOLUTION_FULL_HD,
)
from style_transfer_visualizer_tpu.image_grid import (
    default_comparison_name,
    save_comparison_grid,
    save_gallery_comparison,
)
from style_transfer_visualizer_tpu.utils.logging import logger

GalleryLayout = Literal["gallery-stacked-left", "gallery-two-across"]
FrameStyle = Literal["gold", "oak", "black"]

LAYOUT_CHOICES: tuple[GalleryLayout, ...] = (
    "gallery-stacked-left",
    "gallery-two-across",
)
FRAME_CHOICES: tuple[FrameStyle, ...] = ("gold", "oak", "black")


@dataclass(slots=True)
class ComparisonRenderOptions:
    """All knobs for one comparison render (mirrors compare-grid flags)."""

    content_path: Path
    style_path: Path
    result_path: Path | None = None
    out_path: Path | None = None
    target_height: int = 512
    pad: int = 16
    border_px: int = 0
    target_size: tuple[int, int] | None = None
    layout: GalleryLayout | None = None
    wall_color: tuple[int, int, int] = COLOR_GREY
    frame_style: FrameStyle = "gold"
    show_labels: bool = False


def positive_int(text: str) -> int:
    """Parse a strictly positive integer."""
    try:
        value = int(text)
    except ValueError as exc:
        msg = "must be an integer"
        raise ValueError(msg) from exc
    if value <= 0:
        msg = "must be positive"
        raise ValueError(msg)
    return value


def size_2d(text: str) -> tuple[int, int]:
    """Parse a "WxH" size string."""
    parts = text.lower().split("x")
    if len(parts) != 2:
        msg = "must look like WxH, e.g., 1920x1080"
        raise ValueError(msg)
    try:
        width, height = int(parts[0]), int(parts[1])
    except ValueError as exc:
        msg = "width and height must be integers"
        raise ValueError(msg) from exc
    if width <= 0 or height <= 0:
        msg = "width and height must be positive"
        raise ValueError(msg)
    return width, height


def parse_wall_color(text: str) -> tuple[int, int, int]:
    """Parse a "#rrggbb" hex color."""
    digits = text.strip().lstrip("#")
    if len(digits) != 6:
        msg = "wall color must look like #rrggbb"
        raise ValueError(msg)
    try:
        return tuple(
            int(digits[i : i + 2], 16) for i in (0, 2, 4)
        )  # type: ignore[return-value]
    except ValueError as exc:
        msg = "wall color contains invalid hex digits"
        raise ValueError(msg) from exc


def _with_png_suffix(path: Path) -> Path:
    return path if path.suffix.lower() == ".png" else path.with_suffix(".png")


def render_comparison(options: ComparisonRenderOptions) -> Path:
    """Render either a flat grid or a gallery wall; return the saved path."""
    content_path = Path(options.content_path)
    style_path = Path(options.style_path)
    result_path = (
        Path(options.result_path) if options.result_path else None
    )

    out_path = (
        Path(options.out_path)
        if options.out_path is not None
        else default_comparison_name(content_path, style_path, Path())
    )
    out_path = _with_png_suffix(out_path)

    if options.layout is None:
        if result_path is None:
            msg = "result_path is required when layout is None"
            raise ValueError(msg)
        saved = save_comparison_grid(
            content_path=content_path,
            style_path=style_path,
            result_path=result_path,
            out_path=out_path,
            target_height=(
                options.target_height
                if options.target_size is None
                else None
            ),
            target_size=options.target_size,
            pad=options.pad,
            border_px=options.border_px,
        )
    else:
        saved = save_gallery_comparison(
            content_path=content_path,
            style_path=style_path,
            result_path=(
                None
                if options.layout == "gallery-two-across"
                else result_path
            ),
            out_path=out_path,
            target_size=options.target_size or RESOLUTION_FULL_HD,
            layout=options.layout,
            wall_color=options.wall_color,
            frame_tone=options.frame_style,
            show_labels=options.show_labels,
        )

    logger.info("Comparison image saved to: %s", saved)
    return saved
