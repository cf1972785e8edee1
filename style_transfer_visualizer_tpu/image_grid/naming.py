"""Naming and persistence for comparison outputs.

Deterministic names (``comparison_{content}_x_{style}.png``, spaces to
underscores) and file-opening wrappers around the layout renderers
(reference naming.py:35-130).
"""
from __future__ import annotations

from contextlib import ExitStack
from pathlib import Path
from typing import TYPE_CHECKING

from PIL import Image

from style_transfer_visualizer_tpu.constants import (
    COLOR_GREY,
    COLOR_WHITE,
    RESOLUTION_FULL_HD,
)
from style_transfer_visualizer_tpu.image_grid.core import (
    DEFAULT_HEIGHT,
    DEFAULT_PAD,
    RGB,
    FrameParams,
    to_rgb,
)
from style_transfer_visualizer_tpu.image_grid.layouts import (
    make_gallery_comparison,
    make_horizontal_grid,
)

if TYPE_CHECKING:
    from style_transfer_visualizer_tpu.type_defs import LayoutName


def default_comparison_name(
    content_path: Path,
    style_path: Path,
    out_dir: Path,
) -> Path:
    """Deterministic comparison filename from the input stems."""

    def safe_stem(p: Path) -> str:
        return p.stem.replace(" ", "_")

    return out_dir / (
        f"comparison_{safe_stem(content_path)}_x_{safe_stem(style_path)}.png"
    )


def save_comparison_grid(
    content_path: Path,
    style_path: Path,
    result_path: Path,
    out_path: Path,
    *,
    target_height: int | None = DEFAULT_HEIGHT,
    target_size: tuple[int, int] | None = None,
    pad: int = DEFAULT_PAD,
    bg_color: RGB = COLOR_WHITE,
    border_px: int = 0,
) -> Path:
    """Open the three inputs, render a flat grid, save as PNG."""
    if not isinstance(out_path, Path):
        msg = "out_path must be a pathlib.Path"
        raise TypeError(msg)
    out_path.parent.mkdir(parents=True, exist_ok=True)

    with ExitStack() as stack:
        images = [
            to_rgb(
                stack.enter_context(Image.open(p)), bg_color=bg_color,
            )
            for p in (content_path, style_path, result_path)
        ]
        grid = make_horizontal_grid(
            images,
            target_height=target_height,
            target_size=target_size,
            pad=pad,
            bg_color=bg_color,
            border_px=border_px,
        )
        grid.save(out_path, format="PNG")
    return out_path


def save_gallery_comparison(
    content_path: Path,
    style_path: Path,
    result_path: Path | None,
    out_path: Path,
    *,
    target_size: tuple[int, int] = RESOLUTION_FULL_HD,
    layout: LayoutName = "gallery-stacked-left",
    wall_color: RGB = COLOR_GREY,
    frame_tone: str = "gold",
    show_labels: bool = True,
) -> Path:
    """Open inputs, render a gallery wall, save as PNG."""
    if not isinstance(out_path, Path):
        msg = "out_path must be a pathlib.Path"
        raise TypeError(msg)
    out_path.parent.mkdir(parents=True, exist_ok=True)

    with ExitStack() as stack:
        content = stack.enter_context(Image.open(content_path))
        style = stack.enter_context(Image.open(style_path))
        result = (
            stack.enter_context(Image.open(result_path))
            if result_path
            else None
        )
        img = make_gallery_comparison(
            content=content,
            style=style,
            result=result,
            target_size=target_size,
            layout=layout,
            wall_color=wall_color,
            frame=FrameParams(
                frame_tone=frame_tone,
                label="on" if show_labels else None,
            ),
        )
        img.save(out_path, format="PNG")
    return out_path
