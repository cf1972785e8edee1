"""Comparison-image rendering requested via the main CLI.

Canvas sizes follow the content image; the result variant appends
``_final`` to the deterministic name and is skipped with a warning when
the expected stylized output is missing (reference
runtime/comparison.py:33-160).
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import TYPE_CHECKING

from PIL import Image

from style_transfer_visualizer_tpu.constants import COLOR_GREY
from style_transfer_visualizer_tpu.gallery import (
    ComparisonRenderOptions,
    render_comparison,
)
from style_transfer_visualizer_tpu.image_grid.naming import (
    default_comparison_name,
)
from style_transfer_visualizer_tpu.runtime.output import (
    stylized_image_path_from_paths,
)
from style_transfer_visualizer_tpu.utils.logging import logger

if TYPE_CHECKING:
    from style_transfer_visualizer_tpu.type_defs import LayoutName

__all__ = [
    "ComparisonRequest",
    "comparison_output_path",
    "render_comparison_image",
    "render_requested_comparisons",
]


@dataclass(slots=True)
class ComparisonRequest:
    """Which comparison artifacts the caller wants."""

    include_inputs: bool
    include_result: bool
    result_path: Path | None = None


def comparison_output_path(
    output_dir: Path | str,
    content_path: Path,
    style_path: Path,
    *,
    include_result: bool,
) -> Path:
    """Deterministic output path; ``_final`` suffix for result variants."""
    base = default_comparison_name(
        content_path, style_path, Path(output_dir),
    )
    if include_result:
        return base.parent / f"{base.stem}_final{base.suffix}"
    return base


def render_comparison_image(
    content_path: Path,
    style_path: Path,
    *,
    output_dir: Path | str,
    include_result: bool,
    result_path: Path | None = None,
) -> Path:
    """Render one gallery comparison sized to the content image."""
    content_path = Path(content_path)
    style_path = Path(style_path)
    result_path = (
        Path(result_path) if include_result and result_path else None
    )

    with Image.open(content_path) as content_im:
        target_size = content_im.size

    layout: LayoutName = (
        "gallery-stacked-left" if include_result else "gallery-two-across"
    )
    out_path = comparison_output_path(
        output_dir, content_path, style_path,
        include_result=include_result,
    )

    return render_comparison(
        ComparisonRenderOptions(
            content_path=content_path,
            style_path=style_path,
            result_path=result_path,
            out_path=out_path,
            target_size=target_size,
            layout=layout,
            wall_color=COLOR_GREY,
            frame_style="gold",
            show_labels=True,
        ),
    )


def render_requested_comparisons(
    *,
    content_path: Path,
    style_path: Path,
    output_dir: Path | str,
    request: ComparisonRequest,
) -> list[Path]:
    """Render the requested comparisons; skip a missing stylized result."""
    output_dir = Path(output_dir)
    saved: list[Path] = []

    if request.include_inputs:
        saved.append(
            render_comparison_image(
                content_path=content_path,
                style_path=style_path,
                output_dir=output_dir,
                include_result=False,
            ),
        )

    if request.include_result:
        expected = (
            request.result_path
            if request.result_path is not None
            else stylized_image_path_from_paths(
                output_dir, content_path, style_path,
            )
        )
        if not expected.exists():
            logger.warning(
                "Expected stylized result missing: %s. "
                "Skipping content+style+result comparison.",
                expected,
            )
        else:
            saved.append(
                render_comparison_image(
                    content_path=content_path,
                    style_path=style_path,
                    output_dir=output_dir,
                    include_result=True,
                    result_path=expected,
                ),
            )

    return saved
