"""Output directory management and final artifact persistence.

Behavior contract (reference runtime/output.py:21-118): canonical
``stylized_{content}_x_{style}.png`` naming, a ``style_transfer_output``
fallback directory on OSError, deferred matplotlib import for the loss
plot. Saving goes through the NHWC device-array pipeline instead of
torchvision.
"""
from __future__ import annotations

from pathlib import Path
from typing import TYPE_CHECKING

import style_transfer_visualizer_tpu.image_io as stv_image_io
from style_transfer_visualizer_tpu.utils.logging import logger

if TYPE_CHECKING:
    from collections.abc import Callable

    import jax

    from style_transfer_visualizer_tpu.type_defs import (
        LossHistory,
        SaveOptions,
    )

_FALLBACK_DIR = "style_transfer_output"
_STYLIZED_TEMPLATE = "stylized_{content}_x_{style}.png"


def setup_output_directory(
    output_path: str,
    path_factory: Callable[[str], Path] = Path,
) -> Path:
    """Create (or fall back from) the requested output directory."""
    resolved = path_factory(output_path)
    try:
        resolved.mkdir(parents=True, exist_ok=True)
    except OSError:
        resolved = path_factory(_FALLBACK_DIR)
        resolved.mkdir(parents=True, exist_ok=True)
    return resolved


def _canonical_stem(path: Path) -> str:
    """Filesystem-safe stem: spaces become underscores."""
    return path.stem.replace(" ", "_")


def stylized_image_path_from_names(
    output_dir: Path,
    content_name: str,
    style_name: str,
) -> Path:
    """Canonical stylized output path for content/style stems."""
    return output_dir / _STYLIZED_TEMPLATE.format(
        content=content_name, style=style_name,
    )


def stylized_image_path_from_paths(
    output_dir: Path,
    content_path: Path,
    style_path: Path,
) -> Path:
    """Canonical stylized output path derived from input file paths."""
    return stylized_image_path_from_names(
        output_dir,
        _canonical_stem(content_path),
        _canonical_stem(style_path),
    )


def _ensure_writable_dir(output_dir: Path) -> Path:
    try:
        if not output_dir.exists():
            output_dir.mkdir(parents=True, exist_ok=True)
            logger.info("Created output directory: %s", output_dir)
    except OSError as exc:
        logger.error("Failed to create output directory: %s", exc)
        output_dir = Path(_FALLBACK_DIR)
        output_dir.mkdir(exist_ok=True)
        logger.info("Using fallback directory: %s", output_dir)
    return output_dir


def save_outputs(
    input_img: jax.Array,
    loss_metrics: LossHistory,
    output_dir: Path,
    elapsed: float,
    opts: SaveOptions,
) -> None:
    """Persist the final image, optional loss plot, and summary logs."""
    output_dir = _ensure_writable_dir(output_dir)

    if opts.final_name is not None:
        final_path = output_dir / opts.final_name
    else:
        final_path = stylized_image_path_from_names(
            output_dir, opts.content_name, opts.style_name,
        )
    final_img = stv_image_io.prepare_image_for_output(
        input_img, normalize=opts.normalize,
    )
    if opts.chroma_source is not None:
        from style_transfer_visualizer_tpu.ops.color import (  # noqa: PLC0415
            luminance_transfer,
        )

        final_img = luminance_transfer(final_img, opts.chroma_source)
    stv_image_io.save_array_as_image(final_img, final_path)

    if opts.video_created and opts.video_name:
        logger.info("Video saved to: %s", output_dir / opts.video_name)
    if opts.gif_created and opts.gif_name:
        gif_path = output_dir / opts.gif_name
        if gif_path.exists():
            logger.info("GIF saved to: %s", gif_path)

    if opts.plot_losses:
        from style_transfer_visualizer_tpu.visualization.metrics import (  # noqa: PLC0415
            plot_loss_curves,
        )

        plot_loss_curves(loss_metrics, output_dir)

    logger.info("Style transfer completed in %.2f seconds", elapsed)
    logger.info("Final stylized image saved to: %s", final_path)
