"""Input validation helpers (contract: reference runtime/validation.py)."""
from __future__ import annotations

from pathlib import Path

from style_transfer_visualizer_tpu.constants import (
    VIDEO_QUALITY_MAX,
    VIDEO_QUALITY_MIN,
)


def validate_input_paths(content_path: str, style_path: str) -> None:
    """Ensure both input paths point at existing files."""
    if not Path(content_path).is_file():
        msg = f"Content image not found: {content_path}"
        raise FileNotFoundError(msg)
    if not Path(style_path).is_file():
        msg = f"Style image not found: {style_path}"
        raise FileNotFoundError(msg)


def validate_parameters(video_quality: int) -> None:
    """Range-check runtime parameters not covered by the config schema."""
    if not VIDEO_QUALITY_MIN <= video_quality <= VIDEO_QUALITY_MAX:
        msg = (
            f"Video quality must be between {VIDEO_QUALITY_MIN} and "
            f"{VIDEO_QUALITY_MAX}, got {video_quality}"
        )
        raise ValueError(msg)
