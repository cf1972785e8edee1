"""Frame blending and transition segments (fades and crossfades).

Blends are pure ``a*(1-alpha) + b*alpha`` math on uint8 frames. The
native extension (``native/frameops``) accelerates the inner loop when
built; the numpy path is the portable fallback. Transition budgets
(fade seconds, crossfade caps) match the reference (video.py:71-96).
"""
from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from style_transfer_visualizer_tpu.media.sinks import VideoFrameSink

INTRO_FADE_IN_SECONDS = 1.0
INTRO_CROSSFADE_SECONDS = 0.5
INTRO_MAX_FADE_FRAMES = 48
INTRO_MAX_CROSSFADE_FRAMES = 12
INTRO_MIN_DIM = 128
OUTRO_CROSSFADE_SECONDS = 0.5
OUTRO_MAX_CROSSFADE_FRAMES = 12
OUTRO_MIN_DIM = 512
FINAL_COMPARISON_MIN_FRAMES = 1
FINAL_TIMELAPSE_HOLD_SECONDS = 1.0
FINAL_TIMELAPSE_MIN_FRAMES = 1


def blend_frames(
    frame_a: np.ndarray,
    frame_b: np.ndarray,
    alpha: float,
) -> np.ndarray:
    """Linear blend of two equally-shaped RGB frames."""
    if frame_a.shape != frame_b.shape:
        msg = "Frames must share shape for blending"
        raise ValueError(msg)
    try:
        from style_transfer_visualizer_tpu.native import (  # noqa: PLC0415
            frameops,
        )

        return frameops.blend_u8(frame_a, frame_b, float(alpha))
    except ImportError:
        mixed = (
            frame_a.astype(np.float32) * (1.0 - alpha)
            + frame_b.astype(np.float32) * alpha
        )
        return np.clip(np.rint(mixed), 0, 255).astype(np.uint8)


def append_fade_transition(
    writer: VideoFrameSink,
    start_frame: np.ndarray,
    end_frame: np.ndarray,
    frame_count: int,
) -> None:
    """Emit a linear fade from start to end over ``frame_count`` frames."""
    if frame_count <= 0:
        writer.append_data(end_frame)
        return
    for idx in range(frame_count):
        alpha = (idx + 1) / frame_count
        writer.append_data(blend_frames(start_frame, end_frame, alpha))


def append_crossfade(
    writer: VideoFrameSink,
    start_frame: np.ndarray,
    end_frame: np.ndarray,
    frame_count: int,
    *,
    max_frames: int = INTRO_MAX_CROSSFADE_FRAMES,
) -> None:
    """Emit a bounded crossfade strictly between the two endpoint frames.

    Alphas run (1..n)/(n+1) so neither endpoint frame is duplicated
    (reference video.py:260-274).
    """
    if frame_count <= 0:
        return
    limited = max(1, min(frame_count, max_frames))
    for idx in range(limited):
        alpha = (idx + 1) / (limited + 1)
        writer.append_data(blend_frames(start_frame, end_frame, alpha))
