"""Python bindings for the native frame operations.

Importing this module raises ImportError when the native library cannot
be built, which callers (media.segments) treat as "use the numpy path".
"""
from __future__ import annotations

import numpy as np

from style_transfer_visualizer_tpu.native.loader import load_library

_lib = load_library()


def blend_u8(
    frame_a: np.ndarray,
    frame_b: np.ndarray,
    alpha: float,
) -> np.ndarray:
    """Fused single-pass uint8 blend: a*(1-alpha) + b*alpha, rounded."""
    a = np.ascontiguousarray(frame_a, dtype=np.uint8)
    b = np.ascontiguousarray(frame_b, dtype=np.uint8)
    if a.shape != b.shape:
        msg = "Frames must share shape for blending"
        raise ValueError(msg)
    out = np.empty_like(a)
    _lib.blend_u8(
        a.ctypes.data, b.ctypes.data, out.ctypes.data,
        a.size, float(alpha),
    )
    return out


def pack_f32_to_u8(frame: np.ndarray) -> np.ndarray:
    """Clamp-and-round float32 [0,1] pixels to uint8 in one pass."""
    src = np.ascontiguousarray(frame, dtype=np.float32)
    out = np.empty(src.shape, dtype=np.uint8)
    _lib.pack_f32_to_u8(src.ctypes.data, out.ctypes.data, src.size)
    return out
