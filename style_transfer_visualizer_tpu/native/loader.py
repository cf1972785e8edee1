"""Lazy build-and-load for the native frameops shared object.

The C source ships with the package; on first use it is compiled with
the system compiler into a per-user cache directory and loaded via
ctypes. Hosts without a compiler simply fall back to the numpy paths —
callers treat ImportError from ``native.frameops`` as "use fallback".
"""
from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
from pathlib import Path

_SOURCE = Path(__file__).parent / "frameops.c"
_CACHE_DIR = (
    Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"))
    / "style_transfer_visualizer_tpu"
)
_SO_PATH = _CACHE_DIR / "frameops.so"


class NativeBuildError(ImportError):
    """Raised when the native library cannot be built or loaded."""


def _compiler() -> str | None:
    for cc in ("cc", "gcc", "clang", "g++"):
        path = shutil.which(cc)
        if path:
            return path
    return None


def build_library(force: bool = False) -> Path:
    """Compile frameops.c into the cache directory (idempotent)."""
    if _SO_PATH.exists() and not force:
        src_mtime = _SOURCE.stat().st_mtime
        if _SO_PATH.stat().st_mtime >= src_mtime:
            return _SO_PATH
    cc = _compiler()
    if cc is None:
        msg = "No C compiler found for native frameops"
        raise NativeBuildError(msg)
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        cc, "-O3", "-march=native", "-shared", "-fPIC",
        str(_SOURCE), "-o", str(_SO_PATH),
    ]
    result = subprocess.run(cmd, capture_output=True, text=True, check=False)
    if result.returncode != 0:
        msg = f"frameops build failed: {result.stderr[-500:]}"
        raise NativeBuildError(msg)
    return _SO_PATH


def load_library() -> ctypes.CDLL:
    """Build if needed and load the shared object with typed signatures."""
    lib = ctypes.CDLL(str(build_library()))
    lib.blend_u8.restype = None
    lib.blend_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_size_t, ctypes.c_float,
    ]
    lib.pack_f32_to_u8.restype = None
    lib.pack_f32_to_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
    ]
    return lib
