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
    """Compile frameops.c into the cache directory (idempotent).

    The compile targets a unique temp path and is renamed into place
    atomically, so concurrent processes never load a half-written .so.
    No -march=native: caches can be shared between heterogeneous hosts
    (NFS homes, baked container images) where host-specific ISA
    extensions would SIGILL.
    """
    if _SO_PATH.exists() and not force:
        src_mtime = _SOURCE.stat().st_mtime
        if _SO_PATH.stat().st_mtime >= src_mtime:
            return _SO_PATH
    cc = _compiler()
    if cc is None:
        msg = "No C compiler found for native frameops"
        raise NativeBuildError(msg)
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    tmp = _SO_PATH.with_suffix(f".{os.getpid()}.tmp.so")
    cmd = [
        cc, "-O3", "-shared", "-fPIC",
        str(_SOURCE), "-o", str(tmp),
    ]
    result = subprocess.run(cmd, capture_output=True, text=True, check=False)
    if result.returncode != 0:
        tmp.unlink(missing_ok=True)
        msg = f"frameops build failed: {result.stderr[-500:]}"
        raise NativeBuildError(msg)
    tmp.replace(_SO_PATH)
    return _SO_PATH


def _typed(lib: ctypes.CDLL) -> ctypes.CDLL:
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


def load_library() -> ctypes.CDLL:
    """Build if needed and load the shared object with typed signatures.

    A corrupt cached .so (interrupted build from an older version, wrong
    architecture) gets one forced rebuild; persistent failures raise
    NativeBuildError (an ImportError) so callers fall back to numpy.
    """
    try:
        return _typed(ctypes.CDLL(str(build_library())))
    except OSError:
        try:
            return _typed(ctypes.CDLL(str(build_library(force=True))))
        except OSError as exc:
            msg = f"frameops load failed: {exc}"
            raise NativeBuildError(msg) from exc
