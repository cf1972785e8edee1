"""Persistent XLA compilation-cache setup.

The full VGG19 forward+backward graph takes minutes to compile on some
TPU backends; caching compiled executables on disk makes every run after
the first start in seconds. Enabled by the orchestrator and the bench
harness; opt out with STV_NO_XLA_CACHE=1.
"""
from __future__ import annotations

import os
from pathlib import Path

import jax

_DEFAULT_CACHE = (
    Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"))
    / "style_transfer_visualizer_tpu"
    / "xla_cache"
)
_enabled = False


def enable_persistent_compilation_cache(
    path: str | Path | None = None,
) -> None:
    """Point JAX's persistent compilation cache at a durable directory."""
    global _enabled
    if _enabled or os.environ.get("STV_NO_XLA_CACHE"):
        return
    cache_dir = Path(path) if path else _DEFAULT_CACHE
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
