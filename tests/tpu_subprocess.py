"""Shared runner for real-TPU subprocess parity tests.

The main suite pins JAX to the CPU backend (conftest), so real-TPU
kernel tests spawn a subprocess with a clean environment. On this class
of rig the remote compile service's latency varies wildly (20 s to
~10 min for the same graph — BASELINE.md backend notes), so the runner
enables the persistent compilation cache (later runs are fast) and a
timeout is treated as environmental — skip, not fail.
"""
from __future__ import annotations

import os
import subprocess
import sys

import pytest

# Runs after the snippet's backend probe: warm the persistent compile
# cache so a slow first remote compile only ever hurts once per graph.
_CACHE_PRELUDE = (
    "from style_transfer_visualizer_tpu.utils.cache import "
    "enable_persistent_compilation_cache\n"
    "enable_persistent_compilation_cache()\n"
)


def run_tpu_snippet(
    snippet: str,
    ok_marker: str,
    timeout: float = 540.0,
) -> None:
    """Run ``snippet`` on the real TPU backend; assert ``ok_marker``.

    The snippet must start with a backend probe ending in a
    ``sys.exit(42)`` line (printed ``NO_TPU``) — exit 42 becomes a skip,
    as does a timeout (remote-compile latency under contention, not a
    correctness signal). The cache prelude is inserted right after the
    probe so compiles in the body hit the persistent cache.
    """
    lines = snippet.strip().splitlines()
    probe_end = next(
        i for i, line in enumerate(lines)
        if line.strip().startswith("sys.exit(42)")
    )
    full = "\n".join(
        [*lines[: probe_end + 1], _CACHE_PRELUDE, *lines[probe_end + 1:]],
    )
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    try:
        result = subprocess.run(
            [sys.executable, "-c", full],
            env=env,
            capture_output=True,
            text=True,
            timeout=timeout,
            check=False,
        )
    except subprocess.TimeoutExpired:
        pytest.skip(
            f"TPU subprocess exceeded {timeout:.0f}s — remote compile "
            "latency (known to reach ~10 min under contention); rerun "
            "standalone to exercise the kernel with a warm cache.",
        )
    if result.returncode == 42:
        pytest.skip("No TPU backend available")
    assert result.returncode == 0, result.stderr[-2000:]
    assert ok_marker in result.stdout
