"""Device discovery and deterministic seeding for the JAX runtime.

Mirrors the reference contract (runtime/device.py:12-42): a requested
accelerator falls back to CPU with a logged warning, and seeding covers
every RNG the pipeline consumes. In JAX randomness is explicit — the seed
becomes a root PRNG key that callers split per consumer.
"""
from __future__ import annotations

import random

import jax

from style_transfer_visualizer_tpu.utils.logging import logger

# Aliases accepted for the TPU platform so reference configs written with
# device = "cuda" keep working (they fall back with a warning if no
# accelerator is present).
_PLATFORM_ALIASES = {
    "cuda": "gpu",
    "gpu": "gpu",
    "tpu": "tpu",
    "cpu": "cpu",
}


def setup_device(device_name: str) -> jax.Device:
    """Return the JAX device to run on, falling back to CPU if needed.

    .. warning:: ``device_name='cpu'`` pins ``jax_platforms='cpu'``
       **process-wide** (before first backend use) so CPU-only runs skip
       remote-accelerator plugin startup. A later call in the same
       process requesting ``'tpu'`` will then fall back to CPU — the
       accelerator backend was never initialized. Library callers that
       need to mix devices in one process should manage
       ``jax.default_device`` themselves instead of calling this with
       ``'cpu'`` first; the CLI entry points run one device per process.
    """
    platform = _PLATFORM_ALIASES.get(device_name.lower())
    if platform is None:
        msg = f"Unknown device: {device_name!r}"
        raise ValueError(msg)

    if platform == "cpu":
        # Pin the platform BEFORE the first backend use: otherwise
        # jax.devices() initializes every plugin, and remote-attached
        # accelerators (the axon tunnel) can block startup for minutes
        # on a run that never touches them. No-op/harmless if backends
        # are already up (e.g. under the test suite's global pin).
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:  # pragma: no cover - backend-state dependent
            pass

    if platform != "cpu":
        try:
            device = jax.devices(platform)[0]
            logger.info("Using device: %s", device)
            return device
        except RuntimeError:
            logger.warning(
                "%s requested but not available. Falling back to CPU.",
                device_name.upper(),
            )

    device = jax.devices("cpu")[0]
    logger.info("Using device: %s", device)
    return device


def setup_random_seed(seed: int) -> jax.Array:
    """Seed host-side RNGs and return the root JAX PRNG key.

    Python's ``random`` is seeded for host-side consumers (e.g. temp-file
    naming); all device-side randomness flows from the returned key.
    """
    random.seed(seed)
    return jax.random.key(seed)
