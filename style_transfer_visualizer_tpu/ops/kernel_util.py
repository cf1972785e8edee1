"""Small helpers shared by the TPU kernel modules.

Alignment arithmetic and the Mosaic precision mapping were previously
duplicated per kernel module; they live here so every new kernel reuses
one definition.
"""
from __future__ import annotations

import jax


def round_up(value: int, multiple: int) -> int:
    """Round ``value`` up to the next multiple of ``multiple``."""
    return ((value + multiple - 1) // multiple) * multiple


def mosaic_precision(
    precision: jax.lax.Precision | None,
) -> jax.lax.Precision | None:
    """Map a lax.Precision to one Mosaic's dot lowering accepts.

    Mosaic supports DEFAULT and HIGHEST but not HIGH (the 3-pass bf16
    tier); HIGH rounds up to HIGHEST inside a kernel.
    """
    if precision in (
        jax.lax.Precision.HIGH, jax.lax.Precision.HIGHEST,
    ):
        return jax.lax.Precision.HIGHEST
    return precision
