"""Matmul-precision tiers, including the mixed curve-parity policy.

The reference runs every matmul in float32 (torch CPU/CUDA default), and
the north-star gate requires loss curves within 1e-3 relative of that
trajectory. On TPU the tiers trade MXU passes for fidelity:

- ``highest``: 6-pass f32-equivalent — per-eval loss error ~2e-6,
  100-step curve deviation ~5e-4 (chaos-floor bound: even an f32-rounding
  -level 1e-7 perturbation amplifies to ~3e-4 over 100 steps).
- ``high``: 3-pass bf16 — per-eval error ~1.9e-4, which chaos-amplifies
  to 0.5-1.3e-3 over 100 steps: *marginal* against the 1e-3 gate.
- ``default``: 1-pass bf16 — gradients deviate up to 10%; speed mode.

``mixed`` is the measured sweet spot: error attribution (see
benchmarks/curve_parity_bench.py and BASELINE.md) shows the first two
VGG19 conv blocks (torchvision feature indices 0, 2, 5, 7 —
core_model.py:120-146 slices the same stack) plus the Gram contractions
dominate the ``high`` tier's per-eval error. Running just those at
HIGHEST — ~26% of the conv FLOPs and <3% of step time for the Grams —
cuts per-eval error from 1.9e-4 to ~6e-5, holding the 100-step curve
gate with ~2.5x margin while keeping ~87% of the ``high`` tier's
throughput.

A :class:`PrecisionPolicy` flows through the same ``precision=``
arguments as a plain ``jax.lax.Precision`` (it is hashable, so it works
as a jit static argument); the leaf call sites resolve it with
:func:`conv_precision` / :func:`gram_precision` just before the lax op.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import TypeAlias

import jax

#: What every ``precision=`` argument in this codebase accepts.
PrecisionLike: TypeAlias = "jax.lax.Precision | PrecisionPolicy | None"


@dataclass(frozen=True)
class PrecisionPolicy:
    """Per-role matmul precisions for the VGG19 feature pipeline.

    ``conv_overrides`` maps torchvision layer indices to a precision
    that replaces ``conv_base`` for that conv only; ``gram`` applies to
    every Gram contraction (style-target and loss side alike).
    ``conv_bwd_overrides`` optionally gives the *backward* (input-
    gradient) convs their own override table: ``None`` mirrors the
    forward, ``()`` runs every backward conv at ``conv_base``. Frozen
    with tuple fields so instances hash — they ride through jit static
    arguments unchanged.
    """

    conv_base: jax.lax.Precision | None
    conv_overrides: tuple[tuple[int, jax.lax.Precision], ...] = ()
    gram: jax.lax.Precision | None = None
    conv_bwd_overrides: (
        tuple[tuple[int, jax.lax.Precision], ...] | None
    ) = None
    gram_bwd: jax.lax.Precision | None = None

    def conv(self, layer_idx: int) -> jax.lax.Precision | None:
        """Precision for the conv at torchvision index ``layer_idx``."""
        for idx, prec in self.conv_overrides:
            if idx == layer_idx:
                return prec
        return self.conv_base

    def gram_bwd_or_mirror(self) -> jax.lax.Precision | None:
        """Backward precision for Gram contractions (mirrors ``gram``
        when unset)."""
        if self.gram_bwd is not None:
            return self.gram_bwd
        return self.gram if self.gram is not None else self.conv_base

    def conv_bwd(self, layer_idx: int) -> jax.lax.Precision | None:
        """Precision for layer ``layer_idx``'s backward (input-grad) conv."""
        if self.conv_bwd_overrides is None:
            return self.conv(layer_idx)
        for idx, prec in self.conv_bwd_overrides:
            if idx == layer_idx:
                return prec
        return self.conv_base


def conv_precision(
    precision: object, layer_idx: int,
) -> jax.lax.Precision | None:
    """Precision for the conv at ``layer_idx`` under a policy or tier."""
    if isinstance(precision, PrecisionPolicy):
        return precision.conv(layer_idx)
    return precision


def conv_bwd_precision(
    precision: object, layer_idx: int,
) -> jax.lax.Precision | None:
    """Precision for the backward conv at ``layer_idx``."""
    if isinstance(precision, PrecisionPolicy):
        return precision.conv_bwd(layer_idx)
    return precision


def gram_bwd_precision(precision: object) -> jax.lax.Precision | None:
    """Precision for the backward of a Gram contraction."""
    if isinstance(precision, PrecisionPolicy):
        return precision.gram_bwd_or_mirror()
    return precision


def gram_precision(precision: object) -> jax.lax.Precision | None:
    """Precision for Gram contractions under a policy or tier."""
    if isinstance(precision, PrecisionPolicy):
        return precision.gram if precision.gram is not None \
            else precision.conv_base
    return precision


#: The pipeline-default parity tier (see module docstring for the
#: measured rationale). Indices 0/2/5/7 are conv1_1, conv1_2, conv2_1,
#: conv2_2 in torchvision's vgg19.features numbering — the first two
#: blocks land on the same flat indices in every VGG-family config
#: (vgg16 included), so the policy applies unchanged across backbones.
MIXED = PrecisionPolicy(
    conv_base=jax.lax.Precision.HIGH,
    conv_overrides=(
        (0, jax.lax.Precision.HIGHEST),
        (2, jax.lax.Precision.HIGHEST),
        (5, jax.lax.Precision.HIGHEST),
        (7, jax.lax.Precision.HIGHEST),
    ),
    gram=jax.lax.Precision.HIGHEST,
    # Backward convs and the Gram backward all run bf16x3: with the
    # forward activations in f32 the gradient noise this injects
    # leaves the 100-step curve at the chaos floor (4.57e-4 measured
    # vs 4.47e-4 fully symmetric) while returning the backward f32
    # premium (43.7 -> 49.3 steps/s @512px from the convs alone).
    conv_bwd_overrides=(),
    gram_bwd=jax.lax.Precision.HIGH,
)
