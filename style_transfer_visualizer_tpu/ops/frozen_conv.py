"""3x3 SAME conv with a pre-flipped-kernel backward (frozen backbone).

XLA's autodiff derives the input gradient of a conv through its
transposed-convolution machinery, which on TPU v5e runs the backward
convs ~45% slower than the forward ones (profiled at 512px,
BASELINE.md). For a *frozen* feature extractor the input gradient is
itself a plain forward conv with spatially-rotated, channel-transposed
weights — and since the weights never change, that flipped copy can be
computed once and shipped alongside the originals, making the backward
pass the exact same friendly conv form as the forward (measured ~4%
off the whole fwd+bwd step).

The flipped kernels must travel as runtime arguments (inside the params
pytree), never as closure constants: baked-in weight constants bloat
the serialized HLO and explode remote compile times (BASELINE.md
backend notes).

IMPORTANT: the VJP returns zero cotangents for the weights — do NOT
differentiate through this op with respect to parameters. The
style-transfer pipeline only ever optimizes pixels (reference
optimization.py:286-327 likewise treats the VGG as frozen).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_CONV_DIMS = ("NHWC", "HWIO", "NHWC")


def flip_kernel(w: jax.Array) -> jax.Array:
    """Backward-conv kernel of an HWIO kernel: rot180 + I/O transpose."""
    return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))


def _conv(x: jax.Array, w: jax.Array, precision) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=_CONV_DIMS,
        precision=precision,
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3_frozen(
    x: jax.Array,
    w: jax.Array,
    w_flip: jax.Array,
    precision,
    bwd_precision,
) -> jax.Array:
    """``conv3x3_same(x, w)`` whose backward is ``conv(g, w_flip)``.

    ``w_flip`` must equal :func:`flip_kernel`\\ ``(w)``; both travel as
    runtime arguments. ``bwd_precision`` lets the input-gradient conv
    run at a different tier than the forward (the mixed policy keeps
    forward activations in f32 for the early blocks but tolerates
    bf16x3 gradient noise there — measured at the curve-parity chaos
    floor, BASELINE.md; pass ``None`` to inherit the backend default,
    or the same value as ``precision`` for a symmetric VJP). Weight
    cotangents are zeros (frozen backbone).
    """
    return _conv(x, w, precision)


def _frozen_fwd(x, w, w_flip, precision, bwd_precision):
    return _conv(x, w, precision), w_flip


def _frozen_bwd(precision, bwd_precision, w_flip, g):
    kh, kw, c_out, c_in = w_flip.shape
    return (
        _conv(g, w_flip, bwd_precision),
        # Frozen backbone: weight cotangents are unused and DCE'd in
        # the pixel-only gradient; zeros keep the VJP signature valid.
        jnp.zeros((kh, kw, c_in, c_out), g.dtype),
        jnp.zeros_like(w_flip),
    )


conv3x3_frozen.defvjp(_frozen_fwd, _frozen_bwd)
