"""Fused Pallas TPU kernel for the Gram matrix.

Computes ``G = clamp(F^T F, max) / n`` for a flattened (P, C) feature
block in one VMEM-resident pass: pixel tiles stream HBM->VMEM through the
Pallas grid pipeline (hardware double buffering), partial C x C products
accumulate on the MXU in a float32 VMEM scratch, and the clamp + scale
run on the final grid step without materializing the raw Gram in HBM.

A ``jax.custom_vjp`` supplies the backward pass: with
``S = (M . dG + (M . dG)^T) / n`` (M the clamp pass-through mask),
``dF = F S`` — one more MXU matmul, reusing the saved raw Gram so no
recomputation of the forward reduction is needed.

Shapes are padded to TPU tile boundaries (lane = 128, sublane = 8);
zero-padding is mathematically inert for a Gram accumulation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from style_transfer_visualizer_tpu.constants import GRAM_MATRIX_CLAMP_MAX
from style_transfer_visualizer_tpu.ops.kernel_util import (
    mosaic_precision,
    round_up,
)

_LANE = 128
_SUBLANE = 8
# Pixel-tile rows streamed per grid step; 512 rows x 512 channels f32 is
# 1 MB of VMEM per buffer, well inside the ~16 MB budget with double
# buffering plus the C x C accumulator.
_TILE_P = 512


def _gram_accumulate_kernel(
    f_ref,
    raw_ref,
    acc_ref,
    *,
    num_tiles: int,
    precision,
) -> None:
    """Grid step: acc += tile^T tile; emit raw Gram on the last step."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init() -> None:
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tile = f_ref[:]
    acc_ref[:] += jax.lax.dot_general(
        tile,
        tile,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    @pl.when(step == num_tiles - 1)
    def _emit() -> None:
        raw_ref[:] = acc_ref[:]


def _raw_gram(
    features: jax.Array, interpret: bool, precision,
) -> jax.Array:
    """Unclamped, unnormalized C x C Gram of a (P, C) block via Pallas."""
    p, c = features.shape
    c_pad = round_up(c, _LANE)
    p_pad = round_up(max(p, _SUBLANE), _TILE_P)
    if (p_pad, c_pad) != (p, c):
        features = jnp.pad(
            features, ((0, p_pad - p), (0, c_pad - c)),
        )
    num_tiles = p_pad // _TILE_P

    raw = pl.pallas_call(
        partial(
            _gram_accumulate_kernel,
            num_tiles=num_tiles,
            precision=mosaic_precision(precision),
        ),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (_TILE_P, c_pad),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (c_pad, c_pad),
            lambda i: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c_pad, c_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c_pad, c_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * p_pad * c_pad * c_pad,
            bytes_accessed=p_pad * c_pad * 4 + c_pad * c_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(features)
    return raw[:c, :c]


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def gram_matrix_pallas(
    features: jax.Array,
    clamp_max: float = GRAM_MATRIX_CLAMP_MAX,
    n_norm: int | None = None,
    interpret: bool = False,
    precision: jax.lax.Precision | None = None,
    bwd_precision: jax.lax.Precision | None = None,
) -> jax.Array:
    """Gram matrix of (B, H, W, C) features via the fused TPU kernel.

    Semantics match ``ops.gram.gram_matrix``: per-element clamp at
    ``clamp_max`` before dividing by ``n_norm`` (defaults to B*C*H*W).
    ``interpret=True`` runs the kernel in the Pallas interpreter for
    CPU-backend testing. ``precision`` applies to the forward MXU
    accumulation (via ``mosaic_precision``); ``bwd_precision`` to the
    VJP's matmul (defaults to ``precision``, mirroring
    ``ops.gram.gram_matrix``'s asymmetric-backward support).
    """
    out, _ = _gram_fwd(
        features, clamp_max, n_norm, interpret, precision, bwd_precision,
    )
    return out


def _norm_of(features: jax.Array, n_norm: int | None) -> float:
    if n_norm is not None:
        return float(n_norm)
    b, h, w, c = features.shape
    return float(b * h * w * c)


def _gram_fwd(
    features: jax.Array,
    clamp_max: float,
    n_norm: int | None,
    interpret: bool,
    precision: jax.lax.Precision | None = None,
    bwd_precision: jax.lax.Precision | None = None,
):
    b, h, w, c = features.shape
    flat = features.reshape(b * h * w, c)
    raw = _raw_gram(flat, interpret, precision)
    norm = _norm_of(features, n_norm)
    out = jnp.minimum(raw, clamp_max) / norm
    return out, (flat, raw, features.shape)


def _gram_bwd(
    clamp_max, n_norm, interpret, precision, bwd_precision, residuals, g,
):
    flat, raw, shape = residuals
    norm = jnp.asarray(
        n_norm
        if n_norm is not None
        else shape[0] * shape[1] * shape[2] * shape[3],
        jnp.float32,
    )
    mask = (raw <= clamp_max).astype(g.dtype)
    scaled = mask * g / norm
    sym = scaled + scaled.T
    # dF = F S: (P, C) x (C, C) — a single MXU matmul XLA handles at
    # speed of light; no benefit to hand-writing it.
    dflat = jax.lax.dot_general(
        flat,
        sym,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision if bwd_precision is None else bwd_precision,
    )
    return (dflat.reshape(shape),)


gram_matrix_pallas.defvjp(_gram_fwd, _gram_bwd)
