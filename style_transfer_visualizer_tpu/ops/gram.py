"""Gram-matrix computation for style losses.

The Gram matrix of an NHWC feature map is the channel-correlation matrix
``G[c1, c2] = sum_p F[p, c1] * F[p, c2]`` over all batch*spatial positions,
clamped per element at ``GRAM_MATRIX_CLAMP_MAX`` *before* normalizing by
the total element count — order matters and matches the reference
(core_model.py:56-63).

On TPU this is a single (C, P) x (P, C) contraction that the MXU eats
whole; the NHWC layout means the reduction dimension (pixels) is already
contiguous and no transpose materializes. A fused Pallas variant lives in
``ops.pallas_gram``; a mesh-sharded spatial variant in
``parallel.spatial``. ``gram_apply`` dispatches between the XLA and
Pallas implementations by backend name ("auto" resolves per platform via
``resolve_gram_backend``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from functools import partial

from style_transfer_visualizer_tpu.constants import GRAM_MATRIX_CLAMP_MAX
from style_transfer_visualizer_tpu.ops.precision import (
    PrecisionLike,
    gram_bwd_precision,
    gram_precision,
)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _gram_core(
    flat: jax.Array,
    clamp_max: float,
    precision,
    bwd_precision,
) -> jax.Array:
    """clamp(flat^T flat, max) / flat.size for a (P, C) block.

    The custom VJP reproduces autodiff exactly — with ``S = (M . dG +
    (M . dG)^T) / n`` (M the clamp pass-through mask), ``dF = F S`` —
    but lets the backward matmul run at its own precision
    (``PrecisionPolicy.gram_bwd``): gradient-side rounding sits below
    the trajectory chaos floor while forward Gram fidelity is
    loss-visible (BASELINE.md error attribution).
    """
    out, _ = _gram_core_fwd(flat, clamp_max, precision, bwd_precision)
    return out


def _raw_dot(flat: jax.Array, precision) -> jax.Array:
    return jax.lax.dot_general(
        flat, flat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )


def _gram_core_fwd(flat, clamp_max, precision, bwd_precision):
    raw = _raw_dot(flat, precision)
    out = jnp.minimum(raw, clamp_max) / flat.size
    return out, (flat, raw)


def _gram_core_bwd(clamp_max, precision, bwd_precision, residuals, g):
    flat, raw = residuals
    mask = (raw <= clamp_max).astype(g.dtype)
    scaled = mask * g / flat.size
    sym = scaled + scaled.T
    dflat = jax.lax.dot_general(
        flat, sym,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=bwd_precision,
        preferred_element_type=jnp.float32,
    )
    return (dflat,)


_gram_core.defvjp(_gram_core_fwd, _gram_core_bwd)


def gram_matrix(
    features: jax.Array,
    clamp_max: float = GRAM_MATRIX_CLAMP_MAX,
    *,
    precision: jax.lax.Precision | None = None,
    bwd_precision: jax.lax.Precision | None = None,
) -> jax.Array:
    """Return the (C, C) Gram matrix of an (B, H, W, C) feature map.

    For B > 1 the batch is folded into the pixel sum, which for B == 1
    (the style-transfer case) is identical to the reference's
    channels-merged formulation; normalization divides by B*C*H*W.
    ``bwd_precision`` applies to the VJP's matmul only (defaults to the
    backend default; pass ``precision`` for a symmetric op).
    """
    b, h, w, c = features.shape
    flat = features.reshape(b * h * w, c)
    return _gram_core(flat, clamp_max, precision, bwd_precision)


def resolve_gram_backend(name: str) -> str:
    """Resolve a configured backend name to a concrete one.

    "auto" resolves to XLA on every platform — a measured verdict, not a
    guess: end-to-end on TPU v5e the Pallas kernel loses 15-20% (512px
    "high": 40.1 vs 33.3 steps/s; 1080p: 4.78 vs 3.81 — see
    benchmarks/gram_backend_bench.py and BASELINE.md) because the
    ``pallas_call`` is a fusion barrier five times per step, while XLA
    fuses the Gram contraction's pre/post elementwise work and applies
    the precision tier to its matmuls. The kernel stays production-
    reachable via ``--gram-backend pallas`` (native Mosaic on TPU,
    interpreter on CPU for CI parity tests).
    """
    if name == "auto":
        return "xla"
    if name in ("xla", "pallas"):
        return name
    msg = f"Unknown gram backend: {name!r}"
    raise ValueError(msg)


def gram_apply(
    features: jax.Array,
    *,
    backend: str = "xla",
    precision: PrecisionLike = None,
) -> jax.Array:
    """Gram matrix via the selected kernel (same semantics either way).

    ``backend`` must already be concrete ("xla" or "pallas" — resolve
    "auto" once at setup with ``resolve_gram_backend`` so the choice is
    a stable static argument under jit). A ``PrecisionPolicy`` resolves
    to its Gram-contraction precision here.
    """
    bwd = gram_bwd_precision(precision)
    precision = gram_precision(precision)
    if backend == "pallas":
        from style_transfer_visualizer_tpu.ops.pallas_gram import (  # noqa: PLC0415
            gram_matrix_pallas,
        )

        return gram_matrix_pallas(
            features, GRAM_MATRIX_CLAMP_MAX, None, not _running_on_tpu(),
            precision, bwd,
        )
    return gram_matrix(
        features, precision=precision, bwd_precision=bwd,
    )


def _running_on_tpu() -> bool:
    """True when traced computations will execute on a TPU.

    ``jax.default_device`` (how the pipeline pins ``--device cpu`` on a
    TPU host) takes precedence over the process default backend.
    """
    default_device = jax.config.jax_default_device
    if default_device is not None:
        return default_device.platform == "tpu"
    return jax.default_backend() == "tpu"
