"""Gram-matrix computation for style losses.

The Gram matrix of an NHWC feature map is the channel-correlation matrix
``G[c1, c2] = sum_p F[p, c1] * F[p, c2]`` over all batch*spatial positions,
clamped per element at ``GRAM_MATRIX_CLAMP_MAX`` *before* normalizing by
the total element count — order matters and matches the reference
(core_model.py:56-63).

On TPU this is a single (C, P) x (P, C) contraction that the MXU eats
whole; the NHWC layout means the reduction dimension (pixels) is already
contiguous and no transpose materializes. A fused Pallas variant lives in
``ops.pallas_gram``; a mesh-sharded spatial variant in ``parallel.tiled``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from style_transfer_visualizer_tpu.constants import GRAM_MATRIX_CLAMP_MAX


def gram_matrix(
    features: jax.Array,
    clamp_max: float = GRAM_MATRIX_CLAMP_MAX,
    *,
    precision: jax.lax.Precision | None = None,
) -> jax.Array:
    """Return the (C, C) Gram matrix of an (B, H, W, C) feature map.

    For B > 1 the batch is folded into the pixel sum, which for B == 1
    (the style-transfer case) is identical to the reference's
    channels-merged formulation; normalization divides by B*C*H*W.
    """
    b, h, w, c = features.shape
    flat = features.reshape(b * h * w, c)
    gram = jax.lax.dot_general(
        flat, flat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    gram = jnp.minimum(gram, clamp_max)
    return gram / (b * c * h * w)
