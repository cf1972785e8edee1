"""Total-variation regularizer on the optimized image.

An optional smoothness term the reference does not offer (its loss is
style + content only, core_model.py:297-328 in the reference): the
squared anisotropic total variation of the working image, the classic
companion regularizer for Gatys-style optimization (Mahendran &
Vedaldi 2015; Johnson et al. 2016 use the same form for feed-forward
style nets). Weighted by ``--tv-w`` and folded into the scalar
objective, so every optimizer and every execution path (whole-image,
banded, row-sharded, batched) minimizes it identically.

The term is computed in the model's working space — the normalized
tensor when ``--normalize`` is on — where per-channel ImageNet stds
rescale each channel's gradients by a near-uniform factor; weights are
therefore comparable across normalize settings but not bit-identical.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def tv_loss(x: jax.Array) -> jax.Array:
    """Mean squared anisotropic total variation of an NHWC image.

    ``mean((x[h+1] - x[h])^2) + mean((x[w+1] - x[w])^2)`` — the means
    run over each difference field's own element count, so the weight's
    meaning is resolution-independent.
    """
    dy = x[:, 1:, :, :] - x[:, :-1, :, :]
    dx = x[:, :, 1:, :] - x[:, :, :-1, :]
    return (
        jnp.mean(jnp.square(dy.astype(jnp.float32)))
        + jnp.mean(jnp.square(dx.astype(jnp.float32)))
    )
