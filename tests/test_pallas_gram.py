"""Pallas fused Gram kernel vs the XLA formulation (interpreter mode)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_visualizer_tpu.ops.gram import gram_matrix
from style_transfer_visualizer_tpu.ops.pallas_gram import (
    gram_matrix_pallas,
)

HIGH = jax.lax.Precision.HIGHEST


@pytest.mark.parametrize(
    ("shape"),
    [
        (1, 16, 16, 64),     # C below lane width -> channel padding
        (1, 20, 30, 128),    # pixel count not a tile multiple
        (1, 48, 48, 256),    # multi-tile accumulation
    ],
)
def test_forward_matches_xla(shape) -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ours = gram_matrix_pallas(x, interpret=True)
    ref = gram_matrix(x, precision=HIGH)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-6,
    )


def test_clamp_applied() -> None:
    x = jnp.full((1, 32, 32, 64), 50.0)
    ours = gram_matrix_pallas(x, interpret=True)
    ref = gram_matrix(x)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=1e-6,
    )
    # raw = 50*50*1024 = 2.56e6 > 5e5 -> clamp engaged
    np.testing.assert_allclose(
        np.asarray(ours), 5e5 / (64 * 1024), rtol=1e-6,
    )


def test_gradient_matches_xla() -> None:
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.normal(size=(1, 12, 12, 64)).astype(np.float32) * 3,
    )
    target = jnp.asarray(
        rng.normal(size=(64, 64)).astype(np.float32),
    )

    def loss_pallas(x):
        return jnp.mean(
            jnp.square(gram_matrix_pallas(x, interpret=True) - target),
        )

    def loss_xla(x):
        return jnp.mean(
            jnp.square(gram_matrix(x, precision=HIGH) - target),
        )

    g_pallas = jax.grad(loss_pallas)(x)
    g_xla = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-4, atol=1e-7,
    )


def test_gradient_with_clamp_engaged() -> None:
    """Clamped entries must receive zero gradient through the clamp."""
    rng = np.random.default_rng(2)
    base = rng.normal(size=(1, 32, 32, 64)).astype(np.float32)
    base[..., 0] = 40.0  # channel 0 autocorrelation will exceed 5e5

    x = jnp.asarray(base)

    def loss_pallas(x):
        return jnp.sum(gram_matrix_pallas(x, interpret=True))

    def loss_xla(x):
        return jnp.sum(gram_matrix(x, precision=HIGH))

    g_pallas = jax.grad(loss_pallas)(x)
    g_xla = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-4, atol=1e-6,
    )


def test_custom_norm() -> None:
    x = jnp.ones((1, 8, 8, 64), jnp.float32)
    out = gram_matrix_pallas(x, 5e5, 1000, True)
    np.testing.assert_allclose(np.asarray(out)[0, 0], 64 / 1000, rtol=1e-6)
