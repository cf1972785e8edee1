"""Real-TPU execution of the fused Pallas Gram kernel.

The main suite pins JAX to the CPU backend (conftest), so these tests
spawn a subprocess with a clean environment and run the kernel as a
native Mosaic program on the actual TPU, checking parity against the
XLA contraction — forward, clamp, and gradient. Skipped when no TPU
backend comes up (e.g. plain CI hosts).
"""
from __future__ import annotations

import pytest

from tests.tpu_subprocess import run_tpu_snippet

_SNIPPET = r"""
import jax, sys
if jax.default_backend() != "tpu":
    print("NO_TPU")
    sys.exit(42)
import jax.numpy as jnp
import numpy as np
from style_transfer_visualizer_tpu.ops.gram import gram_matrix
from style_transfer_visualizer_tpu.ops.pallas_gram import gram_matrix_pallas

HIGH = jax.lax.Precision.HIGHEST
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(1, 48, 48, 256)).astype(np.float32) * 2)
ours = np.asarray(jax.jit(gram_matrix_pallas, static_argnums=(1, 2, 3))(x, 5e5, None, False))
ref = np.asarray(jax.jit(lambda f: gram_matrix(f, precision=HIGH))(x))
np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

target = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
def loss_p(f):
    return jnp.mean(jnp.square(gram_matrix_pallas(f, 5e5, None, False) - target))
def loss_x(f):
    return jnp.mean(jnp.square(gram_matrix(f, precision=HIGH) - target))
gp = np.asarray(jax.jit(jax.grad(loss_p))(x))
gx = np.asarray(jax.jit(jax.grad(loss_x))(x))
np.testing.assert_allclose(gp, gx, rtol=1e-3, atol=1e-6)
print("TPU_PARITY_OK")
"""


@pytest.mark.tpu
@pytest.mark.slow
def test_pallas_gram_parity_on_real_tpu() -> None:
    run_tpu_snippet(_SNIPPET, "TPU_PARITY_OK")
