"""Real-TPU execution of the fused Pallas conv+bias+ReLU kernel.

Runs as a native Mosaic program on the actual TPU in a subprocess (the
main suite pins JAX to CPU); checks forward and image-gradient parity
against the XLA conv. Skipped when no TPU backend comes up.
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
from style_transfer_visualizer_tpu.ops.pallas_conv import (
    conv3x3_bias_relu, hwio_to_stencil,
)

HIGH = jax.lax.Precision.HIGHEST
rng = np.random.default_rng(0)
h, w, ci, co = 96, 100, 128, 256   # unaligned width, multi-lane channels
x = jnp.asarray(rng.normal(size=(1, h, w, ci)).astype(np.float32))
wt = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.05)
b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
w9 = hwio_to_stencil(wt)

ref_f = jax.jit(lambda x: jnp.maximum(jax.lax.conv_general_dilated(
    x, wt, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    precision=HIGH) + b, 0.0))
ours_f = jax.jit(lambda x: conv3x3_bias_relu(x, w9, b, True, False, HIGH))
np.testing.assert_allclose(
    np.asarray(ours_f(x)), np.asarray(ref_f(x)), rtol=1e-4, atol=1e-5,
)

g_ours = jax.jit(jax.grad(lambda x: jnp.sum(jnp.sin(
    conv3x3_bias_relu(x, w9, b, True, False, HIGH)))))(x)
g_ref = jax.jit(jax.grad(lambda x: jnp.sum(jnp.sin(ref_f(x)))))(x)
np.testing.assert_allclose(
    np.asarray(g_ours), np.asarray(g_ref), rtol=1e-3, atol=1e-5,
)
print("TPU_CONV_PARITY_OK")
"""


@pytest.mark.tpu
@pytest.mark.slow
def test_pallas_conv_parity_on_real_tpu() -> None:
    run_tpu_snippet(_SNIPPET, "TPU_CONV_PARITY_OK")
