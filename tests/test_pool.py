"""ops.pool: reshape-based maxpool must bit-match select_and_scatter.

The production feature stack (models/features.py) pools with
``ops.pool.maxpool_2x2``; these tests pin its forward and backward to
the reference semantics — ``lax.reduce_window`` forward and
``select_and_scatter`` gradient routing (first maximal element per
window, row-major) — including engineered ties, odd dimensions, and
vmap batching.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from style_transfer_visualizer_tpu.ops.pool import maxpool_2x2, relu


def _reference_pool(x):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def _tied_input(key, shape):
    x = jax.random.normal(key, shape)
    # Post-ReLU-like zero plateaus (every element of many windows ties)
    # plus exact duplicated values inside a window.
    x = x.at[:, : shape[1] // 2, : shape[2] // 2, :].set(0.0)
    if shape[1] >= 2 and shape[2] >= 4:
        x = x.at[:, 1, 2, :].set(x[:, 1, 3, :])
    return x


@pytest.mark.parametrize("shape", [(1, 8, 10, 3), (2, 4, 4, 5)])
def test_forward_matches_reduce_window(shape):
    x = _tied_input(jax.random.key(0), shape)
    np.testing.assert_array_equal(maxpool_2x2(x), _reference_pool(x))


@pytest.mark.parametrize("shape", [(1, 8, 10, 3), (2, 6, 4, 2)])
def test_backward_matches_select_and_scatter(shape):
    x = _tied_input(jax.random.key(1), shape)
    g = jax.random.normal(jax.random.key(2), maxpool_2x2(x).shape)
    _, vjp_new = jax.vjp(maxpool_2x2, x)
    _, vjp_ref = jax.vjp(_reference_pool, x)
    np.testing.assert_array_equal(vjp_new(g)[0], vjp_ref(g)[0])


def test_odd_dims_floor_semantics():
    x = jax.random.normal(jax.random.key(3), (1, 9, 11, 3))
    np.testing.assert_array_equal(maxpool_2x2(x), _reference_pool(x))
    g = jnp.ones((1, 4, 5, 3))
    _, vjp_new = jax.vjp(maxpool_2x2, x)
    _, vjp_ref = jax.vjp(_reference_pool, x)
    gn, gr = vjp_new(g)[0], vjp_ref(g)[0]
    np.testing.assert_array_equal(gn, gr)
    # Cropped row/column receives zero gradient.
    assert float(jnp.abs(gn[:, 8, :, :]).max()) == 0.0
    assert float(jnp.abs(gn[:, :, 10, :]).max()) == 0.0


def test_vmap_batching():
    xb = jax.random.normal(jax.random.key(4), (5, 1, 8, 8, 3))
    np.testing.assert_array_equal(
        jax.vmap(maxpool_2x2)(xb), jax.vmap(_reference_pool)(xb),
    )
    grads = jax.vmap(
        jax.grad(lambda x: jnp.sum(maxpool_2x2(x) ** 2)),
    )(xb)
    assert grads.shape == xb.shape


def test_gradient_routes_to_first_max_like_torch():
    """All-tie window: gradient goes wholly to the row-major-first cell."""
    x = jnp.zeros((1, 2, 2, 1))
    grad = jax.grad(lambda v: maxpool_2x2(v).sum())(x)
    np.testing.assert_array_equal(
        grad[0, :, :, 0], jnp.array([[1.0, 0.0], [0.0, 0.0]]),
    )
    t = torch.zeros((1, 1, 2, 2), requires_grad=True)
    torch.nn.functional.max_pool2d(t, 2).sum().backward()
    np.testing.assert_array_equal(
        np.asarray(grad[0, :, :, 0]), t.grad.numpy()[0, 0],
    )


def test_relu_subgradient_matches_torch():
    x = jnp.array([-1.0, 0.0, 2.0])
    g = jax.grad(lambda v: jnp.sum(relu(v)))(x)
    t = torch.tensor([-1.0, 0.0, 2.0], requires_grad=True)
    torch.relu(t).sum().backward()
    np.testing.assert_array_equal(np.asarray(g), t.grad.numpy())
