"""TPU-friendly 2x2/stride-2 max pooling and ReLU.

``lax.reduce_window`` max pooling differentiates into a
``select-and-scatter`` HLO that the TPU backend executes serially per
window in a T(1,128) layout — a profiled 2.8 ms/step at 512px, plus
another ~2 ms of relayout copies it forces on neighbouring elementwise
ops. Because VGG pooling is exactly 2x2/stride-2 (reference
core_model.py:120-146 slices torchvision VGG19, whose pools are all
``MaxPool2d(2, 2)``), the window never overlaps and the whole op is a
reshape + two axis maxima — pure VPU work in the tensor's native
layout.

The custom VJP routes each output's gradient to the FIRST maximal
element of its window in row-major order, bit-matching both XLA's
``select_and_scatter`` semantics and torch's argmax routing
(``MaxPool2d`` backward), so swapping implementations changes no
gradient anywhere.

A pairwise-comparison formulation (max/argmax from strided
``x[:, 0::2, 0::2]`` quarter views, one read of x) was measured at
512px and LOST ~10% end-to-end: stride-2 slicing of W fights the TPU
(sublane=W, lane=C) tiling and forces relayouts, while this
reshape-reduce + equality-rescan keeps every access in the native
layout. Three formulations measured; this one stands.

``relu`` is ``where(x > 0, x, 0)`` rather than ``jnp.maximum(x, 0)``:
``maximum`` differentiates with a tie-splitting rule (gradient / 2 where
``x == 0`` — a profiled 0.6 ms/step of divides at 512px, on ties that
post-ReLU feature maps hit constantly), while torch's ReLU backward is
exactly ``g * (x > 0)`` — ``where`` is both faster and closer to
reference semantics (core_model.py:133-137 rebuilds ReLUs as
``inplace=False`` torch ReLUs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def relu(x: jax.Array) -> jax.Array:
    """ReLU with torch-matching subgradient (0 at x == 0).

    A mask-saving custom VJP (``maximum`` forward, stored-bool
    backward) was measured at exactly this formulation's cost — the op
    is HBM-bandwidth-bound either way — so the plain version stands.
    """
    return jnp.where(x > 0, x, jnp.zeros((), dtype=x.dtype))


def _crop_even(x: jax.Array) -> jax.Array:
    """Drop trailing odd row/column (torch floor semantics)."""
    _, h, w, _ = x.shape
    return x[:, : (h // 2) * 2, : (w // 2) * 2, :]


def _window_iota(win: tuple[int, ...]) -> jax.Array:
    """Row-major window-position index, generated (never materialized)."""
    return (
        jax.lax.broadcasted_iota(jnp.int32, win, 2) * 2
        + jax.lax.broadcasted_iota(jnp.int32, win, 4)
    )


def _pool_forward(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    xr = _crop_even(x).reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.max(jnp.max(xr, axis=4), axis=2)


def maxpool_2x2(x: jax.Array) -> jax.Array:
    """2x2/stride-2 max pool of an NHWC map, floor semantics.

    The crop to even dimensions stays outside the custom VJP: slicing
    autodiffs to a zero-pad (a no-op for the even-sized VGG case), and
    the inner op can then recover the input shape from the cotangent
    alone.
    """
    return _maxpool_even(_crop_even(x))


@jax.custom_vjp
def _maxpool_even(x: jax.Array) -> jax.Array:
    return _pool_forward(x)


def _maxpool_fwd(x: jax.Array):
    out = _pool_forward(x)
    # Save the row-major index of the first maximal element per window —
    # the backward then never re-reads x: it is a single fused
    # ``where(iota == idx, g, 0)`` write at input size. The index costs
    # one extra read of x here; the net is ~2x cheaper than an
    # equality-mask backward and ~4x cheaper than select_and_scatter.
    n, h, w, c = x.shape
    win = (n, h // 2, 2, w // 2, 2, c)
    xr = x.reshape(win)
    eq = xr == out[:, :, None, :, None, :]
    masked = jnp.where(eq, _window_iota(win), jnp.int32(4))
    argfirst = jnp.min(masked, axis=(2, 4))
    return out, argfirst


def _maxpool_bwd(argfirst: jax.Array, g: jax.Array):
    n, h2, w2, c = g.shape
    win = (n, h2, 2, w2, 2, c)
    zero = jnp.zeros((), dtype=g.dtype)
    # First maximal element in row-major window order gets the whole
    # gradient (select_and_scatter / torch argmax semantics).
    grad_r = jnp.where(
        _window_iota(win) == argfirst[:, :, None, :, None, :],
        g[:, :, None, :, None, :],
        zero,
    )
    return (grad_r.reshape(n, h2 * 2, w2 * 2, c),)


_maxpool_even.defvjp(_maxpool_fwd, _maxpool_bwd)
