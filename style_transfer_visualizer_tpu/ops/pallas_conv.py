"""Fused 3x3 conv + bias + ReLU Pallas TPU kernel for VGG19 blocks.

One kernel computes ``relu(conv3x3_same(x, w) + b)`` for an NHWC image:
row blocks stream HBM -> VMEM through hand-rolled double-buffered DMA
(halo rows overlap between blocks, which Pallas ``BlockSpec`` tiling
cannot express), the nine taps of the 3x3 stencil run as nine MXU
matmuls, accumulation is float32 in a VMEM scratch, and bias + ReLU
fuse into the final write — the conv output never round-trips HBM
unfused. The caller zero-pads the image by one pixel per side (a cheap
XLA pad) so every DMA window is uniform and in bounds; those zeros ARE
the SAME padding. This is the north-star "conv+ReLU blocks fuse into
Pallas kernels" op (reference core_model.py:120-146 is the torch block
being replaced).

A ``jax.custom_vjp`` supplies the image gradient: with the backbone
frozen (the style-transfer case — only pixels are optimized), the
backward pass is ``dx = conv3x3_same(relu_mask * g, rot180(w)^T)`` —
the SAME kernel with spatially-flipped, channel-transposed weights and
no bias/ReLU. Weight/bias cotangents are NOT computed (zeros are
returned): do not differentiate through this op with respect to
parameters.

Measured verdict lives in BASELINE.md; the XLA conv path remains the
default (``--conv-backend``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from style_transfer_visualizer_tpu.ops.kernel_util import (
    mosaic_precision,
    round_up,
)

_LANE = 128


def _pick_tile_h(h: int, w: int, c_in: int, c_out: int) -> int:
    """Largest row-block height that keeps the working set in VMEM.

    Budget: 2 input slots (tile_h+2, w+2, c_in), 2 output slots
    (tile_h, w, c_out), one f32 accumulator (tile_h*w, c_out), weights
    (9, c_in, c_out) — aim for <= ~10 MB of the ~16 MB VMEM.
    """
    budget = 10 * 1024 * 1024
    for tile_h in (64, 32, 16, 8, 4, 2, 1):
        if h % tile_h != 0:
            continue
        in_bytes = 2 * (tile_h + 2) * (w + 2) * c_in * 4
        out_bytes = 2 * tile_h * w * c_out * 4
        acc_bytes = tile_h * w * c_out * 4
        w_bytes = 9 * c_in * c_out * 4
        if in_bytes + out_bytes + acc_bytes + w_bytes <= budget:
            return tile_h
    return 1


def _conv_kernel(
    x_hbm,       # (h+2, w+2, c_in) zero-padded image in HBM
    w_ref,       # (9, c_in, c_out) stencil in VMEM
    b_ref,       # (1, c_out) bias in VMEM
    out_hbm,     # (h, w, c_out) in HBM
    in_buf,      # VMEM (2, tile_h+2, w+2, c_in)
    out_buf,     # VMEM (2, tile_h, w, c_out)
    acc_ref,     # VMEM (tile_h*w, c_out) f32
    in_sems,
    out_sems,
    *,
    h: int,
    w: int,
    c_in: int,
    c_out: int,
    tile_h: int,
    apply_relu: bool,
    precision,
):
    """Double-buffered row-block sweep of the fused 3x3 stencil.

    All DMA slices are leading-dimension dynamic slices (the layout
    Mosaic supports for strided memref windows).
    """
    n_blocks = h // tile_h

    def in_dma(slot, blk):
        # Padded-image rows [blk*tile_h, blk*tile_h + tile_h + 2): the
        # block's rows plus one halo row each side, always in bounds.
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(blk * tile_h, tile_h + 2)],
            in_buf.at[slot],
            in_sems.at[slot],
        )

    def out_dma(slot, blk):
        return pltpu.make_async_copy(
            out_buf.at[slot],
            out_hbm.at[pl.ds(blk * tile_h, tile_h)],
            out_sems.at[slot],
        )

    in_dma(0, 0).start()

    def body(blk, _):
        slot = jax.lax.rem(blk, 2)
        next_slot = jax.lax.rem(blk + 1, 2)

        @pl.when(blk + 1 < n_blocks)
        def _():
            in_dma(next_slot, blk + 1).start()

        in_dma(slot, blk).wait()

        # Nine shifted MXU matmuls accumulate the 3x3 stencil.
        for dy in range(3):
            for dx in range(3):
                window = in_buf[
                    slot, dy : dy + tile_h, dx : dx + w, :,
                ].reshape(tile_h * w, c_in)
                contrib = jax.lax.dot_general(
                    window,
                    w_ref[dy * 3 + dx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
                if dy == 0 and dx == 0:
                    acc_ref[:] = contrib
                else:
                    acc_ref[:] += contrib

        # Wait for the previous output DMA from this slot to drain
        # before overwriting the buffer.
        @pl.when(blk >= 2)
        def _():
            out_dma(slot, blk - 2).wait()

        result = acc_ref[:] + b_ref[0]
        if apply_relu:
            result = jnp.maximum(result, 0.0)
        out_buf[slot] = result.reshape(tile_h, w, c_out)
        out_dma(slot, blk).start()
        return 0

    jax.lax.fori_loop(0, n_blocks, body, 0)

    # Drain the in-flight output DMAs (static indices: n_blocks is
    # a Python int).
    if n_blocks >= 2:
        out_dma((n_blocks - 2) % 2, n_blocks - 2).wait()
    out_dma((n_blocks - 1) % 2, n_blocks - 1).wait()


def _run_conv(
    x: jax.Array,
    w9: jax.Array,
    b: jax.Array,
    *,
    apply_relu: bool,
    interpret: bool,
    precision=None,
) -> jax.Array:
    b_, h, w, c_in = x.shape
    c_out = w9.shape[2]
    if b_ != 1:
        msg = "pallas conv kernel expects batch 1 (the pixel problem)"
        raise ValueError(msg)
    # The VMEM stage and accumulator are float32.
    x = x.astype(jnp.float32)
    w9 = w9.astype(jnp.float32)
    b = b.astype(jnp.float32)
    # Pad channels to lane width so every matmul maps onto the MXU; pad
    # H by the SAME-padding halo rows; pad W so both the input and
    # output memrefs' second-minor dims are sublane (8) aligned —
    # Mosaic requires aligned slice shapes for strided HBM DMA. The
    # extra zero columns produce relu(bias) junk that is cropped off.
    c_in_p = round_up(c_in, _LANE)
    c_out_p = round_up(c_out, _LANE)
    w_out_p = round_up(w, 8)
    w_in_p = round_up(w_out_p + 2, 8)
    x = jnp.pad(
        x,
        ((0, 0), (1, 1), (1, w_in_p - w - 1), (0, c_in_p - c_in)),
    )
    if c_in_p != c_in:
        w9 = jnp.pad(w9, ((0, 0), (0, c_in_p - c_in), (0, 0)))
    if c_out_p != c_out:
        w9 = jnp.pad(w9, ((0, 0), (0, 0), (0, c_out_p - c_out)))
        b = jnp.pad(b, (0, c_out_p - c_out))

    tile_h = _pick_tile_h(h, w_in_p, c_in_p, c_out_p)
    kernel = partial(
        _conv_kernel,
        h=h, w=w_out_p,
        c_in=c_in_p, c_out=c_out_p, tile_h=tile_h,
        apply_relu=apply_relu, precision=mosaic_precision(precision),
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # image streams via DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # 9 weight taps
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias row
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((h, w_out_p, c_out_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, w_in_p, c_in_p), jnp.float32),
            pltpu.VMEM((2, tile_h, w_out_p, c_out_p), jnp.float32),
            pltpu.VMEM((tile_h * w_out_p, c_out_p), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * h * w * c_in_p * c_out_p,
            bytes_accessed=(h * w * (c_in_p + c_out_p) * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x[0], w9, b.reshape(1, c_out_p))
    return out[None, :, :w, :c_out]


def _flip_transpose(w9: jax.Array) -> jax.Array:
    """rot180 + channel transpose: the stencil of the input gradient."""
    return jnp.transpose(w9[::-1], (0, 2, 1))


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3_bias_relu(
    x: jax.Array,
    w9: jax.Array,
    b: jax.Array,
    apply_relu: bool = True,
    interpret: bool = False,
    precision=None,
) -> jax.Array:
    """Fused ``relu(conv3x3_same(x, w) + b)`` on (1, H, W, C_in).

    ``w9`` is the (9, C_in, C_out) stencil (HWIO reshaped row-major over
    (ky, kx)). The VJP produces the image gradient only — weight/bias
    cotangents are zeros by design (frozen feature extractor).
    """
    out, _ = _conv_fwd(x, w9, b, apply_relu, interpret, precision)
    return out


def _conv_fwd(x, w9, b, apply_relu, interpret, precision):
    out = _run_conv(
        x, w9, b,
        apply_relu=apply_relu, interpret=interpret, precision=precision,
    )
    return out, (out if apply_relu else None, w9)


def _conv_bwd(apply_relu, interpret, precision, residuals, g):
    out, w9 = residuals
    if apply_relu:
        g = g * (out > 0).astype(g.dtype)
    dx = _run_conv(
        g, _flip_transpose(w9), jnp.zeros((w9.shape[1],), g.dtype),
        apply_relu=False, interpret=interpret, precision=precision,
    )
    return dx, jnp.zeros_like(w9), jnp.zeros((w9.shape[2],), g.dtype)


conv3x3_bias_relu.defvjp(_conv_fwd, _conv_bwd)


def resolve_conv_backend(name: str) -> str:
    """Resolve a configured conv backend name to a concrete one.

    "auto" resolves to XLA: measured end-to-end on TPU v5e the Pallas
    stencil kernel matches XLA per-op but loses in the full step (see
    BASELINE.md) — XLA's conv fuses with its surrounding elementwise
    ops and supports the 3-pass bf16 "high" tier, which Mosaic's dot
    does not (HIGH rounds up to HIGHEST in-kernel). The kernel stays
    production-reachable via ``--conv-backend pallas``.
    """
    if name == "auto":
        return "xla"
    if name in ("xla", "pallas"):
        return name
    msg = f"Unknown conv backend: {name!r}"
    raise ValueError(msg)


def hwio_to_stencil(w: jax.Array) -> jax.Array:
    """(3, 3, C_in, C_out) HWIO weights -> (9, C_in, C_out) stencil."""
    kh, kw, c_in, c_out = w.shape
    if (kh, kw) != (3, 3):
        msg = f"Expected a 3x3 kernel, got {kh}x{kw}"
        raise ValueError(msg)
    return w.reshape(9, c_in, c_out)
