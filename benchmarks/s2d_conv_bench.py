"""Space-to-depth phase decomposition vs direct 3x3 conv, per-op.

The profile attribution (BASELINE.md "Where the remaining step time
goes") pins ~67% of the 512px step on the VGG 3x3 convs at ~29% MXU
utilization — batch-1 large-spatial narrow-channel stencils tile the
128x128 systolic array poorly (N=64 output channels fill half the
lanes). The candidate fix the round-2 analysis named (VERDICT item 2)
is the space-to-depth (block-2) phase decomposition:

    pad H,W by 1 -> space-to-depth (4C channels, half spatial)
    -> ONE dense 2x2 conv with 4C_in -> 4C_out -> depth-to-space.

Each output phase (a',b') needs input rows/cols within one 2x2 block
of s2d cells, so a 2x2 VALID conv covers the whole 3x3 stencil. The
dense 2x2x4Cx4C kernel carries the 3x3 taps at 9/16 density (zeros
elsewhere), so the decomposition spends 16/9 = 1.78x the FLOPs of the
direct conv, betting on >1.78x better MXU tiling (M=HW/4, K=16C,
N=4C vs M=HW, K=9C, N=C).

This measures both paths per-op at the VGG19 @512px hot shapes for
the precisions the mixed tier actually runs (HIGHEST for blocks 1-2,
bf16x3 HIGH and bf16 DEFAULT elsewhere), chained through a lax.scan
(inputs evolve every iteration — this rig memoizes repeated identical
dispatches) so RTT amortizes. Correctness is asserted against the
direct conv before timing.

Usage:
    python benchmarks/s2d_conv_bench.py --iters 30 --repeats 5
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from style_transfer_visualizer_tpu.utils.cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

_DIMS = ("NHWC", "HWIO", "NHWC")

# (label, H, W, C_in, C_out) — the conv shapes of VGG19 at 512px input.
SHAPES = [
    ("conv2_512x64", 512, 512, 64, 64),
    ("conv7_256x128", 256, 256, 128, 128),
    ("conv12_128x256", 128, 128, 256, 256),
    ("conv21_64x512", 64, 64, 512, 512),
]

PRECISIONS = {
    "highest": lax.Precision.HIGHEST,
    "high": lax.Precision.HIGH,
    "default": lax.Precision.DEFAULT,
}


def build_s2d_kernel(w3: np.ndarray) -> np.ndarray:
    """(3,3,C,K) HWIO -> the dense (2,2,4C,4K) space-to-depth kernel.

    w2[p,q,(a,b,c),(a',b',k)] = w3[di+1, dj+1, c, k] with
    di = 2p+a-1-a', dj = 2q+b-1-b' when both land in the 3x3 stencil,
    else zero (9/16 of the taps are live).
    """
    c, k = w3.shape[2], w3.shape[3]
    w2 = np.zeros((2, 2, 4 * c, 4 * k), w3.dtype)
    for p in (0, 1):
        for q in (0, 1):
            for a in (0, 1):
                for b in (0, 1):
                    for ao in (0, 1):
                        for bo in (0, 1):
                            di = 2 * p + a - 1 - ao
                            dj = 2 * q + b - 1 - bo
                            if di in (-1, 0, 1) and dj in (-1, 0, 1):
                                ci = (a * 2 + b) * c
                                co = (ao * 2 + bo) * k
                                w2[p, q, ci:ci + c, co:co + k] = (
                                    w3[di + 1, dj + 1]
                                )
    return w2


def space_to_depth_padded(x: jax.Array) -> jax.Array:
    """SAME-pad by 1 then block-2 space-to-depth: (N,H,W,C)->(N,(H+2)/2,(W+2)/2,4C)."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = xp.reshape(n, (h + 2) // 2, 2, (w + 2) // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5)
    return xs.reshape(n, (h + 2) // 2, (w + 2) // 2, 4 * c)


def depth_to_space(ys: jax.Array, c_out: int) -> jax.Array:
    """(N,H/2,W/2,4K) phase layout -> (N,H,W,K)."""
    n, h2, w2, _ = ys.shape
    y = ys.reshape(n, h2, w2, 2, 2, c_out)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h2 * 2, w2 * 2, c_out)


def direct_conv(x, w3, precision):
    return lax.conv_general_dilated(
        x, w3, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=_DIMS, precision=precision,
    )


def s2d_conv(x, w2, c_out, precision):
    xs = space_to_depth_padded(x)
    ys = lax.conv_general_dilated(
        xs, w2, (1, 1), "VALID",
        dimension_numbers=_DIMS, precision=precision,
    )
    return depth_to_space(ys, c_out)


def check_correctness() -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 8, 10, 3)).astype(np.float32))
    w3 = rng.normal(size=(3, 3, 3, 5)).astype(np.float32)
    ref = direct_conv(x, jnp.asarray(w3), lax.Precision.HIGHEST)
    got = s2d_conv(
        x, jnp.asarray(build_s2d_kernel(w3)), 5, lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5,
    )


def time_fn(fn, x, iters, repeats):
    @jax.jit
    def chained(x):
        def body(carry, _):
            y = fn(carry)
            # Renormalize so activations neither explode nor collapse —
            # and every iteration's input differs (memoization guard).
            return y / (jnp.max(jnp.abs(y)) + 1e-6), None

        out, _ = lax.scan(body, x, None, length=iters)
        return out

    out = chained(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = chained(x)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--precisions", default="highest,high,default")
    ap.add_argument("--shapes", default="")
    args = ap.parse_args()

    check_correctness()
    rng = np.random.default_rng(1)
    wanted = args.shapes.split(",") if args.shapes else None
    for label, h, w, c_in, c_out in SHAPES:
        if wanted and label not in wanted:
            continue
        x = jnp.asarray(
            rng.normal(size=(1, h, w, c_in)).astype(np.float32),
        )
        w3 = rng.normal(size=(3, 3, c_in, c_out)).astype(np.float32)
        w3 = (w3 / np.sqrt(9 * c_in)).astype(np.float32)
        w3_j = jnp.asarray(w3)
        w2_j = jnp.asarray(build_s2d_kernel(w3))
        flops = 2 * h * w * 9 * c_in * c_out
        for pname in args.precisions.split(","):
            prec = PRECISIONS[pname]
            t_direct = time_fn(
                lambda x: direct_conv(x, w3_j, prec),
                x, args.iters, args.repeats,
            )
            t_s2d = time_fn(
                lambda x: s2d_conv(x, w2_j, c_out, prec),
                x, args.iters, args.repeats,
            )
            print(json.dumps({
                "shape": label, "precision": pname,
                "direct_ms": round(t_direct * 1e3, 3),
                "s2d_ms": round(t_s2d * 1e3, 3),
                "speedup": round(t_direct / t_s2d, 3),
                "direct_tflops": round(flops / t_direct / 1e12, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
