"""Audit compiled-HLO copy/relayout ops in the production 512px step.

The r3 profile shows ~0.86 ms/step (≈5%) in `copy`/`copy-done` device
ops at 512px mixed. This harness compiles the exact production chunked
step and prints every copy/transpose/bitcast-convert instruction with
its shape and estimated bytes, so layout-change candidates can be
attributed to source ops instead of guessed at.
"""
import argparse
import collections
import re

import jax
import jax.numpy as jnp

from style_transfer_visualizer_tpu.engine.step import build_update_step
from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.features import (
    compute_targets,
    initialize_input,
)
from style_transfer_visualizer_tpu.utils.cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def _bytes_of(shape_str: str) -> int:
    match = _SHAPE_RE.search(shape_str)
    if not match:
        return 0
    dtype, dims = match.groups()
    width = {"f32": 4, "bf16": 2, "s32": 4, "u8": 1, "pred": 1,
             "u32": 4, "f16": 2}.get(dtype, 4)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * width


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--precision", default="mixed")
    ap.add_argument("--k", type=int, default=25)
    ap.add_argument("--optimizer", default="adam")
    args = ap.parse_args()

    params = vgg19.init_random_params(jax.random.key(0))
    sl, cl = (0, 5, 10, 19, 28), (21,)
    shape = (1, args.size, args.size, 3)
    key = jax.random.key(1)
    content = jax.random.uniform(key, shape, jnp.float32)
    style = jax.random.uniform(
        jax.random.fold_in(key, 1), shape, jnp.float32,
    )
    targets = compute_targets(params, style, content, sl, cl)
    bundle = build_update_step(
        params, targets, shape,
        optimizer=args.optimizer, lr=0.05, style_w=1e5, content_w=1.0,
        style_layers=sl, content_layers=cl, precision=args.precision,
    )
    x = initialize_input(content, "random", jax.random.key(2))

    lowered = jax.jit(
        bundle.chunked_update_fn, static_argnums=(2,),
    ).lower(x, bundle.opt_state, args.k)
    hlo = lowered.compile().as_text()

    counts: collections.Counter = collections.Counter()
    total_bytes: collections.Counter = collections.Counter()
    for line in hlo.splitlines():
        stripped = line.strip()
        m = re.match(r"%?[\w.-]+ = (\S+) (copy|transpose|bitcast-convert)\(",
                     stripped)
        if m:
            shape_str, op = m.groups()
            counts[(op, shape_str)] += 1
            total_bytes[(op, shape_str)] += _bytes_of(shape_str)
    print(f"copy/relayout instructions in the k={args.k} step:")
    for (op, shape_str), count in sorted(
        counts.items(), key=lambda kv: -total_bytes[kv[0]],
    )[:25]:
        mb = total_bytes[(op, shape_str)] / 1e6
        print(f"  {count:4d}x {op:16s} {shape_str:40s} {mb:9.2f} MB total")
    if not counts:
        print("  (none found)")


if __name__ == "__main__":
    main()
