"""TPU L-BFGS throughput at the reference's default workload shape.

The reference's default optimizer is L-BFGS with ``lr=1.0``,
``max_iter=1``, ``max_eval=1`` and torch's default history of 100
(/root/reference/src/style_transfer_visualizer/config_defaults.py:5-13,
core_model.py:344-349) — one forward+backward per accepted step, plus
the two-loop recursion over the curvature history. This measures the
production chunked path at those settings, sweeping history size to
quantify what the history ring (2 * m * N floats — 629 MB at 512px with
m=100) costs in HBM traffic and dispatch.

Usage:
    python benchmarks/lbfgs_bench.py --sizes 512,1080p \
        --precision mixed --histories 100,20
"""
from __future__ import annotations

import argparse
import json
import time

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

CONFIGS = {
    "512": dict(h=512, w=512),
    "1080p": dict(h=1088, w=1920),
}


def main() -> None:
    from style_transfer_visualizer_tpu import config_defaults as d

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512")
    ap.add_argument("--precision", default=d.DEFAULT_PRECISION)
    ap.add_argument(
        "--histories", default=str(d.DEFAULT_LBFGS_HISTORY_SIZE),
    )
    ap.add_argument("--history-dtype",
                    default=d.DEFAULT_LBFGS_HISTORY_DTYPE,
                    choices=["float32", "bfloat16"])
    ap.add_argument("--direction", default=d.DEFAULT_LBFGS_DIRECTION,
                    choices=["two-loop", "compact"])
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    params = vgg19.init_random_params(jax.random.key(0))
    sl, cl = (0, 5, 10, 19, 28), (21,)

    # (remat, chunk k) resolve exactly as a default CLI run would —
    # never hardcoded (tests/test_bench_configs.py pins this; the
    # round-3 1440p staleness is why).
    from style_transfer_visualizer_tpu.engine.runner import (
        DEFAULT_CHUNK,
    )
    from style_transfer_visualizer_tpu.main import resolve_single_remat

    for name in args.sizes.split(","):
        size = CONFIGS[name]
        cfg = dict(
            size,
            remat=resolve_single_remat(
                size["h"], size["w"], 0, requested=False,
            ),
            k=DEFAULT_CHUNK,
        )
        shape = (1, cfg["h"], cfg["w"], 3)
        key = jax.random.key(1)
        content = jax.random.uniform(key, shape, jnp.float32)
        style = jax.random.uniform(
            jax.random.fold_in(key, 1), shape, jnp.float32,
        )
        targets = compute_targets(params, style, content, sl, cl)
        n = shape[1] * shape[2] * shape[3]
        for hist in (int(h) for h in args.histories.split(",")):
            bundle = build_update_step(
                params, targets, shape,
                optimizer="lbfgs", lr=1.0, style_w=1e5, content_w=1.0,
                style_layers=sl, content_layers=cl,
                precision=args.precision, remat=cfg["remat"],
                lbfgs_max_iter=1, lbfgs_max_eval=1,
                lbfgs_history_size=hist,
                lbfgs_history_dtype=args.history_dtype,
                lbfgs_direction=args.direction,
            )
            x = initialize_input(content, "random", jax.random.key(2))
            state = bundle.opt_state
            k = cfg["k"]
            x, state, _ = bundle.chunked_update_fn(x, state, k)  # compile
            jax.block_until_ready(x)
            best = 1e9
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                x, state, _ = bundle.chunked_update_fn(x, state, k)
                jax.block_until_ready(x)
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({
                "config": name, "precision": args.precision,
                "optimizer": "lbfgs", "history_size": hist,
                "history_dtype": args.history_dtype,
                "direction": args.direction,
                "history_mb": round(
                    2 * hist * n * (4 if args.history_dtype == "float32" else 2) / 2**20, 1,
                ),
                "lr": 1.0, "max_iter": 1, "max_eval": 1, "k": k,
                "steps_per_sec": round(k / best, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
