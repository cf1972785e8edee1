"""Steady-state steps/s at 1080p/1440p-class sizes (production path)."""
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

def production_config(h: int, w: int) -> dict:
    """Resolve (remat, chunk k) exactly as a default CLI run would.

    The round-3 1440p staleness (a hardcoded remat=True drifting from
    the production rule, under-reporting 44% for two rounds) is why
    nothing here is hardcoded: remat comes from
    ``main.resolve_single_remat`` and the dispatch chunk from the
    runner's unconstrained default. tests/test_bench_configs.py pins
    this equivalence.
    """
    from style_transfer_visualizer_tpu.engine.runner import (
        DEFAULT_CHUNK,
    )
    from style_transfer_visualizer_tpu.main import resolve_single_remat

    return dict(
        h=h, w=w,
        remat=resolve_single_remat(h, w, 0, requested=False),
        k=DEFAULT_CHUNK,
    )


CONFIGS = {
    "1080p": dict(h=1088, w=1920),
    # 3.77MP is below the 4.19MP auto-remat threshold: the production
    # path runs 1440p whole-image (remat measured 2.09 vs 3.02 steps/s
    # at mixed; it was only ever needed for r1's `highest` tier).
    "1440p": dict(h=1472, w=2560),
}


def main() -> None:
    from style_transfer_visualizer_tpu import config_defaults as d

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1080p,1440p")
    ap.add_argument("--precision", default=d.DEFAULT_PRECISION)
    ap.add_argument(
        "--remat", choices=["config", "on", "off"], default="config",
        help="Override the production-resolved remat setting",
    )
    args = ap.parse_args()

    params = vgg19.init_random_params(jax.random.key(0))
    sl, cl = (0, 5, 10, 19, 28), (21,)

    for name in args.sizes.split(","):
        size = CONFIGS[name]
        cfg = production_config(size["h"], size["w"])
        if args.remat != "config":
            cfg["remat"] = args.remat == "on"
        shape = (1, cfg["h"], cfg["w"], 3)
        key = jax.random.key(1)
        content = jax.random.uniform(key, shape, jnp.float32)
        style = jax.random.uniform(
            jax.random.fold_in(key, 1), shape, jnp.float32,
        )
        targets = compute_targets(params, style, content, sl, cl)
        bundle = build_update_step(
            params, targets, shape,
            optimizer="adam", lr=0.05, style_w=1e5, content_w=1.0,
            style_layers=sl, content_layers=cl,
            precision=args.precision, remat=cfg["remat"],
        )
        x = initialize_input(content, "random", jax.random.key(2))
        state = bundle.opt_state
        k = cfg["k"]
        x, state, _ = bundle.chunked_update_fn(x, state, k)
        jax.block_until_ready(x)
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            x, state, _ = bundle.chunked_update_fn(x, state, k)
            jax.block_until_ready(x)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "config": name, "precision": args.precision,
            "remat": cfg["remat"],
            "steps_per_sec": round(k / best, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
