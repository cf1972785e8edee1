"""Sharded-vs-whole overhead of the spatial loss on a 1-device mesh.

Round-4 verdict ask #2: measure what the shard_map program costs ON TPU
SILICON relative to the whole-image path at the same sizes. A 1-device
``space`` mesh degenerates the collectives (psum of one shard,
zero-peer ppermute + zero-halo pads) but compiles and executes the
exact sharded graph, so the delta is the sharding machinery's overhead
floor — the number a multi-chip deployment would pay per chip before
ICI costs.

Prints one JSON line per size:
  {"size": ..., "whole_steps_per_sec": ..., "sharded_steps_per_sec":
   ..., "overhead_pct": ...}
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
    Targets,
    compute_targets,
    initialize_input,
)
from style_transfer_visualizer_tpu.parallel.mesh import create_mesh
from style_transfer_visualizer_tpu.parallel.spatial import (
    compute_sharded_targets,
    make_spatial_loss,
    spatial_shardings,
)
from style_transfer_visualizer_tpu.utils.cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

STYLE_LAYERS = (0, 5, 10, 19, 28)
CONTENT_LAYERS = (21,)

# Heights are multiples of 16 (n_space * 2^4 pools for the deepest
# default tap) — the same rounding the production CLI requires.
CONFIGS = {
    "512px": dict(h=512, w=512),
    "1080p": dict(h=1088, w=1920),
}


def _rate(chunked_update_fn, x, state, steps: int, chunk: int) -> float:
    """Best-dispatch steps/s (same scoring as bench.py)."""
    x, state, _ = chunked_update_fn(x, state, chunk)  # compile
    jax.block_until_ready(x)
    best = float("inf")
    for _ in range(max(1, steps // chunk)):
        start = time.perf_counter()
        x, state, _ = chunked_update_fn(x, state, chunk)
        jax.block_until_ready(x)
        best = min(best, time.perf_counter() - start)
    return chunk / best


def main() -> None:
    from style_transfer_visualizer_tpu import config_defaults as d
    from style_transfer_visualizer_tpu.engine.runner import DEFAULT_CHUNK
    from style_transfer_visualizer_tpu.main import resolve_single_remat

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512px,1080p")
    ap.add_argument("--steps", type=int, default=75)
    ap.add_argument("--precision", default=d.DEFAULT_PRECISION)
    args = ap.parse_args()

    params = vgg19.init_random_params(jax.random.key(0))
    mesh = create_mesh(
        n_style=1, n_space=1, devices=jax.devices()[:1],
    )
    for name in args.sizes.split(","):
        h, w = CONFIGS[name]["h"], CONFIGS[name]["w"]
        key = jax.random.key(1)
        shape = (1, h, w, 3)
        content = jax.random.uniform(key, shape, jnp.float32)
        style = jax.random.uniform(
            jax.random.fold_in(key, 1), (1, 512, 512, 3), jnp.float32,
        )
        chunk = min(DEFAULT_CHUNK, args.steps)
        remat = resolve_single_remat(h, w, 0, requested=False)

        # Whole-image production path.
        targets = compute_targets(
            params, style, content, STYLE_LAYERS, CONTENT_LAYERS,
        )
        whole = build_update_step(
            params, targets, shape,
            optimizer="adam", lr=0.05, style_w=1e5, content_w=1.0,
            style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
            precision=args.precision, remat=remat,
        )
        x = initialize_input(content, "random", jax.random.key(2))
        whole_rate = _rate(
            whole.chunked_update_fn, x, whole.opt_state, args.steps, chunk,
        )

        # Sharded path on the 1-device mesh (same objective).
        sh_targets = compute_sharded_targets(
            mesh, params, style, content, STYLE_LAYERS, CONTENT_LAYERS,
        )
        merged = Targets(
            style_grams=sh_targets.style_grams,
            content_feats=sh_targets.content_feats,
        )
        from style_transfer_visualizer_tpu.engine.step import (
            resolve_precision,
        )

        loss_fn = make_spatial_loss(
            mesh, shape, style_w=1e5, content_w=1.0,
            style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
            precision=resolve_precision(args.precision),
        )
        sharded = build_update_step(
            params, merged, shape,
            optimizer="adam", lr=0.05, style_w=1e5, content_w=1.0,
            style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
            precision=args.precision, loss_fn=loss_fn,
        )
        row_sharding, target_shardings = spatial_shardings(mesh, merged)
        x = jax.device_put(
            initialize_input(content, "random", jax.random.key(2)),
            row_sharding,
        )
        sharded_rate = _rate(
            sharded.chunked_update_fn, x, sharded.opt_state,
            args.steps, chunk,
        )
        print(
            json.dumps({
                "size": name,
                "whole_steps_per_sec": round(whole_rate, 3),
                "sharded_steps_per_sec": round(sharded_rate, 3),
                "overhead_pct": round(
                    100 * (1 - sharded_rate / whole_rate), 1,
                ),
            }),
        )


if __name__ == "__main__":
    main()
