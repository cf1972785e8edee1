"""Multi-style batch throughput: 1 content x S styles at 512px.

BASELINE.json configs[2]. On a single chip the style axis is a
1-device mesh and the batch rides vmap; on a pod slice the same code
shards styles across chips. ``--styles N`` sweeps the single-chip
batch-size scaling curve (how far vmap keeps filling the MXU).
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp

from style_transfer_visualizer_tpu.engine.step import (
    resolve_precision,
)
from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.parallel.mesh import create_mesh
from style_transfer_visualizer_tpu.parallel.multistyle import (
    build_multi_style_update,
    initialize_multi_inputs,
    multi_style_targets,
)
from style_transfer_visualizer_tpu.utils.cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

SIZE = 512
K_CHUNK = 10
CHUNKS = 4


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--styles", type=int, default=8)
    ap.add_argument("--skip-eager", action="store_true")
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()
    n_styles = args.styles
    params = vgg19.init_random_params(jax.random.key(0))
    sl, cl = (0, 5, 10, 19, 28), (21,)
    key = jax.random.key(1)
    shape = (1, SIZE, SIZE, 3)
    content = jax.random.uniform(key, shape, jnp.float32)
    styles = [
        jax.random.uniform(jax.random.fold_in(key, s), shape, jnp.float32)
        for s in range(n_styles)
    ]

    mesh = create_mesh(n_style=1, n_space=1)
    targets = multi_style_targets(
        params, content, styles, sl, cl,
        precision=resolve_precision("mixed"),
    )
    bundle = build_multi_style_update(
        mesh, params, targets, shape, n_styles,
        optimizer="adam", lr=0.05, style_w=1e5, content_w=1.0,
        style_layers=sl, content_layers=cl, precision="mixed",
        remat=args.remat,
    )
    images = initialize_multi_inputs(
        content, "random", jax.random.key(2), n_styles,
    )
    state = bundle.opt_state
    update = bundle.update_fn

    # Warm past BOTH compiles: the first call compiles, and because the
    # carried buffers are donated, the second call sees the output
    # layouts and compiles once more before reaching the fixed point.
    best = None
    if not args.skip_eager:
        for _ in range(3):
            images, state, _ = update(images, state)
            jax.block_until_ready(images)
        best = 1e9
        for _ in range(CHUNKS):
            t0 = time.perf_counter()
            for _ in range(K_CHUNK):
                images, state, _ = update(images, state)
            jax.block_until_ready(images)
            best = min(best, (time.perf_counter() - t0) / K_CHUNK)

    # The production batch loop since 0.3.0: k steps fused into one
    # lax.scan dispatch (main.py:_run_multi_style_loop picks k=25 when
    # no checkpoint cadence constrains it).
    k = 25
    images, state, _ = bundle.chunked_update_fn(images, state, k)
    jax.block_until_ready(images)
    best_chunked = 1e9
    for _ in range(CHUNKS):
        t0 = time.perf_counter()
        images, state, _ = bundle.chunked_update_fn(images, state, k)
        jax.block_until_ready(images)
        best_chunked = min(best_chunked, (time.perf_counter() - t0) / k)
    out = {
        "metric": "multistyle_batch_steps_per_sec_512px",
        "n_styles": n_styles,
        "precision": "mixed",
        "chunked_batch_steps_per_sec": round(1 / best_chunked, 3),
        "chunked_style_steps_per_sec": round(n_styles / best_chunked, 2),
        "chunk": k,
    }
    if best is not None:
        out["batch_steps_per_sec"] = round(1 / best, 3)
        out["style_steps_per_sec"] = round(n_styles / best, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
