"""4K single-chip throughput via banded (scan-tiled) loss evaluation.

BASELINE.json configs[3]: 4K content, tiled Gram evaluation. The
whole-image 4K fwd+bwd graph is rejected by this rig's remote compiler
(BASELINE.md); the banded path compiles one ~2.3MP band graph instead.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from style_transfer_visualizer_tpu.utils.cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()
H, W = 2160, 3840
WARMUP = 2
CHUNK = 5
CHUNKS = 4


def main() -> None:
    from style_transfer_visualizer_tpu.engine.step import build_update_step
    from style_transfer_visualizer_tpu.models import vgg19
    from style_transfer_visualizer_tpu.models.features import (
        initialize_input,
    )
    from style_transfer_visualizer_tpu.ops.tiled import (
        auto_tile_rows,
        compute_tiled_targets,
    )

    style_layers = (0, 5, 10, 19, 28)
    content_layers = (21,)
    taps = tuple(sorted(set(style_layers) | set(content_layers)))
    tile_rows = auto_tile_rows(H, W, taps)
    print("backend:", jax.default_backend(), "tile_rows:", tile_rows,
          flush=True)

    params = vgg19.init_random_params(jax.random.key(0))
    key = jax.random.key(1)
    content = jax.random.uniform(key, (1, H, W, 3), jnp.float32)
    style = jax.random.uniform(
        jax.random.fold_in(key, 1), (1, 512, 512, 3), jnp.float32,
    )

    t0 = time.perf_counter()
    targets = compute_tiled_targets(
        params, style, content, style_layers, content_layers,
        tile_rows_style=None, tile_rows_content=tile_rows,
    )
    jax.block_until_ready(targets.content_feats[21])
    print(f"targets computed in {time.perf_counter() - t0:.1f}s",
          flush=True)

    bundle = build_update_step(
        params, targets, tuple(content.shape),
        optimizer="adam", lr=0.05, style_w=1e5, content_w=1.0,
        style_layers=style_layers, content_layers=content_layers,
        precision="mixed", tile_rows=tile_rows,
    )
    x = initialize_input(content, "random", jax.random.key(2))
    state = bundle.opt_state

    t0 = time.perf_counter()
    x, state, aux = bundle.update_fn(x, state)
    print("first step loss:", float(aux.loss),
          f"(compile+run {time.perf_counter() - t0:.1f}s)", flush=True)
    for _ in range(WARMUP):
        x, state, aux = bundle.update_fn(x, state)
    jax.block_until_ready(x)

    best = float("inf")
    for _ in range(CHUNKS):
        start = time.perf_counter()
        for _ in range(CHUNK):
            x, state, aux = bundle.update_fn(x, state)
        jax.block_until_ready(x)
        best = min(best, time.perf_counter() - start)
    print(
        json.dumps(
            {
                "metric": "adam_steps_per_sec_4k_tiled",
                "size": [H, W],
                "tile_rows": tile_rows,
                "precision": "mixed",
                "steps_per_sec": round(CHUNK / best, 3),
            },
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
