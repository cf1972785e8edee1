"""Measure e2e step throughput with XLA vs Pallas Gram backends on TPU.

Times the full jitted Adam update (forward + backward + update) at
512px and 1080p-class sizes for each gram backend and precision tier.
Informs the "auto" resolution recorded in BASELINE.md.
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
WARMUP = 3
CHUNK = 10
CHUNKS = 5


def time_config(size_hw, backend, precision):
    from style_transfer_visualizer_tpu.engine.step import build_update_step
    from style_transfer_visualizer_tpu.models import vgg19
    from style_transfer_visualizer_tpu.models.features import (
        compute_targets,
        initialize_input,
    )

    params = vgg19.init_random_params(jax.random.key(0))
    style_layers = (0, 5, 10, 19, 28)
    content_layers = (21,)
    h, w = size_hw
    key = jax.random.key(1)
    content = jax.random.uniform(key, (1, h, w, 3), jnp.float32)
    style = jax.random.uniform(
        jax.random.fold_in(key, 1), (1, h, w, 3), jnp.float32,
    )
    targets = compute_targets(
        params, style, content, style_layers, content_layers,
        gram_backend=backend,
    )
    bundle = build_update_step(
        params, targets, tuple(content.shape),
        optimizer="adam", lr=0.05, style_w=1e5, content_w=1.0,
        style_layers=style_layers, content_layers=content_layers,
        precision=precision, gram_backend=backend,
    )
    x = initialize_input(content, "random", jax.random.key(2))
    state = bundle.opt_state
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
    return CHUNK / best


def main() -> None:
    print("backend:", jax.default_backend(), flush=True)
    for size in [(512, 512), (1088, 1920)]:
        for precision in ("high", "default"):
            for backend in ("xla", "pallas"):
                sps = time_config(size, backend, precision)
                print(
                    json.dumps(
                        {
                            "size": list(size),
                            "precision": precision,
                            "gram_backend": backend,
                            "steps_per_sec": round(sps, 3),
                        },
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
