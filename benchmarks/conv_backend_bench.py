import json, time
import jax, jax.numpy as jnp
from style_transfer_visualizer_tpu.engine.step import build_update_step
from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.features import compute_targets, initialize_input

from style_transfer_visualizer_tpu.utils.cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()
SIZE = 512
params = vgg19.init_random_params(jax.random.key(0))
sl, cl = (0, 5, 10, 19, 28), (21,)
key = jax.random.key(1)
content = jax.random.uniform(key, (1, SIZE, SIZE, 3), jnp.float32)
style = jax.random.uniform(jax.random.fold_in(key, 1), (1, SIZE, SIZE, 3), jnp.float32)
targets = compute_targets(params, style, content, sl, cl)
for precision in ("high", "default"):
    for conv_backend in ("xla", "pallas"):
        bundle = build_update_step(
            params, targets, tuple(content.shape),
            optimizer="adam", lr=0.05, style_w=1e5, content_w=1.0,
            style_layers=sl, content_layers=cl, precision=precision,
            conv_backend=conv_backend,
        )
        x = initialize_input(content, "random", jax.random.key(2))
        state = bundle.opt_state
        try:
            x, state, aux = bundle.chunked_update_fn(x, state, 25)
            jax.block_until_ready(x)
        except Exception as e:
            print(json.dumps({"precision": precision, "conv_backend": conv_backend,
                              "error": str(e)[:200]}), flush=True)
            continue
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            x, state, aux = bundle.chunked_update_fn(x, state, 25)
            jax.block_until_ready(x)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"precision": precision, "conv_backend": conv_backend,
                          "steps_per_sec": round(25 / best, 2),
                          "loss": float(aux.loss[-1])}), flush=True)
