"""Backbone throughput: VGG19 vs VGG16 optimizer steps/s.

The reference supports only torchvision VGG19; ``--model vgg16`` is
this framework's second family (models/arch.py). At their default taps
VGG16 runs 13 of VGG19's 16 convs and its deepest tap sits at conv5_1
(flat index 24 vs 28) — same pooling depth, ~2 fewer deep 512-channel
convs per sweep — so it should land measurably above the VGG19 rate at
equal precision. This measures the production chunked path for both
backbones at their model-default layer sets.

Usage:
    python benchmarks/model_bench.py --sizes 512 --precision mixed \
        --models vgg19,vgg16 --optimizer adam
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from style_transfer_visualizer_tpu.engine.step import build_update_step
from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.arch import get_architecture
from style_transfer_visualizer_tpu.models.features import (
    compute_targets,
    initialize_input,
)
from style_transfer_visualizer_tpu.utils.cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

CONFIGS = {
    "128": dict(h=128, w=128, remat=False, k=10),  # CPU-smokeable
    "512": dict(h=512, w=512, remat=False, k=25),
    "1080p": dict(h=1088, w=1920, remat=False, k=10),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512")
    ap.add_argument("--precision", default="mixed")
    ap.add_argument("--models", default="vgg19,vgg16")
    ap.add_argument("--optimizer", default="adam",
                    choices=["adam", "lbfgs"])
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    for model_name in args.models.split(","):
        arch = get_architecture(model_name)
        params = vgg19.init_random_params(jax.random.key(0), arch=arch)
        sl = arch.default_style_layers
        cl = arch.default_content_layers
        for name in args.sizes.split(","):
            cfg = CONFIGS[name]
            shape = (1, cfg["h"], cfg["w"], 3)
            key = jax.random.key(1)
            content = jax.random.uniform(key, shape, jnp.float32)
            style = jax.random.uniform(
                jax.random.fold_in(key, 1), shape, jnp.float32,
            )
            targets = compute_targets(params, style, content, sl, cl)
            opt_kwargs = (
                dict(lr=1.0, lbfgs_max_iter=1, lbfgs_max_eval=1,
                     lbfgs_history_size=100)
                if args.optimizer == "lbfgs"
                else dict(lr=0.05)
            )
            bundle = build_update_step(
                params, targets, shape,
                optimizer=args.optimizer, style_w=1e5, content_w=1.0,
                style_layers=sl, content_layers=cl,
                precision=args.precision, remat=cfg["remat"],
                **opt_kwargs,
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
                "model": model_name, "config": name,
                "precision": args.precision,
                "optimizer": args.optimizer,
                "style_layers": list(sl), "content_layers": list(cl),
                "k": k, "steps_per_sec": round(k / best, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
