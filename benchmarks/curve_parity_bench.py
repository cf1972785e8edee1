"""Loss-curve parity: TPU precision tiers vs CPU float32 ground truth.

Runs the same 100-step Adam optimization (256px, default taps, random
VGG weights) on the CPU backend in float32 and on the default device at
the requested precision tiers, and reports the max relative deviation
of the loss curves. The north-star gate is 1e-3 relative
(BASELINE.json); BASELINE.md records the measured tiers.

CPU ground truth runs in a subprocess (the axon TPU plugin ignores
JAX_PLATFORMS at runtime, so backend choice must happen before jax
initializes).
"""
import json
import os
import subprocess
import sys

STEPS = 100
SIZE = 256

_CHILD = r"""
import json, sys
import jax
if sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from style_transfer_visualizer_tpu.engine.step import build_update_step
from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.features import (
    compute_targets, initialize_input,
)
from style_transfer_visualizer_tpu.utils.cache import (
    enable_persistent_compilation_cache,
)
enable_persistent_compilation_cache()

precision = sys.argv[2]
steps, size = int(sys.argv[3]), int(sys.argv[4])
optimizer = sys.argv[5] if len(sys.argv) > 5 else "adam"
params = vgg19.init_random_params(jax.random.key(0))
sl, cl = (0, 5, 10, 19, 28), (21,)
key = jax.random.key(1)
shape = (1, size, size, 3)
content = jax.random.uniform(key, shape, jnp.float32)
style = jax.random.uniform(jax.random.fold_in(key, 1), shape, jnp.float32)
from style_transfer_visualizer_tpu.engine.step import resolve_precision
targets = compute_targets(
    params, style, content, sl, cl, resolve_precision(precision),
)
bundle = build_update_step(
    params, targets, shape, optimizer=optimizer,
    lr=0.05 if optimizer == "adam" else 1.0,
    style_w=1e5, content_w=1.0, style_layers=sl, content_layers=cl,
    precision=precision,
)
x = initialize_input(content, "random", jax.random.key(2))
state = bundle.opt_state
losses = []
for _ in range(steps):
    x, state, aux = bundle.update_fn(x, state)
    losses.append(aux.loss)
print(json.dumps([float(v) for v in losses]))
"""


def run(
    backend: str, precision: str, optimizer: str = "adam",
) -> list[float]:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, backend, precision,
         str(STEPS), str(SIZE), optimizer],
        capture_output=True, text=True, check=True,
        env={**os.environ},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--optimizer", default="adam",
                    choices=("adam", "lbfgs"))
    ap.add_argument("--tiers", default="highest,mixed,high")
    args = ap.parse_args()
    ref = run("cpu", "highest", args.optimizer)
    for tier in args.tiers.split(","):
        got = run("default", tier, args.optimizer)
        rel = max(
            abs(a - b) / max(abs(b), 1e-12) for a, b in zip(got, ref)
        )
        print(json.dumps({
            "metric": "loss_curve_max_rel_dev_vs_cpu_f32",
            "optimizer": args.optimizer,
            "precision": tier, "steps": STEPS, "size": SIZE,
            "max_rel_dev": f"{rel:.3e}",
            "within_1e3_gate": rel < 1e-3,
        }), flush=True)


if __name__ == "__main__":
    main()
