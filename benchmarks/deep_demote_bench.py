"""Deep-conv demotion candidates for the mixed precision policy.

The mixed tier (ops/precision.py::MIXED) keeps VGG blocks 1-2 at
HIGHEST because error attribution showed they dominate per-eval loss
error; everything else runs bf16x3 (HIGH) forward, bf16x3 backward.
The one untried forward lever is the *deep* end: the block-4/5 convs
(torchvision indices 19/21/23/25/28 — the last style tap is 28, so
block 5 runs only its first conv) carry ~45% of the executed conv
FLOPs at 512px but contributed little per-eval error at the HIGH
tier. This bench measures whether demoting them to 1-pass bf16
(DEFAULT) — optionally together with block 3 (10/12/14/16) — still
holds the 1e-3 100-step curve-parity gate, and what it buys at 512px.

Candidates (all deltas vs MIXED):
  deep-fwd      forward convs 19..28 at DEFAULT
  deep-fwd-mid  forward convs 10..28 at DEFAULT
  deep-both     forward AND backward convs 19..28 at DEFAULT

Usage:
  python benchmarks/deep_demote_bench.py --mode parity
  python benchmarks/deep_demote_bench.py --mode speed

Parity mode mirrors benchmarks/curve_parity_bench.py (100-step Adam at
256px vs a CPU-f32 subprocess ground truth); speed mode mirrors
bench.py's chunked 512px measurement. Results land in BASELINE.md with
an accept/reject verdict, like the gram/conv-backend and
space-to-depth studies before it.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

STEPS = 100
PARITY_SIZE = 256
SPEED_SIZE = 512

# Runs inside a fresh process so backend choice (cpu vs device) and the
# experimental-tier registration happen before jax initializes.
_CHILD = r"""
import json, sys, time
from dataclasses import replace
import jax
mode, backend, tier = sys.argv[1], sys.argv[2], sys.argv[3]
steps, size = int(sys.argv[4]), int(sys.argv[5])
if backend == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from style_transfer_visualizer_tpu.engine import step as step_mod
from style_transfer_visualizer_tpu.engine.step import (
    build_update_step, resolve_precision,
)
from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.features import (
    compute_targets, initialize_input,
)
from style_transfer_visualizer_tpu.ops.precision import MIXED
from style_transfer_visualizer_tpu.utils.cache import (
    enable_persistent_compilation_cache,
)
enable_persistent_compilation_cache()

D = jax.lax.Precision.DEFAULT
DEEP = (19, 21, 23, 25, 28)
MID = (10, 12, 14, 16)
step_mod._PRECISIONS.update({
    "deep-fwd": replace(
        MIXED,
        conv_overrides=MIXED.conv_overrides + tuple((i, D) for i in DEEP),
    ),
    "deep-fwd-mid": replace(
        MIXED,
        conv_overrides=MIXED.conv_overrides
        + tuple((i, D) for i in DEEP + MID),
    ),
    "deep-both": replace(
        MIXED,
        conv_overrides=MIXED.conv_overrides + tuple((i, D) for i in DEEP),
        conv_bwd_overrides=tuple((i, D) for i in DEEP),
    ),
    "deep-both-mid": replace(
        MIXED,
        conv_overrides=MIXED.conv_overrides
        + tuple((i, D) for i in DEEP + MID),
        conv_bwd_overrides=tuple((i, D) for i in DEEP + MID),
    ),
})

params = vgg19.init_random_params(jax.random.key(0))
sl, cl = (0, 5, 10, 19, 28), (21,)
key = jax.random.key(1)
shape = (1, size, size, 3)
content = jax.random.uniform(key, shape, jnp.float32)
style = jax.random.uniform(jax.random.fold_in(key, 1), shape, jnp.float32)
targets = compute_targets(
    params, style, content, sl, cl, resolve_precision(tier),
)
bundle = build_update_step(
    params, targets, shape, optimizer="adam", lr=0.05,
    style_w=1e5, content_w=1.0, style_layers=sl, content_layers=cl,
    precision=tier,
)
x = initialize_input(content, "random", jax.random.key(2))
state = bundle.opt_state
if mode == "parity":
    losses = []
    for _ in range(steps):
        x, state, aux = bundle.update_fn(x, state)
        losses.append(aux.loss)
    print(json.dumps([float(v) for v in losses]))
else:
    chunk = min(25, steps)
    x, state, aux = bundle.chunked_update_fn(x, state, chunk)
    jax.block_until_ready(x)
    best = float("inf")
    for _ in range(max(steps // chunk, 3)):
        start = time.perf_counter()
        x, state, aux = bundle.chunked_update_fn(x, state, chunk)
        jax.block_until_ready(x)
        best = min(best, time.perf_counter() - start)
    print(json.dumps({"steps_per_sec": chunk / best}))
"""

CANDIDATES = (
    "mixed", "deep-fwd", "deep-fwd-mid", "deep-both", "deep-both-mid",
)


def run(mode: str, backend: str, tier: str, steps: int, size: int) -> object:
    out = subprocess.run(  # noqa: S603 (self-invocation)
        [sys.executable, "-c", _CHILD, mode, backend, tier,
         str(steps), str(size)],
        capture_output=True, text=True, check=True, env={**os.environ},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="parity", choices=("parity", "speed"))
    ap.add_argument("--tiers", default=",".join(CANDIDATES))
    args = ap.parse_args()
    tiers = args.tiers.split(",")

    if args.mode == "speed":
        for tier in tiers:
            got = run("speed", "device", tier, 150, SPEED_SIZE)
            print(json.dumps({
                "metric": "adam_steps_per_sec_512px", "precision": tier,
                "value": round(got["steps_per_sec"], 2),
            }), flush=True)
        return

    ref = run("parity", "cpu", "highest", STEPS, PARITY_SIZE)
    for tier in tiers:
        got = run("parity", "device", tier, STEPS, PARITY_SIZE)
        rel = max(
            abs(a - b) / max(abs(b), 1e-12) for a, b in zip(got, ref)
        )
        print(json.dumps({
            "metric": "loss_curve_max_rel_dev_vs_cpu_f32",
            "precision": tier, "steps": STEPS, "size": PARITY_SIZE,
            "max_rel_dev": f"{rel:.3e}",
            "within_1e3_gate": rel < 1e-3,
        }), flush=True)


if __name__ == "__main__":
    main()
