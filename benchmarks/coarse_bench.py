"""Measure the coarse-to-fine warm start: loss vs wall-clock budget.

Compares three runs of the BASELINE configs[0]-shaped problem (512px
Adam by default):

  cold      — random init, N full-res steps
  warm      — coarse_steps half-res steps, upsample, then full-res
              steps trimmed so TOTAL cost matches the cold run
              (half-res steps are ~4x cheaper; measured, not assumed)
  warm-full — the warm start plus the full N (quality ceiling check)

Prints one JSON line per run with the final full-res loss and wall
time, plus a summary line: the full-res-step equivalent the warm
start saves at matched loss.

With ``--pyramid-levels L > 2`` a fourth run measures the multi-scale
ladder (engine/coarse.py plan_pyramid): the same coarse budget split
across L-1 levels, cost-matched against the cold run by the ladder's
own measured wall time.

Usage:
    python benchmarks/coarse_bench.py --size 512 --steps 300 \
        --coarse-steps 150 --precision mixed [--pyramid-levels 3]
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

SL, CL = (0, 5, 10, 19, 28), (21,)
CHUNK = 25


def _fresh(state):
    """Deep-copy optimizer state (the chunked path donates its carries)."""
    return jax.tree_util.tree_map(jnp.array, state)


def _run_steps(bundle, x, state, steps):
    remaining = steps
    aux = None
    while remaining > 0:
        k = min(CHUNK, remaining)
        x, state, aux = bundle.chunked_update_fn(x, state, k)
        remaining -= k
    jax.block_until_ready(x)
    return x, state, aux


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--coarse-steps", type=int, default=150)
    ap.add_argument("--precision", default="mixed")
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument(
        "--pyramid-levels", type=int, default=2,
        help="Add a multi-scale-ladder run at this pyramid depth (>2).",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="Pin the CPU platform (the axon plugin ignores "
             "JAX_PLATFORMS; this must happen before first backend use).",
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    params = vgg19.init_random_params(jax.random.key(0))
    size = args.size
    key = jax.random.key(1)
    content = jax.random.uniform(key, (1, size, size, 3), jnp.float32)
    style = jax.random.uniform(
        jax.random.fold_in(key, 1), (1, size, size, 3), jnp.float32,
    )
    common = dict(
        optimizer="adam", lr=args.lr, style_w=1e5, content_w=1.0,
        style_layers=SL, content_layers=CL, precision=args.precision,
    )
    targets = compute_targets(params, style, content, SL, CL)
    bundle = build_update_step(
        params, targets, tuple(content.shape), **common,
    )

    half = size // 2
    c_half = jax.image.resize(content, (1, half, half, 3), "linear")
    s_half = jax.image.resize(style, (1, half, half, 3), "linear")
    targets_half = compute_targets(params, s_half, c_half, SL, CL)
    bundle_half = build_update_step(
        params, targets_half, tuple(c_half.shape), **common,
    )

    # Warm both executables (compile) before timing.
    x0 = initialize_input(content, "random", jax.random.key(2))
    _run_steps(bundle, jnp.array(x0), _fresh(bundle.opt_state), CHUNK)
    x0h = initialize_input(c_half, "random", jax.random.key(2))
    _run_steps(bundle_half, jnp.array(x0h), _fresh(bundle_half.opt_state), CHUNK)

    # Measure the half/full step cost ratio on this machine.
    t0 = time.perf_counter()
    _run_steps(bundle, jnp.array(x0), _fresh(bundle.opt_state), CHUNK)
    full_per_step = (time.perf_counter() - t0) / CHUNK
    t0 = time.perf_counter()
    _run_steps(bundle_half, jnp.array(x0h), _fresh(bundle_half.opt_state), CHUNK)
    half_per_step = (time.perf_counter() - t0) / CHUNK
    ratio = half_per_step / full_per_step

    def report(label, loss_curve, seconds):
        print(json.dumps({
            "run": label, "size": size, "precision": args.precision,
            "final_loss": round(float(loss_curve), 4),
            "seconds": round(seconds, 2),
        }), flush=True)

    # Cold: N full-res steps.
    t0 = time.perf_counter()
    x, st, aux = _run_steps(
        bundle, jnp.array(x0), _fresh(bundle.opt_state), args.steps,
    )
    cold_s = time.perf_counter() - t0
    cold_loss = float(aux.loss[-1])
    report("cold", cold_loss, cold_s)

    # Warm, cost-matched: coarse_steps at half res costs
    # coarse_steps*ratio full-res equivalents; trim the full-res budget.
    equiv = max(1, round(args.coarse_steps * ratio))
    budget = max(1, args.steps - equiv)
    t0 = time.perf_counter()
    xh, sth, _ = _run_steps(
        bundle_half, jnp.array(x0h), _fresh(bundle_half.opt_state),
        args.coarse_steps,
    )
    x_warm0 = jax.image.resize(xh, (1, size, size, 3), "linear")
    x, st, aux = _run_steps(
        bundle, x_warm0, _fresh(bundle.opt_state), budget,
    )
    warm_s = time.perf_counter() - t0
    warm_loss = float(aux.loss[-1])
    report(f"warm (coarse {args.coarse_steps} + full {budget})",
           warm_loss, warm_s)

    # Warm, full budget (ceiling).
    t0 = time.perf_counter()
    xh, sth, _ = _run_steps(
        bundle_half, jnp.array(x0h), _fresh(bundle_half.opt_state),
        args.coarse_steps,
    )
    x_warm0 = jax.image.resize(xh, (1, size, size, 3), "linear")
    x, st, aux = _run_steps(bundle, x_warm0, _fresh(bundle.opt_state), args.steps)
    report(f"warm-full (coarse {args.coarse_steps} + full {args.steps})",
           float(aux.loss[-1]), time.perf_counter() - t0)

    print(json.dumps({
        "summary": "half/full step cost ratio",
        "ratio": round(ratio, 3),
        "coarse_equiv_full_steps": equiv,
        "cost_matched_budget": budget,
        "cold_loss": round(cold_loss, 4),
        "warm_loss": round(warm_loss, 4),
        "warm_beats_cold_at_equal_cost": warm_loss < cold_loss,
    }), flush=True)

    if args.pyramid_levels > 2:  # noqa: PLR2004
        from style_transfer_visualizer_tpu.engine.coarse import (
            plan_pyramid,
        )

        schedule = plan_pyramid(
            size, size, args.coarse_steps, args.pyramid_levels,
        )
        level_bundles = []
        for ch, cw, lsteps in schedule:
            c_l = jax.image.resize(content, (1, ch, cw, 3), "linear")
            s_l = jax.image.resize(style, (1, ch, cw, 3), "linear")
            t_l = compute_targets(params, s_l, c_l, SL, CL)
            b_l = build_update_step(params, t_l, tuple(c_l.shape), **common)
            level_bundles.append((ch, cw, lsteps, c_l, b_l))
            # Warm the executable so the timed ladder is compile-free.
            x_w = initialize_input(c_l, "random", jax.random.key(2))
            _run_steps(b_l, x_w, _fresh(b_l.opt_state), 1)

        def run_ladder():
            x_lvl = None
            for ch, cw, lsteps, c_l, b_l in level_bundles:
                x = (
                    initialize_input(c_l, "random", jax.random.key(2))
                    if x_lvl is None
                    else jax.image.resize(x_lvl, (1, ch, cw, 3), "linear")
                )
                x_lvl, _, _ = _run_steps(
                    b_l, x, _fresh(b_l.opt_state), lsteps,
                )
            return jax.image.resize(x_lvl, (1, size, size, 3), "linear")

        t0 = time.perf_counter()
        x_warm0 = run_ladder()
        jax.block_until_ready(x_warm0)
        ladder_s = time.perf_counter() - t0
        ladder_equiv = max(1, round(ladder_s / full_per_step))
        ladder_budget = max(1, args.steps - ladder_equiv)
        t0 = time.perf_counter()
        x, st, aux = _run_steps(
            bundle, x_warm0, _fresh(bundle.opt_state), ladder_budget,
        )
        pyramid_s = ladder_s + (time.perf_counter() - t0)
        pyramid_loss = float(aux.loss[-1])
        report(
            f"pyramid-L{args.pyramid_levels} "
            f"(ladder {args.coarse_steps} + full {ladder_budget})",
            pyramid_loss, pyramid_s,
        )
        print(json.dumps({
            "summary": "pyramid vs single-level warm (equal cost)",
            "levels": args.pyramid_levels,
            "schedule": [list(s[:3]) for s in level_bundles],
            "ladder_seconds": round(ladder_s, 2),
            "ladder_equiv_full_steps": ladder_equiv,
            "pyramid_loss": round(pyramid_loss, 4),
            "warm_loss": round(warm_loss, 4),
            "cold_loss": round(cold_loss, 4),
            "pyramid_beats_warm": pyramid_loss < warm_loss,
        }), flush=True)


if __name__ == "__main__":
    main()
