"""Headline benchmark: optimizer steps/sec at 512px on the local device.

Runs the BASELINE.json configs[0] workload — full VGG19 feature stack,
style layers (0,5,10,19,28), content layer 21, Adam on the pixels
(exactly one fused forward+backward+update per step) — on a 512x512
image and reports steady-state steps/sec.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}

``vs_baseline`` is relative to the reference implementation's hot loop
on CPU (measured by benchmarks/reference_cpu_baseline.py on this
machine; see BASELINE.md). The same line also carries the L-BFGS rate
at the reference's *default* workload (lr=1, max_iter/max_eval=1,
history 100 — config_defaults.py:5-13 and torch's LBFGS default) as
``lbfgs_steps_per_sec_512px`` / ``lbfgs_vs_baseline`` (vs the 0.1351
steps/s torch-CPU L-BFGS baseline), so the flagship configuration has
a recorded speed on the flagship hardware; Adam stays the primary
metric because its smooth fixed-step dynamics are what the 1e-3
curve-parity gate is certified on (BASELINE.md).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

# Reference (torch CPU, identical workload: VGG19 taps, Gram+MSE loss,
# Adam) measured on this host; LBFGS variant measured at 0.1351.
# See BASELINE.md.
REFERENCE_CPU_STEPS_PER_SEC = 0.137  # steps/s, 512px, torch 2.13 CPU
REFERENCE_CPU_LBFGS_STEPS_PER_SEC = 0.1351  # same rig, L-BFGS default

# Certified headline bands on the bench rig (v5e via axon), BASELINE.md
# "certified band": the r04 measurements +/- the observed ~5% run-to-run
# spread. A result outside its band is recorded (in_certified_band:
# false + a stderr warning), never failed — the band's job is to make
# silent drift visible in BENCH_r*.json, not to gate on a noisy rig.
ADAM_CERTIFIED_BAND = (48.9, 54.1)  # around 51.50 steps/s
LBFGS_CERTIFIED_BAND = (42.4, 46.9)  # around 44.66 steps/s

# Env overrides exist for driving the harness itself (smoke tests,
# CPU-only rigs); the headline contract is the 512px/150-step default.
SIZE = int(os.environ.get("STV_BENCH_SIZE", "512"))
TIMED_STEPS = int(os.environ.get("STV_BENCH_STEPS", "150"))


def main() -> None:
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it
    # here so `JAX_PLATFORMS=cpu python bench.py` works as documented
    # (useful for driving the harness itself without the tunnel).
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from style_transfer_visualizer_tpu.engine.step import build_update_step
    from style_transfer_visualizer_tpu.utils.cache import (
        enable_persistent_compilation_cache,
    )

    # Remote compiles on this class of backend can take minutes cold
    # (BASELINE.md backend notes); the persistent cache makes every run
    # after the first start in seconds.
    enable_persistent_compilation_cache()
    from style_transfer_visualizer_tpu.models import vgg19
    from style_transfer_visualizer_tpu.models.features import (
        compute_targets,
        initialize_input,
    )

    params = vgg19.init_random_params(jax.random.key(0))
    style_layers = (0, 5, 10, 19, 28)
    content_layers = (21,)

    key = jax.random.key(1)
    content = jax.random.uniform(key, (1, SIZE, SIZE, 3), jnp.float32)
    style = jax.random.uniform(
        jax.random.fold_in(key, 1), (1, SIZE, SIZE, 3), jnp.float32,
    )
    targets = compute_targets(
        params, style, content, style_layers, content_layers,
    )
    # Precision and chunk resolve from the production defaults, never
    # hardcoded (tests/test_bench_configs.py pins the equivalence).
    from style_transfer_visualizer_tpu import config_defaults as d
    from style_transfer_visualizer_tpu.engine.runner import DEFAULT_CHUNK

    bundle = build_update_step(
        params, targets, tuple(content.shape),
        optimizer="adam", lr=0.05, style_w=1e5, content_w=1.0,
        style_layers=style_layers, content_layers=content_layers,
        precision=d.DEFAULT_PRECISION,  # parity-grade "mixed"
    )

    x = initialize_input(content, "random", jax.random.key(2))
    state = bundle.opt_state
    # The production runner fuses steps into one dispatch when no
    # cadence constrains alignment (runner._resolve_chunk_size); this
    # measures exactly that path.
    chunk = min(DEFAULT_CHUNK, TIMED_STEPS)
    x, state, aux = bundle.chunked_update_fn(x, state, chunk)  # compile
    jax.block_until_ready(x)

    # Time several dispatches and score the best one: some TPU runtimes
    # evict and recompile executables mid-run, and a single multi-second
    # hiccup would otherwise swamp the steady-state rate.
    best = float("inf")
    for _ in range(TIMED_STEPS // chunk):
        start = time.perf_counter()
        x, state, aux = bundle.chunked_update_fn(x, state, chunk)
        jax.block_until_ready(x)
        best = min(best, time.perf_counter() - start)

    steps_per_sec = chunk / best

    # Secondary metric: the reference's DEFAULT workload — L-BFGS at
    # lr=1, max_iter=max_eval=1, history 100 — run at THIS pipeline's
    # defaults (bfloat16 ring + compact direction, the round-4
    # re-decision), pulled from config_defaults so the bench always
    # measures the configuration a default CLI run would execute.
    lbfgs = build_update_step(
        params, targets, tuple(content.shape),
        optimizer="lbfgs", lr=1.0, style_w=1e5, content_w=1.0,
        style_layers=style_layers, content_layers=content_layers,
        precision=d.DEFAULT_PRECISION,
        lbfgs_max_iter=d.DEFAULT_LBFGS_MAX_ITER,
        lbfgs_max_eval=d.DEFAULT_LBFGS_MAX_EVAL,
        lbfgs_history_size=d.DEFAULT_LBFGS_HISTORY_SIZE,
        lbfgs_history_dtype=d.DEFAULT_LBFGS_HISTORY_DTYPE,
        lbfgs_direction=d.DEFAULT_LBFGS_DIRECTION,
    )
    x = initialize_input(content, "random", jax.random.key(2))
    state = lbfgs.opt_state
    x, state, aux = lbfgs.chunked_update_fn(x, state, chunk)  # compile
    jax.block_until_ready(x)
    lbfgs_best = float("inf")
    for _ in range(TIMED_STEPS // chunk):
        start = time.perf_counter()
        x, state, aux = lbfgs.chunked_update_fn(x, state, chunk)
        jax.block_until_ready(x)
        lbfgs_best = min(lbfgs_best, time.perf_counter() - start)
    lbfgs_steps_per_sec = chunk / lbfgs_best

    # Self-audit (round-4 verdict weak #3): analytic FLOPs for THIS
    # measured config, achieved TFLOP/s, fraction of v5e bf16 peak, and
    # ms/step — so a regression hiding inside the headline's noise band
    # still shows as a drifted efficiency number — plus a check against
    # the BASELINE.md certified band (warn-and-record, never fail).
    # tests/test_flops.py pins the FLOPs model to the arch layer tables.
    from style_transfer_visualizer_tpu.models.arch import (
        layer_table_from_params,
    )
    from style_transfer_visualizer_tpu.utils.flops import audit_fields

    table = layer_table_from_params(params)
    audit = audit_fields(
        table, SIZE, SIZE, style_layers, content_layers, steps_per_sec,
    )
    lbfgs_ms = round(1000.0 / lbfgs_steps_per_sec, 3)
    is_default_config = SIZE == 512 and jax.default_backend() == "tpu"
    in_band: bool | None = None
    if is_default_config:
        in_band = (
            ADAM_CERTIFIED_BAND[0] <= steps_per_sec <= ADAM_CERTIFIED_BAND[1]
        ) and (
            LBFGS_CERTIFIED_BAND[0]
            <= lbfgs_steps_per_sec
            <= LBFGS_CERTIFIED_BAND[1]
        )
        if not in_band:
            print(
                f"WARNING: result outside the certified band — adam "
                f"{steps_per_sec:.2f} vs {ADAM_CERTIFIED_BAND}, lbfgs "
                f"{lbfgs_steps_per_sec:.2f} vs {LBFGS_CERTIFIED_BAND} "
                f"(see BASELINE.md)",
                file=sys.stderr,
            )

    print(
        json.dumps(
            {
                "metric": "adam_steps_per_sec_512px",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(
                    steps_per_sec / REFERENCE_CPU_STEPS_PER_SEC, 2,
                ),
                "lbfgs_steps_per_sec_512px": round(lbfgs_steps_per_sec, 3),
                "lbfgs_vs_baseline": round(
                    lbfgs_steps_per_sec / REFERENCE_CPU_LBFGS_STEPS_PER_SEC,
                    2,
                ),
                "lbfgs_ms_per_step": lbfgs_ms,
                "in_certified_band": in_band,
                **audit,
            },
        ),
    )


def _run_with_retries(
    attempts: int = int(os.environ.get("STV_BENCH_ATTEMPTS", "3")),
    backoff_s: float = float(os.environ.get("STV_BENCH_BACKOFF", "90")),
) -> int:
    """Run the measurement in a child process, retrying on failure.

    The TPU tunnel on this class of rig can be transiently unavailable
    (backend init blocks for minutes, then raises UNAVAILABLE); one
    mid-run hiccup should not cost the benchmark its headline number.
    The child prints the JSON line; the parent forwards only that line
    to stdout so the contract (ONE JSON line) holds across retries.
    """
    env = dict(os.environ, STV_BENCH_CHILD="1")
    last_rc = 1
    for attempt in range(attempts):
        if attempt:
            time.sleep(backoff_s)
        proc = subprocess.run(  # noqa: S603 (self-invocation)
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            stdout=subprocess.PIPE,
            text=True,
            check=False,
        )
        json_line = next(
            (
                ln
                for ln in reversed(proc.stdout.splitlines())
                if ln.startswith("{")
            ),
            None,
        )
        if proc.returncode == 0 and json_line is not None:
            print(json_line)
            return 0
        last_rc = proc.returncode or 1
        print(
            f"bench attempt {attempt + 1}/{attempts} failed "
            f"(rc={proc.returncode}); retrying",
            file=sys.stderr,
        )
    return last_rc


if __name__ == "__main__":
    if os.environ.get("STV_BENCH_CHILD"):
        main()
    else:
        sys.exit(_run_with_retries())
