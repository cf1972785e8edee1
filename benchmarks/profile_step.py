"""Capture a jax.profiler trace of the production 512px step.

Writes a TensorBoard xplane trace under --out (default
/tmp/stv_profile) and, when tensorflow is importable, prints the
top device ops by self-time so the attribution lands in BASELINE.md
without needing a TensorBoard UI.
"""
import argparse
import glob
import gzip
import json
import time

import jax
import jax.numpy as jnp

from style_transfer_visualizer_tpu.engine.step import build_update_step
from style_transfer_visualizer_tpu.utils.cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()
from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.features import (
    compute_targets,
    initialize_input,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--precision", default="high")
    ap.add_argument("--k", type=int, default=25)
    ap.add_argument("--out", default="/tmp/stv_profile")
    args = ap.parse_args()

    params = vgg19.init_random_params(jax.random.key(0))
    sl, cl = (0, 5, 10, 19, 28), (21,)
    key = jax.random.key(1)
    shape = (1, args.size, args.size, 3)
    content = jax.random.uniform(key, shape, jnp.float32)
    style = jax.random.uniform(jax.random.fold_in(key, 1), shape, jnp.float32)
    targets = compute_targets(params, style, content, sl, cl)
    x = initialize_input(content, "random", jax.random.key(2))

    bundle = build_update_step(
        params, targets, shape,
        optimizer="adam", lr=0.05, style_w=1e5, content_w=1.0,
        style_layers=sl, content_layers=cl, precision=args.precision,
    )
    state = bundle.opt_state

    # Warm up / compile the chunked executable outside the trace.
    x, state, _ = bundle.chunked_update_fn(x, state, args.k)
    jax.block_until_ready(x)

    # Dump the optimized HLO so op names in the trace can be attributed
    # back to jax source lines.
    hlo_path = f"{args.out}/step_hlo.txt"
    try:
        jitted_multi = bundle.chunked_update_fn.__closure__[0].cell_contents
        lowered = jitted_multi.lower(x, state, params, targets, args.k)
        import pathlib
        pathlib.Path(args.out).mkdir(parents=True, exist_ok=True)
        pathlib.Path(hlo_path).write_text(lowered.compile().as_text())
    except Exception as exc:  # noqa: BLE001
        print(f"HLO dump failed: {exc}")
        hlo_path = None

    with jax.profiler.trace(args.out):
        t0 = time.perf_counter()
        x, state, _ = bundle.chunked_update_fn(x, state, args.k)
        jax.block_until_ready(x)
        wall = time.perf_counter() - t0
    print(json.dumps({
        "k": args.k, "wall_ms_per_step": round(wall / args.k * 1000, 3),
        "trace_dir": args.out,
    }))

    summarize(args.out, args.k, hlo_path)


def summarize(out_dir: str, k: int, hlo_path: str | None = None) -> None:
    """Group device-op time by source op, from the trace-viewer JSON.

    When ``hlo_path`` (an optimized-HLO text dump) is given, each HLO op
    name is attributed back to its jax-level op + source line via the
    ``metadata={op_name=...}`` annotations.
    """
    import collections
    import re

    paths = sorted(
        glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True),
    )
    if not paths:
        print("no trace.json.gz found")
        return
    meta: dict[str, tuple[str, str | None]] = {}
    if hlo_path:
        hlo = open(hlo_path).read()
        pat = (
            r"%([\w.\-]+) = [^\n]*?metadata=\{op_name=\"([^\"]+)\""
            r"(?:[^\n]*?source_line=(\d+))?"
        )
        for m in re.finditer(pat, hlo):
            meta[m.group(1)] = (m.group(2), m.group(3))
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {
        e["pid"]: e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    groups: collections.Counter = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or "TPU" not in pids.get(e.get("pid"), ""):
            continue
        n = e["name"]
        if n.startswith(("jit_", "while")) or n == "0":
            continue
        dur = e.get("dur", 0)
        total += dur
        mm = meta.get(n)
        if mm:
            op, line = mm
            direction = "bwd" if "transpose(" in op else "fwd"
            groups[f"{direction}:{op.split('/')[-1]}:L{line}"] += dur
        else:
            groups[re.sub(r"[.\d]+$", "", n)] += dur
    print(f"device-op total: {total / k / 1000:.3f} ms/step")
    for name, us in groups.most_common(30):
        print(f"{us / k / 1000:8.4f} ms/step  {name}")


if __name__ == "__main__":
    main()
