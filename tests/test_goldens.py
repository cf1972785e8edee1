"""Golden-regression corpus: every mode's pixels vs committed goldens.

Round-4 verdict weak #5: internal-consistency tests (sharded ==
unsharded, banded == whole) cannot catch a change that drifts both
paths identically — e.g. a target-computation bug. Each test here runs
one seeded 64px problem through a mode and compares the output image
against tests/goldens/<mode>.png by SSIM and mean absolute difference.

If a test goes red after an INTENTIONAL numeric change, regenerate with
``python tools/refresh_goldens.py`` and say why in the commit (the
refresh tool's docstring defines what counts as legitimate). Runners,
inputs, and bounds live in tests/goldens_lib.py, shared with the tool.
"""
from __future__ import annotations

import pytest

from tests.goldens_lib import (
    GOLDENS_DIR,
    MAD_MAX,
    MODES,
    SSIM_MIN,
    compare,
    write_inputs,
)


@pytest.mark.parametrize("mode", sorted(MODES))
def test_golden(mode: str, tmp_path) -> None:
    golden = GOLDENS_DIR / f"{mode}.png"
    assert golden.exists(), (
        f"missing golden for {mode}; run python tools/refresh_goldens.py"
    )
    inputs = write_inputs(tmp_path / "inputs")
    out_dir = tmp_path / mode
    out_dir.mkdir()
    produced = MODES[mode](inputs, out_dir)
    ssim, mad = compare(produced, golden)
    assert ssim >= SSIM_MIN and mad <= MAD_MAX, (
        f"{mode} drifted from its golden (ssim={ssim:.4f} < {SSIM_MIN} "
        f"or mad={mad:.2f} > {MAD_MAX}); if the change is intentional, "
        "regenerate via tools/refresh_goldens.py and explain in the "
        "commit"
    )
