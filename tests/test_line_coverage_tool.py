"""Unit tests for the arc-accurate branch model in tools/line_coverage.py.

The tool is the air-gapped rig's substitute for coverage.py's branch
accounting (round-4 verdict weak #4); these tests pin its static model:
which constructs form branch units, what their outcomes are, and that
the CLI flag parsing fails usefully (round-4 advisor findings).
"""
from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
import line_coverage as lc  # noqa: E402

_SAMPLE = '''\
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    import os


def f(x, items):
    if x > 0:
        y = 1
    else:
        y = 2
    while y < 10:
        y += 1
    for item in items:
        y += item
    if x > 0: y += 1
    z = 1 if x else 2
    assert y >= 0
    cond = (x > 0
            and y > 0)
    if (x > 0
            and y > 0):
        z += 1
    return [i for i in items], y, z, cond


if __name__ == "__main__":
    f(1, [2])
'''


@pytest.fixture
def sample(tmp_path: Path) -> Path:
    path = tmp_path / "sample.py"
    path.write_text(_SAMPLE)
    return path


class TestStaticModel:
    def test_unit_anchors(self, sample: Path) -> None:
        """if/while/for/comprehension form units; TYPE_CHECKING and
        __main__ guards, ternaries, asserts, and bare boolean
        expressions do not."""
        units, _sites = lc._static_branch_model(sample)
        anchors = sorted(u.anchor for u in units)
        # 8: if/else; 12: while; 14: for; 21: multiline if (anchored at
        # the `if` keyword line). Not units: line 3 (TYPE_CHECKING), 16
        # (one-line `if x: y` — invisible at line level, as in
        # coverage.py), 17 (ternary), 18 (assert), 19-20 (bare boolop),
        # 24 (single-line comprehension), 27 (__main__).
        assert anchors == [8, 12, 14, 21]

    def test_if_else_has_two_line_outcomes(self, sample: Path) -> None:
        units, _ = lc._static_branch_model(sample)
        unit = next(u for u in units if u.anchor == 8)
        kinds = {m[0] for m in unit.outcomes}
        assert len(unit.outcomes) == 2
        assert kinds == {"line"}

    def test_while_loop_has_body_and_exit_outcomes(
        self, sample: Path,
    ) -> None:
        """The compiler's two jump copies of a `while` condition (entry
        test + loop-back test) collapse into ONE unit with body/exit
        line outcomes — the pattern the old dynamic heuristic needed
        its unsound union clause for."""
        units, _ = lc._static_branch_model(sample)
        unit = next(u for u in units if u.anchor == 12)
        assert unit.sites == 2
        assert unit.outcomes == {("line", 13), ("line", 14)}

    def test_multiline_condition_is_one_unit(self, sample: Path) -> None:
        """`if (a\\n and b):` — the clause hop is condition-internal;
        only the two statement-level outcomes count (coverage.py
        statement semantics)."""
        units, _ = lc._static_branch_model(sample)
        unit = next(u for u in units if u.anchor == 21)
        assert unit.sites == 2  # two short-circuit clauses
        assert len(unit.outcomes) == 2

    def test_sites_map_to_units(self, sample: Path) -> None:
        units, sites = lc._static_branch_model(sample)
        assert set(sites.values()) <= set(units)
        # Every live unit has at least one bytecode site.
        assert {id(u) for u in sites.values()} == {id(u) for u in units}


class TestFailUnderParsing:
    def test_missing_value_is_usage_error(self) -> None:
        with pytest.raises(SystemExit) as exc:
            lc._parse_fail_under(["--fail-under-lines"])
        assert exc.value.code == 2

    def test_non_numeric_value_is_usage_error(self) -> None:
        with pytest.raises(SystemExit) as exc:
            lc._parse_fail_under(["--fail-under-branch", "lots"])
        assert exc.value.code == 2

    def test_values_extracted_and_rest_kept(self) -> None:
        lines, branch, kept = lc._parse_fail_under(
            ["tests/", "--fail-under-lines", "100",
             "--fail-under-branch", "99.5", "-q"],
        )
        assert (lines, branch) == (100.0, 99.5)
        assert kept == ["tests/", "-q"]

    def test_branch_bar_with_no_branch_rejected(self) -> None:
        """--fail-under-branch combined with --no-branch is a usage
        error instead of a silent pass."""
        rc = lc.main(["--no-branch", "--fail-under-branch", "100"])
        assert rc == 2
