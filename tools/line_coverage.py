"""Zero-dependency line + branch coverage for rigs without coverage.py.

This container has no network egress and no ``coverage``/``pytest-cov``
wheels, but the reference project gates changes on branch coverage
(``/root/reference/pyproject.toml:126``, ``CONTRIBUTING.md:38``). This
tool fills the gap with :mod:`sys.monitoring` (PEP 669, Python 3.12+):
it runs pytest in-process, records each executed line of the package
exactly once (the callback disables itself per location, so steady-state
overhead is near zero), and reports per-file missing-line ranges.

It also records BRANCH events: every conditional-branch site that fires
is tracked until both of its destinations have been taken. A *source
line* counts as a fully covered branch line when either (a) each of its
fired sites took two distinct destinations, or (b) its sites' taken
destinations span two or more distinct lines — clause (b) absorbs the
compiler's habit of emitting two jump instructions for one ``while``
condition (entry check + loop-back check), where each site alone may
only ever take one side even though both outcomes of the *condition*
were exercised.

Usage::

    python tools/line_coverage.py [pytest args...]
    # e.g. python tools/line_coverage.py tests/ -q
    # line-only (faster; partial branch sites keep their events live):
    python tools/line_coverage.py --no-branch tests/ -q
    # enforce the repo bar (exit 2 when under it):
    python tools/line_coverage.py tests/ -q \
        --fail-under-lines 100 --fail-under-branch 100

Caveats vs real coverage.py:

- Branch sites are discovered dynamically: a conditional on a line that
  never executes is reported as a missing *line*, not additionally as a
  missing branch.
- Code exercised only in subprocesses (the CLI integration tests, the
  real-TPU kernel tests) is NOT credited — treat per-file numbers as a
  lower bound and the missing-line ranges as leads, not verdicts.
- ``# pragma: no cover`` excludes that line only, plus any ``def``/
  ``class`` statement it annotates (the body is then unreachable from
  the report's perspective and is excluded wholesale).
- ``# pragma: no branch`` keeps a line in line coverage but exempts it
  from the both-directions requirement (coverage.py's convention for
  loops/conditions with a structurally one-way direction).
- Single-line compound conditions (``while x: y()``) whose entry and
  loop-back sites each see one side can read as partial; split the
  line or annotate ``no branch``.
"""

from __future__ import annotations

import ast
import bisect
import dis
import json
import sys
from pathlib import Path

PACKAGE = "style_transfer_visualizer_tpu"
REPO_ROOT = Path(__file__).resolve().parent.parent
PACKAGE_DIR = REPO_ROOT / PACKAGE

TOOL_ID = sys.monitoring.COVERAGE_ID

_executed: dict[str, set[int]] = {}

# Branch bookkeeping. Keyed by id(code) with the code object kept alive
# in _codes so ids are never recycled.
_codes: dict[int, object] = {}
_line_tables: dict[int, tuple[list[int], list[int]]] = {}
_arcs: dict[tuple[int, int], set[int]] = {}


def _on_line(code, line_number: int):  # noqa: ANN001, ANN202
    filename = code.co_filename
    if PACKAGE in filename and filename.endswith(".py"):
        _executed.setdefault(filename, set()).add(line_number)
    return sys.monitoring.DISABLE


def _on_branch(code, src_offset: int, dst_offset: int):  # noqa: ANN001, ANN202
    filename = code.co_filename
    if PACKAGE not in filename or not filename.endswith(".py"):
        return sys.monitoring.DISABLE
    cid = id(code)
    if cid not in _codes:
        _codes[cid] = code
    dsts = _arcs.setdefault((cid, src_offset), set())
    dsts.add(dst_offset)
    # Both sides seen: nothing more to learn at this site.
    if len(dsts) >= 2:
        return sys.monitoring.DISABLE
    return None


def _offset_to_line(cid: int, offset: int) -> int | None:
    """Resolve a bytecode offset to a source line via co_lines()."""
    tables = _line_tables.get(cid)
    if tables is None:
        starts: list[int] = []
        lines: list[int] = []
        for start, _end, lineno in _codes[cid].co_lines():  # type: ignore[attr-defined]
            starts.append(start)
            lines.append(lineno if lineno else 0)
        tables = (starts, lines)
        _line_tables[cid] = tables
    starts, lines = tables
    i = bisect.bisect_right(starts, offset) - 1
    if i < 0:
        return None
    return lines[i] or None


def _executable_lines(path: Path) -> set[int]:
    """Lines the compiler can attribute code to, minus no-cover spans."""
    source = path.read_text(encoding="utf-8")
    lines: set[int] = set()
    stack = [compile(source, str(path), "exec")]
    while stack:
        code = stack.pop()
        for _, _, lineno in code.co_lines():
            # Line 0 is the compiler's synthetic module-setup marker.
            if lineno:
                lines.add(lineno)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    excluded = _no_cover_lines(source, str(path))
    return lines - excluded


def _is_type_checking(test: ast.expr) -> bool:
    return (isinstance(test, ast.Name) and test.id == "TYPE_CHECKING") or (
        isinstance(test, ast.Attribute) and test.attr == "TYPE_CHECKING"
    )


def _is_main_guard(test: ast.expr) -> bool:
    return (
        isinstance(test, ast.Compare)
        and isinstance(test.left, ast.Name)
        and test.left.id == "__name__"
    )


def _no_cover_lines(source: str, filename: str) -> set[int]:
    """Never-executed-by-design lines, mirroring coverage.py defaults.

    ``# pragma: no cover`` lines (plus the body of any compound
    statement they annotate), ``if TYPE_CHECKING:`` blocks, and
    ``if __name__ == "__main__":`` blocks.
    """
    marked = {
        i
        for i, text in enumerate(source.splitlines(), start=1)
        if "pragma: no cover" in text
    }
    excluded = set(marked)
    tree = ast.parse(source, filename)
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.If)
            and (_is_type_checking(node.test) or _is_main_guard(node.test))
            and node.body
        ):
            # Exclude the test line and the guarded body (the else
            # branch, if any, is real runtime code and stays in).
            end = node.body[-1].end_lineno or node.body[-1].lineno
            excluded.update(range(node.lineno, end + 1))
    if not marked:
        return excluded
    for node in ast.walk(tree):
        if not isinstance(
            node,
            (
                ast.FunctionDef,
                ast.AsyncFunctionDef,
                ast.ClassDef,
                ast.If,
                ast.While,
                ast.For,
                ast.Try,
                ast.With,
                ast.ExceptHandler,
            ),
        ):
            continue
        header = node.lineno
        if header in marked and node.end_lineno is not None:
            excluded.update(range(header, node.end_lineno + 1))
    return excluded


def _interpreter_branch_offsets(code) -> set[int]:  # noqa: ANN001
    """Jump offsets that are interpreter plumbing, not source branches.

    ``except X:`` compiles to CHECK_EXC_MATCH + POP_JUMP_IF_FALSE and a
    ``with`` exit to WITH_EXCEPT_START + POP_JUMP_IF_TRUE; both fire
    BRANCH events only while an exception unwinds and are structurally
    one-way in a healthy suite (the other side is a non-matching
    exception class or a context manager that suppresses). coverage.py
    likewise does not treat them as branches.
    """
    skip: set[int] = set()
    instructions = list(dis.get_instructions(code))
    assertion_offsets = {
        ins.offset
        for ins in instructions
        if ins.opname == "LOAD_ASSERTION_ERROR"
    }
    prev = None
    prev_offset = 0
    for ins in instructions:
        if prev in {"CHECK_EXC_MATCH", "WITH_EXCEPT_START"}:
            skip.add(ins.offset)
        # ``assert`` compiles to jumps whose failing side raises
        # AssertionError — either as the fall-through of the final test
        # or as the jump target of an earlier short-circuit clause
        # (``assert a and b``). That side is never taken in a healthy
        # suite (coverage.py setups exclude asserts the same way).
        if ins.opname == "LOAD_ASSERTION_ERROR":
            skip.add(prev_offset)
        if (
            ins.opcode in dis.hasjabs + dis.hasjrel
            and ins.argval in assertion_offsets
        ):
            skip.add(ins.offset)
        prev = ins.opname
        prev_offset = ins.offset
    return skip


def _branch_status_by_file() -> dict[str, dict[int, bool]]:
    """Per file: {source line of a fired branch site: fully covered?}.

    A line is fully covered when every fired site on it took both
    destinations, or when the union of taken destinations across its
    sites spans >= 2 distinct lines (the two-jump ``while`` pattern).
    """
    per_line: dict[tuple[str, int], list[tuple[int, set[int]]]] = {}
    plumbing: dict[int, set[int]] = {}
    for (cid, src_offset), dsts in _arcs.items():
        code = _codes[cid]
        if cid not in plumbing:
            plumbing[cid] = _interpreter_branch_offsets(code)
        if src_offset in plumbing[cid]:
            continue
        src_line = _offset_to_line(cid, src_offset)
        if src_line is None:
            continue
        dst_lines = {
            ln
            for d in dsts
            if (ln := _offset_to_line(cid, d)) is not None
        }
        per_line.setdefault(
            (code.co_filename, src_line), [],  # type: ignore[attr-defined]
        ).append((len(dsts), dst_lines))

    import os

    debug = os.environ.get("STV_COV_DEBUG", "")
    result: dict[str, dict[int, bool]] = {}
    for (filename, line), sites in per_line.items():
        all_two = all(n >= 2 for n, _ in sites)
        union: set[int] = set()
        for _, dst_lines in sites:
            union |= dst_lines
        covered = all_two or len(union) >= 2
        if debug and debug in f"{filename}:{line}":
            print(
                f"[cov-debug] {filename}:{line} sites={sites} "
                f"union={sorted(union)} covered={covered}",
            )
        result.setdefault(filename, {})[line] = covered
    return result


def _no_branch_lines(source: str) -> set[int]:
    return {
        i
        for i, text in enumerate(source.splitlines(), start=1)
        if "pragma: no branch" in text
    }


def _ranges(lines: list[int]) -> str:
    """Compact 1,3-5,9 style rendering of sorted line numbers."""
    parts: list[str] = []
    start = prev = None
    for n in lines:
        if start is None:
            start = prev = n
            continue
        if n == prev + 1:
            prev = n
            continue
        parts.append(str(start) if start == prev else f"{start}-{prev}")
        start = prev = n
    if start is not None:
        parts.append(str(start) if start == prev else f"{start}-{prev}")
    return ",".join(parts)


def main(argv: list[str]) -> int:
    # `python -m pytest` puts the cwd on sys.path; running via this
    # script puts tools/ there instead, breaking `from tests...`
    # imports in the suite. Mirror the -m behavior.
    if str(REPO_ROOT) not in sys.path:
        sys.path.insert(0, str(REPO_ROOT))
    branch = True
    if "--no-branch" in argv:
        argv = [a for a in argv if a != "--no-branch"]
        branch = False
    fail_under_lines: float | None = None
    fail_under_branch: float | None = None
    kept: list[str] = []
    it = iter(argv)
    for arg in it:
        if arg == "--fail-under-lines":
            fail_under_lines = float(next(it))
        elif arg == "--fail-under-branch":
            fail_under_branch = float(next(it))
        else:
            kept.append(arg)
    argv = kept
    sys.monitoring.use_tool_id(TOOL_ID, "line_coverage")
    sys.monitoring.register_callback(
        TOOL_ID, sys.monitoring.events.LINE, _on_line,
    )
    events = sys.monitoring.events.LINE
    if branch:
        sys.monitoring.register_callback(
            TOOL_ID, sys.monitoring.events.BRANCH, _on_branch,
        )
        events |= sys.monitoring.events.BRANCH
    sys.monitoring.set_events(TOOL_ID, events)

    import pytest

    rc = pytest.main(argv)

    sys.monitoring.set_events(TOOL_ID, 0)
    sys.monitoring.free_tool_id(TOOL_ID)

    branch_status = _branch_status_by_file() if branch else {}

    rows = []
    total_exec = total_hit = 0
    total_br = total_br_hit = 0
    for path in sorted(PACKAGE_DIR.rglob("*.py")):
        source = path.read_text(encoding="utf-8")
        executable = _executable_lines(path)
        if not executable:
            continue
        hit = _executed.get(str(path), set()) & executable
        missing = sorted(executable - hit)
        total_exec += len(executable)
        total_hit += len(hit)
        row = {
            "file": str(path.relative_to(REPO_ROOT)),
            "lines": len(executable),
            "covered": len(hit),
            "pct": round(100 * len(hit) / len(executable), 1),
            "missing": _ranges(missing),
        }
        if branch:
            exempt = _no_branch_lines(source)
            sites = {
                line: ok
                for line, ok in branch_status.get(str(path), {}).items()
                if line in executable and line not in exempt
            }
            partial = sorted(ln for ln, ok in sites.items() if not ok)
            total_br += len(sites)
            total_br_hit += len(sites) - len(partial)
            row["branches"] = len(sites)
            row["partial"] = _ranges(partial)
        rows.append(row)

    rows.sort(key=lambda r: (r["pct"], -r["lines"]))
    width = max(len(r["file"]) for r in rows)
    header = f"\n{'file':<{width}}  lines  cover   pct  missing"
    if branch:
        header += "  partial-branches"
    print(header)
    for r in rows:
        line = (
            f"{r['file']:<{width}}  {r['lines']:>5}  {r['covered']:>5}"
            f"  {r['pct']:>4}  {r['missing']}"
        )
        if branch:
            line += f"  {r['partial']}"
        print(line)
    overall = round(100 * total_hit / total_exec, 2) if total_exec else 0.0
    print(f"\nTOTAL {total_hit}/{total_exec} lines = {overall}%")
    report: dict = {"total_pct": overall, "files": rows}
    if branch:
        br_overall = (
            round(100 * total_br_hit / total_br, 2) if total_br else 0.0
        )
        print(
            f"BRANCH {total_br_hit}/{total_br} fired "
            f"branch lines fully covered = {br_overall}%",
        )
        report["branch_pct"] = br_overall
    out = REPO_ROOT / "line_coverage.json"
    out.write_text(json.dumps(report, indent=1))
    print(f"(report written to {out})")
    if fail_under_lines is not None and overall < fail_under_lines:
        print(
            f"FAIL: line coverage {overall}% is under the "
            f"{fail_under_lines}% bar",
        )
        rc = rc or 2
    if branch and fail_under_branch is not None:
        br = report["branch_pct"]
        if br < fail_under_branch:
            print(
                f"FAIL: branch coverage {br}% is under the "
                f"{fail_under_branch}% bar",
            )
            rc = rc or 2
    return int(rc)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
