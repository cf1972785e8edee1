"""Zero-dependency line coverage for rigs without coverage.py.

This container has no network egress and no ``coverage``/``pytest-cov``
wheels, but the reference project gates changes on coverage
(``/root/reference/pyproject.toml:126``, ``CONTRIBUTING.md:38``). This
tool fills the gap with :mod:`sys.monitoring` (PEP 669, Python 3.12+):
it runs pytest in-process, records each executed line of the package
exactly once (the callback disables itself per location, so steady-state
overhead is near zero), and reports per-file missing-line ranges.

Usage::

    python tools/line_coverage.py [pytest args...]
    # e.g. python tools/line_coverage.py tests/ -q

Caveats vs real coverage.py:

- Line coverage only (no branch arcs).
- Code exercised only in subprocesses (the CLI integration tests, the
  real-TPU kernel tests) is NOT credited — treat per-file numbers as a
  lower bound and the missing-line ranges as leads, not verdicts.
- ``# pragma: no cover`` excludes that line only, plus any ``def``/
  ``class`` statement it annotates (the body is then unreachable from
  the report's perspective and is excluded wholesale).
"""

from __future__ import annotations

import ast
import json
import sys
from pathlib import Path

PACKAGE = "style_transfer_visualizer_tpu"
REPO_ROOT = Path(__file__).resolve().parent.parent
PACKAGE_DIR = REPO_ROOT / PACKAGE

TOOL_ID = sys.monitoring.COVERAGE_ID

_executed: dict[str, set[int]] = {}


def _on_line(code, line_number: int):  # noqa: ANN001, ANN202
    filename = code.co_filename
    if PACKAGE in filename and filename.endswith(".py"):
        _executed.setdefault(filename, set()).add(line_number)
    return sys.monitoring.DISABLE


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
    sys.monitoring.use_tool_id(TOOL_ID, "line_coverage")
    sys.monitoring.register_callback(
        TOOL_ID, sys.monitoring.events.LINE, _on_line,
    )
    sys.monitoring.set_events(TOOL_ID, sys.monitoring.events.LINE)

    import pytest

    rc = pytest.main(argv)

    sys.monitoring.set_events(TOOL_ID, 0)
    sys.monitoring.free_tool_id(TOOL_ID)

    rows = []
    total_exec = total_hit = 0
    for path in sorted(PACKAGE_DIR.rglob("*.py")):
        executable = _executable_lines(path)
        if not executable:
            continue
        hit = _executed.get(str(path), set()) & executable
        missing = sorted(executable - hit)
        total_exec += len(executable)
        total_hit += len(hit)
        rows.append(
            {
                "file": str(path.relative_to(REPO_ROOT)),
                "lines": len(executable),
                "covered": len(hit),
                "pct": round(100 * len(hit) / len(executable), 1),
                "missing": _ranges(missing),
            },
        )

    rows.sort(key=lambda r: (r["pct"], -r["lines"]))
    width = max(len(r["file"]) for r in rows)
    print(f"\n{'file':<{width}}  lines  cover   pct  missing")
    for r in rows:
        print(
            f"{r['file']:<{width}}  {r['lines']:>5}  {r['covered']:>5}"
            f"  {r['pct']:>4}  {r['missing']}",
        )
    overall = round(100 * total_hit / total_exec, 2) if total_exec else 0.0
    print(f"\nTOTAL {total_hit}/{total_exec} lines = {overall}%")
    out = REPO_ROOT / "line_coverage.json"
    out.write_text(
        json.dumps({"total_pct": overall, "files": rows}, indent=1),
    )
    print(f"(report written to {out})")
    return int(rc)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
