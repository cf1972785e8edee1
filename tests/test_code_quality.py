"""In-repo static-analysis gate (ast-based).

The reference enforces ruff select=ALL + pyright in pre-commit
(reference pyproject.toml:83-85, CONTRIBUTING.md:38); this image ships
neither tool, so the configured gates in pyproject.toml cannot execute
here. This module enforces the highest-signal subset with the stdlib so
the quality bar is CI-checked on any machine: every module compiles,
every public callable is documented, no debugging prints or bare
excepts ship in the package, and the reference's 79-column limit holds.
"""
from __future__ import annotations

import ast
from pathlib import Path

PACKAGE = Path(__file__).parent.parent / "style_transfer_visualizer_tpu"
MAX_LINE = 79


def _package_sources() -> list[Path]:
    files = sorted(PACKAGE.rglob("*.py"))
    assert files, "package sources not found"
    return files


def _parse(path: Path) -> ast.Module:
    return ast.parse(path.read_text(), filename=str(path))


def test_all_modules_parse_and_have_docstrings() -> None:
    for path in _package_sources():
        tree = _parse(path)
        assert ast.get_docstring(tree), f"{path} lacks a module docstring"


def test_public_callables_documented() -> None:
    """Module-level public functions/classes and methods need docs.

    Nested closures (jit bodies, shard_map shard functions) are exempt
    — they are implementation details of their documented parent.
    """
    undocumented: list[str] = []
    for path in _package_sources():
        tree = _parse(path)
        tops = [
            node
            for node in tree.body
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
            )
        ]
        for cls in [n for n in tree.body if isinstance(n, ast.ClassDef)]:
            tops.extend(
                node
                for node in cls.body
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
            )
        for node in tops:
            if node.name.startswith("_"):
                continue
            if not ast.get_docstring(node):
                undocumented.append(f"{path.name}:{node.name}")
    assert not undocumented, f"Missing docstrings: {undocumented}"


def test_no_debug_prints_in_package() -> None:
    offenders: list[str] = []
    for path in _package_sources():
        for node in ast.walk(_parse(path)):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id == "print"
            ):
                offenders.append(f"{path.name}:{node.lineno}")
    assert not offenders, f"print() in package code: {offenders}"


def test_no_bare_except() -> None:
    offenders: list[str] = []
    for path in _package_sources():
        for node in ast.walk(_parse(path)):
            if isinstance(node, ast.ExceptHandler) and node.type is None:
                offenders.append(f"{path.name}:{node.lineno}")
    assert not offenders, f"bare except: {offenders}"


def test_line_length_limit() -> None:
    offenders: list[str] = []
    for path in _package_sources():
        for lineno, line in enumerate(
            path.read_text().splitlines(), start=1,
        ):
            if len(line) > MAX_LINE and "noqa" not in line:
                offenders.append(f"{path.name}:{lineno} ({len(line)})")
    assert not offenders, f"lines over {MAX_LINE} cols: {offenders[:20]}"


def test_no_mutable_default_arguments() -> None:
    offenders: list[str] = []
    for path in _package_sources():
        for node in ast.walk(_parse(path)):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            for default in [*node.args.defaults, *node.args.kw_defaults]:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    offenders.append(f"{path.name}:{node.lineno}")
    assert not offenders, f"mutable default args: {offenders}"


def test_no_wildcard_imports() -> None:
    offenders: list[str] = []
    for path in _package_sources():
        for node in ast.walk(_parse(path)):
            if isinstance(node, ast.ImportFrom) and any(
                alias.name == "*" for alias in node.names
            ):
                offenders.append(f"{path.name}:{node.lineno}")
    assert not offenders, f"wildcard imports: {offenders}"


def test_no_unused_imports() -> None:
    """Every imported name is referenced somewhere in its module.

    ``__init__.py`` re-exports are exempt (their imports ARE the public
    API); so are names re-exported via ``__all__`` and conventional
    underscore-aliased imports.
    """
    offenders: list[str] = []
    for path in _package_sources():
        if path.name == "__init__.py":
            continue
        tree = _parse(path)
        exported: set[str] = set()
        for node in tree.body:
            if (
                isinstance(node, ast.Assign)
                and any(
                    isinstance(t, ast.Name) and t.id == "__all__"
                    for t in node.targets
                )
                and isinstance(node.value, (ast.List, ast.Tuple))
            ):
                exported |= {
                    elt.value
                    for elt in node.value.elts
                    if isinstance(elt, ast.Constant)
                }
        imported: dict[str, int] = {}
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.ImportFrom)
                and node.module == "__future__"
            ):
                continue
            if isinstance(node, ast.Import):
                for alias in node.names:
                    name = alias.asname or alias.name.split(".")[0]
                    imported[name] = node.lineno
            elif isinstance(node, ast.ImportFrom):
                for alias in node.names:
                    name = alias.asname or alias.name
                    imported[name] = node.lineno
        used: set[str] = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Name):
                used.add(node.id)
            elif isinstance(node, ast.Attribute):
                root = node
                while isinstance(root, ast.Attribute):
                    root = root.value
                if isinstance(root, ast.Name):
                    used.add(root.id)
        # String annotations ("Params", TYPE_CHECKING-only names) count.
        for node in ast.walk(tree):
            if isinstance(node, ast.Constant) and isinstance(
                node.value, str,
            ):
                used |= {
                    part
                    for part in node.value.replace(
                        "[", " ",
                    ).replace("]", " ").replace("|", " ").split()
                    if part.isidentifier()
                }
        for name, lineno in imported.items():
            if name.startswith("_") or name in exported or name in used:
                continue
            offenders.append(f"{path.name}:{lineno} {name}")
    assert not offenders, f"unused imports: {offenders}"
