"""Version resolution behavior."""
from __future__ import annotations

from importlib import metadata as importlib_metadata

import pytest

import style_transfer_visualizer_tpu.utils.version as version_mod
from style_transfer_visualizer_tpu.utils.version import (
    resolve_project_version,
)


def test_resolves_from_source_tree() -> None:
    # Not installed as a distribution in CI; should find pyproject.toml.
    v = resolve_project_version()
    assert v
    assert v[0].isdigit()


def test_prefers_installed_distribution(
    monkeypatch: pytest.MonkeyPatch,
) -> None:
    monkeypatch.setattr(
        version_mod.importlib_metadata,
        "version",
        lambda _name: "9.9.9",
    )
    assert resolve_project_version() == "9.9.9"


def _no_dist(monkeypatch: pytest.MonkeyPatch) -> None:
    def raise_not_found(name: str) -> str:
        raise importlib_metadata.PackageNotFoundError(name)

    monkeypatch.setattr(
        version_mod.importlib_metadata, "version", raise_not_found,
    )


def test_walks_up_to_pyproject(
    monkeypatch: pytest.MonkeyPatch, tmp_path,
) -> None:
    _no_dist(monkeypatch)
    (tmp_path / "pyproject.toml").write_text(
        '[project]\nversion = "3.2.1"\n',
    )
    fake_file = tmp_path / "pkg" / "utils" / "version.py"
    fake_file.parent.mkdir(parents=True)
    fake_file.touch()
    monkeypatch.setattr(version_mod, "__file__", str(fake_file))
    assert resolve_project_version() == "3.2.1"


def test_skips_pyproject_without_version(
    monkeypatch: pytest.MonkeyPatch, tmp_path,
) -> None:
    _no_dist(monkeypatch)
    (tmp_path / "pyproject.toml").write_text('[project]\nversion = "7.7.7"\n')
    inner = tmp_path / "pkg"
    inner.mkdir()
    (inner / "pyproject.toml").write_text("[tool.other]\nx = 1\n")
    fake_file = inner / "version.py"
    fake_file.touch()
    monkeypatch.setattr(version_mod, "__file__", str(fake_file))
    assert resolve_project_version() == "7.7.7"


def test_unreadable_pyproject_falls_back(
    monkeypatch: pytest.MonkeyPatch, tmp_path, caplog,
) -> None:
    _no_dist(monkeypatch)
    (tmp_path / "pyproject.toml").write_text("not [valid toml ((")
    fake_file = tmp_path / "version.py"
    fake_file.touch()
    monkeypatch.setattr(version_mod, "__file__", str(fake_file))
    import logging

    with caplog.at_level(logging.WARNING):
        assert resolve_project_version() == "0.0.0"
    assert "Error reading" in caplog.text


def test_fallback_when_nothing_found(
    monkeypatch: pytest.MonkeyPatch, tmp_path,
) -> None:
    def raise_not_found(name: str) -> str:
        raise importlib_metadata.PackageNotFoundError(name)

    monkeypatch.setattr(
        version_mod.importlib_metadata, "version", raise_not_found,
    )
    # Point the module file somewhere with no pyproject.toml above it
    # being... (tmp dirs still live under / which has none readable with
    # a project.version). Simulate by patching Path resolution instead.
    fake_file = tmp_path / "a" / "b" / "version.py"
    fake_file.parent.mkdir(parents=True)
    fake_file.touch()
    monkeypatch.setattr(version_mod, "__file__", str(fake_file))
    assert resolve_project_version() == "0.0.0"
