"""Loss-plotting behavior, including matplotlib-absent handling."""
from __future__ import annotations

import sys
from pathlib import Path

import pytest

from style_transfer_visualizer_tpu.visualization.metrics import (
    plot_loss_curves,
)


def test_empty_metrics_warns(tmp_path: Path, caplog) -> None:
    plot_loss_curves({}, tmp_path)
    assert "No loss metrics" in caplog.text


def test_all_empty_series_warns(tmp_path: Path, caplog) -> None:
    plot_loss_curves({"style_loss": []}, tmp_path)
    assert "nothing to plot" in caplog.text


def test_plot_written(tmp_path: Path) -> None:
    plot_loss_curves({"total_loss": [3.0, 2.0, 1.0]}, tmp_path)
    assert (tmp_path / "loss_plot.png").exists()


def test_matplotlib_missing(tmp_path: Path, caplog, monkeypatch) -> None:
    monkeypatch.setitem(sys.modules, "matplotlib", None)
    monkeypatch.setitem(sys.modules, "matplotlib.pyplot", None)
    plot_loss_curves({"total_loss": [1.0]}, tmp_path)
    assert "matplotlib not found" in caplog.text
    assert not (tmp_path / "loss_plot.png").exists()
