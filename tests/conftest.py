"""Shared test fixtures.

Tests run on the CPU backend with a virtual 8-device platform so mesh and
sharding behavior is exercised without TPU hardware (the documented JAX
testing pattern for multi-chip code). Environment variables must be set
before jax initializes, hence the top-of-file ordering.
"""
from __future__ import annotations

import os

# Force CPU regardless of ambient JAX_PLATFORMS (e.g. "axon" on TPU hosts).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# TPU hosts may inject a platform plugin that overrides JAX_PLATFORMS at
# import time; the config update below wins as long as no backend has been
# initialized yet (conftest runs before any test imports).
jax.config.update("jax_platforms", "cpu")

import logging  # noqa: E402
from pathlib import Path  # noqa: E402
from typing import Any  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402
from PIL import Image  # noqa: E402

from style_transfer_visualizer_tpu.config import (  # noqa: E402
    StyleTransferConfig,
)
from style_transfer_visualizer_tpu.type_defs import InputPaths  # noqa: E402

# Device/video-mode matrix used by pipeline tests; TPU rows appear only
# when real hardware is present (it is not under the CPU test backend).
STYLE_CONFIG_VARIANTS: list[tuple[str, str]] = [
    ("cpu", "realtime"),
    ("cpu", "postprocess"),
]

RESOLUTION_CASES = [
    ("1080p", (1920, 1080)),
    ("720p", (1280, 720)),
    ("portrait", (1080, 1920)),
]


def _write_solid_image(
    path: Path,
    size: tuple[int, int],
    color: tuple[int, int, int],
) -> Path:
    img = Image.new("RGB", size, color)
    path.parent.mkdir(parents=True, exist_ok=True)
    img.save(path)
    return path


@pytest.fixture
def make_image_file(tmp_path: Path):
    """Factory writing a solid-color image file and returning its path."""

    def _make(
        name: str = "img.png",
        size: tuple[int, int] = (64, 64),
        color: tuple[int, int, int] = (128, 64, 32),
    ) -> Path:
        return _write_solid_image(tmp_path / name, size, color)

    return _make


@pytest.fixture
def content_image(tmp_path: Path) -> Path:
    """64x64 green content image."""
    return _write_solid_image(tmp_path / "content.png", (64, 64), (0, 200, 0))


@pytest.fixture
def style_image(tmp_path: Path) -> Path:
    """64x64 blue style image."""
    return _write_solid_image(tmp_path / "style.png", (64, 64), (0, 0, 200))


@pytest.fixture
def sample_frame() -> np.ndarray:
    """A small RGB uint8 frame."""
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)


@pytest.fixture
def make_style_transfer_config(tmp_path: Path):
    """Config factory with per-section overrides and isolated output dir."""

    def _make(
        *,
        output: dict[str, Any] | None = None,
        optimization: dict[str, Any] | None = None,
        video: dict[str, Any] | None = None,
        hardware: dict[str, Any] | None = None,
    ) -> StyleTransferConfig:
        cfg = StyleTransferConfig.model_validate({})
        cfg.output.output = str(tmp_path / "out")
        cfg.hardware.device = "cpu"
        cfg.optimization.steps = 2
        for section, overrides in (
            (cfg.output, output),
            (cfg.optimization, optimization),
            (cfg.video, video),
            (cfg.hardware, hardware),
        ):
            for key, value in (overrides or {}).items():
                setattr(section, key, value)
        return cfg

    return _make


@pytest.fixture
def make_input_paths(content_image: Path, style_image: Path):
    """Factory producing InputPaths for the synthetic images."""

    def _make() -> InputPaths:
        return InputPaths(
            content_path=str(content_image),
            style_path=str(style_image),
        )

    return _make


@pytest.fixture(autouse=True)
def _propagate_logger(monkeypatch: pytest.MonkeyPatch):
    """Let caplog see records from the package logger."""
    log = logging.getLogger("style_transfer_tpu")
    monkeypatch.setattr(log, "propagate", True)
