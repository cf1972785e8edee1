"""Shared type aliases and small data carriers.

Mirrors the public aliases of the reference (type_defs.py:13-38) with JAX
array types in place of torch tensors.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

import jax

InitMethod = Literal["content", "random", "white"]
LayoutName = Literal["gallery-stacked-left", "gallery-two-across"]
VideoMode = Literal["realtime", "postprocess"]
OptimizerName = Literal["lbfgs", "adam"]
PrecisionName = Literal["highest", "high", "default"]

LossHistory = dict[str, list[float]]
ArrayList = list[jax.Array]


@dataclass(slots=True)
class InputPaths:
    """Content and style input image paths."""

    content_path: str
    style_path: str


@dataclass(slots=True)
class SaveOptions:
    """Names and flags controlling the final persistence step."""

    content_name: str
    style_name: str
    video_name: str | None = None
    gif_name: str | None = None
    normalize: bool = True
    video_created: bool = True
    gif_created: bool = False
    plot_losses: bool = True
