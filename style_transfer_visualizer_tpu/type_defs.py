"""Shared type aliases and small data carriers.

Public alias names mirror the reference's so downstream code reads the
same (reference type_defs.py:13-38); array-typed aliases use jax.Array
in place of torch tensors, and the TPU framework adds optimizer and
precision literals.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal

import jax

# --- Literal option sets ------------------------------------------------

#: Starting-image strategies for the pixel optimization.
InitMethod = Literal["content", "random", "white"]

#: Gallery-wall arrangements rendered by the compositing subsystem.
LayoutName = Literal["gallery-stacked-left", "gallery-two-across"]

#: Encoding strategy: stream frames live, or spill and encode at the end.
VideoMode = Literal["realtime", "postprocess"]

#: Pixel optimizers compiled by the engine (TPU-framework addition).
OptimizerName = Literal["lbfgs", "adam"]

#: MXU matmul precision tiers (TPU-framework addition).
PrecisionName = Literal["highest", "mixed", "high", "default"]

#: Gram-matrix kernel selection: "auto" resolves to the measured-fastest
#: backend (TPU-framework addition).
GramBackendName = Literal["auto", "xla", "pallas"]

#: Convolution kernel selection: XLA's conv or the fused Pallas
#: conv+bias+ReLU stencil kernel (TPU-framework addition).
ConvBackendName = Literal["auto", "xla", "pallas"]

#: Color-preservation schemes (Gatys et al. 2016; TPU-framework
#: addition): "luminance" recombines stylized luminance with content
#: chrominance on every output; "match" remaps the style image onto the
#: content's color statistics before targets are computed.
ColorPreservation = Literal["off", "luminance", "match"]

# --- Collection aliases --------------------------------------------------

#: Loss-series mapping produced by the accumulator for plotting.
LossHistory = dict[str, list[float]]

#: A list of device arrays (per-layer losses and the like).
ArrayList = list[jax.Array]


# --- Small data carriers -------------------------------------------------

@dataclass(slots=True)
class InputPaths:
    """The two input image locations for a run."""

    #: Path to the content image file.
    content_path: str
    #: Path to the style image file.
    style_path: str


@dataclass(slots=True)
class SaveOptions:
    """Everything the final persistence step needs to know."""

    #: Stem of the content image (drives canonical output names).
    content_name: str
    #: Stem of the style image.
    style_name: str
    #: Timelapse MP4 filename, when a video sink was active.
    video_name: str | None = None
    #: GIF filename, when GIF export was active.
    gif_name: str | None = None
    #: Whether the working image is in ImageNet-normalized space.
    normalize: bool = True
    #: Whether an MP4 was produced (controls the saved-video log line).
    video_created: bool = True
    #: Whether a GIF was produced.
    gif_created: bool = field(default=False)
    #: Whether to render the matplotlib loss plot.
    plot_losses: bool = True
    #: Content image in [0,1] RGB for luminance-only color
    #: preservation of the final PNG; None leaves colors untouched.
    chroma_source: jax.Array | None = None
    #: Final PNG filename override (within the output directory); None
    #: uses the canonical ``stylized_{content}_x_{style}.png``. Regional
    #: runs name their output ``regional_{content}_x_{s0+s1}.png``.
    final_name: str | None = None
