"""Configuration schema, TOML loader, and CLI-override merge.

Pydantic v2 models with the same sections, field names, bounds, and merge
precedence (CLI > TOML > defaults) as the reference (config.py:53-309).
TOML parsing uses the stdlib ``tomllib``. New TPU-specific fields:
``optimization.optimizer``, ``optimization.lbfgs_history_size``, and
``hardware.precision``.
"""
from __future__ import annotations

from collections.abc import Callable, Mapping
from pathlib import Path
from typing import Any, Literal

import tomllib
from pydantic import BaseModel, ConfigDict, Field, model_validator

from style_transfer_visualizer_tpu import config_defaults as d
from style_transfer_visualizer_tpu.constants import (
    VIDEO_QUALITY_MAX,
    VIDEO_QUALITY_MIN,
)
from style_transfer_visualizer_tpu.type_defs import (
    ColorPreservation,
    ConvBackendName,
    GramBackendName,
    InitMethod,
    OptimizerName,
    PrecisionName,
    VideoMode,
)
from style_transfer_visualizer_tpu.utils.logging import logger


class _ValidatedSection(BaseModel):
    """Base for config sections: field bounds hold on assignment too.

    The CLI merge writes overrides with setattr; without this, CLI
    values would bypass every declared bound while TOML values are
    checked — two different contracts for the same schema.
    """

    model_config = ConfigDict(validate_assignment=True)


class OptimizationConfig(_ValidatedSection):
    """Optimization-loop settings."""

    steps: int = Field(d.DEFAULT_STEPS, ge=1)
    style_w: float = Field(d.DEFAULT_STYLE_WEIGHT, ge=0)
    content_w: float = Field(d.DEFAULT_CONTENT_WEIGHT, ge=0)
    # TPU-framework addition: optional total-variation smoothness term
    # (ops/tv.py), weighted into the objective. 0 (the default) matches
    # the reference's style+content-only loss.
    tv_w: float = Field(d.DEFAULT_TV_WEIGHT, ge=0)
    # TPU-framework addition: Laplacian detail-preservation term
    # (Lapstyle, Li et al. 2017 arXiv:1707.01253; ops/lap.py) matching
    # the pooled-Laplacian response of the content image. 0 (the
    # default) matches the reference's style+content-only loss;
    # lap_pool sets the detail scale (mean-pool size before the
    # stencil).
    lap_w: float = Field(d.DEFAULT_LAP_WEIGHT, ge=0)
    lap_pool: int = Field(d.DEFAULT_LAP_POOL, ge=1)
    # TPU-framework addition: color preservation (Gatys et al. 2016,
    # arXiv:1606.05897). "luminance" keeps the content's chrominance in
    # every output; "match" remaps the style image onto the content's
    # color statistics before Gram targets are computed. "off" is the
    # reference behavior (ops/color.py).
    preserve_color: ColorPreservation = Field(d.DEFAULT_PRESERVE_COLOR)
    lr: float = Field(d.DEFAULT_LEARNING_RATE, gt=0)
    init_method: InitMethod = Field(d.DEFAULT_INIT_METHOD)
    seed: int = Field(d.DEFAULT_SEED, ge=0)
    normalize: bool = d.DEFAULT_NORMALIZE
    lbfgs_max_iter: int = Field(d.DEFAULT_LBFGS_MAX_ITER, ge=1)
    lbfgs_max_eval: int = Field(d.DEFAULT_LBFGS_MAX_EVAL, ge=1)
    style_layers: list[int] = Field(
        default_factory=lambda: list(d.DEFAULT_STYLE_LAYERS),
    )
    content_layers: list[int] = Field(
        default_factory=lambda: list(d.DEFAULT_CONTENT_LAYERS),
    )
    # TPU-framework addition: per-layer style weights (Gatys-style
    # w_l on each style layer's Gram MSE). One weight per entry of
    # ``style_layers``; None weighs every layer 1.0 — the reference's
    # equal-weight sum (core_model.py:234-264).
    style_layer_weights: list[float] | None = None
    # TPU-framework addition: selectable VGG-family backbone (the
    # reference hardcodes torchvision VGG19, core_model.py:103-117).
    model: Literal["vgg19", "vgg16"] = Field(d.DEFAULT_MODEL)
    # TPU-framework additions:
    optimizer: OptimizerName = Field(d.DEFAULT_OPTIMIZER)
    lbfgs_history_size: int = Field(d.DEFAULT_LBFGS_HISTORY_SIZE, ge=1)
    # Curvature-ring storage dtype; "bfloat16" (default) halves the
    # ring's HBM traffic (+11% at m=100/512px); "float32" bit-matches
    # torch.optim.LBFGS for anyone chasing bit-fidelity (which no two
    # L-BFGS implementations hold over a trajectory anyway —
    # BASELINE.md chaos control).
    lbfgs_history_dtype: Literal["float32", "bfloat16"] = Field(
        d.DEFAULT_LBFGS_HISTORY_DTYPE,
    )
    # Direction computation: "compact" (default) computes the two-loop
    # direction (Byrd-Nocedal-Schnabel compact representation) as
    # batched ring contractions — fewer HBM passes over a long history
    # ring; "two-loop" bit-matches torch's sequential recursion.
    lbfgs_direction: Literal["two-loop", "compact"] = Field(
        d.DEFAULT_LBFGS_DIRECTION,
    )
    # Permit seeded-random VGG19 weights when no pretrained checkpoint is
    # reachable (air-gapped hosts); stylization quality will be poor.
    allow_random_weights: bool = False

    @model_validator(mode="after")
    def _remap_default_layers_for_model(self) -> OptimizationConfig:
        """Move VGG19-default layer lists onto the selected model's taps.

        Layer indices address torchvision's flat ``features`` numbering,
        which differs per architecture; a non-VGG19 model with the layer
        lists still at the VGG19 defaults means the user never chose
        layers, so the model's own literature-standard taps (the same
        named conv1_1..conv5_1 / conv4_2 layers) apply instead.
        Explicitly chosen lists are never touched.
        """
        if self.model == "vgg19":
            return self
        from style_transfer_visualizer_tpu.models.arch import (  # noqa: PLC0415
            get_architecture,
        )

        arch = get_architecture(self.model)
        changed = False
        if tuple(self.style_layers) == d.DEFAULT_STYLE_LAYERS:
            self.__dict__["style_layers"] = list(arch.default_style_layers)
            changed = True
        if tuple(self.content_layers) == d.DEFAULT_CONTENT_LAYERS:
            self.__dict__["content_layers"] = list(
                arch.default_content_layers,
            )
            changed = True
        if changed:
            logger.info(
                "Model %s: layer defaults remapped to style=%s content=%s",
                self.model, self.style_layers, self.content_layers,
            )
        return self

    @model_validator(mode="after")
    def _check_style_layer_weights(self) -> OptimizationConfig:
        """One non-negative weight per style layer, not all zero.

        Runs after the model-default layer remap so the length check
        sees the final ``style_layers`` list.
        """
        weights = self.style_layer_weights
        if weights is None:
            return self
        if len(weights) != len(self.style_layers):
            msg = (
                f"style_layer_weights has {len(weights)} entries for "
                f"{len(self.style_layers)} style layers"
            )
            raise ValueError(msg)
        if any(w < 0 for w in weights):
            msg = "style_layer_weights entries must be >= 0"
            raise ValueError(msg)
        if weights and not any(w > 0 for w in weights):
            msg = "style_layer_weights must include a positive weight"
            raise ValueError(msg)
        return self

    def style_weights_tuple(self) -> tuple[float, ...] | None:
        """``style_layer_weights`` as the engines' static tuple form."""
        if self.style_layer_weights is None:
            return None
        return tuple(float(w) for w in self.style_layer_weights)
    # Rematerialize feature segments in the backward pass (trades ~1
    # extra forward of FLOPs for HBM headroom). Auto-enabled for
    # 4MP+ inputs; force with this flag.
    remat: bool = False
    # Coarse-to-fine warm start: optimize this many steps at half
    # resolution and upsample the result as the starting image
    # (engine/coarse.py). The half-res step is ~4x cheaper, so
    # front-loading global structure there cuts the full-res steps
    # needed for equal quality (8.6x measured, BASELINE.md). -1 = auto
    # (the default): on for >=1MP content with a steps//5 budget, off
    # below (small runs stay trajectory-comparable with the
    # reference). 0 disables, >0 forces that total coarse budget.
    coarse_steps: int = Field(-1, ge=-1)
    # Number of resolutions in the coarse-to-fine warm start: 2 (the
    # default) runs one half-res phase; N ladders up from 1/2^(N-1),
    # each level warm-starting the next (engine/coarse.py). Only
    # meaningful when coarse_steps > 0, which carries the total coarse
    # budget split across the levels.
    pyramid_levels: int = Field(2, ge=2, le=6)
    # Evaluate the loss as a lax.scan over row bands of this height
    # (exact; shrinks the compiled graph and activation memory for
    # 4K-class inputs). -1 = auto (tile above ~4MP), 0 = always
    # whole-image, >0 = forced band height.
    tile_rows: int = Field(-1, ge=-1)


class VideoConfig(_ValidatedSection):
    """Timelapse video/GIF output settings."""

    save_every: int = Field(d.DEFAULT_SAVE_EVERY, ge=1)
    fps: int = Field(d.DEFAULT_FPS, ge=1, le=60)
    quality: int = Field(
        d.DEFAULT_VIDEO_QUALITY, ge=VIDEO_QUALITY_MIN, le=VIDEO_QUALITY_MAX,
    )
    create_video: bool = d.DEFAULT_CREATE_VIDEO
    final_only: bool = d.DEFAULT_FINAL_ONLY
    intro_enabled: bool = d.DEFAULT_VIDEO_INTRO_ENABLED
    intro_duration_seconds: float = Field(
        d.DEFAULT_VIDEO_INTRO_DURATION, ge=0.0,
    )
    metadata_title: str | None = None
    metadata_artist: str | None = None
    final_frame_compare: bool = d.DEFAULT_VIDEO_FINAL_FRAME_COMPARE
    outro_duration_seconds: float = Field(
        d.DEFAULT_VIDEO_OUTRO_DURATION, ge=0.0,
    )
    mode: VideoMode = Field(d.DEFAULT_VIDEO_MODE)
    create_gif: bool = d.DEFAULT_CREATE_GIF
    gif_include_intro: bool = d.DEFAULT_GIF_INCLUDE_INTRO
    gif_include_outro: bool = d.DEFAULT_GIF_INCLUDE_OUTRO
    # Set (not serialized) when the user picked the mode explicitly, which
    # disables the auto realtime->postprocess promotion heuristic.
    mode_override: bool = Field(default=False, exclude=True, repr=False)


class HardwareConfig(_ValidatedSection):
    """Accelerator selection."""

    device: str = Field(d.DEFAULT_DEVICE)
    precision: PrecisionName = Field(d.DEFAULT_PRECISION)
    gram_backend: GramBackendName = Field(d.DEFAULT_GRAM_BACKEND)
    conv_backend: ConvBackendName = Field(d.DEFAULT_CONV_BACKEND)
    # Shard image rows across this many mesh devices (halo-exchange
    # convs + psum'd Gram partials over ICI); 1 = single device.
    spatial_shards: int = Field(1, ge=1)
    # Fuse this many optimizer steps into one device dispatch (lax.scan)
    # to amortize per-dispatch host overhead. 0 = auto (the gcd of the
    # active logging/frame/checkpoint cadences); 1 disables fusion.
    steps_per_dispatch: int = Field(0, ge=0)


class OutputConfig(_ValidatedSection):
    """Output directory, loss-logging, and checkpoint settings."""

    output: str = Field(d.DEFAULT_OUTPUT_DIR)
    log_every: int = Field(d.DEFAULT_LOG_EVERY, ge=1)
    log_loss: str | None = None
    plot_losses: bool = True
    # Checkpoint/resume (new capability; the reference has none):
    checkpoint_every: int = Field(0, ge=0)   # 0 disables
    checkpoint_path: str | None = None       # default: <output>/checkpoint.npz
    resume_from: str | None = None
    # Write a jax.profiler trace of the optimization loop here
    # (view with TensorBoard / xprof).
    profile_dir: str | None = None


class StyleTransferConfig(BaseModel):
    """Root config grouping all sections (mirrors config.toml layout)."""

    output: OutputConfig = Field(
        default_factory=lambda: OutputConfig.model_validate({}),
    )
    optimization: OptimizationConfig = Field(
        default_factory=lambda: OptimizationConfig.model_validate({}),
    )
    video: VideoConfig = Field(
        default_factory=lambda: VideoConfig.model_validate({}),
    )
    hardware: HardwareConfig = Field(
        default_factory=lambda: HardwareConfig.model_validate({}),
    )


class ConfigLoader:
    """Load and validate a TOML config file."""

    @staticmethod
    def load(path: str) -> StyleTransferConfig:
        """Parse ``path`` as TOML and validate into a typed config."""
        config_path = Path(path)
        if not config_path.is_file():
            msg = f"Config file not found: {path}"
            raise FileNotFoundError(msg)
        with config_path.open("rb") as fh:
            doc = tomllib.load(fh)
        return StyleTransferConfig.model_validate(doc)


def parse_int_list(value: str | list[int]) -> list[int]:
    """Accept "0,5,10" or an int list; return a list of ints."""
    if isinstance(value, list):
        return value
    return [int(part) for part in value.split(",")]


def parse_float_list(value: str | list[float]) -> list[float]:
    """Accept "1,0.5,0.25" or a float list; return a list of floats."""
    if isinstance(value, list):
        return [float(part) for part in value]
    return [float(part) for part in value.split(",")]


def build_config_from_cli(
    cli_args: Mapping[str, Any],
    *,
    loader: Callable[[str], StyleTransferConfig] | None = None,
    base_config: StyleTransferConfig | None = None,
) -> StyleTransferConfig:
    """Merge CLI args over a base (TOML or default) config.

    Only keys present in ``cli_args`` override — the CLI uses
    ``argparse.SUPPRESS`` defaults so untouched flags are absent.
    """
    args = dict(cli_args)
    if base_config is not None:
        cfg = base_config.model_copy(deep=True)
    elif (config_path := args.get("config")):
        cfg = (loader or ConfigLoader.load)(config_path)
    else:
        cfg = StyleTransferConfig.model_validate({})

    _merge_output(cfg, args)
    _merge_optimization(cfg, args)
    _merge_video(cfg, args)
    _merge_hardware(cfg, args)
    _enforce_csv_plot_rule(cfg)
    return cfg


def _merge_output(cfg: StyleTransferConfig, args: Mapping[str, Any]) -> None:
    for key in (
        "output", "log_every", "log_loss",
        "checkpoint_every", "checkpoint_path", "resume_from",
        "profile_dir",
    ):
        if key in args:
            setattr(cfg.output, key, args[key])
    if args.get("no_plot"):
        cfg.output.plot_losses = False


def _merge_optimization(
    cfg: StyleTransferConfig,
    args: Mapping[str, Any],
) -> None:
    opt = cfg.optimization
    for key in (
        "steps", "style_w", "content_w", "tv_w", "lap_w", "lap_pool",
        "lr", "init_method", "seed",
        "optimizer", "model", "lbfgs_max_iter", "lbfgs_max_eval",
        "lbfgs_history_size", "lbfgs_history_dtype", "lbfgs_direction",
        "tile_rows", "coarse_steps", "pyramid_levels", "preserve_color",
    ):
        if key in args:
            setattr(opt, key, args[key])
    if args.get("allow_random_weights"):
        opt.allow_random_weights = True
    if args.get("remat"):
        opt.remat = True
    if args.get("no_normalize"):
        opt.normalize = False
    if (style_layers := args.get("style_layers")):
        opt.style_layers = parse_int_list(style_layers)
    if (content_layers := args.get("content_layers")):
        opt.content_layers = parse_int_list(content_layers)
    if (weights := args.get("style_layer_weights")) is not None:
        opt.style_layer_weights = parse_float_list(weights)


def _merge_video(cfg: StyleTransferConfig, args: Mapping[str, Any]) -> None:
    vid = cfg.video
    for key in (
        "save_every", "fps", "quality", "metadata_title", "metadata_artist",
        "create_gif", "gif_include_intro", "gif_include_outro",
        "final_frame_compare",
    ):
        if key in args:
            setattr(vid, key, args[key])

    if args.get("no_video"):
        vid.create_video = False
    if args.get("no_intro"):
        vid.intro_enabled = False
    if args.get("final_only"):
        vid.final_only = True

    if "intro_duration" in args:
        vid.intro_duration_seconds = max(args["intro_duration"], 0.0)
    if "outro_duration" in args:
        vid.outro_duration_seconds = max(args["outro_duration"], 0.0)

    if "video_mode" in args:
        vid.mode = args["video_mode"]
        vid.mode_override = True
    # A non-default mode coming from TOML also counts as explicit intent.
    if not vid.mode_override and vid.mode != d.DEFAULT_VIDEO_MODE:
        vid.mode_override = True


def _merge_hardware(
    cfg: StyleTransferConfig,
    args: Mapping[str, Any],
) -> None:
    if "device" in args:
        cfg.hardware.device = args["device"]
    if "precision" in args:
        cfg.hardware.precision = args["precision"]
    if "gram_backend" in args:
        cfg.hardware.gram_backend = args["gram_backend"]
    if "conv_backend" in args:
        cfg.hardware.conv_backend = args["conv_backend"]
    if "spatial_shards" in args:
        cfg.hardware.spatial_shards = args["spatial_shards"]
    if "steps_per_dispatch" in args:
        cfg.hardware.steps_per_dispatch = args["steps_per_dispatch"]


def _enforce_csv_plot_rule(cfg: StyleTransferConfig) -> None:
    """CSV loss logging supersedes in-memory plotting."""
    if getattr(cfg.output, "log_loss", None) and cfg.output.plot_losses:
        logger.warning(
            "Loss plotting is disabled because CSV logging is enabled. "
            "Only loss CSV will be created.",
        )
        cfg.output.plot_losses = False
