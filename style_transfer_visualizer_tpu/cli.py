"""``style-visualizer`` command-line interface.

Flag surface matches the reference (cli.py:26-244) — required inputs,
output/optimization/video/hardware/config groups, `argparse.SUPPRESS`
defaults so only explicitly passed flags override the TOML — plus
TPU-framework additions: ``--optimizer``, ``--precision``, and
``--allow-random-weights``.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import style_transfer_visualizer_tpu.config as stv_config
import style_transfer_visualizer_tpu.main as stv_main
from style_transfer_visualizer_tpu.config_defaults import (
    DEFAULT_LOG_EVERY,
    DEFAULT_VIDEO_INTRO_DURATION,
    DEFAULT_VIDEO_OUTRO_DURATION,
)
from style_transfer_visualizer_tpu.constants import (
    VIDEO_QUALITY_MAX,
    VIDEO_QUALITY_MIN,
)
from style_transfer_visualizer_tpu.runtime.comparison import (
    ComparisonRequest,
    render_requested_comparisons,
)
from style_transfer_visualizer_tpu.type_defs import InputPaths
from style_transfer_visualizer_tpu.utils.logging import logger


def build_arg_parser() -> argparse.ArgumentParser:
    """Construct the CLI argument parser from the flag specification."""
    suppress = argparse.SUPPRESS

    # group -> [(flag, kwargs)] specification. Flags without an explicit
    # default use SUPPRESS so the config merge only sees values the user
    # actually typed.
    spec: dict[str, list[tuple[str, dict]]] = {
        "required arguments": [
            ("--content", {"type": str, "help": "Path to content image"}),
            ("--style", {"type": str, "help": "Path to style image"}),
            ("--styles", {
                "type": str, "default": None,
                "help": (
                    "Comma-separated style image paths for a parallel "
                    "multi-style batch run (styles shard across TPU "
                    "devices; timelapse outputs are one GIF and/or one "
                    "postprocess MP4 per style, no intro/outro)."
                ),
            }),
            ("--style-blend", {
                "dest": "style_blend", "type": str, "default": None,
                "help": (
                    "Comma-separated weights, one per --styles entry: "
                    "blends the styles' Gram targets into ONE "
                    "interpolated stylization instead of a per-style "
                    "batch. Weights normalize to sum 1; outputs are "
                    "named with the joined style stems "
                    "(stylized_{c}_x_{s1+s2}.png) and gallery "
                    "intro/outro panels show the highest-weight style."
                ),
            }),
            ("--style-masks", {
                "dest": "style_masks", "type": str, "default": None,
                "help": (
                    "Comma-separated grayscale mask paths, one per "
                    "--styles entry: regional style transfer (Gatys et "
                    "al. 2017 spatial control) — each style's Gram loss "
                    "is restricted to its masked region, so one "
                    "stylization paints different regions with "
                    "different styles. Masks resize to the content's "
                    "dims and normalize to a pixelwise partition; "
                    "output is regional_{c}_x_{s1+s2}.png."
                ),
            }),
            ("--blend-sweep", {
                "dest": "blend_sweep", "type": int, "default": None,
                "help": (
                    "Render an N-frame morph animation across the "
                    "--styles list (piecewise-linear blend-weight "
                    "traversal, each frame a converged stylization "
                    "warm-started from the previous one). Frames save "
                    "as sweep_NNNN.png plus a "
                    "blend_sweep_{c}_x_{s1+s2}.gif at the --fps rate. "
                    "Incompatible with --style-blend (the sweep "
                    "generates its own weights)."
                ),
            }),
            ("--sweep-steps", {
                "dest": "sweep_steps", "type": int, "default": None,
                "help": (
                    "Per-frame step budget for blend-sweep frames after "
                    "the first (default: --steps). Warm starts converge "
                    "well below the cold budget, so a smaller value is "
                    "the sweep's main throughput lever."
                ),
            }),
        ],
        "output": [
            ("--output", {"type": str, "help": "Output directory",
                          "default": suppress}),
            ("--no-plot", {"action": "store_true",
                           "help": "Disable loss plotting"}),
            ("--log-loss", {
                "type": str,
                "help": (
                    "Path to CSV file for logging loss metrics. When "
                    "enabled, loss metrics are written directly to disk "
                    "instead of kept in memory, and matplotlib loss "
                    "plotting is automatically disabled."
                ),
            }),
            ("--log-every", {
                "type": int, "default": DEFAULT_LOG_EVERY,
                "help": (
                    f"Log losses to CSV every N steps (default: "
                    f"{DEFAULT_LOG_EVERY}). Ignored if --log-loss is "
                    "not set."
                ),
            }),
            ("--checkpoint-every", {
                "type": int, "default": suppress,
                "help": (
                    "Save a resumable checkpoint (image + optimizer "
                    "state) every N steps (0 disables; default 0)."
                ),
            }),
            ("--checkpoint-path", {
                "type": str, "default": suppress,
                "help": (
                    "Checkpoint file path "
                    "(default: <output>/checkpoint.npz)."
                ),
            }),
            ("--resume-from", {
                "type": str, "default": suppress,
                "help": "Resume optimization from a saved checkpoint file.",
            }),
            ("--profile-dir", {
                "type": str, "default": suppress,
                "help": (
                    "Write a jax.profiler trace of the optimization loop "
                    "to this directory (view with TensorBoard)."
                ),
            }),
            ("--compare-inputs", {
                "action": "store_true",
                "help": (
                    "Save a labeled comparison image of content and style "
                    "to the output directory and exit."
                ),
            }),
            ("--compare-result", {
                "action": "store_true",
                "help": (
                    "Save a labeled comparison image of content, style, "
                    "and result to the output directory and exit. The "
                    "stylized image path is derived from the input "
                    "filenames."
                ),
            }),
        ],
        "optimization": [
            ("--steps", {"type": int, "default": suppress,
                         "help": "Number of optimization steps"}),
            ("--style-w", {"type": float, "default": suppress,
                           "help": "Style weight"}),
            ("--content-w", {"type": float, "default": suppress,
                             "help": "Content weight"}),
            ("--tv-w", {
                "type": float, "default": suppress,
                "help": (
                    "Total-variation weight: adds a smoothness "
                    "regularizer on the optimized image to the "
                    "objective (0, the default, reproduces the "
                    "reference's style+content-only loss). Computed in "
                    "the model's working space; composes with every "
                    "path (batch styles, row sharding, banded 4K, "
                    "coarse warm start)."
                ),
            }),
            ("--lap-w", {
                "type": float, "default": suppress,
                "help": (
                    "Laplacian detail-preservation weight (Lapstyle, "
                    "Li et al. 2017): penalizes edge-structure drift "
                    "from the content photo via pooled-Laplacian "
                    "response matching (0, the default, reproduces the "
                    "reference's style+content-only loss). Applies to "
                    "whole-image, banded, batch, warm-start, sequence, "
                    "and blend-sweep paths; not applied under "
                    "--spatial-shards."
                ),
            }),
            ("--lap-pool", {
                "type": int, "default": suppress,
                "help": (
                    "Mean-pool size before the Laplacian stencil "
                    "(default 4): larger values match coarser edge "
                    "structure and cost less."
                ),
            }),
            ("--preserve-color", {
                "dest": "preserve_color",
                "choices": ["off", "luminance", "match"],
                "default": suppress,
                "help": (
                    "Keep the content image's colors (Gatys et al. "
                    "2016): 'luminance' recombines the stylized "
                    "luminance with the content's chrominance in every "
                    "output (final PNG, timelapse frames); 'match' "
                    "remaps the style image onto the content's color "
                    "statistics before style targets are computed. "
                    "'off' (default) inherits the style's palette."
                ),
            }),
            ("--lr", {"type": float, "default": suppress,
                      "help": "Learning rate"}),
            ("--init-method", {
                "choices": ["random", "white", "content"],
                "default": suppress, "help": "Initialization method",
            }),
            ("--seed", {"type": int, "default": suppress,
                        "help": "Random seed"}),
            ("--no-normalize", {"action": "store_true",
                                "help": "Disable VGG19 normalization"}),
            ("--style-layers", {
                "type": str,
                "help": "Comma-separated VGG19 layer indices for style loss",
            }),
            ("--content-layers", {
                "type": str,
                "help": (
                    "Comma-separated VGG19 layer indices for content loss"
                ),
            }),
            ("--style-layer-weights", {
                "type": str,
                "help": (
                    "Comma-separated per-layer style weights (one per "
                    "--style-layers entry, e.g. '1,1,0.5,0.25,0.25'); "
                    "each layer's Gram MSE scales by its weight before "
                    "the style sum. Omit for the reference's equal "
                    "weighting."
                ),
            }),
            ("--optimizer", {
                "choices": ["lbfgs", "adam"], "default": suppress,
                "help": "Pixel optimizer (default: lbfgs)",
            }),
            ("--model", {
                "choices": ["vgg19", "vgg16"], "default": suppress,
                "help": (
                    "Feature backbone (default: vgg19, the reference's "
                    "model). With vgg16, layer lists left at the VGG19 "
                    "defaults remap to vgg16's own standard taps "
                    "(style 0,5,10,17,24; content 19); explicit "
                    "--style-layers/--content-layers are used as given."
                ),
            }),
            ("--lbfgs-history-size", {
                "dest": "lbfgs_history_size", "type": int,
                "default": suppress,
                "help": (
                    "Curvature pairs kept by L-BFGS (default: 100, the "
                    "torch.optim.LBFGS default). The m=100 ring costs "
                    "~10%% of a 512px step in HBM traffic; 20 recovers "
                    "it with no measurable quality change at "
                    "max_iter=1."
                ),
            }),
            ("--lbfgs-history-dtype", {
                "dest": "lbfgs_history_dtype",
                "choices": ["float32", "bfloat16"], "default": suppress,
                "help": (
                    "Storage dtype of the L-BFGS curvature ring. "
                    "bfloat16 (default) halves the ring's HBM traffic "
                    "for long histories (+11%% steps/s at m=100); "
                    "float32 bit-matches torch.optim.LBFGS."
                ),
            }),
            ("--lbfgs-direction", {
                "dest": "lbfgs_direction",
                "choices": ["two-loop", "compact"], "default": suppress,
                "help": (
                    "L-BFGS direction computation. compact (default) "
                    "computes the two-loop's direction via batched "
                    "history contractions (fewer HBM passes, +11%% "
                    "steps/s at m=100); two-loop bit-matches "
                    "torch.optim.LBFGS's sequential recursion."
                ),
            }),
            ("--remat", {
                "action": "store_true",
                "help": (
                    "Rematerialize VGG feature segments in the backward "
                    "pass to cut HBM use (auto-enabled for 4MP+ inputs)."
                ),
            }),
            ("--tile-rows", {
                "dest": "tile_rows", "type": int, "default": suppress,
                "help": (
                    "Evaluate the loss band-by-band over rows of this "
                    "height (exact scan tiling; lets 4K-class inputs "
                    "compile and fit one chip). 0 forces whole-image; "
                    "omitted/-1 = auto above ~4MP."
                ),
            }),
            ("--coarse-steps", {
                "dest": "coarse_steps", "type": int, "default": suppress,
                "help": (
                    "Warm-start: optimize N steps at half resolution "
                    "and upsample the result as the starting image "
                    "(half-res steps are ~4x cheaper; 8.6x measured "
                    "convergence per wall-clock). -1 = auto (default): "
                    "on for >=1MP content with a steps/5 budget. "
                    "0 disables."
                ),
            }),
            ("--pyramid-levels", {
                "dest": "pyramid_levels", "type": int, "default": suppress,
                "help": (
                    "Resolutions in the coarse-to-fine warm start: 2 "
                    "(default) runs one half-res phase; N ladders up "
                    "from 1/2^(N-1), each level warm-starting the "
                    "next. The --coarse-steps budget splits across "
                    "the levels. No effect unless --coarse-steps > 0."
                ),
            }),
            ("--allow-random-weights", {
                "action": "store_true",
                "help": (
                    "Run with seeded random VGG19 weights when no "
                    "pretrained checkpoint is available (air-gapped hosts)."
                ),
            }),
        ],
        "video": [
            ("--save-every", {"type": int, "default": suppress,
                              "help": "Save image every N steps"}),
            ("--fps", {"type": int, "default": suppress,
                       "help": "Frames per second for video"}),
            ("--quality", {"type": int, "default": suppress,
                           "help": "Video quality (lower is better)"}),
            ("--no-video", {"action": "store_true",
                            "help": "Disable video creation"}),
            ("--final-only", {"action": "store_true",
                              "help": "Only save final image"}),
            ("--no-intro", {
                "action": "store_true",
                "help": (
                    "Disable the intro comparison segment in the video"
                ),
            }),
            ("--intro-duration", {
                "type": float, "default": suppress,
                "help": (
                    "Seconds to display the intro comparison frame before "
                    "the stylization timelapse (default: "
                    f"{DEFAULT_VIDEO_INTRO_DURATION})"
                ),
            }),
            ("--no-final-frame-compare", {
                "dest": "final_frame_compare", "action": "store_false",
                "default": suppress,
                "help": (
                    "Disable the final comparison frame so the timelapse "
                    "ends on the last stylization step."
                ),
            }),
            ("--outro-duration", {
                "type": float, "default": suppress,
                "help": (
                    "Seconds to display the final comparison frame at the "
                    f"end of the video (default: "
                    f"{DEFAULT_VIDEO_OUTRO_DURATION})"
                ),
            }),
            ("--metadata-title", {
                "type": str, "default": suppress,
                "help": "Custom title to embed in MP4 metadata",
            }),
            ("--metadata-artist", {
                "type": str, "default": suppress,
                "help": "Custom artist/author to embed in MP4 metadata",
            }),
            ("--gif", {
                "dest": "create_gif", "action": "store_true",
                "default": suppress,
                "help": (
                    "Also export a GIF timelapse (intro/outro segments "
                    "are skipped unless explicitly included)."
                ),
            }),
            ("--no-gif", {
                "dest": "create_gif", "action": "store_false",
                "default": suppress,
                "help": "Disable GIF export even when enabled via config.",
            }),
            ("--gif-include-intro", {
                "dest": "gif_include_intro", "action": "store_true",
                "default": suppress,
                "help": "Include the intro comparison segment in GIF output.",
            }),
            ("--gif-include-outro", {
                "dest": "gif_include_outro", "action": "store_true",
                "default": suppress,
                "help": "Include the outro comparison segment in GIF output.",
            }),
            ("--video-mode", {
                "choices": ["realtime", "postprocess"], "default": suppress,
                "help": (
                    "Video encoding strategy: realtime streams frames "
                    "directly, postprocess defers encoding until after "
                    "optimization. When omitted the CLI may auto-switch "
                    "to postprocess for long runs."
                ),
            }),
        ],
        "hardware": [
            ("--device", {
                "type": str, "default": suppress,
                "help": "Device to run on (e.g., 'tpu' or 'cpu')",
            }),
            ("--precision", {
                "choices": ["highest", "mixed", "high", "default"],
                "default": suppress,
                "help": (
                    "MXU matmul precision: 'highest' keeps f32 "
                    "everywhere; 'mixed' (the default) keeps f32 for the "
                    "error-dominant early conv blocks and Gram products "
                    "(holds 1e-3 loss-curve parity at near-'high' "
                    "speed); 'high' runs 3-pass bf16 everywhere and is "
                    "MARGINAL against the 1e-3 parity gate (measured "
                    "1.3e-3 over 100 steps — pick 'mixed' when parity "
                    "matters); 'default' allows bf16 passes for top speed."
                ),
            }),
            ("--gram-backend", {
                "dest": "gram_backend",
                "choices": ["auto", "xla", "pallas"],
                "default": suppress,
                "help": (
                    "Gram-matrix kernel: 'pallas' forces the fused TPU "
                    "kernel, 'xla' the plain contraction, 'auto' picks "
                    "the measured-fastest backend."
                ),
            }),
            ("--conv-backend", {
                "dest": "conv_backend",
                "choices": ["auto", "xla", "pallas"],
                "default": suppress,
                "help": (
                    "Convolution kernel: 'pallas' runs the fused "
                    "conv+bias+ReLU stencil kernel, 'xla' the native "
                    "conv, 'auto' the measured-fastest backend."
                ),
            }),
            ("--spatial-shards", {
                "dest": "spatial_shards", "type": int, "default": suppress,
                "help": (
                    "Shard image rows across this many devices "
                    "(halo-exchange convolutions, Gram partials psum'd "
                    "over ICI). Requires that many attached devices."
                ),
            }),
            ("--steps-per-dispatch", {
                "dest": "steps_per_dispatch", "type": int,
                "default": suppress,
                "help": (
                    "Fuse this many optimizer steps into one device "
                    "dispatch to amortize host overhead. 0 = auto (gcd "
                    "of logging/frame cadences); 1 disables fusion."
                ),
            }),
        ],
        "config": [
            ("--config", {"type": str,
                          "help": "Path to config.toml file"}),
            ("--validate-config-only", {
                "action": "store_true",
                "help": (
                    "Validate config file and exit without running style "
                    "transfer"
                ),
            }),
        ],
    }

    p = argparse.ArgumentParser(
        description="Neural Style Transfer on TPU (JAX/XLA/Pallas)",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        epilog=(
            "Examples:\n"
            "style-visualizer --content cat.jpg --style starry_night.jpg\n"
            "style-visualizer --content cat.jpg --style starry_night.jpg "
            "--final-only\n"
            "style-visualizer --content cat.jpg --style starry_night.jpg "
            "--steps 1000 --fps 30\n\n"
            "Note:\n"
            "  Normalization is enabled by default. "
            "Use --no-normalize to disable it"
        ),
    )
    for group_name, flags in spec.items():
        group = p.add_argument_group(group_name)
        for flag, kwargs in flags:
            group.add_argument(flag, **kwargs)
    return p


def log_parameters(
    paths: InputPaths,
    cfg: stv_config.StyleTransferConfig,
    args: argparse.Namespace,
) -> None:
    """Echo the full effective configuration."""
    logger.info("Content image loaded: %s", paths.content_path)
    logger.info("Style image loaded: %s", paths.style_path)
    if getattr(args, "config", None):
        logger.info("Loaded config from: %s", args.config)
    logger.info("Output Directory: %s", cfg.output.output)
    logger.info("Steps: %d", cfg.optimization.steps)
    logger.info("Save Every: %d", cfg.video.save_every)
    logger.info("Style Weight: %g", cfg.optimization.style_w)
    logger.info("Content Weight: %g", cfg.optimization.content_w)
    if cfg.optimization.tv_w:
        logger.info("TV Weight: %g", cfg.optimization.tv_w)
    if cfg.optimization.lap_w:
        logger.info(
            "Laplacian Weight: %g (pool %d)",
            cfg.optimization.lap_w, cfg.optimization.lap_pool,
        )
    if cfg.optimization.preserve_color != "off":
        logger.info(
            "Color Preservation: %s", cfg.optimization.preserve_color,
        )
    logger.info("Learning Rate: %g", cfg.optimization.lr)
    logger.info("Model: %s", cfg.optimization.model)
    logger.info("Optimizer: %s", cfg.optimization.optimizer)
    if cfg.optimization.optimizer == "lbfgs":
        logger.info(
            "L-BFGS History: %d pairs (%s), %s direction",
            cfg.optimization.lbfgs_history_size,
            cfg.optimization.lbfgs_history_dtype,
            cfg.optimization.lbfgs_direction,
        )
    logger.info("Style Layers: %s", cfg.optimization.style_layers)
    if cfg.optimization.style_layer_weights is not None:
        logger.info(
            "Style Layer Weights: %s",
            cfg.optimization.style_layer_weights,
        )
    logger.info("Content Layers: %s", cfg.optimization.content_layers)
    logger.info("FPS for Timelapse Video: %d", cfg.video.fps)
    logger.info("Video Quality: %d (%d-%d scale)", cfg.video.quality,
                VIDEO_QUALITY_MIN, VIDEO_QUALITY_MAX)
    logger.info("Initialization Method: %s", cfg.optimization.init_method)
    if cfg.optimization.coarse_steps < 0:
        logger.info(
            "Coarse Warm Start: auto (on at >=1MP content, "
            "steps/5 budget)",
        )
    elif cfg.optimization.coarse_steps:
        logger.info(
            "Coarse Warm Start: %d steps across %d pyramid level(s)",
            cfg.optimization.coarse_steps,
            cfg.optimization.pyramid_levels - 1,
        )
    logger.info("Normalization: %s",
                "Enabled" if cfg.optimization.normalize else "Disabled")
    logger.info("Video Creation: %s",
                "Enabled" if cfg.video.create_video else "Disabled")
    logger.info("Video Intro: %s",
                "Enabled" if cfg.video.intro_enabled else "Disabled")
    logger.info("Intro Duration (s): %.2f", cfg.video.intro_duration_seconds)
    logger.info("Outro Duration (s): %.2f", cfg.video.outro_duration_seconds)
    logger.info(
        "Final Frame Compare: %s",
        "Enabled" if cfg.video.final_frame_compare else "Disabled",
    )
    logger.info(
        "GIF Export: %s",
        "Enabled" if cfg.video.create_gif else "Disabled",
    )
    if cfg.video.create_gif:
        logger.info(
            "GIF Intro Included: %s",
            "Yes" if cfg.video.gif_include_intro else "No",
        )
        logger.info(
            "GIF Outro Included: %s",
            "Yes" if cfg.video.gif_include_outro else "No",
        )
    logger.info("Video Mode: %s", cfg.video.mode)
    logger.info("Loss Plotting: %s",
                "Enabled" if cfg.output.plot_losses else "Disabled")
    logger.info("Random Seed: %d", cfg.optimization.seed)
    logger.info("Device: %s", cfg.hardware.device)
    logger.info("Matmul Precision: %s", cfg.hardware.precision)
    logger.info("Gram Backend: %s", cfg.hardware.gram_backend)
    logger.info("Conv Backend: %s", cfg.hardware.conv_backend)
    if cfg.hardware.spatial_shards > 1:
        logger.info("Spatial Shards: %d", cfg.hardware.spatial_shards)
    if cfg.optimization.tile_rows > 0:
        logger.info("Tile Rows: %d", cfg.optimization.tile_rows)
    if cfg.hardware.steps_per_dispatch:
        logger.info(
            "Steps per Dispatch: %d", cfg.hardware.steps_per_dispatch,
        )
    logger.info("Metadata Title: %s",
                cfg.video.metadata_title or "(default)")
    logger.info("Metadata Artist: %s",
                cfg.video.metadata_artist or "(default)")


def parse_int_list(s: str | list[int]) -> list[int]:
    """Convert a comma-separated string or int list into ints."""
    return stv_config.parse_int_list(s)


def run_from_args(args: argparse.Namespace) -> None:
    """Execute a style-transfer run from parsed CLI arguments."""
    base_cfg: stv_config.StyleTransferConfig | None = None
    if args.config:
        base_cfg = stv_config.ConfigLoader.load(args.config)
        if args.validate_config_only:
            logger.info("Config %s validated successfully.", args.config)
            sys.exit(0)

    cfg = stv_config.build_config_from_cli(vars(args), base_config=base_cfg)

    if getattr(args, "style_blend", None) and not getattr(
        args, "styles", None,
    ):
        msg = "--style-blend requires --styles (the images to blend)"
        raise SystemExit(msg)
    if getattr(args, "blend_sweep", None) is not None:
        if getattr(args, "style_blend", None):
            msg = (
                "--blend-sweep is incompatible with --style-blend "
                "(the sweep generates its own per-frame weights)"
            )
            raise SystemExit(msg)
        if not getattr(args, "styles", None):
            msg = "--blend-sweep requires --styles (>= 2 images to morph)"
            raise SystemExit(msg)
    if getattr(args, "style_masks", None):
        if not getattr(args, "styles", None):
            msg = "--style-masks requires --styles (one image per mask)"
            raise SystemExit(msg)
        if getattr(args, "style_blend", None) or (
            getattr(args, "blend_sweep", None) is not None
        ):
            msg = (
                "--style-masks is incompatible with --style-blend/"
                "--blend-sweep (regional masks already assign styles "
                "to regions)"
            )
            raise SystemExit(msg)

    if getattr(args, "styles", None):
        style_paths = [
            s.strip() for s in args.styles.split(",") if s.strip()
        ]
        if not style_paths:
            msg = "--styles was given but contains no paths"
            raise SystemExit(msg)
        if getattr(args, "style_masks", None):
            _run_regional(args, cfg, style_paths)
            return
        if getattr(args, "blend_sweep", None) is not None:
            _run_blend_sweep(args, cfg, style_paths)
            return
        if getattr(args, "style_blend", None):
            style_blend = _parse_blend_weights(
                args.style_blend, style_paths,
            )
            _run_blended(args, cfg, style_blend)
            return
        logger.info(
            "Multi-style batch: content=%s styles=%s",
            args.content, style_paths,
        )
        stv_main.multi_style_transfer(args.content, style_paths, cfg)
        return

    paths = InputPaths(content_path=args.content, style_path=args.style)
    log_parameters(paths, cfg, args)

    stv_main.style_transfer(paths, cfg)

    if args.compare_inputs or args.compare_result:
        render_requested_comparisons(
            content_path=Path(args.content),
            style_path=Path(args.style),
            output_dir=Path(cfg.output.output),
            request=ComparisonRequest(
                include_inputs=args.compare_inputs,
                include_result=args.compare_result,
            ),
        )


def _parse_blend_weights(
    spec: str,
    style_paths: list[str],
) -> list[tuple[str, float]]:
    """Validate and normalize ``--style-blend`` into (path, weight) pairs."""
    try:
        weights = [float(w) for w in spec.split(",") if w.strip()]
    except ValueError as exc:
        msg = f"--style-blend must be comma-separated numbers: {exc}"
        raise SystemExit(msg) from exc
    if len(weights) != len(style_paths):
        msg = (
            f"--style-blend has {len(weights)} weights for "
            f"{len(style_paths)} --styles entries"
        )
        raise SystemExit(msg)
    if any(w < 0 for w in weights):
        msg = "--style-blend weights must be non-negative"
        raise SystemExit(msg)
    total = sum(weights)
    if total <= 0:
        msg = "--style-blend weights must not all be zero"
        raise SystemExit(msg)
    return [(p, w / total) for p, w in zip(style_paths, weights)]


def _run_regional(
    args: argparse.Namespace,
    cfg: stv_config.StyleTransferConfig,
    style_paths: list[str],
) -> None:
    """Masked regional transfer: one style per masked region."""
    if cfg.hardware.spatial_shards > 1:
        # Reject loudly before any device work: regional mode has no
        # sharded evaluation of its mask-weighted Grams, and silently
        # ignoring the flag would change the memory envelope the user
        # asked for (compose-or-reject rule; stylize_regional carries
        # the same guard for direct API callers).
        msg = (
            "--spatial-shards is not supported with --style-masks "
            "(regional mode evaluates mask-weighted Grams whole-image); "
            "drop --spatial-shards for regional runs"
        )
        raise SystemExit(msg)
    from style_transfer_visualizer_tpu.regional import (  # noqa: PLC0415
        stylize_regional,
    )

    mask_paths = [
        m.strip() for m in args.style_masks.split(",") if m.strip()
    ]
    logger.info(
        "Regional transfer: content=%s styles=%s masks=%s",
        args.content, style_paths, mask_paths,
    )
    result = stylize_regional(
        args.content, list(style_paths), mask_paths, cfg,
    )
    logger.info(
        "Regional transfer finished in %.2fs (final loss %.4g): %s",
        result.elapsed_seconds, result.final_loss, result.output_path,
    )


def _run_blend_sweep(
    args: argparse.Namespace,
    cfg: stv_config.StyleTransferConfig,
    style_paths: list[str],
) -> None:
    """N-frame morph animation across the style list (blend sweep)."""
    from style_transfer_visualizer_tpu.blend_sweep import (  # noqa: PLC0415
        stylize_blend_sweep,
    )

    logger.info(
        "Blend sweep: content=%s styles=%s frames=%d",
        args.content, style_paths, args.blend_sweep,
    )
    result = stylize_blend_sweep(
        args.content, list(style_paths), cfg,
        n_frames=args.blend_sweep,
        sweep_steps=getattr(args, "sweep_steps", None),
    )
    logger.info(
        "Blend sweep finished: %d frames, %d total steps%s",
        len(result.frame_paths), result.total_steps,
        f", animation at {result.video_path}" if result.video_path else "",
    )


def _run_blended(
    args: argparse.Namespace,
    cfg: stv_config.StyleTransferConfig,
    style_blend: list[tuple[str, float]],
) -> None:
    """One interpolated stylization from weighted styles (blend mode)."""
    # The highest-weight style fronts the gallery intro/outro panels
    # and the --compare-* renders (ties resolve to the earliest).
    primary = max(style_blend, key=lambda pair: pair[1])[0]
    logger.info(
        "Blended styles: %s",
        ", ".join(f"{p} (w={w:.3f})" for p, w in style_blend),
    )
    paths = InputPaths(content_path=args.content, style_path=primary)
    log_parameters(paths, cfg, args)
    stv_main.style_transfer(paths, cfg, style_blend=style_blend)

    if args.compare_inputs or args.compare_result:
        content_stem = Path(args.content).stem
        joined = "+".join(Path(p).stem for p, _ in style_blend)
        render_requested_comparisons(
            content_path=Path(args.content),
            style_path=Path(primary),
            output_dir=Path(cfg.output.output),
            request=ComparisonRequest(
                include_inputs=args.compare_inputs,
                include_result=args.compare_result,
                result_path=Path(cfg.output.output)
                / f"stylized_{content_stem}_x_{joined}.png",
            ),
        )


def main() -> None:
    """Console entry point."""
    arg_parser = build_arg_parser()
    args = arg_parser.parse_args()
    if args.validate_config_only and not args.config:
        arg_parser.error("--validate-config-only requires --config")
    has_style = bool(args.style or args.styles)
    if not args.validate_config_only and (not args.content or not has_style):
        arg_parser.error(
            "the following arguments are required: --content, --style",
        )
    run_from_args(args)


if __name__ == "__main__":  # pragma: no cover
    main()
