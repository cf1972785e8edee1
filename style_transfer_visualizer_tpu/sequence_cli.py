"""``style-sequence`` CLI: stylize a directory of video frames."""
from __future__ import annotations

import argparse
import sys

import style_transfer_visualizer_tpu.config as stv_config
from style_transfer_visualizer_tpu.sequence import stylize_sequence
from style_transfer_visualizer_tpu.utils.logging import logger


def build_parser() -> argparse.ArgumentParser:
    """Build the sequence-stylization argument parser."""
    p = argparse.ArgumentParser(
        description=(
            "Stylize an image sequence (video frames) with per-frame "
            "warm starting for temporal coherence."
        ),
    )
    p.add_argument(
        "--frames", required=True, type=str,
        help="Directory of input frames (png/jpg), processed in name "
             "order — or a video clip file (.gif/.webp decode via "
             "Pillow; .mp4/.mov/.mkv/.webm/.avi via ffmpeg), decoded "
             "into frames first.",
    )
    p.add_argument("--style", type=str,
                   help="Path to style image")
    p.add_argument(
        "--styles", type=str, default=None,
        help="Comma-separated style images for a blended sequence "
             "(requires --style-blend; replaces --style)",
    )
    p.add_argument(
        "--style-blend", dest="style_blend", type=str, default=None,
        help="Comma-separated non-negative weights, one per --styles "
             "entry; the clip optimizes against the weighted Gram "
             "mixture of the styles (weights are normalized to sum 1)",
    )
    p.add_argument(
        "--output", type=str, default=argparse.SUPPRESS,
        help="Output directory for stylized frames",
    )
    p.add_argument(
        "--steps", type=int, default=argparse.SUPPRESS,
        help="Optimization steps per frame (default from config: 1500; "
             "sequences usually want far fewer, e.g. 50-200)",
    )
    p.add_argument("--style-w", type=float, default=argparse.SUPPRESS)
    p.add_argument("--content-w", type=float, default=argparse.SUPPRESS)
    p.add_argument(
        "--tv-w", dest="tv_w", type=float, default=argparse.SUPPRESS,
        help="Total-variation weight: smoothness regularizer on each "
             "stylized frame (0, the default, is style+content only)",
    )
    p.add_argument(
        "--lap-w", dest="lap_w", type=float, default=argparse.SUPPRESS,
        help="Laplacian detail-preservation weight (Lapstyle): pins "
             "each frame's edge structure to its OWN source frame "
             "(0, the default, is style+content only)",
    )
    p.add_argument(
        "--lap-pool", dest="lap_pool", type=int,
        default=argparse.SUPPRESS,
        help="Mean-pool size before the Laplacian stencil (default 4)",
    )
    p.add_argument("--lr", type=float, default=argparse.SUPPRESS)
    p.add_argument(
        "--optimizer", choices=["lbfgs", "adam"],
        default=argparse.SUPPRESS,
    )
    p.add_argument(
        "--model", choices=["vgg19", "vgg16"],
        default=argparse.SUPPRESS,
        help="Feature backbone (default: vgg19; see style-visualizer help)",
    )
    p.add_argument(
        "--lbfgs-history-size", dest="lbfgs_history_size", type=int,
        default=argparse.SUPPRESS,
        help="L-BFGS curvature-pair history length (default 100)",
    )
    p.add_argument(
        "--lbfgs-history-dtype", dest="lbfgs_history_dtype",
        choices=["float32", "bfloat16"], default=argparse.SUPPRESS,
        help="Storage dtype for the L-BFGS curvature ring",
    )
    p.add_argument(
        "--lbfgs-direction", dest="lbfgs_direction",
        choices=["two-loop", "compact"], default=argparse.SUPPRESS,
        help="L-BFGS direction algorithm (see style-visualizer --help)",
    )
    p.add_argument(
        "--init-method", choices=["random", "white", "content"],
        default=argparse.SUPPRESS,
        help="Initialization for the FIRST frame (later frames warm-start)",
    )
    p.add_argument(
        "--preserve-color", dest="preserve_color",
        choices=["off", "luminance", "match"],
        default=argparse.SUPPRESS,
        help="Keep the clip's colors: 'luminance' recolors each "
             "stylized frame with its own source frame's chrominance; "
             "'match' remaps the style(s) onto frame 0's color "
             "statistics before targets (see style-visualizer --help)",
    )
    p.add_argument("--seed", type=int, default=argparse.SUPPRESS)
    p.add_argument(
        "--coarse-steps", dest="coarse_steps", type=int,
        default=argparse.SUPPRESS,
        help="Warm-start frame 0 with N half-resolution steps "
             "(later frames warm from the previous result).",
    )
    p.add_argument("--no-normalize", action="store_true")
    p.add_argument(
        "--style-layers", dest="style_layers", type=str, default=None,
        help="Comma-separated layer indices for the style loss",
    )
    p.add_argument(
        "--content-layers", dest="content_layers", type=str, default=None,
        help="Comma-separated layer indices for the content loss",
    )
    p.add_argument(
        "--style-layer-weights", dest="style_layer_weights", type=str,
        default=None,
        help="Comma-separated per-layer style weights (one per "
             "--style-layers entry); omit for equal weighting",
    )
    p.add_argument("--device", type=str, default=argparse.SUPPRESS)
    p.add_argument(
        "--spatial-shards", dest="spatial_shards", type=int,
        default=argparse.SUPPRESS,
        help="Shard each frame's rows over N devices (halo-exchange "
             "convs, psum'd Grams); frame heights must divide "
             "N * 2^pools (see style-visualizer --help)",
    )
    p.add_argument(
        "--precision", choices=["highest", "mixed", "high", "default"],
        default=argparse.SUPPRESS,
        help="MXU matmul precision tier (see style-visualizer --help; "
             "'mixed' is the certified-parity default)",
    )
    p.add_argument("--allow-random-weights", action="store_true")
    p.add_argument(
        "--gif", action="store_true",
        help="Assemble stylized frames into stylized_sequence.gif",
    )
    p.add_argument(
        "--output-video", dest="output_video", type=str, default=None,
        help="Assemble stylized frames into this clip file under the "
             "output directory (.gif, or .mp4/.mov/.mkv/.webm with "
             "ffmpeg on PATH). Defaults its frame rate to the source "
             "clip's when --frames is a video file.",
    )
    p.add_argument(
        "--max-frames", dest="max_frames", type=int, default=None,
        help="Stylize at most N frames (applied after --frame-stride)",
    )
    p.add_argument(
        "--frame-stride", dest="frame_stride", type=int, default=1,
        help="Keep every Nth source frame (temporal downsampling)",
    )
    p.add_argument(
        "--fps", type=int, default=argparse.SUPPRESS,
        help="Frame rate for --gif/--output-video assembly (default 10; "
             "video-file input defaults --output-video to the source "
             "rate instead)",
    )
    p.add_argument("--config", type=str, help="Path to config.toml")
    return p


def main(argv: list[str] | None = None) -> int:
    """Entry point for style-sequence."""
    args = build_parser().parse_args(argv)

    style_blend: list[tuple[str, float]] | None = None
    if args.styles:
        if not args.style_blend:
            msg = "--styles requires --style-blend (the mixture weights)"
            raise SystemExit(msg)
        if args.style:
            msg = "--style and --styles are mutually exclusive"
            raise SystemExit(msg)
        from style_transfer_visualizer_tpu.cli import (  # noqa: PLC0415
            _parse_blend_weights,
        )

        style_paths = [s for s in args.styles.split(",") if s.strip()]
        style_blend = _parse_blend_weights(args.style_blend, style_paths)
        # The highest-weight style is the primary (ties: earliest).
        style_path = max(style_blend, key=lambda pair: pair[1])[0]
        logger.info(
            "Blended styles: %s",
            ", ".join(f"{p} (w={w:.3f})" for p, w in style_blend),
        )
    elif args.style_blend:
        msg = "--style-blend requires --styles (the images to blend)"
        raise SystemExit(msg)
    elif args.style:
        style_path = args.style
    else:
        msg = "one of --style or --styles is required"
        raise SystemExit(msg)

    base_cfg = (
        stv_config.ConfigLoader.load(args.config) if args.config else None
    )
    cfg = stv_config.build_config_from_cli(
        vars(args), base_config=base_cfg,
    )

    from style_transfer_visualizer_tpu.runtime.device import (  # noqa: PLC0415
        setup_device,
    )
    from style_transfer_visualizer_tpu.utils.cache import (  # noqa: PLC0415
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    import jax  # noqa: PLC0415

    # An explicit --fps pins the assembly rate; otherwise video-file
    # input inherits the source clip's native rate inside
    # stylize_sequence (argparse.SUPPRESS keeps the distinction).
    explicit_fps = vars(args).get("fps")
    device = setup_device(cfg.hardware.device)
    with jax.default_device(device):
        result = stylize_sequence(
            args.frames, style_path, cfg, cfg.output.output,
            assemble_gif=args.gif,
            style_blend=style_blend,
            output_video=args.output_video,
            output_fps=float(explicit_fps) if explicit_fps else None,
            max_frames=args.max_frames,
            frame_stride=args.frame_stride,
        )
    logger.info(
        "Sequence complete: %d frames, %d total steps.",
        len(result.frame_paths), result.total_steps,
    )
    return 0


def entrypoint() -> None:  # pragma: no cover - console script shim
    """Console-script entry."""
    sys.exit(main())


if __name__ == "__main__":  # pragma: no cover
    entrypoint()
