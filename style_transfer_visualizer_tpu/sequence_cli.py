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
        help="Directory of input frames (png/jpg), processed in name order.",
    )
    p.add_argument("--style", required=True, type=str,
                   help="Path to style image")
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
    p.add_argument("--lr", type=float, default=argparse.SUPPRESS)
    p.add_argument(
        "--optimizer", choices=["lbfgs", "adam"],
        default=argparse.SUPPRESS,
    )
    p.add_argument(
        "--init-method", choices=["random", "white", "content"],
        default=argparse.SUPPRESS,
        help="Initialization for the FIRST frame (later frames warm-start)",
    )
    p.add_argument("--seed", type=int, default=argparse.SUPPRESS)
    p.add_argument(
        "--coarse-steps", dest="coarse_steps", type=int,
        default=argparse.SUPPRESS,
        help="Warm-start frame 0 with N half-resolution steps "
             "(later frames warm from the previous result).",
    )
    p.add_argument("--no-normalize", action="store_true")
    p.add_argument("--device", type=str, default=argparse.SUPPRESS)
    p.add_argument(
        "--precision", choices=["highest", "high", "default"],
        default=argparse.SUPPRESS,
    )
    p.add_argument("--allow-random-weights", action="store_true")
    p.add_argument(
        "--gif", action="store_true",
        help="Assemble stylized frames into stylized_sequence.gif",
    )
    p.add_argument(
        "--fps", type=int, default=argparse.SUPPRESS,
        help="Frame rate for --gif assembly (default 10)",
    )
    p.add_argument("--config", type=str, help="Path to config.toml")
    return p


def main(argv: list[str] | None = None) -> int:
    """Entry point for style-sequence."""
    args = build_parser().parse_args(argv)

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

    device = setup_device(cfg.hardware.device)
    with jax.default_device(device):
        result = stylize_sequence(
            args.frames, args.style, cfg, cfg.output.output,
            assemble_gif=args.gif,
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
