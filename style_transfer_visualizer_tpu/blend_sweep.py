"""Blend-sweep stylization: animate a morph between styles.

Each output frame is a *converged* stylization of the same content
image at blend weights interpolated along the style list (piecewise-
linear traversal: style A -> B -> C ...); frame i warm-starts from
frame i-1's result, so adjacent frames share an optimization trajectory
and the animation stays temporally coherent.

TPU compilation discipline: per-style Gram targets are computed ONCE;
each frame's blended target is a cheap device-side convex combination
(``models.features.blend_targets``) that flows into ONE compiled update
step as a runtime argument (``sequence.build_targets_update``) — the
whole sweep reuses a single executable regardless of frame count.

The reference supports exactly one style image per run
(core_model.py:218-232); the sweep is a TPU-framework capability built
on the same Gram statistics its loss already optimizes.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import TYPE_CHECKING, NamedTuple

import jax
import jax.numpy as jnp

import style_transfer_visualizer_tpu.image_io as stv_image_io
import style_transfer_visualizer_tpu.runtime as stv_runtime
from style_transfer_visualizer_tpu.engine.step import (
    drive_chunked,
    resolve_precision,
)
from style_transfer_visualizer_tpu.models.features import (
    blend_targets,
    compute_targets,
    initialize_input,
)
from style_transfer_visualizer_tpu.sequence import (
    _SEQUENCE_MAX_CHUNK,
    assemble_output_video,
    build_targets_update,
    maybe_spatial_context,
    spatial_frame_targets,
)
from style_transfer_visualizer_tpu.utils.logging import logger

if TYPE_CHECKING:
    from style_transfer_visualizer_tpu.config import StyleTransferConfig

_MIN_SWEEP_FRAMES = 2
_MIN_SWEEP_STYLES = 2


class BlendSweepResult(NamedTuple):
    """Outcome of a blend-sweep run.

    ``frame_seconds[0]`` includes the one-time compile; steady-state
    throughput is ``frame_seconds[1:]``. ``frame_losses[i]`` is frame
    i's final total loss at its own blend weights.
    """

    frame_paths: list[Path]
    video_path: Path | None
    total_steps: int
    frame_seconds: tuple[float, ...] = ()
    frame_losses: tuple[float, ...] = ()


def sweep_weights(n_styles: int, n_frames: int) -> list[list[float]]:
    """Per-frame blend weights traversing the style list.

    Piecewise-linear: frame 0 is pure style 0, the last frame pure
    style ``n_styles - 1``, and the sweep passes exactly through every
    intermediate style. Every row is a convex combination (sums to 1,
    non-negative) with at most two non-zero entries.
    """
    if n_styles < _MIN_SWEEP_STYLES:
        msg = f"A blend sweep needs at least 2 styles, got {n_styles}"
        raise ValueError(msg)
    if n_frames < _MIN_SWEEP_FRAMES:
        msg = f"A blend sweep needs at least 2 frames, got {n_frames}"
        raise ValueError(msg)
    rows: list[list[float]] = []
    for i in range(n_frames):
        pos = i / (n_frames - 1) * (n_styles - 1)
        seg = min(int(pos), n_styles - 2)
        local = pos - seg
        row = [0.0] * n_styles
        row[seg] = 1.0 - local
        row[seg + 1] = local
        rows.append(row)
    return rows


def stylize_blend_sweep(
    content_path: str | Path,
    style_paths: list[str | Path],
    config: StyleTransferConfig,
    *,
    n_frames: int,
    sweep_steps: int | None = None,
    output_fps: float | None = None,
) -> BlendSweepResult:
    """Render an ``n_frames`` morph of the content across the styles.

    Frame 0 gets the full ``optimization.steps`` budget (the sweep's
    only cold start, optionally coarse-warm-started); later frames get
    ``sweep_steps`` each (default: the same budget — warm starts
    usually converge well below it, so passing a smaller value is the
    main throughput lever). Frames save as ``sweep_{i:04d}.png`` under
    the configured output directory and assemble into
    ``blend_sweep_{content}_x_{s0+s1+...}.gif`` at ``output_fps``
    (default ``video.fps``).

    Color preservation composes: ``match`` remaps every style onto the
    content's color statistics before Grams are computed; ``luminance``
    recolors every frame with the content's chrominance.
    """
    from style_transfer_visualizer_tpu.utils.cache import (  # noqa: PLC0415
        enable_persistent_compilation_cache,
    )

    if len(style_paths) < _MIN_SWEEP_STYLES:
        msg = (
            "A blend sweep needs at least 2 --styles entries, got "
            f"{len(style_paths)}"
        )
        raise ValueError(msg)
    for style_path in style_paths:
        stv_runtime.validate_input_paths(str(content_path), str(style_path))
    weights_rows = sweep_weights(len(style_paths), n_frames)
    per_frame_steps = (
        config.optimization.steps if sweep_steps is None else sweep_steps
    )
    if per_frame_steps < 1:
        msg = f"sweep_steps must be >= 1, got {per_frame_steps}"
        raise ValueError(msg)

    enable_persistent_compilation_cache()
    device = stv_runtime.setup_device(config.hardware.device)
    key = stv_runtime.setup_random_seed(config.optimization.seed)
    with jax.default_device(device):
        return _sweep_on_device(
            Path(content_path), [Path(p) for p in style_paths], config,
            key, weights_rows=weights_rows, per_frame_steps=per_frame_steps,
            output_fps=output_fps,
        )


def _sweep_on_device(
    content_path: Path,
    style_paths: list[Path],
    config: StyleTransferConfig,
    key: jax.Array,
    *,
    weights_rows: list[list[float]],
    per_frame_steps: int,
    output_fps: float | None,
) -> BlendSweepResult:
    from style_transfer_visualizer_tpu.models.arch import (  # noqa: PLC0415
        get_architecture,
    )
    from style_transfer_visualizer_tpu.models.vgg19 import (  # noqa: PLC0415
        load_pretrained_params,
    )

    opt_cfg = config.optimization
    output_dir = stv_runtime.setup_output_directory(config.output.output)

    content_host = stv_image_io.load_image_to_host_array(content_path)
    content_img = stv_image_io.host_array_to_device(
        content_host, normalize=opt_cfg.normalize,
    )
    match_to = (
        content_host if opt_cfg.preserve_color == "match" else None
    )
    chroma_source = (
        jnp.asarray(content_host)
        if opt_cfg.preserve_color == "luminance"
        else None
    )
    style_imgs = [
        stv_image_io.load_style_image_to_array(
            p, normalize=opt_cfg.normalize, match_to=match_to,
        )
        for p in style_paths
    ]

    params = load_pretrained_params(
        get_architecture(opt_cfg.model),
        allow_random=opt_cfg.allow_random_weights, seed=opt_cfg.seed,
    )
    prec = resolve_precision(config.hardware.precision)
    style_layers = tuple(opt_cfg.style_layers)
    content_layers = tuple(opt_cfg.content_layers)

    # One Targets per style, computed once; content features ride on the
    # first entry (blend_targets carries them through every mixture).
    # Sharded runs (--spatial-shards) extract Grams whole-image too (C x
    # C, size-independent) but take their content features from the
    # shard-local extraction below instead of the first entry.
    spatial = maybe_spatial_context(
        config, params, tuple(content_img.shape),
    )
    per_style = [
        compute_targets(
            params, s_img, content_img, style_layers,
            content_layers if i == 0 and spatial is None else (), prec,
        )
        for i, s_img in enumerate(style_imgs)
    ]
    spatial_feats = None
    if spatial is not None:
        # The content is fixed across the sweep, so the sharded content
        # features (and padded lap target, if any) are computed once and
        # reused under every mixture frame's blended Grams.
        spatial_feats = spatial_frame_targets(
            spatial, params, content_img, {}, config,
        ).content_feats

    _, update_many, init_state, run_params = build_targets_update(
        params, tuple(content_img.shape), config,
        loss_fn=spatial.loss_fn if spatial is not None else None,
    )

    x: jax.Array | None = None
    from style_transfer_visualizer_tpu.engine.coarse import (  # noqa: PLC0415
        coarse_init,
        resolve_coarse_steps,
    )

    opt_cfg.coarse_steps = resolve_coarse_steps(
        opt_cfg.coarse_steps,
        int(content_img.shape[1]), int(content_img.shape[2]),
        opt_cfg.steps,
    )
    if opt_cfg.coarse_steps > 0:
        # Frame 0 is pure style 0, so the coarse phase warm-starts the
        # very objective the sweep's first frame optimizes.
        x = coarse_init(params, content_img, style_imgs[0], config, key)
    if x is None:
        x = initialize_input(content_img, opt_cfg.init_method, key)
    if spatial is not None:
        # Coarse (if any) ran unsharded at reduced resolution; the
        # full-res sweep rides row-sharded from the first step on.
        x = jax.device_put(x, spatial.row_sharding)

    outputs: list[Path] = []
    frame_seconds: list[float] = []
    frame_losses: list[float] = []
    total_steps = 0
    lap_t = None
    if opt_cfg.lap_w and spatial is None:
        from style_transfer_visualizer_tpu.ops.lap import (  # noqa: PLC0415
            lap_response,
        )

        # The content is fixed across the sweep; one response serves
        # every mixture frame.
        lap_t = lap_response(content_img, opt_cfg.lap_pool)
    for i, weights in enumerate(weights_rows):
        frame_start = time.perf_counter()
        targets = blend_targets(per_style, weights)
        if spatial_feats is not None:
            # Blended Grams over the once-computed sharded content
            # features; the sharded loss owns the TV/lap terms.
            from style_transfer_visualizer_tpu.models.features import (  # noqa: PLC0415
                Targets,
            )

            targets = Targets(
                style_grams=targets.style_grams,
                content_feats=spatial_feats,
            )
        elif opt_cfg.lap_w:
            targets = (targets, lap_t)
        budget = opt_cfg.steps if i == 0 else per_frame_steps
        state = init_state()
        x, state, auxes = drive_chunked(
            lambda img, st, k: update_many(img, st, run_params, targets, k),  # noqa: B023
            x, state, budget, min(budget, _SEQUENCE_MAX_CHUNK),
        )
        aux = jax.tree.map(lambda a: a[-1], auxes)
        total_steps += budget

        prepared = stv_image_io.prepare_image_for_output(
            x, normalize=opt_cfg.normalize,
        )
        if chroma_source is not None:
            from style_transfer_visualizer_tpu.ops.color import (  # noqa: PLC0415
                luminance_transfer,
            )

            prepared = luminance_transfer(prepared, chroma_source)
        out_path = output_dir / f"sweep_{i:04d}.png"
        stv_image_io.save_array_as_image(prepared, out_path)
        outputs.append(out_path)
        frame_seconds.append(time.perf_counter() - frame_start)
        frame_losses.append(float(aux.loss))
        logger.info(
            "Sweep frame %d/%d (weights %s, loss %.4g, %.2fs): %s",
            i + 1, len(weights_rows),
            "/".join(f"{w:.3f}" for w in weights),
            frame_losses[-1], frame_seconds[-1], out_path,
        )

    video_path: Path | None = None
    # sweep_weights enforces n_frames >= 2, so the loop above always
    # produced frames; the guard is belt-and-braces.
    if outputs:  # pragma: no branch
        joined = "+".join(p.stem.replace(" ", "_") for p in style_paths)
        video_path = (
            output_dir
            / f"blend_sweep_{content_path.stem.replace(' ', '_')}"
              f"_x_{joined}.gif"
        )
        assemble_output_video(
            outputs, video_path,
            output_fps or float(config.video.fps), config,
        )

    return BlendSweepResult(
        frame_paths=outputs,
        video_path=video_path,
        total_steps=total_steps,
        frame_seconds=tuple(frame_seconds),
        frame_losses=tuple(frame_losses),
    )
