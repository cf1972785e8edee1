"""Top-level style-transfer orchestration.

Preserves the reference's ``style_transfer(paths, config)`` contract and
ordering (main.py:20-167): validate -> final-only cascade -> seed/device
-> load images -> auto video mode -> model/targets/optimizer -> sinks and
intro -> optimization -> outro -> close sinks -> persist outputs ->
return the clipped result image ((1, H, W, 3) NHWC in [0, 1]).
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import TYPE_CHECKING

import jax
import numpy as np

import style_transfer_visualizer_tpu.image_io as stv_image_io
import style_transfer_visualizer_tpu.runtime as stv_runtime
from style_transfer_visualizer_tpu.constants import (
    AUTO_REMAT_PIXEL_THRESHOLD,
    AUTO_TILE_PIXEL_THRESHOLD,
    BATCH_AUTO_REMAT_PIXEL_THRESHOLD,
)
from style_transfer_visualizer_tpu.engine.runner import OptimizationRunner
from style_transfer_visualizer_tpu.engine.step import build_update_step
from style_transfer_visualizer_tpu.media import encode as stv_encode
from style_transfer_visualizer_tpu.media import segments as stv_segments
from style_transfer_visualizer_tpu.media.modes import select_video_mode
from style_transfer_visualizer_tpu.models.features import (
    compute_targets,
    initialize_input,
    targets_maybe_blended,
)
from style_transfer_visualizer_tpu.models.arch import (
    get_architecture,
    layer_table_from_params,
)
from style_transfer_visualizer_tpu.models.vgg19 import load_pretrained_params
from style_transfer_visualizer_tpu.ops.precision import PrecisionPolicy
from style_transfer_visualizer_tpu.type_defs import InputPaths, SaveOptions
from style_transfer_visualizer_tpu.utils.logging import logger

if TYPE_CHECKING:
    from style_transfer_visualizer_tpu.config import (
        StyleTransferConfig,
        VideoConfig,
    )
    from style_transfer_visualizer_tpu.engine.step import StepBundle
    from style_transfer_visualizer_tpu.media.sinks import VideoFrameSink


def style_transfer(
    paths: InputPaths,
    config: StyleTransferConfig,
    style_blend: list[tuple[str, float]] | None = None,
) -> jax.Array:
    """Run the full pipeline; return the final image in [0, 1].

    ``style_blend`` — a list of ``(style_path, weight)`` covering every
    style — switches the run to multi-style *interpolation*: per-style
    Gram targets blend by weight into one objective
    (``models.features.blend_targets``) and one stylized output named
    with the joined style stems. ``paths.style_path`` stays the
    display style (intro/outro gallery panels); the reference supports
    exactly one style image per run (core_model.py:218-232).
    """
    stv_runtime.validate_input_paths(paths.content_path, paths.style_path)
    for blend_path, _ in style_blend or ():
        stv_runtime.validate_input_paths(paths.content_path, blend_path)
    stv_runtime.validate_parameters(config.video.quality)

    # Final-only mode disables all timelapse outputs.
    if config.video.final_only:
        config.video.create_video = False
        config.video.create_gif = False
        config.video.save_every = config.optimization.steps + 1

    from style_transfer_visualizer_tpu.utils.cache import (  # noqa: PLC0415
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    # Device FIRST: an explicit --device cpu pins the platform before
    # jax.random.key initializes backends, skipping remote-accelerator
    # plugin startup (the axon tunnel costs ~1-4 min) entirely.
    device = stv_runtime.setup_device(config.hardware.device)
    key = stv_runtime.setup_random_seed(config.optimization.seed)

    with jax.default_device(device):
        return _run_on_device(paths, config, key, style_blend=style_blend)


def _run_on_device(
    paths: InputPaths,
    config: StyleTransferConfig,
    key: jax.Array,
    style_blend: list[tuple[str, float]] | None = None,
) -> jax.Array:
    opt_cfg = config.optimization

    # Color preservation (Gatys et al. 2016; ops/color.py): "match"
    # remaps every style image onto the content's color statistics on
    # the host before targets are computed; "luminance" leaves the
    # optimization alone and recolors every output (frames, final PNG,
    # return value) with the content's chrominance.
    content_host = stv_image_io.load_image_to_host_array(paths.content_path)
    content_img = stv_image_io.host_array_to_device(
        content_host, normalize=opt_cfg.normalize,
    )
    match_to = (
        content_host if opt_cfg.preserve_color == "match" else None
    )
    chroma_source = (
        stv_image_io.host_array_to_device(content_host)
        if opt_cfg.preserve_color == "luminance"
        else None
    )
    style_img = stv_image_io.load_style_image_to_array(
        paths.style_path, normalize=opt_cfg.normalize, match_to=match_to,
    )
    blend_imgs: list[tuple[jax.Array, float]] | None = None
    if style_blend:
        blend_imgs = [
            (
                stv_image_io.load_style_image_to_array(
                    blend_path,
                    normalize=opt_cfg.normalize,
                    match_to=match_to,
                ),
                float(weight),
            )
            for blend_path, weight in style_blend
        ]

    _resolve_auto_coarse(config, content_img)

    if config.video.create_video:
        height, width = content_img.shape[1:3]
        effective_mode, reason, frame_estimate = select_video_mode(
            config.video,
            frame_size=(int(width), int(height)),
            total_steps=opt_cfg.steps,
        )
        if effective_mode != config.video.mode:
            config.video.mode = effective_mode
        if reason is not None:
            logger.info(
                "Auto-selected postprocess video mode (%s). "
                "Estimated frames: %d.",
                reason,
                frame_estimate,
            )

    bundle, input_img = _prepare_model_and_input(
        content_img, style_img, config, key, blend_imgs=blend_imgs,
    )

    content_path = Path(paths.content_path)
    style_path = Path(paths.style_path)
    style_name = None
    if style_blend:
        # Blended outputs name every contributing style, in user order.
        style_name = "+".join(
            Path(blend_path).stem for blend_path, _ in style_blend
        )
    result = run_with_artifacts(
        bundle.update_fn,
        bundle.chunked_update_fn,
        bundle.opt_state,
        input_img,
        config,
        content_path=content_path,
        style_path=style_path,
        style_name=style_name,
        chroma_source=chroma_source,
    )
    return result.image


@dataclass(slots=True)
class ArtifactRunResult:
    """What the shared artifact-contract loop hands back to its caller."""

    #: Prepared final image in [0, 1] (chroma-restored when requested).
    image: jax.Array
    #: Path of the saved final PNG.
    final_path: Path
    #: Exported loss history (empty when CSV logging owned the series).
    loss_history: dict[str, list[float]]
    #: Optimization wall-clock seconds.
    elapsed: float
    #: Last host-synced total loss (NaN when no row ever synced).
    final_total_loss: float


def run_with_artifacts(
    update_fn,
    chunked_update_fn,
    opt_state,
    input_img: jax.Array,
    config: StyleTransferConfig,
    *,
    content_path: Path,
    style_path: Path,
    style_name: str | None = None,
    chroma_source: jax.Array | None = None,
    final_name: str | None = None,
) -> ArtifactRunResult:
    """Drive a prepared update loop with the full artifact contract.

    Everything downstream of model preparation in the reference's
    orchestration (main.py:85-165) lives here — timelapse MP4/GIF sinks
    with intro/outro gallery segments, loss CSV or in-memory history
    feeding the loss plot, checkpoint/resume, artifact-survival on sink
    failure, and the final PNG — so every execution mode (single,
    blended, regional) shares one contract. ``style_name`` overrides the
    style stem in artifact names (multi-style modes join their stems);
    ``final_name`` overrides the final PNG's canonical
    ``stylized_{content}_x_{style}.png`` name. ``content_path`` and
    ``style_path`` also feed the intro/outro gallery panels.
    """
    opt_cfg = config.optimization
    output_path = stv_runtime.setup_output_directory(config.output.output)
    content_name = content_path.stem
    if style_name is None:
        style_name = style_path.stem
    video_name = f"timelapse_{content_name}_x_{style_name}.mp4"
    gif_name = f"timelapse_{content_name}_x_{style_name}.gif"

    video_writer = stv_encode.setup_video_writer(
        config.video, output_path, video_name,
    )
    gif_collector = stv_encode.setup_gif_collector(
        config.video, output_path, gif_name,
    )
    gif_segment_options = stv_segments.GifSegmentOptions(
        sink=gif_collector,
        include_intro=config.video.gif_include_intro,
        include_outro=config.video.gif_include_outro,
    )

    intro_last_frame = None
    intro_crossfade_frames = 0
    gif_intro_requested = (
        gif_segment_options.sink is not None
        and gif_segment_options.include_intro
    )
    if video_writer is not None or gif_intro_requested:
        intro_info = stv_segments.prepare_intro_segment(
            config.video,
            video_writer,
            (content_path, style_path),
            gif_options=gif_segment_options,
        )
        if intro_info is not None:
            intro_last_frame, intro_crossfade_frames = intro_info

    start_step = 0
    if config.output.resume_from:
        from style_transfer_visualizer_tpu.runtime.checkpoint import (  # noqa: PLC0415
            load_checkpoint,
        )

        ckpt = load_checkpoint(config.output.resume_from, opt_state)
        input_img, opt_state = ckpt.image, ckpt.opt_state
        start_step = min(ckpt.step, opt_cfg.steps)

    checkpoint_path = None
    if config.output.checkpoint_every > 0:
        checkpoint_path = (
            Path(config.output.checkpoint_path)
            if config.output.checkpoint_path
            else output_path / "checkpoint.npz"
        )

    runner = OptimizationRunner(
        update_fn,
        opt_state,
        input_img,
        config,
        video_writer=video_writer,
        gif_collector=gif_collector,
        intro_last_frame=intro_last_frame,
        intro_crossfade_frames=intro_crossfade_frames,
        start_step=start_step,
        checkpoint_path=checkpoint_path,
        chunked_update_fn=chunked_update_fn,
        chroma_source=chroma_source,
    )
    # The optimized image must survive late media failures: every sink
    # is closed even when one fails, and the final PNG is saved before
    # any close error is re-raised (the reference loses both,
    # main.py:144-165 unprotected). Close errors are tracked per sink so
    # a failed GIF encode does not mislabel a fine MP4 (or vice versa).
    close_errors: dict[str, Exception] = {}
    try:
        if config.output.profile_dir:
            logger.info(
                "Profiling optimization loop to %s",
                config.output.profile_dir,
            )
            with jax.profiler.trace(config.output.profile_dir):
                input_img, loss_metrics, elapsed = runner.run()
        else:
            input_img, loss_metrics, elapsed = runner.run()

        _maybe_append_final_segments(
            config.video,
            video_writer,
            gif_segment_options,
            content_path,
            style_path,
            input_img,
            normalize=opt_cfg.normalize,
            chroma_source=chroma_source,
        )
    finally:
        for sink_name, sink in (
            ("video", video_writer),
            ("gif", gif_collector),
        ):
            if not sink:
                continue
            try:
                sink.close()
            except Exception as exc:  # noqa: BLE001
                logger.error(
                    "Error closing %s media sink: %s", sink_name, exc,
                )
                close_errors[sink_name] = exc

    save_opts = SaveOptions(
        content_name=content_name,
        style_name=style_name,
        video_name=video_name if video_writer else None,
        gif_name=gif_name if gif_collector else None,
        normalize=opt_cfg.normalize,
        video_created=video_writer is not None
        and "video" not in close_errors,
        gif_created=gif_collector is not None and "gif" not in close_errors,
        plot_losses=config.output.plot_losses,
        chroma_source=chroma_source,
        final_name=final_name,
    )
    stv_runtime.save_outputs(
        input_img, loss_metrics, output_path, elapsed, save_opts,
    )
    if close_errors:
        raise next(iter(close_errors.values()))

    from style_transfer_visualizer_tpu.ops.color import (  # noqa: PLC0415
        maybe_restore_color,
    )

    if loss_metrics.get("total_loss"):
        final_total = float(loss_metrics["total_loss"][-1])
    elif runner.latest_logged is not None:
        final_total = runner.latest_logged.total_loss
    else:
        final_total = float("nan")
    final_path = (
        output_path / final_name
        if final_name is not None
        else stv_runtime.stylized_image_path_from_names(
            output_path, content_name, style_name,
        )
    )
    return ArtifactRunResult(
        image=maybe_restore_color(
            stv_image_io.prepare_image_for_output(
                input_img, normalize=opt_cfg.normalize,
            ),
            chroma_source,
        ),
        final_path=final_path,
        loss_history=loss_metrics,
        elapsed=elapsed,
        final_total_loss=final_total,
    )


def multi_style_transfer(
    content_path: str,
    style_paths: list[str],
    config: StyleTransferConfig,
) -> list[Path]:
    """Optimize one content image against S styles in parallel.

    Styles shard across available devices on the ``style`` mesh axis
    (vmapped stacked update); outputs save as
    ``stylized_{content}_x_{style_i}.png``. ``--gif`` produces one
    timelapse GIF per style and video one postprocess MP4 per style
    (realtime streaming mode is promoted to postprocess).
    """
    from style_transfer_visualizer_tpu.parallel.mesh import (  # noqa: PLC0415
        create_mesh,
    )
    from style_transfer_visualizer_tpu.parallel.multistyle import (  # noqa: PLC0415
        build_multi_style_update,
        initialize_multi_inputs,
        multi_style_targets,
    )
    from style_transfer_visualizer_tpu.utils.cache import (  # noqa: PLC0415
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    if not style_paths:
        msg = "multi_style_transfer requires at least one style path"
        raise ValueError(msg)
    # Final-only mode disables timelapse outputs (same cascade as the
    # single-run path).
    if config.video.final_only:
        config.video.create_video = False
        config.video.create_gif = False
    for style_path in style_paths:
        stv_runtime.validate_input_paths(content_path, style_path)

    opt_cfg = config.optimization
    device = stv_runtime.setup_device(config.hardware.device)
    key = stv_runtime.setup_random_seed(opt_cfg.seed)

    with jax.default_device(device):
        # Same color-preservation contract as the single-run path:
        # "match" recolors every style before its targets, "luminance"
        # recolors every output against the one shared content image.
        content_host = stv_image_io.load_image_to_host_array(content_path)
        content_img = stv_image_io.host_array_to_device(
            content_host, normalize=opt_cfg.normalize,
        )
        match_to = (
            content_host if opt_cfg.preserve_color == "match" else None
        )
        chroma_source = (
            stv_image_io.host_array_to_device(content_host)
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
        _resolve_auto_coarse(config, content_img)
        n_styles = len(style_imgs)
        n_space = config.hardware.spatial_shards
        n_devices = len(jax.devices(device.platform))
        if n_devices % n_space != 0:
            msg = (
                f"--spatial-shards {n_space} must divide the "
                f"{n_devices} attached {device.platform} devices"
            )
            raise ValueError(msg)
        # Largest divisor of S that fits the devices left after the
        # space axis takes its share.
        style_budget = n_devices // n_space
        n_style_axis = max(
            d for d in range(1, min(n_styles, style_budget) + 1)
            if n_styles % d == 0
        )
        mesh = create_mesh(
            n_style=n_style_axis, n_space=n_space,
            devices=jax.devices(device.platform),
        )
        logger.info(
            "Multi-style run: %d styles over a %d-device style axis"
            "%s.",
            n_styles, n_style_axis,
            f" x {n_space}-way row sharding" if n_space > 1 else "",
        )
        if n_space > 1:
            return _dp_sp_multi_style(
                mesh, params, content_img, style_imgs, style_paths,
                content_path, config, key,
                chroma_source=chroma_source,
            )

        from style_transfer_visualizer_tpu.ops.gram import (  # noqa: PLC0415
            resolve_gram_backend,
        )
        from style_transfer_visualizer_tpu.ops.pallas_conv import (  # noqa: PLC0415
            resolve_conv_backend,
        )

        gram_backend = resolve_gram_backend(config.hardware.gram_backend)
        if resolve_conv_backend(config.hardware.conv_backend) == "pallas":
            logger.warning(
                "--conv-backend pallas is not supported in batch "
                "(vmapped multi-style) mode; using the XLA conv.",
            )
        targets = multi_style_targets(
            params, content_img, style_imgs,
            tuple(opt_cfg.style_layers), tuple(opt_cfg.content_layers),
            precision=_precision(config.hardware.precision),
            gram_backend=gram_backend,
        )
        _, height, width, _ = content_img.shape
        # Activation memory multiplies by the per-device style count, so
        # remat keys on pixels x styles — against the measured batched
        # ceiling, which sits higher than the single-run threshold
        # because the vmapped graph itself does not grow with S.
        styles_per_device = max(1, n_styles // n_style_axis)
        remat = opt_cfg.remat or _auto_remat_batched(
            int(height) * int(width), styles_per_device,
        )
        lap_target = None
        if opt_cfg.lap_w:
            from style_transfer_visualizer_tpu.ops.lap import (  # noqa: PLC0415
                lap_response,
            )

            # One content image serves every style; the response
            # replicates across the style axis inside the builder.
            lap_target = lap_response(content_img, opt_cfg.lap_pool)
        bundle = build_multi_style_update(
            mesh, params, targets, tuple(content_img.shape), n_styles,
            optimizer=opt_cfg.optimizer,
            lr=opt_cfg.lr,
            style_w=opt_cfg.style_w,
            content_w=opt_cfg.content_w,
            tv_w=opt_cfg.tv_w,
            lap_w=opt_cfg.lap_w,
            lap_pool=opt_cfg.lap_pool,
            lap_target=lap_target,
            style_layers=tuple(opt_cfg.style_layers),
            style_weights=opt_cfg.style_weights_tuple(),
            content_layers=tuple(opt_cfg.content_layers),
            precision=config.hardware.precision,
            lbfgs_max_iter=opt_cfg.lbfgs_max_iter,
            lbfgs_max_eval=opt_cfg.lbfgs_max_eval,
            lbfgs_history_size=opt_cfg.lbfgs_history_size,
            lbfgs_history_dtype=opt_cfg.lbfgs_history_dtype,
            lbfgs_direction=opt_cfg.lbfgs_direction,
            remat=remat,
            gram_backend=gram_backend,
        )
        images = _multi_initial_images(
            mesh, params, content_img, style_imgs, config, key,
            n_styles, gram_backend, styles_per_device,
        )
        state = bundle.opt_state

        output_path = stv_runtime.setup_output_directory(
            config.output.output,
        )
        style_names = [Path(p).stem for p in style_paths]
        images, state, close_errors = _run_multi_style_loop(
            bundle, images, state, config, output_path, style_names,
            content_name=Path(content_path).stem,
            content_path=Path(content_path),
            style_paths=[Path(p) for p in style_paths],
            chroma_source=chroma_source,
        )

        saved = _save_multi_style_outputs(
            images, style_paths, content_path, output_path,
            normalize=opt_cfg.normalize,
            chroma_source=chroma_source,
        )
        if close_errors:
            raise close_errors[0]
        return saved


def _multi_initial_images(
    mesh,
    params,
    content_img: jax.Array,
    style_imgs: list[jax.Array],
    config: StyleTransferConfig,
    key: jax.Array,
    n_styles: int,
    gram_backend: str,
    styles_per_device: int,
) -> jax.Array:
    """Stacked starting images; coarse warm start when requested.

    The coarse phase is the batch analog of ``engine.coarse``: one
    vmapped half-resolution problem over the same style mesh axis, so
    all S styles warm-start in a single compiled executable. The
    full-res init stack is only materialized on the fallback paths —
    a successful warm start replaces it wholesale, and the (S,1,H,W,3)
    buffers matter exactly when the batch is near the HBM ceiling.
    """
    from style_transfer_visualizer_tpu.engine.coarse import (  # noqa: PLC0415
        plan_pyramid,
        resize_image,
    )
    from style_transfer_visualizer_tpu.engine.runner import (  # noqa: PLC0415
        DEFAULT_CHUNK,
    )
    from style_transfer_visualizer_tpu.engine.step import (  # noqa: PLC0415
        drive_chunked,
    )
    from style_transfer_visualizer_tpu.parallel.multistyle import (  # noqa: PLC0415
        build_multi_style_update,
        initialize_multi_inputs,
        multi_style_targets,
    )

    opt_cfg = config.optimization
    _, height, width, _ = content_img.shape
    schedule: list[tuple[int, int, int]] = []
    if opt_cfg.coarse_steps > 0 and config.output.resume_from:
        logger.info("Coarse warm start skipped: resuming a checkpoint.")
    else:
        schedule = plan_pyramid(
            int(height), int(width), opt_cfg.coarse_steps,
            opt_cfg.pyramid_levels,
        )
    if not schedule:
        return initialize_multi_inputs(
            content_img, opt_cfg.init_method, key, n_styles,
        )

    x = None
    for ch, cw, steps in schedule:
        coarse_content = resize_image(content_img, ch, cw)
        coarse_targets = multi_style_targets(
            params, coarse_content,
            [resize_image(s, ch, cw) for s in style_imgs],
            tuple(opt_cfg.style_layers), tuple(opt_cfg.content_layers),
            precision=_precision(config.hardware.precision),
            gram_backend=gram_backend,
        )
        # Same per-device activation-memory rule as the main batch
        # phase, keyed on this level's pixel count (a 32-style coarse
        # phase at 512px sits past the whole-activation ceiling too).
        remat = opt_cfg.remat or _auto_remat_batched(
            ch * cw, styles_per_device,
        )
        lap_w = opt_cfg.lap_w
        lap_target = None
        if lap_w and min(ch, cw) // opt_cfg.lap_pool < 3:  # noqa: PLR2004
            logger.info(
                "Coarse level %dx%d is too small for lap_pool=%d; the "
                "Laplacian term starts at the next level.",
                cw, ch, opt_cfg.lap_pool,
            )
            lap_w = 0.0
        if lap_w:
            from style_transfer_visualizer_tpu.ops.lap import (  # noqa: PLC0415
                lap_response,
            )

            lap_target = lap_response(coarse_content, opt_cfg.lap_pool)
        coarse_bundle = build_multi_style_update(
            mesh, params, coarse_targets, tuple(coarse_content.shape),
            n_styles,
            optimizer=opt_cfg.optimizer,
            lr=opt_cfg.lr,
            style_w=opt_cfg.style_w,
            content_w=opt_cfg.content_w,
            tv_w=opt_cfg.tv_w,
            lap_w=lap_w,
            lap_pool=opt_cfg.lap_pool,
            lap_target=lap_target,
            style_layers=tuple(opt_cfg.style_layers),
            style_weights=opt_cfg.style_weights_tuple(),
            content_layers=tuple(opt_cfg.content_layers),
            precision=config.hardware.precision,
            lbfgs_max_iter=opt_cfg.lbfgs_max_iter,
            lbfgs_max_eval=opt_cfg.lbfgs_max_eval,
            lbfgs_history_size=opt_cfg.lbfgs_history_size,
            lbfgs_history_dtype=opt_cfg.lbfgs_history_dtype,
            lbfgs_direction=opt_cfg.lbfgs_direction,
            remat=remat,
            gram_backend=gram_backend,
        )
        if x is None:
            x = initialize_multi_inputs(
                coarse_content, opt_cfg.init_method, key, n_styles,
            )
        else:
            x = jax.image.resize(
                x, (n_styles, 1, ch, cw, 3), method="linear",
            )
        state = coarse_bundle.opt_state
        logger.info(
            "Coarse warm start: %d vmapped steps at %dx%d for %d styles.",
            steps, cw, ch, n_styles,
        )
        x, _, _aux = drive_chunked(
            coarse_bundle.chunked_update_fn, x, state,
            steps, DEFAULT_CHUNK,
        )
    return jax.image.resize(
        x, (n_styles, 1, int(height), int(width), 3), method="linear",
    )


def _dp_sp_multi_style(
    mesh,
    params,
    content_img: jax.Array,
    style_imgs: list[jax.Array],
    style_paths: list[str],
    content_path: str,
    config: StyleTransferConfig,
    key: jax.Array,
    *,
    chroma_source: jax.Array | None = None,
) -> list[Path]:
    """S styles x N row shards on one mesh (configs[2] x configs[3]).

    Each device holds a row block of its styles' images; convolutions
    halo-exchange over the space axis and Gram partials psum over ICI,
    while styles stay embarrassingly parallel on the style axis. Style
    Gram targets compute whole-image (style images need no divisibility
    property); content targets shard like the images.
    """
    import jax.numpy as jnp  # noqa: PLC0415

    from style_transfer_visualizer_tpu.models.features import (  # noqa: PLC0415
        Targets,
    )
    from style_transfer_visualizer_tpu.parallel.multistyle import (  # noqa: PLC0415
        MultiStyleBundle,
    )
    from style_transfer_visualizer_tpu.parallel.spatial import (  # noqa: PLC0415
        build_dp_sp_update,
        compute_sharded_targets,
    )

    opt_cfg = config.optimization
    precision = _precision(config.hardware.precision)
    style_layers = tuple(opt_cfg.style_layers)
    content_layers = tuple(opt_cfg.content_layers)
    n_styles = len(style_imgs)

    grams = [
        compute_targets(
            params, s, s, style_layers, (), precision=precision,
        ).style_grams
        for s in style_imgs
    ]
    content_only = compute_sharded_targets(
        mesh, params, content_img, content_img, (), content_layers,
        precision=precision,
    )
    # Stack/broadcast directly into the dp x sp sharding: an eager
    # broadcast would transiently materialize S identical full-size
    # feature maps (GBs at 4K x 8 styles) before the reshard.
    from jax.sharding import NamedSharding  # noqa: PLC0415
    from jax.sharding import PartitionSpec as P  # noqa: PLC0415

    from style_transfer_visualizer_tpu.constants import (  # noqa: PLC0415
        MESH_AXIS_SPACE,
        MESH_AXIS_STYLE,
    )

    content_feats = dict(content_only.content_feats)
    if opt_cfg.lap_w:
        # Composes with dp x sp: the padded whole-image target
        # broadcasts over styles and row-shards with the content
        # features; each shard evaluates the stencil halo-exactly.
        from style_transfer_visualizer_tpu.parallel.spatial import (  # noqa: PLC0415
            LAP_RESPONSE_KEY,
            padded_lap_target,
            validate_lap_shard_divisibility,
        )

        validate_lap_shard_divisibility(
            int(content_img.shape[1]),
            mesh.shape[MESH_AXIS_SPACE],
            opt_cfg.lap_pool,
        )
        content_feats[LAP_RESPONSE_KEY] = padded_lap_target(
            content_img, opt_cfg.lap_pool,
        )

    target_shardings = Targets(
        style_grams={
            k: NamedSharding(mesh, P(MESH_AXIS_STYLE))
            for k in style_layers
        },
        content_feats={
            k: NamedSharding(
                mesh,
                P(MESH_AXIS_STYLE, None, MESH_AXIS_SPACE, None, None),
            )
            for k in content_feats
        },
    )

    def stack_targets(grams_list, feats):
        return Targets(
            style_grams={
                k: jnp.stack([g[k] for g in grams_list])
                for k in style_layers
            },
            content_feats={
                k: jnp.broadcast_to(f, (n_styles, *f.shape))
                for k, f in feats.items()
            },
        )

    stacked = jax.jit(stack_targets, out_shardings=target_shardings)(
        grams, content_feats,
    )
    update_fn, state, chunked_update_fn = build_dp_sp_update(
        mesh, params, stacked, tuple(content_img.shape), n_styles,
        optimizer=opt_cfg.optimizer,
        lr=opt_cfg.lr,
        style_w=opt_cfg.style_w,
        content_w=opt_cfg.content_w,
        tv_w=opt_cfg.tv_w,
        lap_w=opt_cfg.lap_w,
        lap_pool=opt_cfg.lap_pool,
        style_layers=style_layers,
        style_weights=opt_cfg.style_weights_tuple(),
        content_layers=content_layers,
        precision=precision,
        lbfgs_max_iter=opt_cfg.lbfgs_max_iter,
        lbfgs_max_eval=opt_cfg.lbfgs_max_eval,
        lbfgs_history_size=opt_cfg.lbfgs_history_size,
        lbfgs_history_dtype=opt_cfg.lbfgs_history_dtype,
        lbfgs_direction=opt_cfg.lbfgs_direction,
    )
    bundle = MultiStyleBundle(
        update_fn=update_fn, opt_state=state, targets=stacked,
        chunked_update_fn=chunked_update_fn,
    )
    # Coarse warm start composes with dp x sp: the coarse levels are
    # small enough to run style-sharded only (replicated over the space
    # axis via the shared batch warm-start machinery), and the full-res
    # result then reshards onto the dp x sp layout.
    images = jax.device_put(
        _multi_initial_images(
            mesh, params, content_img, style_imgs, config, key,
            n_styles, "xla",
            max(1, n_styles // mesh.shape[MESH_AXIS_STYLE]),
        ),
        NamedSharding(
            mesh, P(MESH_AXIS_STYLE, None, MESH_AXIS_SPACE, None, None),
        ),
    )
    output_path = stv_runtime.setup_output_directory(config.output.output)
    style_names = [Path(p).stem for p in style_paths]
    images, state, close_errors = _run_multi_style_loop(
        bundle, images, state, config, output_path, style_names,
        content_name=Path(content_path).stem,
        content_path=Path(content_path),
        style_paths=[Path(p) for p in style_paths],
        chroma_source=chroma_source,
    )
    saved = _save_multi_style_outputs(
        images, style_paths, content_path, output_path,
        normalize=opt_cfg.normalize,
        chroma_source=chroma_source,
    )
    if close_errors:
        raise close_errors[0]
    return saved


def _append_batch_outros(
    config: StyleTransferConfig,
    images: jax.Array,
    content_path: Path | None,
    style_paths: list[Path] | None,
    gif_sinks: list,
    video_sinks: list,
    *,
    normalize: bool,
    chroma_source: jax.Array | None = None,
) -> None:
    """Per-style outro comparison segments for batch timelapses.

    Mirrors the single-run outro (`_maybe_append_final_segments`): each
    style's sinks get a hold of its final frame, a crossfade into the
    gallery comparison of (content, that style, that result), and an
    outro hold — gated by ``final_frame_compare`` and, for GIFs,
    ``gif_include_outro``.
    """
    if not config.video.final_frame_compare:
        return
    if content_path is None or style_paths is None:
        return
    include_gif_outro = config.video.gif_include_outro
    wanted = []
    for i in range(len(style_paths)):
        has_video = video_sinks[i] is not None
        wants_gif = gif_sinks[i] is not None and include_gif_outro
        wanted.append(has_video or wants_gif)
    if not any(wanted):
        return

    from style_transfer_visualizer_tpu.ops.color import (  # noqa: PLC0415
        maybe_restore_color,
    )

    prepared = maybe_restore_color(
        stv_image_io.prepare_image_for_output(images, normalize=normalize),
        chroma_source,
    )
    frames = np.asarray(stv_image_io.pack_uint8_frames_batch(prepared))
    for i, style_path in enumerate(style_paths):
        if not wanted[i]:
            continue
        gif_options = None
        if gif_sinks[i] is not None:
            gif_options = stv_segments.GifSegmentOptions(
                sink=gif_sinks[i],
                include_intro=False,
                include_outro=include_gif_outro,
            )
        stv_segments.append_final_comparison_frame(
            config.video,
            video_sinks[i],
            (Path(content_path), Path(style_path)),
            np.ascontiguousarray(frames[i]),
            gif_options=gif_options,
        )


def resolve_single_remat(
    height: int,
    width: int,
    tile_rows: int,
    requested: bool,
) -> bool:
    """Production remat setting for a single whole-image run.

    Banded evaluation owns its memory policy (each band recomputes by
    construction), so tiling disables remat; otherwise an explicit
    request or the 4MP auto threshold enables it. Public so benchmark
    configs can resolve exactly what a CLI run would (the round-3
    1440p staleness: a benchmark's hardcoded remat drifted from this
    rule and under-reported for two rounds).
    """
    return not tile_rows and (
        requested
        or int(height) * int(width) >= AUTO_REMAT_PIXEL_THRESHOLD
    )


def _auto_remat_batched(pixels: int, styles_per_device: int) -> bool:
    """Whether a batch run's per-device activations need remat.

    Keyed on pixels x styles against the measured whole-activation HBM
    ceiling (24 styles x 512px fits, 32 OOMs; rematerializing early
    costs 29% — BASELINE.md batch-scaling table).
    """
    return pixels * styles_per_device >= BATCH_AUTO_REMAT_PIXEL_THRESHOLD


def _save_multi_style_outputs(
    images: jax.Array,
    style_paths: list[str],
    content_path: str,
    output_path: Path,
    *,
    normalize: bool,
    chroma_source: jax.Array | None = None,
) -> list[Path]:
    """Persist one stylized PNG per style with canonical names."""
    from style_transfer_visualizer_tpu.ops.color import (  # noqa: PLC0415
        maybe_restore_color,
    )

    content_name = Path(content_path).stem
    saved: list[Path] = []
    for i, style_path in enumerate(style_paths):
        final = maybe_restore_color(
            stv_image_io.prepare_image_for_output(
                images[i], normalize=normalize,
            ),
            chroma_source,
        )
        out_file = stv_runtime.stylized_image_path_from_names(
            output_path, content_name, Path(style_path).stem,
        )
        stv_image_io.save_array_as_image(final, out_file)
        logger.info("Stylized image saved to: %s", out_file)
        saved.append(out_file)
    return saved


def _resolve_batch_chunk(bundle, config: StyleTransferConfig) -> int:
    """Steps fused into one batch-mode dispatch (``lax.scan``).

    Same invariant as the single-run engine
    (engine/runner.py:_resolve_chunk_size) minus the logging cadence:
    chunked dispatch stacks every step's losses, so CSV rows and plot
    history can be read off interior steps of a chunk — only
    checkpointing and per-style GIF frame extraction (which need the
    materialized image/state at an exact step) must land on a chunk
    boundary. A user ``--steps-per-dispatch`` folds into the same gcd.
    """
    if getattr(bundle, "chunked_update_fn", None) is None:
        return 1
    from style_transfer_visualizer_tpu.engine.runner import (  # noqa: PLC0415
        aligned_chunk,
    )

    requested = config.hardware.steps_per_dispatch
    if requested == 1:
        return 1
    cadences = []
    if config.output.checkpoint_every:
        cadences.append(config.output.checkpoint_every)
    if (
        config.video.create_gif or config.video.create_video
    ) and config.video.save_every:  # pragma: no branch (save_every >= 1)
        cadences.append(config.video.save_every)
    if requested > 1:
        cadences.append(requested)
    return aligned_chunk(cadences)


def _run_multi_style_loop(
    bundle,
    images: jax.Array,
    state,
    config: StyleTransferConfig,
    output_path: Path,
    style_names: list[str],
    content_name: str = "content",
    content_path: Path | None = None,
    style_paths: list[Path] | None = None,
    chroma_source: jax.Array | None = None,
):
    """The batch-mode optimization loop with the full logging contract.

    Batch mode keeps per-style loss CSVs (``<log_loss stem>_<style>``),
    per-style loss plots, checkpoint/resume of the stacked problem,
    cadence-gated host syncs, and one timelapse per style: with
    ``--gif`` a looping GIF, with video a postprocess MP4 (streaming
    ``realtime`` mode is promoted — S concurrent ffmpeg encoders would
    contend on the host, while spilled frames encode serially on
    close). Frames for all S styles are packed on-device in a single
    dispatch at the ``save_every`` cadence and fan out to the per-style
    sinks on the async frame worker, so encoding never stalls step
    dispatch. Batch timelapses always end on the final image, and each
    style's sinks receive the same intro and outro segments as a single
    run under the same gates (``intro_enabled``/``final_frame_compare``
    for MP4, ``gif_include_intro``/``gif_include_outro`` for GIFs): the
    per-style intro fade+hold is appended at sink setup and the
    crossfade into that style's first stylized frame fires on the FIFO
    frame worker, so ordering matches the single-run contract.

    Returns ``(images, state, close_errors)``; callers persist the
    stylized PNGs before re-raising any sink close error, matching the
    single-run artifact-survival contract.
    """
    opt_cfg = config.optimization
    out_cfg = config.output
    if config.video.create_video and config.video.mode != "postprocess":
        # S concurrent streaming encoders would contend on the host;
        # spilled frames encode serially on close instead.
        logger.info(
            "Batch (multi-style) mode encodes MP4 in postprocess mode; "
            "promoting from '%s'.", config.video.mode,
        )
        config.video.mode = "postprocess"
    if config.video.create_video or config.video.create_gif:
        logger.info(
            "Batch mode writes one timelapse per style, with the same "
            "intro/outro segments as a single run where enabled.",
        )

    from style_transfer_visualizer_tpu.engine.loss_logger import (  # noqa: PLC0415
        LossCSVLogger,
    )

    start_step = 0
    if out_cfg.resume_from:
        from style_transfer_visualizer_tpu.runtime.checkpoint import (  # noqa: PLC0415
            load_checkpoint,
        )

        ckpt = load_checkpoint(out_cfg.resume_from, state)
        images, state = ckpt.image, ckpt.opt_state
        start_step = min(ckpt.step, opt_cfg.steps)
        logger.info("Resumed batch run at step %d.", start_step)

    checkpoint_path = None
    if out_cfg.checkpoint_every > 0:
        checkpoint_path = (
            Path(out_cfg.checkpoint_path)
            if out_cfg.checkpoint_path
            else output_path / "checkpoint.npz"
        )

    # Per-style media sinks (GIF collectors and/or postprocess MP4
    # writers), fed by a single on-device packing dispatch at the
    # save_every cadence (S*H*W*3 uint8 bytes per extraction). Sinks are
    # also kept as (label, sink) pairs so close accounting can name the
    # failure.
    n_styles = len(style_names)
    gif_sinks: list = [None] * n_styles
    video_sinks: list = [None] * n_styles
    style_sinks: list[list[tuple[str, object]]] = [
        [] for _ in style_names
    ]
    media_names: list[str] = []
    frame_stream = None
    save_every = config.video.save_every
    if config.video.create_gif and save_every:
        for i, name in enumerate(style_names):
            gif_name = f"timelapse_{content_name}_x_{name}.gif"
            media_names.append(gif_name)
            gif_sinks[i] = stv_encode.GifFrameCollector(
                (output_path / gif_name).resolve(), config.video.fps,
            )
            style_sinks[i].append((gif_name, gif_sinks[i]))
    if config.video.create_video and save_every:
        for i, name in enumerate(style_names):
            video_name = f"timelapse_{content_name}_x_{name}.mp4"
            media_names.append(video_name)
            video_sinks[i] = stv_encode.setup_video_writer(
                config.video, output_path, video_name,
            )
            style_sinks[i].append((video_name, video_sinks[i]))
    if any(style_sinks):
        from style_transfer_visualizer_tpu.media.stream import (  # noqa: PLC0415
            AsyncFrameStream,
        )

        frame_stream = AsyncFrameStream()

    # Per-style intro segments, mirroring the single-run contract:
    # fade-in + hold appended at sink setup, crossfade into each style's
    # FIRST stylized frame deferred to delivery time (the frame worker
    # is FIFO, so the crossfade lands exactly once, in order).
    pending_intros: list[tuple[np.ndarray, int] | None] = [None] * n_styles
    if content_path is not None and style_paths is not None:
        for i in range(n_styles):
            if video_sinks[i] is None and gif_sinks[i] is None:
                continue
            gif_options = None
            if gif_sinks[i] is not None:
                gif_options = stv_segments.GifSegmentOptions(
                    sink=gif_sinks[i],
                    include_intro=config.video.gif_include_intro,
                )
            pending_intros[i] = stv_segments.prepare_intro_segment(
                config.video, video_sinks[i],
                (Path(content_path), Path(style_paths[i])),
                gif_options=gif_options,
            )

    from style_transfer_visualizer_tpu.ops.color import (  # noqa: PLC0415
        maybe_restore_color,
    )

    def submit_frames(imgs: jax.Array) -> None:
        """Pack all styles' frames on-device; deliver off-thread."""
        prepared = maybe_restore_color(
            stv_image_io.prepare_image_for_output(
                imgs, normalize=opt_cfg.normalize,
            ),
            chroma_source,
        )
        packed = stv_image_io.pack_uint8_frames_batch(prepared)

        def deliver(frames: np.ndarray) -> None:
            for i, (sinks, frame) in enumerate(zip(style_sinks, frames)):
                intro = pending_intros[i]
                if intro is not None:
                    intro_last, n_crossfade = intro
                    if (
                        video_sinks[i] is not None
                        # One-way: intro_enabled is the master switch —
                        # prepare_intro_segment returns None without it,
                        # so a pending intro implies it is set.
                        and config.video.intro_enabled  # pragma: no branch
                    ):
                        stv_segments.append_crossfade(
                            video_sinks[i], intro_last, frame, n_crossfade,
                        )
                    if (
                        gif_sinks[i] is not None
                        and config.video.gif_include_intro
                    ):
                        stv_segments.append_crossfade(
                            gif_sinks[i], intro_last, frame, n_crossfade,
                        )
                    pending_intros[i] = None
                for _, sink in sinks:
                    sink.append_data(frame)

        frame_stream.submit(packed, deliver)

    csv_loggers: list[LossCSVLogger | None] = [None] * len(style_names)
    if out_cfg.log_loss:
        base = Path(out_cfg.log_loss)
        for i, name in enumerate(style_names):
            per_style = base.with_name(
                f"{base.stem}_{name}{base.suffix or '.csv'}",
            )
            try:
                csv_loggers[i] = LossCSVLogger(
                    str(per_style),
                    out_cfg.log_every,
                    resume=start_step > 0,
                )
            except OSError as exc:
                logger.error(
                    "Failed to initialize CSV logging for style %s: %s",
                    name, exc,
                )
        logger.info(
            "Per-style loss CSV logging enabled under %s.", base.parent,
        )
    track_history = config.output.plot_losses and not out_cfg.log_loss
    histories: list[dict[str, list[float]]] = [
        {"style_loss": [], "content_loss": [], "total_loss": []}
        for _ in style_names
    ]

    from tqdm import tqdm  # noqa: PLC0415

    def log_step(step: int, vals) -> None:
        """One (3, S) row of host-side telemetry (style, content, total)."""
        for i in range(len(style_names)):
            if csv_loggers[i] is not None:
                csv_loggers[i].log(
                    step, float(vals[0, i]), float(vals[1, i]),
                    float(vals[2, i]),
                )
            if track_history:
                histories[i]["style_loss"].append(float(vals[0, i]))
                histories[i]["content_loss"].append(float(vals[1, i]))
                histories[i]["total_loss"].append(float(vals[2, i]))
        bar.set_postfix({"mean_loss": f"{vals[2].mean():.4f}"})

    def maybe_checkpoint(step: int) -> None:
        if (
            checkpoint_path is not None
            # One-way: the path is only resolved when the cadence is >0.
            and out_cfg.checkpoint_every  # pragma: no branch
            and step % out_cfg.checkpoint_every == 0
        ):
            from style_transfer_visualizer_tpu.runtime.checkpoint import (  # noqa: PLC0415
                save_checkpoint,
            )

            save_checkpoint(checkpoint_path, step, images, state)

    chunk = _resolve_batch_chunk(bundle, config)
    bar = tqdm(
        total=opt_cfg.steps, initial=start_step,
        desc="Multi-Style Transfer",
    )
    import contextlib  # noqa: PLC0415

    profile_ctx = (
        jax.profiler.trace(out_cfg.profile_dir)
        if out_cfg.profile_dir
        else contextlib.nullcontext()
    )
    if out_cfg.profile_dir:
        logger.info(
            "Profiling batch optimization loop to %s", out_cfg.profile_dir,
        )
    try:
        profile_ctx.__enter__()
        step = start_step
        while step < opt_cfg.steps:
            remaining = opt_cfg.steps - step
            # Stay chunked only while chunk ends stay aligned to the
            # cadence grid (resume offsets may start misaligned).
            if chunk > 1 and remaining >= chunk and step % chunk == 0:
                images, state, auxes = bundle.chunked_update_fn(
                    images, state, chunk,
                )
                log_steps = [
                    j for j in range(chunk)
                    if (step + j + 1) % out_cfg.log_every == 0
                ]
                if log_steps:
                    # One fused (3, k, S) transfer per dispatch.
                    vals = np.asarray(
                        jax.numpy.stack(
                            [
                                auxes.style_score,
                                auxes.content_score,
                                auxes.loss,
                            ],
                        ),
                    )
                    for j in log_steps:
                        log_step(step + j + 1, vals[:, j])
                step += chunk
                bar.update(chunk)
                if frame_stream is not None and step % save_every == 0:
                    submit_frames(images)
                maybe_checkpoint(step)
                continue

            images, state, aux = bundle.update_fn(images, state)
            step += 1
            bar.update(1)
            if frame_stream is not None and step % save_every == 0:
                submit_frames(images)
            if step % out_cfg.log_every == 0:
                # One fused (3, S) transfer per cadence.
                vals = np.asarray(
                    jax.numpy.stack(
                        [aux.style_score, aux.content_score, aux.loss],
                    ),
                )
                log_step(step, vals)
            maybe_checkpoint(step)
        if frame_stream is not None and opt_cfg.steps % save_every != 0:
            # End every timelapse on the finished image even when the
            # step count does not land on the frame cadence.
            submit_frames(images)
        jax.block_until_ready(images)
        if frame_stream is not None:
            # FIFO: all cadence frames must land before the outro
            # comparison segments are appended on this thread.
            frame_stream.drain()
            _append_batch_outros(
                config, images, content_path, style_paths,
                gif_sinks, video_sinks,
                normalize=opt_cfg.normalize,
                chroma_source=chroma_source,
            )
    finally:
        with contextlib.suppress(Exception):
            profile_ctx.__exit__(None, None, None)
        bar.close()
        close_errors: list[Exception] = []
        failed_sinks: set[str] = set()
        if frame_stream is not None:
            try:
                frame_stream.close()
            except Exception as exc:  # noqa: BLE001
                logger.error("Error closing frame stream: %s", exc)
                close_errors.append(exc)
        for sinks in style_sinks:
            for label, sink in sinks:
                try:
                    sink.close()
                except Exception as exc:  # noqa: BLE001
                    logger.error(
                        "Error closing media sink %s: %s", label, exc,
                    )
                    close_errors.append(exc)
                    failed_sinks.add(label)
        for csv_logger in csv_loggers:
            if csv_logger is not None:
                try:
                    csv_logger.close()
                except OSError as exc:
                    logger.error("Error closing loss logger: %s", exc)

    if track_history:
        from style_transfer_visualizer_tpu.visualization.metrics import (  # noqa: PLC0415
            plot_loss_curves,
        )

        for name, history in zip(style_names, histories):
            if history["total_loss"]:
                plot_loss_curves(
                    history, output_path, filename=f"loss_plot_{name}.png",
                )
    for media_name in media_names:
        if media_name not in failed_sinks:
            logger.info(
                "Timelapse saved to: %s", output_path / media_name,
            )
    return images, state, close_errors


def _prepare_model_and_input(
    content_img: jax.Array,
    style_img: jax.Array,
    config: StyleTransferConfig,
    key: jax.Array,
    blend_imgs: list[tuple[jax.Array, float]] | None = None,
) -> tuple[StepBundle, jax.Array]:
    """Load weights, precompute targets, build the jitted step, init image.

    ``blend_imgs`` — ``(style_image, weight)`` for every style of a
    blended run — replaces the single ``style_img`` in the *targets*
    math: the first entry computes full targets (content included),
    the rest contribute style Grams only, and the weighted blend
    (``blend_targets``) feeds the unchanged step builder.
    """
    opt_cfg = config.optimization
    params = load_pretrained_params(
        get_architecture(opt_cfg.model),
        allow_random=opt_cfg.allow_random_weights,
        seed=opt_cfg.seed,
    )
    if config.hardware.spatial_shards > 1:
        if opt_cfg.tile_rows > 0:
            msg = (
                "--spatial-shards and --tile-rows are mutually "
                "exclusive: sharding already bounds per-device graphs."
            )
            raise ValueError(msg)
        return _prepare_spatial_model_and_input(
            params, content_img, style_img, config, key,
            blend_imgs=blend_imgs,
        )
    precision_name = config.hardware.precision
    from style_transfer_visualizer_tpu.ops.gram import (  # noqa: PLC0415
        resolve_gram_backend,
    )

    gram_backend = resolve_gram_backend(config.hardware.gram_backend)
    if gram_backend != config.hardware.gram_backend:
        logger.info("Gram backend resolved to: %s", gram_backend)
    from style_transfer_visualizer_tpu.ops.pallas_conv import (  # noqa: PLC0415
        resolve_conv_backend,
    )

    conv_backend = resolve_conv_backend(config.hardware.conv_backend)
    if conv_backend != config.hardware.conv_backend:
        logger.info("Conv backend resolved to: %s", conv_backend)

    _, height, width, _ = content_img.shape
    tile_rows = _resolve_tile_rows(config, int(height), int(width))
    if tile_rows:
        from style_transfer_visualizer_tpu.ops.tiled import (  # noqa: PLC0415
            auto_tile_rows,
            compute_tiled_targets,
        )

        if gram_backend == "pallas":
            logger.info(
                "Banded evaluation accumulates raw Gram partials with "
                "its own fused path; --gram-backend pallas does not "
                "apply while tiling.",
            )

        def one_targets(s_img: jax.Array, content_layers: tuple[int, ...]):
            style_h = int(s_img.shape[1])
            style_w_px = int(s_img.shape[2])
            tile_rows_style = None
            if style_h * style_w_px >= AUTO_TILE_PIXEL_THRESHOLD:
                tile_rows_style = auto_tile_rows(
                    style_h, style_w_px, tuple(opt_cfg.style_layers),
                    table=layer_table_from_params(params),
                )
            return compute_tiled_targets(
                params,
                s_img,
                content_img,
                tuple(opt_cfg.style_layers),
                content_layers,
                tile_rows_style=tile_rows_style,
                tile_rows_content=tile_rows,
                precision=_precision(precision_name),
                conv_backend=conv_backend,
            )
    else:
        def one_targets(s_img: jax.Array, content_layers: tuple[int, ...]):
            return compute_targets(
                params,
                s_img,
                content_img,
                tuple(opt_cfg.style_layers),
                content_layers,
                precision=_precision(precision_name),
                gram_backend=gram_backend,
                conv_backend=conv_backend,
            )

    targets = targets_maybe_blended(
        one_targets, style_img, tuple(opt_cfg.content_layers), blend_imgs,
    )
    lap_target = None
    if opt_cfg.lap_w:
        from style_transfer_visualizer_tpu.ops.lap import (  # noqa: PLC0415
            lap_response,
        )

        lap_target = lap_response(content_img, opt_cfg.lap_pool)
    remat = resolve_single_remat(height, width, tile_rows, opt_cfg.remat)
    if remat and not opt_cfg.remat:
        logger.info(
            "Auto-enabling feature rematerialization for %dx%d input.",
            width, height,
        )
    bundle = build_update_step(
        params,
        targets,
        tuple(content_img.shape),
        optimizer=opt_cfg.optimizer,
        lr=opt_cfg.lr,
        style_w=opt_cfg.style_w,
        content_w=opt_cfg.content_w,
        tv_w=opt_cfg.tv_w,
        lap_w=opt_cfg.lap_w,
        lap_pool=opt_cfg.lap_pool,
        lap_target=lap_target,
        style_layers=tuple(opt_cfg.style_layers),
        style_weights=opt_cfg.style_weights_tuple(),
        content_layers=tuple(opt_cfg.content_layers),
        precision=precision_name,
        lbfgs_max_iter=opt_cfg.lbfgs_max_iter,
        lbfgs_max_eval=opt_cfg.lbfgs_max_eval,
        lbfgs_history_size=opt_cfg.lbfgs_history_size,
        lbfgs_history_dtype=opt_cfg.lbfgs_history_dtype,
        lbfgs_direction=opt_cfg.lbfgs_direction,
        remat=remat,
        gram_backend=gram_backend,
        conv_backend=conv_backend,
        tile_rows=tile_rows,
    )
    input_img = _initial_image(
        params, content_img, style_img, config, key,
        gram_backend=gram_backend, conv_backend=conv_backend,
        blend_imgs=blend_imgs,
    )
    return bundle, input_img


def _resolve_auto_coarse(
    config: StyleTransferConfig,
    content_img: jax.Array,
) -> None:
    """Resolve ``--coarse-steps -1`` (auto) against the content size.

    Runs once per orchestration entry, as soon as the content shape is
    known; writes the resolved value back so every downstream
    ``coarse_steps > 0`` gate (single, batch, blend-sweep, sequence)
    keeps its meaning. Mirrors the auto video-mode mutation pattern.
    """
    from style_transfer_visualizer_tpu.engine.coarse import (  # noqa: PLC0415
        resolve_coarse_steps,
    )

    opt_cfg = config.optimization
    opt_cfg.coarse_steps = resolve_coarse_steps(
        opt_cfg.coarse_steps,
        int(content_img.shape[1]),
        int(content_img.shape[2]),
        opt_cfg.steps,
    )


def _initial_image(
    params,
    content_img: jax.Array,
    style_img: jax.Array,
    config: StyleTransferConfig,
    key: jax.Array,
    *,
    gram_backend: str = "xla",
    conv_backend: str = "xla",
    blend_imgs: list[tuple[jax.Array, float]] | None = None,
) -> jax.Array:
    """Starting image: coarse warm start when requested, else init_method."""
    if config.optimization.coarse_steps > 0 and config.output.resume_from:
        # The checkpoint image supersedes any init; don't burn the
        # coarse phase on a result the resume would overwrite.
        logger.info("Coarse warm start skipped: resuming a checkpoint.")
    elif config.optimization.coarse_steps > 0:
        from style_transfer_visualizer_tpu.engine.coarse import (  # noqa: PLC0415
            coarse_init,
        )

        warm = coarse_init(
            params, content_img, style_img, config, key,
            gram_backend=gram_backend, conv_backend=conv_backend,
            blend_imgs=blend_imgs,
        )
        if warm is not None:
            return warm
    return initialize_input(
        content_img, config.optimization.init_method, key,
    )


def _prepare_spatial_model_and_input(
    params,
    content_img: jax.Array,
    style_img: jax.Array,
    config: StyleTransferConfig,
    key: jax.Array,
    blend_imgs: list[tuple[jax.Array, float]] | None = None,
) -> tuple[StepBundle, jax.Array]:
    """Build a row-sharded update step over an n-device space mesh.

    Style Gram targets compute whole-image (C x C, size-independent, so
    the style image needs no divisibility property); content targets and
    the working image shard by rows. The optimizer machinery is the
    shared step builder with the mesh loss injected.
    """
    from style_transfer_visualizer_tpu.models.features import (  # noqa: PLC0415
        Targets,
    )
    from style_transfer_visualizer_tpu.parallel.mesh import (  # noqa: PLC0415
        create_mesh,
    )
    from style_transfer_visualizer_tpu.parallel.spatial import (  # noqa: PLC0415
        compute_sharded_targets,
        make_spatial_loss,
        spatial_shardings,
    )

    opt_cfg = config.optimization
    n_space = config.hardware.spatial_shards
    platform = (
        jax.config.jax_default_device.platform
        if jax.config.jax_default_device is not None
        else jax.default_backend()
    )
    devices = jax.devices(platform)
    if len(devices) < n_space:
        msg = (
            f"--spatial-shards {n_space} needs {n_space} {platform} "
            f"devices; {len(devices)} attached."
        )
        raise ValueError(msg)
    mesh = create_mesh(n_style=1, n_space=n_space, devices=devices)
    logger.info(
        "Spatial sharding: image rows over %d %s devices.",
        n_space, platform,
    )

    precision = _precision(config.hardware.precision)
    style_layers = tuple(opt_cfg.style_layers)
    content_layers = tuple(opt_cfg.content_layers)
    def one_targets(s_img: jax.Array, content_layers_: tuple[int, ...]):
        # Style Grams are C x C and size-independent; the sharded
        # content targets are handled separately below, so this path
        # only ever computes with content_layers_ == ().
        return compute_targets(
            params, s_img, content_img, style_layers, content_layers_,
            precision=precision,
        )

    grams_only = targets_maybe_blended(
        one_targets, style_img, (), blend_imgs,
    )
    sharded = compute_sharded_targets(
        mesh, params, content_img, content_img, (), content_layers,
        precision=precision,
    )
    content_feats = dict(sharded.content_feats)
    if opt_cfg.lap_w:
        # The Laplacian term composes with row sharding: the padded
        # whole-image target rides with the content features and each
        # shard evaluates the stencil halo-exactly (sharded_lap).
        from style_transfer_visualizer_tpu.parallel.spatial import (  # noqa: PLC0415
            LAP_RESPONSE_KEY,
            padded_lap_target,
            validate_lap_shard_divisibility,
        )

        validate_lap_shard_divisibility(
            int(content_img.shape[1]), n_space, opt_cfg.lap_pool,
        )
        content_feats[LAP_RESPONSE_KEY] = padded_lap_target(
            content_img, opt_cfg.lap_pool,
        )
    targets = Targets(
        style_grams=grams_only.style_grams,
        content_feats=content_feats,
    )
    row_sharding, target_shardings = spatial_shardings(mesh, targets)
    targets = jax.device_put(targets, target_shardings)

    loss_fn = make_spatial_loss(
        mesh,
        tuple(content_img.shape),
        style_w=opt_cfg.style_w,
        content_w=opt_cfg.content_w,
        tv_w=opt_cfg.tv_w,
        lap_w=opt_cfg.lap_w,
        lap_pool=opt_cfg.lap_pool,
        style_layers=style_layers,
        style_weights=opt_cfg.style_weights_tuple(),
        content_layers=content_layers,
        precision=precision,
        table=layer_table_from_params(params),
    )
    bundle = build_update_step(
        params,
        targets,
        tuple(content_img.shape),
        optimizer=opt_cfg.optimizer,
        lr=opt_cfg.lr,
        style_w=opt_cfg.style_w,
        content_w=opt_cfg.content_w,
        tv_w=opt_cfg.tv_w,
        style_layers=style_layers,
        style_weights=opt_cfg.style_weights_tuple(),
        content_layers=content_layers,
        precision=config.hardware.precision,
        lbfgs_max_iter=opt_cfg.lbfgs_max_iter,
        lbfgs_max_eval=opt_cfg.lbfgs_max_eval,
        lbfgs_history_size=opt_cfg.lbfgs_history_size,
        lbfgs_history_dtype=opt_cfg.lbfgs_history_dtype,
        lbfgs_direction=opt_cfg.lbfgs_direction,
        loss_fn=loss_fn,
    )
    input_img = jax.device_put(
        _initial_image(
            params, content_img, style_img, config, key,
            blend_imgs=blend_imgs,
        ),
        row_sharding,
    )
    return bundle, input_img


def _resolve_tile_rows(
    config: StyleTransferConfig,
    height: int,
    width: int,
) -> int:
    """Explicit --tile-rows wins; otherwise auto-tile 4K-class inputs.

    Band tiling (ops.tiled) keeps the compiled graph and activation
    memory at one band's size — required on this class of hardware for
    inputs past the whole-image compile/HBM ceiling (~4MP measured,
    BASELINE.md), exact at any size.
    """
    opt_cfg = config.optimization
    taps = tuple(
        set(opt_cfg.style_layers) | set(opt_cfg.content_layers),
    )
    if opt_cfg.tile_rows > 0:
        from style_transfer_visualizer_tpu.ops.tiled import (  # noqa: PLC0415
            validate_tiling,
        )

        validate_tiling(
            height, opt_cfg.tile_rows, taps,
            get_architecture(opt_cfg.model).layer_table,
        )
        return opt_cfg.tile_rows
    if opt_cfg.tile_rows == 0:
        # Explicit off-switch: whole-image evaluation regardless of size.
        return 0
    if height * width < AUTO_TILE_PIXEL_THRESHOLD:
        return 0
    from style_transfer_visualizer_tpu.ops.tiled import (  # noqa: PLC0415
        auto_tile_rows,
    )

    rows = auto_tile_rows(
        height, width, taps,
        table=get_architecture(opt_cfg.model).layer_table,
    )
    if rows is None:
        logger.warning(
            "Input is %dx%d (>= %d px) but its height admits no exact "
            "band tiling; attempting whole-image evaluation.",
            width, height, AUTO_TILE_PIXEL_THRESHOLD,
        )
        return 0
    logger.info(
        "Auto-enabling banded loss evaluation (tile_rows=%d) for "
        "%dx%d input.",
        rows, width, height,
    )
    return rows


def _precision(name: str) -> jax.lax.Precision | PrecisionPolicy:
    from style_transfer_visualizer_tpu.engine.step import (  # noqa: PLC0415
        resolve_precision,
    )

    return resolve_precision(name)


def _maybe_append_final_segments(
    video_config: VideoConfig,
    video_writer: VideoFrameSink | None,
    gif_options: stv_segments.GifSegmentOptions | None,
    content_path: Path,
    style_path: Path,
    input_img: jax.Array,
    *,
    normalize: bool,
    chroma_source: jax.Array | None = None,
) -> None:
    """Append outro comparison frames to active sinks when configured."""
    gif_outro_requested = bool(
        gif_options and gif_options.sink and gif_options.include_outro,
    )
    if not video_config.final_frame_compare:
        return
    if video_writer is None and not gif_outro_requested:
        return

    final_frame = stv_image_io.array_to_uint8_frame(
        input_img, normalize=normalize, chroma_source=chroma_source,
    )
    final_frame = np.ascontiguousarray(final_frame)

    kwargs = {}
    if gif_options is not None and gif_options.sink is not None:
        kwargs["gif_options"] = gif_options
    stv_segments.append_final_comparison_frame(
        video_config,
        video_writer,
        (content_path, style_path),
        final_frame,
        **kwargs,
    )
