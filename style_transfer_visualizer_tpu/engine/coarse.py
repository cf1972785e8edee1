"""Coarse-to-fine warm start: seed full-res optimization from half res.

Gatys-style optimization spends most of its early steps establishing
global color/structure that a quarter-pixel-count problem finds just as
well at a fraction of the cost (the 512px step is conv-bound, so the
half-res step is ~4x cheaper). ``coarse_init`` optimizes a downsampled
copy of the problem for ``coarse_steps`` and bilinearly upsamples the
result as the full-resolution starting image. TPU-friendly by
construction: the coarse phase is one extra static-shape executable
(compiled once), not a dynamic schedule.

The coarse problem follows the same memory policy as the main phase at
its own (halved) shape: auto-remat past ``AUTO_REMAT_PIXEL_THRESHOLD``,
banded evaluation past ``AUTO_TILE_PIXEL_THRESHOLD`` — so a warm start
on a tiled 17MP run does not build a whole-image 9MP graph the chip
cannot hold.

The reference has no counterpart (its init methods are content/random/
white, core_model.py:66-100); this composes with them — the coarse
problem itself starts from the configured ``init_method``.
"""
from __future__ import annotations

import jax

from style_transfer_visualizer_tpu.constants import (
    AUTO_REMAT_PIXEL_THRESHOLD,
    AUTO_TILE_PIXEL_THRESHOLD,
)
from style_transfer_visualizer_tpu.models.features import (
    compute_targets,
    initialize_input,
    targets_maybe_blended,
)
from style_transfer_visualizer_tpu.utils.logging import logger

# Four 2x2 pools sit above the deepest default tap; multiples of 16
# stay even through every one of them (the reshape pool needs even
# dims at each level).
_POOL_ALIGN = 16
# Below this the coarse problem carries too little structure to help.
_MIN_COARSE_DIM = 32


def coarse_dims(height: int, width: int) -> tuple[int, int] | None:
    """Half resolution rounded down to pool alignment; None if too small."""
    ch = height // 2 // _POOL_ALIGN * _POOL_ALIGN
    cw = width // 2 // _POOL_ALIGN * _POOL_ALIGN
    if ch < _MIN_COARSE_DIM or cw < _MIN_COARSE_DIM:
        return None
    return ch, cw


def plan_warm_start(
    height: int,
    width: int,
    coarse_steps: int,
) -> tuple[int, int] | None:
    """Coarse dims when the warm start should run, else None.

    Shared gate for the single-run and batch paths: off when
    ``coarse_steps`` is 0, logged-skip when the input is too small to
    halve meaningfully. (Resume short-circuits are caller policy — the
    checkpoint image supersedes any init.)
    """
    if coarse_steps <= 0:
        return None
    dims = coarse_dims(height, width)
    if dims is None:
        logger.info(
            "Coarse warm start skipped: %dx%d is too small to halve.",
            width, height,
        )
    return dims


def resize_image(img: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize of an (N, H, W, C) image batch."""
    return jax.image.resize(
        img,
        (img.shape[0], height, width, img.shape[3]),
        method="linear",
    )


def coarse_init(
    params,
    content_img: jax.Array,
    style_img: jax.Array,
    config,
    key: jax.Array,
    *,
    gram_backend: str = "xla",
    conv_backend: str = "xla",
    blend_imgs: list[tuple[jax.Array, float]] | None = None,
) -> jax.Array | None:
    """Warm-started full-res init image, or None when coarse is off/moot.

    Runs ``optimization.coarse_steps`` steps of the configured
    optimizer on the half-resolution problem and upsamples the result.
    Returns None when ``coarse_steps`` is 0 or the image is too small
    to downsample meaningfully — the caller falls back to the plain
    ``init_method`` start. On blended runs (``blend_imgs``) the coarse
    phase blends the same styles at its own resolution, so the warm
    start optimizes the very objective the full-res phase continues.
    """
    opt_cfg = config.optimization
    steps = opt_cfg.coarse_steps
    _, height, width, _ = content_img.shape
    dims = plan_warm_start(int(height), int(width), steps)
    if dims is None:
        return None
    ch, cw = dims

    from style_transfer_visualizer_tpu.engine.runner import (  # noqa: PLC0415
        DEFAULT_CHUNK,
    )
    from style_transfer_visualizer_tpu.engine.step import (  # noqa: PLC0415
        build_update_step,
        drive_chunked,
        resolve_precision,
    )

    coarse_content = resize_image(content_img, ch, cw)
    coarse_style = resize_image(style_img, ch, cw)
    style_layers = tuple(opt_cfg.style_layers)
    content_layers = tuple(opt_cfg.content_layers)

    # Memory policy at the *coarse* shape, mirroring the main phase
    # (main._prepare_model_and_input / _resolve_tile_rows): an explicit
    # --tile-rows value was validated against the full-res height, so
    # the coarse phase re-derives its own band height.
    tile_rows = 0
    if opt_cfg.tile_rows != 0 and ch * cw >= AUTO_TILE_PIXEL_THRESHOLD:
        from style_transfer_visualizer_tpu.ops.tiled import (  # noqa: PLC0415
            auto_tile_rows,
        )

        from style_transfer_visualizer_tpu.models.arch import (  # noqa: PLC0415
            layer_table_from_params,
        )

        taps = tuple(set(style_layers) | set(content_layers))
        tile_rows = auto_tile_rows(
            ch, cw, taps, table=layer_table_from_params(params),
        ) or 0
        if tile_rows:
            logger.info(
                "Coarse phase uses banded evaluation (tile_rows=%d) "
                "at %dx%d.",
                tile_rows, cw, ch,
            )
        else:
            # Mirror main._resolve_tile_rows: a silent whole-image
            # fallback past the chip's measured graph ceiling would
            # fail with an OOM that points nowhere near the warm start.
            logger.warning(
                "Coarse problem is %dx%d (>= %d px) but its height "
                "admits no exact band tiling; attempting whole-image "
                "evaluation.",
                cw, ch, AUTO_TILE_PIXEL_THRESHOLD,
            )
    remat = not tile_rows and (
        opt_cfg.remat or ch * cw >= AUTO_REMAT_PIXEL_THRESHOLD
    )

    prec = resolve_precision(config.hardware.precision)
    if tile_rows:
        from style_transfer_visualizer_tpu.ops.tiled import (  # noqa: PLC0415
            compute_tiled_targets,
        )

        # Content and style were both resized to (ch, cw), so one band
        # height serves both target passes.
        def one_targets(s_img, content_layers_):
            return compute_tiled_targets(
                params, s_img, coarse_content,
                style_layers, content_layers_,
                tile_rows_style=tile_rows,
                tile_rows_content=tile_rows,
                precision=prec,
                conv_backend=conv_backend,
            )
    else:
        def one_targets(s_img, content_layers_):
            return compute_targets(
                params, s_img, coarse_content,
                style_layers, content_layers_,
                precision=prec,
                gram_backend=gram_backend,
                conv_backend=conv_backend,
            )

    coarse_blend = None
    if blend_imgs is not None:
        coarse_blend = [
            (resize_image(img, ch, cw), weight)
            for img, weight in blend_imgs
        ]
    targets = targets_maybe_blended(
        one_targets, coarse_style, content_layers, coarse_blend,
    )
    bundle = build_update_step(
        params, targets, tuple(coarse_content.shape),
        optimizer=opt_cfg.optimizer,
        lr=opt_cfg.lr,
        style_w=opt_cfg.style_w,
        content_w=opt_cfg.content_w,
        tv_w=opt_cfg.tv_w,
        style_layers=style_layers,
        content_layers=content_layers,
        precision=config.hardware.precision,
        lbfgs_max_iter=opt_cfg.lbfgs_max_iter,
        lbfgs_max_eval=opt_cfg.lbfgs_max_eval,
        lbfgs_history_size=opt_cfg.lbfgs_history_size,
        lbfgs_history_dtype=opt_cfg.lbfgs_history_dtype,
        lbfgs_direction=opt_cfg.lbfgs_direction,
        remat=remat,
        gram_backend=gram_backend,
        conv_backend=conv_backend,
        tile_rows=tile_rows,
        style_weights=opt_cfg.style_weights_tuple(),
    )
    x = initialize_input(coarse_content, opt_cfg.init_method, key)
    state = bundle.opt_state
    logger.info(
        "Coarse warm start: %d steps at %dx%d before %dx%d.",
        steps, cw, ch, width, height,
    )
    x, _, aux = drive_chunked(
        bundle.chunked_update_fn, x, state, steps, DEFAULT_CHUNK,
    )
    logger.info(
        "Coarse phase done (final loss %.4g); upsampling to full res.",
        float(aux.loss[-1]),
    )
    return resize_image(x, int(height), int(width))
