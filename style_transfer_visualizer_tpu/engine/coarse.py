"""Coarse-to-fine warm start: seed full-res optimization from a pyramid.

Gatys-style optimization spends most of its early steps establishing
global color/structure that a quarter-pixel-count problem finds just as
well at a fraction of the cost (the 512px step is conv-bound, so the
half-res step is ~4x cheaper). ``coarse_init`` optimizes downsampled
copies of the problem for ``coarse_steps`` total steps and bilinearly
upsamples the result as the full-resolution starting image. With the
default ``pyramid_levels=2`` that is one half-resolution phase; deeper
pyramids (``--pyramid-levels N``) ladder up from 1/2^(N-1) resolution,
each level warm-starting the next — the classic multi-scale schedule
(Gatys et al. 2017, arXiv:1611.07865 §5 use the same coarse-to-fine
trick for high-resolution transfer). TPU-friendly by construction:
every level is one extra static-shape executable (compiled once), not
a dynamic schedule.

Each coarse problem follows the same memory policy as the main phase at
its own (downscaled) shape: auto-remat past ``AUTO_REMAT_PIXEL_THRESHOLD``,
banded evaluation past ``AUTO_TILE_PIXEL_THRESHOLD`` — so a warm start
on a tiled 17MP run does not build a whole-image 9MP graph the chip
cannot hold.

The reference has no counterpart (its init methods are content/random/
white, core_model.py:66-100); this composes with them — the coarsest
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


# Auto mode (--coarse-steps -1, the default) enables the warm start
# for content at or above this pixel count. Below it the default run
# stays trajectory-comparable with the reference implementation (the
# classic 512px workload the parity gates are certified on); above it
# wall-clock dominates and the measured 8.6x convergence-per-second
# win (BASELINE.md coarse table) takes priority.
AUTO_COARSE_MIN_PIXELS = 1_000_000
# Auto budget: coarse_steps = steps // 5. At the 0.27 measured
# half/full step-cost ratio this adds ~5% wall-clock while
# front-loading the global structure of the trajectory.
AUTO_COARSE_STEPS_DIVISOR = 5


def resolve_coarse_steps(
    requested: int,
    height: int,
    width: int,
    steps: int,
) -> int:
    """Resolve the ``--coarse-steps -1`` auto mode against the input.

    Explicit values (>= 0) pass through; auto enables the warm start
    only for >= 1MP content (``AUTO_COARSE_MIN_PIXELS``) with a budget
    of ``steps // 5``. Orchestrators call this once, as soon as the
    content size is known, and write the result back into the config so
    every downstream ``coarse_steps > 0`` gate keeps its meaning.
    """
    if requested >= 0:
        return requested
    if height * width < AUTO_COARSE_MIN_PIXELS:
        return 0
    resolved = max(1, steps // AUTO_COARSE_STEPS_DIVISOR)
    logger.info(
        "Coarse warm start auto-enabled for %dx%d content: %d "
        "half-resolution steps (disable with --coarse-steps 0).",
        width, height, resolved,
    )
    return resolved


def coarse_dims(height: int, width: int) -> tuple[int, int] | None:
    """Half resolution rounded down to pool alignment; None if too small."""
    ch = height // 2 // _POOL_ALIGN * _POOL_ALIGN
    cw = width // 2 // _POOL_ALIGN * _POOL_ALIGN
    if ch < _MIN_COARSE_DIM or cw < _MIN_COARSE_DIM:
        return None
    return ch, cw


def pyramid_dims(
    height: int,
    width: int,
    levels: int,
) -> list[tuple[int, int]]:
    """Coarse-level shapes, coarsest first: 1/2^k for k = levels-1 .. 1.

    Each level rounds down to pool alignment; levels that fall below
    ``_MIN_COARSE_DIM`` are dropped (a deep pyramid on a small image
    simply starts shallower). Consecutive levels can never collapse to
    the same shape: floor(d / (16 * 2^k)) is strictly decreasing in k
    while it stays >= 2, so no dedupe is needed. ``levels=2``
    reproduces :func:`coarse_dims`. The full-resolution level is the
    caller's main phase and is never included.
    """
    dims: list[tuple[int, int]] = []
    for k in range(levels - 1, 0, -1):
        factor = 2 ** k
        ch = height // factor // _POOL_ALIGN * _POOL_ALIGN
        cw = width // factor // _POOL_ALIGN * _POOL_ALIGN
        if ch < _MIN_COARSE_DIM or cw < _MIN_COARSE_DIM:
            continue
        dims.append((ch, cw))
    return dims


def plan_pyramid(
    height: int,
    width: int,
    coarse_steps: int,
    levels: int = 2,
) -> list[tuple[int, int, int]]:
    """Warm-start schedule ``[(ch, cw, steps), ...]``, coarsest first.

    Shared gate for the single-run and batch paths: empty when
    ``coarse_steps`` is 0 or the input is too small to downsample
    meaningfully (logged skip). The step budget splits evenly across
    the surviving levels with the remainder on the coarsest (cheapest)
    level; levels whose share rounds to zero are dropped. (Resume
    short-circuits are caller policy — the checkpoint image supersedes
    any init.)
    """
    if coarse_steps <= 0:
        return []
    dims = pyramid_dims(height, width, levels)
    if not dims:
        logger.info(
            "Coarse warm start skipped: %dx%d is too small to halve.",
            width, height,
        )
        return []
    base, rem = divmod(coarse_steps, len(dims))
    schedule = []
    for i, (ch, cw) in enumerate(dims):
        steps = base + (rem if i == 0 else 0)
        if steps > 0:
            schedule.append((ch, cw, steps))
    return schedule


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
    optimizer across the ``optimization.pyramid_levels`` coarse
    resolutions (coarsest first, each level warm-starting the next)
    and upsamples the final level's result. Returns None when
    ``coarse_steps`` is 0 or the image is too small to downsample
    meaningfully — the caller falls back to the plain ``init_method``
    start. On blended runs (``blend_imgs``) every coarse level blends
    the same styles at its own resolution, so the warm start optimizes
    the very objective the full-res phase continues.
    """
    opt_cfg = config.optimization
    _, height, width, _ = content_img.shape
    schedule = plan_pyramid(
        int(height), int(width), opt_cfg.coarse_steps,
        opt_cfg.pyramid_levels,
    )
    if not schedule:
        return None

    x: jax.Array | None = None
    for ch, cw, steps in schedule:
        start = resize_image(x, ch, cw) if x is not None else None
        logger.info(
            "Coarse warm start: %d steps at %dx%d before %dx%d.",
            steps, cw, ch, width, height,
        )
        x = _optimize_level(
            params, content_img, style_img, config, key, ch, cw, steps,
            gram_backend=gram_backend,
            conv_backend=conv_backend,
            blend_imgs=blend_imgs,
            start=start,
        )
    return resize_image(x, int(height), int(width))


def _optimize_level(
    params,
    content_img: jax.Array,
    style_img: jax.Array,
    config,
    key: jax.Array,
    ch: int,
    cw: int,
    steps: int,
    *,
    gram_backend: str,
    conv_backend: str,
    blend_imgs: list[tuple[jax.Array, float]] | None,
    start: jax.Array | None,
) -> jax.Array:
    """Optimize one coarse level at (ch, cw); returns the level's image.

    ``start`` is the previous (coarser) level's result already resized
    to this level's shape; None means this is the coarsest level, which
    begins from the configured ``init_method``.
    """
    opt_cfg = config.optimization
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
    lap_target = None
    lap_w = opt_cfg.lap_w
    if lap_w and min(ch, cw) // opt_cfg.lap_pool < 3:  # noqa: PLR2004
        # The pooled stencil needs a 3x3 response; a level this small
        # carries no matchable edge structure anyway.
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

        # Each level matches the Laplacian of ITS OWN resized content:
        # the term is resolution-independent (mean-reduced), so the
        # coarse phases steer toward the same edge structure the
        # full-res phase will pin down.
        lap_target = lap_response(coarse_content, opt_cfg.lap_pool)
    bundle = build_update_step(
        params, targets, tuple(coarse_content.shape),
        optimizer=opt_cfg.optimizer,
        lr=opt_cfg.lr,
        style_w=opt_cfg.style_w,
        content_w=opt_cfg.content_w,
        tv_w=opt_cfg.tv_w,
        lap_w=lap_w,
        lap_pool=opt_cfg.lap_pool,
        lap_target=lap_target,
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
    x = (
        initialize_input(coarse_content, opt_cfg.init_method, key)
        if start is None
        else start
    )
    state = bundle.opt_state
    x, _, aux = drive_chunked(
        bundle.chunked_update_fn, x, state, steps, DEFAULT_CHUNK,
    )
    logger.info(
        "Coarse level %dx%d done (final loss %.4g).",
        cw, ch, float(aux.loss[-1]),
    )
    return x
