"""Coarse-to-fine warm start: seed full-res optimization from half res.

Gatys-style optimization spends most of its early steps establishing
global color/structure that a quarter-pixel-count problem finds just as
well at a fraction of the cost (the 512px step is conv-bound, so the
half-res step is ~4x cheaper). ``coarse_init`` optimizes a downsampled
copy of the problem for ``coarse_steps`` and bilinearly upsamples the
result as the full-resolution starting image. TPU-friendly by
construction: the coarse phase is one extra static-shape executable
(compiled once), not a dynamic schedule.

The reference has no counterpart (its init methods are content/random/
white, core_model.py:66-100); this composes with them — the coarse
problem itself starts from the configured ``init_method``.
"""
from __future__ import annotations

import jax

from style_transfer_visualizer_tpu.models.features import (
    compute_targets,
    initialize_input,
)
from style_transfer_visualizer_tpu.utils.logging import logger

# Four 2x2 pools sit above the deepest default tap; multiples of 16
# stay even through every one of them (the reshape pool needs even
# dims at each level).
_POOL_ALIGN = 16
# Below this the coarse problem carries too little structure to help.
_MIN_COARSE_DIM = 32

_CHUNK = 25  # matches the production dispatch chunk


def coarse_dims(height: int, width: int) -> tuple[int, int] | None:
    """Half resolution rounded down to pool alignment; None if too small."""
    ch = height // 2 // _POOL_ALIGN * _POOL_ALIGN
    cw = width // 2 // _POOL_ALIGN * _POOL_ALIGN
    if ch < _MIN_COARSE_DIM or cw < _MIN_COARSE_DIM:
        return None
    return ch, cw


def _resize(img: jax.Array, height: int, width: int) -> jax.Array:
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
) -> jax.Array | None:
    """Warm-started full-res init image, or None when coarse is off/moot.

    Runs ``optimization.coarse_steps`` steps of the configured
    optimizer on the half-resolution problem and upsamples the result.
    Returns None when ``coarse_steps`` is 0 or the image is too small
    to downsample meaningfully — the caller falls back to the plain
    ``init_method`` start.
    """
    opt_cfg = config.optimization
    steps = opt_cfg.coarse_steps
    if steps <= 0:
        return None
    _, height, width, _ = content_img.shape
    dims = coarse_dims(int(height), int(width))
    if dims is None:
        logger.info(
            "Coarse warm start skipped: %dx%d is too small to halve.",
            width, height,
        )
        return None
    ch, cw = dims

    from style_transfer_visualizer_tpu.engine.step import (  # noqa: PLC0415
        build_update_step,
        resolve_precision,
    )

    coarse_content = _resize(content_img, ch, cw)
    coarse_style = _resize(style_img, ch, cw)
    style_layers = tuple(opt_cfg.style_layers)
    content_layers = tuple(opt_cfg.content_layers)
    targets = compute_targets(
        params, coarse_style, coarse_content,
        style_layers, content_layers,
        precision=resolve_precision(config.hardware.precision),
    )
    bundle = build_update_step(
        params, targets, tuple(coarse_content.shape),
        optimizer=opt_cfg.optimizer,
        lr=opt_cfg.lr,
        style_w=opt_cfg.style_w,
        content_w=opt_cfg.content_w,
        style_layers=style_layers,
        content_layers=content_layers,
        precision=config.hardware.precision,
        lbfgs_max_iter=opt_cfg.lbfgs_max_iter,
        lbfgs_max_eval=opt_cfg.lbfgs_max_eval,
        lbfgs_history_size=opt_cfg.lbfgs_history_size,
        lbfgs_history_dtype=opt_cfg.lbfgs_history_dtype,
    )
    x = initialize_input(coarse_content, opt_cfg.init_method, key)
    state = bundle.opt_state
    logger.info(
        "Coarse warm start: %d steps at %dx%d before %dx%d.",
        steps, cw, ch, width, height,
    )
    remaining = steps
    while remaining > 0:
        k = min(_CHUNK, remaining)
        x, state, aux = bundle.chunked_update_fn(x, state, k)
        remaining -= k
    logger.info(
        "Coarse phase done (final loss %.4g); upsampling to full res.",
        float(aux.loss[-1]),
    )
    return _resize(x, int(height), int(width))
