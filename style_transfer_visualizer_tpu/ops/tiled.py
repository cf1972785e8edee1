"""Scan-tiled feature extraction and loss for HBM/compile-bound inputs.

The Gram matrix and content MSE are position-independent sums over
pixels, so the full-image loss can be computed as a ``lax.scan`` over
horizontal row bands: each step slices one band (plus a receptive-field
margin on each side), runs the VGG19 stack on it, and accumulates raw
C x C Gram partials and squared-error sums into a small carry. Clamp and
normalization apply once to the accumulated totals — semantics identical
to the whole-image loss (reference core_model.py:29-63 order: clamp
before normalize).

Why bands + margins are *exact*, not approximate: a stack of 3x3 SAME
convolutions corrupts at most ``r`` rows inward from any artificial cut
edge, where ``r`` is the receptive-field radius (one row per conv at
that conv's pooling scale). Each window is sliced with a margin
``>= r`` on every cut edge, and clamped so that windows at the image
boundary make their cut edge coincide with the *global* edge — where
SAME zero padding is exactly the whole-image behavior. Window starts
stay congruent to the global 2^pools grid so max-pool windows align.

This is the single-device analog of ``parallel.spatial`` (which shards
bands over mesh devices and psums partials over ICI); here the bands run
sequentially under one ``lax.scan`` whose body is rematerialized, so
peak HBM holds one band's activations and the compiled graph is one
band's graph — what lets 4K-class inputs (BASELINE.json configs[3])
compile and fit on a single chip.
"""
from __future__ import annotations

from functools import partial
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp

from style_transfer_visualizer_tpu.constants import GRAM_MATRIX_CLAMP_MAX
from style_transfer_visualizer_tpu.models.arch import (
    CONV,
    LayerTable,
    layer_table_from_params,
    pools_before_in,
)
from style_transfer_visualizer_tpu.models.vgg19 import LAYER_TABLE
from style_transfer_visualizer_tpu.ops.kernel_util import round_up
from style_transfer_visualizer_tpu.ops.precision import (
    PrecisionLike,
    gram_precision,
)

if TYPE_CHECKING:
    from style_transfer_visualizer_tpu.models.features import Targets
    from style_transfer_visualizer_tpu.models.vgg19 import Params


def receptive_margin(
    taps: tuple[int, ...],
    table: LayerTable = LAYER_TABLE,
) -> tuple[int, int]:
    """(margin_rows, align) for exact band tiling of the given taps.

    ``margin_rows`` is the receptive-field radius of the deepest tap in
    input rows — each 3x3 conv adds one row of context per side at its
    own pooling scale — rounded up to ``align = 2^pools`` so window
    starts stay on the global pooling grid. ``table`` selects the
    architecture's layer layout (VGG19 by default).
    """
    if not taps:
        return 0, 1
    last = max(taps)
    radius = sum(
        2 ** pools_before_in(table, idx)
        for idx, (kind, _, _) in enumerate(table[: last + 1])
        if kind == CONV
    )
    align = 2 ** pools_before_in(table, last)
    return round_up(radius, align), align


def validate_tiling(
    global_h: int,
    tile_rows: int,
    taps: tuple[int, ...],
    table: LayerTable = LAYER_TABLE,
) -> None:
    """Check that ``tile_rows`` produces an exact, aligned band tiling."""
    margin, align = receptive_margin(taps, table)
    if tile_rows % align != 0 or global_h % align != 0:
        msg = (
            f"Tiled evaluation needs tile_rows ({tile_rows}) and image "
            f"height ({global_h}) divisible by 2^pools = {align} so "
            f"pooling grids align across bands."
        )
        raise ValueError(msg)
    if global_h % tile_rows != 0:
        msg = (
            f"Image height ({global_h}) must be divisible by tile_rows "
            f"({tile_rows})."
        )
        raise ValueError(msg)
    if tile_rows + 2 * margin > global_h:
        msg = (
            f"tile_rows ({tile_rows}) + 2 x margin ({margin}) exceeds the "
            f"image height ({global_h}); use whole-image evaluation "
            f"instead of tiling."
        )
        raise ValueError(msg)


def auto_tile_rows(
    global_h: int,
    global_w: int,
    taps: tuple[int, ...],
    *,
    max_band_pixels: int = 3_500_000,
    table: LayerTable = LAYER_TABLE,
) -> int | None:
    """Pick a band height for auto-tiling, or None if none fits.

    Chooses the largest valid ``tile_rows`` whose *window* (band plus
    margins) stays under ``max_band_pixels`` — just under the largest
    whole-image graph known to compile and fit on one chip (1440p-class
    3.77MP with remat, BASELINE.md; the band body is checkpointed the
    same way). Fewer bands means less margin-recompute overhead:
    measured at 4K, 3 bands of 720 run 17% faster than 5 of 432.
    """
    margin, align = receptive_margin(taps, table)
    for n_tiles in range(2, 65):
        if global_h % n_tiles != 0:
            continue
        tile_rows = global_h // n_tiles
        if tile_rows % align != 0 or tile_rows + 2 * margin > global_h:
            continue
        if (tile_rows + 2 * margin) * global_w <= max_band_pixels:
            return tile_rows
    return None


def _raw_band_partials(
    params: Params,
    window: jax.Array,
    valid_offset: jax.Array,
    tile_rows: int,
    targets: Targets,
    tile_index: jax.Array,
    style_layers: tuple[int, ...],
    content_layers: tuple[int, ...],
    precision: PrecisionLike,
    conv_backend: str = "xla",
) -> tuple[dict[int, jax.Array], dict[int, jax.Array]]:
    """One band's raw Gram partials and content squared-error sums.

    ``valid_offset`` is the (traced) row where the exact region starts
    inside the window; ``tile_index`` locates the band's slice of the
    global content targets.
    """
    from style_transfer_visualizer_tpu.models.features import (  # noqa: PLC0415
        extract_features,
    )

    table = layer_table_from_params(params)
    taps = tuple(sorted(set(style_layers) | set(content_layers)))
    acts = extract_features(
        params, window, taps, precision=precision,
        conv_backend=conv_backend,
    )
    grams: dict[int, jax.Array] = {}
    content_sq: dict[int, jax.Array] = {}
    for idx in taps:
        scale = 2 ** pools_before_in(table, idx)
        act = acts[idx]
        b, _, w_l, c = act.shape
        valid = jax.lax.dynamic_slice(
            act,
            (0, valid_offset // scale, 0, 0),
            (b, tile_rows // scale, w_l, c),
        )
        if idx in style_layers:
            flat = valid.reshape(-1, c)
            grams[idx] = jax.lax.dot_general(
                flat, flat,
                dimension_numbers=(((0,), (0,)), ((), ())),
                precision=gram_precision(precision),
                preferred_element_type=jnp.float32,
            )
        if idx in content_layers:
            target_band = jax.lax.dynamic_slice(
                targets.content_feats[idx],
                (0, tile_index * (tile_rows // scale), 0, 0),
                (b, tile_rows // scale, w_l, c),
            )
            content_sq[idx] = jnp.sum(jnp.square(valid - target_band))
    return grams, content_sq


def tiled_style_content_losses(
    params: Params,
    x: jax.Array,
    targets: Targets,
    style_layers: tuple[int, ...],
    content_layers: tuple[int, ...],
    *,
    tile_rows: int,
    precision: PrecisionLike = None,
    conv_backend: str = "xla",
    style_weights: tuple[float, ...] | None = None,
) -> tuple[list[jax.Array], list[jax.Array]]:
    """Per-layer losses computed band-by-band; exact vs the plain path.

    The band Gram partials are raw (unclamped, unnormalized) sums the
    fused Pallas Gram kernel cannot produce, so ``gram_backend`` does
    not apply here; ``conv_backend`` selects the band conv kernel.

    The scan body is rematerialized (``jax.checkpoint``) so the backward
    pass replays one band at a time instead of keeping every band's
    activations live.
    """
    table = layer_table_from_params(params)
    taps = tuple(sorted(set(style_layers) | set(content_layers)))
    b, gh, gw, _ = x.shape
    validate_tiling(int(gh), tile_rows, taps, table)
    margin, _ = receptive_margin(taps, table)
    window_h = tile_rows + 2 * margin
    n_tiles = int(gh) // tile_rows

    def band_contrib(x_img: jax.Array, i: jax.Array):
        win_start = jnp.clip(i * tile_rows - margin, 0, gh - window_h)
        window = jax.lax.dynamic_slice(
            x_img, (0, win_start, 0, 0), (b, window_h, gw, x_img.shape[3]),
        )
        valid_offset = i * tile_rows - win_start
        return _raw_band_partials(
            params, window, valid_offset, tile_rows, targets, i,
            style_layers, content_layers, precision, conv_backend,
        )

    contrib = jax.checkpoint(band_contrib)

    def body(carry, i):
        grams_acc, sq_acc = carry
        grams, sq = contrib(x, i)
        new_grams = {
            k: grams_acc[k] + grams[k] for k in grams_acc
        }
        new_sq = {k: sq_acc[k] + sq[k] for k in sq_acc}
        return (new_grams, new_sq), None

    channels = {idx: table[idx][2] for idx in taps}
    init = (
        {
            idx: jnp.zeros((channels[idx], channels[idx]), jnp.float32)
            for idx in style_layers
        },
        {idx: jnp.zeros((), jnp.float32) for idx in content_layers},
    )
    (grams_raw, content_sq), _ = jax.lax.scan(
        body, init, jnp.arange(n_tiles),
    )

    from style_transfer_visualizer_tpu.models.features import (  # noqa: PLC0415
        _resolve_style_weights,
        _weighted,
    )

    weights = _resolve_style_weights(style_weights, style_layers)
    style_losses = []
    for idx, w in zip(style_layers, weights, strict=True):
        scale = 2 ** pools_before_in(table, idx)
        c = channels[idx]
        n_norm = b * (gh // scale) * (gw // scale) * c
        gram = jnp.minimum(grams_raw[idx], GRAM_MATRIX_CLAMP_MAX) / n_norm
        style_losses.append(
            _weighted(
                w, jnp.mean(jnp.square(gram - targets.style_grams[idx])),
            ),
        )
    content_losses = []
    for idx in content_layers:
        scale = 2 ** pools_before_in(table, idx)
        n_elems = b * (gh // scale) * (gw // scale) * channels[idx]
        content_losses.append(content_sq[idx] / n_elems)
    return style_losses, content_losses


@partial(
    jax.jit,
    static_argnames=(
        "style_layers", "content_layers", "tile_rows", "precision",
        "conv_backend", "style_weights",
    ),
)
def tiled_total_loss(
    params: Params,
    x: jax.Array,
    targets: Targets,
    style_w: jax.Array | float,
    content_w: jax.Array | float,
    style_layers: tuple[int, ...],
    content_layers: tuple[int, ...],
    tile_rows: int,
    precision: PrecisionLike = None,
    conv_backend: str = "xla",
    style_weights: tuple[float, ...] | None = None,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Weighted total loss via band tiling; same contract as total_loss."""
    style_losses, content_losses = tiled_style_content_losses(
        params, x, targets, style_layers, content_layers,
        tile_rows=tile_rows, precision=precision,
        conv_backend=conv_backend, style_weights=style_weights,
    )
    zero = jnp.zeros((), dtype=x.dtype)
    style_score = (
        jnp.sum(jnp.stack(style_losses)) if style_losses else zero
    )
    content_score = (
        jnp.sum(jnp.stack(content_losses)) if content_losses else zero
    )
    total = style_w * style_score + content_w * content_score
    return total, (style_score, content_score)


@partial(
    jax.jit,
    static_argnames=(
        "style_layers", "content_layers", "tile_rows_style",
        "tile_rows_content", "precision", "conv_backend",
    ),
)
def compute_tiled_targets(
    params: Params,
    style_img: jax.Array,
    content_img: jax.Array,
    style_layers: tuple[int, ...],
    content_layers: tuple[int, ...],
    tile_rows_style: int | None = None,
    tile_rows_content: int | None = None,
    precision: PrecisionLike = None,
    conv_backend: str = "xla",
):
    """Targets via band tiling (either image may also run untiled).

    Style Gram targets accumulate across the style image's bands;
    content activation targets are written band-by-band into a
    preallocated full-size buffer (``dynamic_update_slice``), which is
    the only full feature map ever materialized — targets are persistent
    state, so there is no way around holding them.
    """
    from style_transfer_visualizer_tpu.models.features import (  # noqa: PLC0415
        Targets,
        compute_targets,
        extract_features,
    )

    if tile_rows_style is None and tile_rows_content is None:
        return compute_targets(
            params, style_img, content_img,
            tuple(style_layers), tuple(content_layers),
            precision=precision, conv_backend=conv_backend,
        )

    # --- Style Grams -----------------------------------------------------
    if tile_rows_style is None:
        style_grams = compute_targets(
            params, style_img, content_img, tuple(style_layers), (),
            precision=precision, conv_backend=conv_backend,
        ).style_grams
    else:
        zeros = Targets(style_grams={}, content_feats={})
        b, gh, gw, _ = style_img.shape
        table = layer_table_from_params(params)
        validate_tiling(int(gh), tile_rows_style, tuple(style_layers), table)
        margin, _ = receptive_margin(tuple(style_layers), table)
        window_h = tile_rows_style + 2 * margin
        n_tiles = int(gh) // tile_rows_style

        def style_band(carry, i):
            win_start = jnp.clip(
                i * tile_rows_style - margin, 0, gh - window_h,
            )
            window = jax.lax.dynamic_slice(
                style_img, (0, win_start, 0, 0),
                (b, window_h, gw, style_img.shape[3]),
            )
            grams, _ = _raw_band_partials(
                params, window, i * tile_rows_style - win_start,
                tile_rows_style, zeros, i, tuple(style_layers), (),
                precision, conv_backend,
            )
            return {k: carry[k] + grams[k] for k in carry}, None

        channels = {idx: table[idx][2] for idx in style_layers}
        init = {
            idx: jnp.zeros((channels[idx], channels[idx]), jnp.float32)
            for idx in style_layers
        }
        raw, _ = jax.lax.scan(style_band, init, jnp.arange(n_tiles))
        style_grams = {}
        for idx in style_layers:
            scale = 2 ** pools_before_in(table, idx)
            n_norm = b * (gh // scale) * (gw // scale) * channels[idx]
            style_grams[idx] = jax.lax.stop_gradient(
                jnp.minimum(raw[idx], GRAM_MATRIX_CLAMP_MAX) / n_norm,
            )

    # --- Content activations ----------------------------------------------
    if not content_layers:
        content_feats: dict[int, jax.Array] = {}
    elif tile_rows_content is None:
        content_feats = compute_targets(
            params, style_img, content_img, (), tuple(content_layers),
            precision=precision, conv_backend=conv_backend,
        ).content_feats
    else:
        b, gh, gw, _ = content_img.shape
        taps = tuple(content_layers)
        table = layer_table_from_params(params)
        validate_tiling(int(gh), tile_rows_content, taps, table)
        margin, _ = receptive_margin(taps, table)
        window_h = tile_rows_content + 2 * margin
        n_tiles = int(gh) // tile_rows_content

        def content_band(carry, i):
            win_start = jnp.clip(
                i * tile_rows_content - margin, 0, gh - window_h,
            )
            window = jax.lax.dynamic_slice(
                content_img, (0, win_start, 0, 0),
                (b, window_h, gw, content_img.shape[3]),
            )
            acts = extract_features(
                params, window, taps, precision=precision,
                conv_backend=conv_backend,
            )
            valid_offset = i * tile_rows_content - win_start
            new_carry = {}
            for idx in taps:
                scale = 2 ** pools_before_in(table, idx)
                act = acts[idx]
                valid = jax.lax.dynamic_slice(
                    act,
                    (0, valid_offset // scale, 0, 0),
                    (
                        b, tile_rows_content // scale,
                        act.shape[2], act.shape[3],
                    ),
                )
                new_carry[idx] = jax.lax.dynamic_update_slice(
                    carry[idx],
                    valid,
                    (0, i * (tile_rows_content // scale), 0, 0),
                )
            return new_carry, None

        init_feats = {}
        for idx in taps:
            scale = 2 ** pools_before_in(table, idx)
            init_feats[idx] = jnp.zeros(
                (b, gh // scale, gw // scale, table[idx][2]),
                content_img.dtype,
            )
        feats, _ = jax.lax.scan(
            content_band, init_feats, jnp.arange(n_tiles),
        )
        content_feats = {
            idx: jax.lax.stop_gradient(feat)
            for idx, feat in feats.items()
        }

    return Targets(style_grams=style_grams, content_feats=content_feats)
