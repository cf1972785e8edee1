"""Spatially-sharded feature extraction and Gram evaluation (shard_map).

Image rows are sharded across the ``space`` mesh axis. Each 3x3 SAME
convolution exchanges one-row halos with its mesh neighbors via
``ppermute`` (edge shards receive zeros — exactly SAME padding at the
global border), 2x2 pools stay shard-local because per-shard heights are
kept even, and each style-layer Gram is an ``psum`` of per-shard C x C
partials — the Gram is a position-independent pixel sum, so tiles reduce
with one add (SURVEY §5 "long-context" analog; the collective rides
ICI). Content losses reduce the same way. The whole loss is therefore
computed without any device ever holding a full feature map, which is
what lets 4K-class inputs fit HBM.

``shard_map`` is differentiable (``ppermute``/``psum`` have transpose
rules), so ``jax.grad`` through ``sharded_total_loss`` yields a
correctly-sharded pixel gradient.
"""
from __future__ import annotations

from functools import partial
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from style_transfer_visualizer_tpu.constants import (
    GRAM_MATRIX_CLAMP_MAX,
    MESH_AXIS_SPACE,
    MESH_AXIS_STYLE,
)
from style_transfer_visualizer_tpu.models.arch import (
    CONV,
    POOL,
    RELU,
    LayerTable,
    layer_table_from_params,
    pools_before_in,
)
from style_transfer_visualizer_tpu.models.vgg19 import LAYER_TABLE
from style_transfer_visualizer_tpu.ops.pool import maxpool_2x2, relu
from style_transfer_visualizer_tpu.ops.precision import (
    PrecisionLike,
    conv_bwd_precision,
    conv_precision,
    gram_precision,
)

if TYPE_CHECKING:
    from jax.sharding import Mesh

    from style_transfer_visualizer_tpu.models.features import Targets
    from style_transfer_visualizer_tpu.models.vgg19 import Params

_CONV_DIMS = ("NHWC", "HWIO", "NHWC")


def validate_shard_divisibility(
    global_h: int,
    n_space: int,
    taps: tuple[int, ...],
    table: LayerTable = LAYER_TABLE,
) -> None:
    """Require per-shard heights to stay even across every pool crossed.

    A shard whose height goes odd at a pool silently drops a row under
    VALID pooling, diverging from single-device semantics — so this is
    checked at build time instead. ``table`` selects the architecture's
    layer layout (VGG19 by default).
    """
    if not taps:
        return
    max_pools = max(pools_before_in(table, idx) for idx in taps)
    required = n_space * (2**max_pools)
    if global_h % required != 0:
        msg = (
            f"Spatial sharding requires the image height ({global_h}) to "
            f"be divisible by n_space * 2^pools = {n_space} * "
            f"{2**max_pools} = {required} so per-shard heights stay even "
            f"across every pool before the deepest tap."
        )
        raise ValueError(msg)


def _exchange_halos(x: jax.Array, axis_name: str) -> jax.Array:
    """Concatenate one-row halos from both mesh neighbors onto x.

    Devices at the global edges receive zeros, matching SAME padding.
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    # Shard i's bottom row becomes shard i+1's top halo, and vice versa.
    top_halo = jax.lax.ppermute(
        x[:, -1:],
        axis_name,
        perm=[(i, i + 1) for i in range(n - 1)],
    )
    bottom_halo = jax.lax.ppermute(
        x[:, :1],
        axis_name,
        perm=[(i + 1, i) for i in range(n - 1)],
    )
    return jnp.concatenate([top_halo, x, bottom_halo], axis=1)


def _halo_conv(
    x: jax.Array,
    w: jax.Array,
    axis_name: str,
    precision: PrecisionLike,
) -> jax.Array:
    """Row-sharded global SAME conv: halo exchange + VALID-in-H conv."""
    padded = _exchange_halos(x, axis_name)
    return jax.lax.conv_general_dilated(
        padded,
        w,
        window_strides=(1, 1),
        padding=((0, 0), (1, 1)),  # H handled by halos, W by zero pad
        dimension_numbers=_CONV_DIMS,
        precision=precision,
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _halo_conv_frozen(
    x: jax.Array,
    w: jax.Array,
    w_flip: jax.Array,
    axis_name: str,
    precision,
    bwd_precision,
) -> jax.Array:
    """Sharded SAME conv whose backward is the SAME sharded conv.

    The composite op (halo exchange + VALID conv) computes row shards
    of the GLOBAL stride-1 SAME convolution, and the adjoint of a
    global SAME conv is a global SAME conv with the rot180 +
    I/O-transposed kernel — so the input gradient is one more
    :func:`_halo_conv` with ``w_flip``, instead of XLA's transposed-
    conv machinery plus the concat/ppermute transpose chain (the same
    frozen-backbone trick as ``ops.frozen_conv``, measured ~45% slower
    backward convs without it). Weight cotangents are zeros — the
    backbone is frozen; only pixels are ever differentiated.
    """
    return _halo_conv(x, w, axis_name, precision)


def _halo_frozen_fwd(x, w, w_flip, axis_name, precision, bwd_precision):
    return _halo_conv(x, w, axis_name, precision), w_flip


def _halo_frozen_bwd(axis_name, precision, bwd_precision, w_flip, g):
    kh, kw, c_out, c_in = w_flip.shape
    return (
        _halo_conv(g, w_flip, axis_name, bwd_precision),
        jnp.zeros((kh, kw, c_in, c_out), g.dtype),
        jnp.zeros_like(w_flip),
    )


_halo_conv_frozen.defvjp(_halo_frozen_fwd, _halo_frozen_bwd)


def _sharded_conv(
    x: jax.Array,
    layer: dict[str, jax.Array],
    idx: int,
    axis_name: str,
    precision: PrecisionLike,
) -> jax.Array:
    """3x3 stride-1 SAME conv over row-sharded activations.

    With a pre-flipped kernel in the layer (``models.vgg19.
    add_flipped_kernels``) the backward runs as one more halo conv
    (:func:`_halo_conv_frozen`); otherwise plain autodiff applies (the
    target-computation paths never differentiate).
    """
    w_flip = layer.get("w_flip")
    if w_flip is not None:
        return _halo_conv_frozen(
            x, layer["w"], w_flip, axis_name,
            conv_precision(precision, idx),
            conv_bwd_precision(precision, idx),
        ) + layer["b"]
    return _halo_conv(
        x, layer["w"], axis_name, conv_precision(precision, idx),
    ) + layer["b"]


def sharded_extract_features(
    params: Params,
    x: jax.Array,
    taps: tuple[int, ...],
    *,
    axis_name: str = MESH_AXIS_SPACE,
    precision: PrecisionLike = None,
) -> dict[int, jax.Array]:
    """Per-shard activations at each tap (rows stay sharded throughout)."""
    if not taps:
        return {}
    table = layer_table_from_params(params)
    tap_set = frozenset(taps)
    last = max(taps)
    acts: dict[int, jax.Array] = {}
    # Breaks at max(taps), never exhausts the table:
    for idx, (kind, _, _) in enumerate(table):  # pragma: no branch
        if kind == CONV:
            x = _sharded_conv(
                x, params[idx], idx, axis_name, precision,
            )
        elif kind == RELU:
            x = relu(x)
        elif kind == POOL:  # pragma: no branch (kinds are exhaustive)
            x = maxpool_2x2(x)
        if idx in tap_set:
            acts[idx] = x
        if idx >= last:
            break
    return acts


def sharded_gram(
    features: jax.Array,
    global_pixels: int,
    *,
    axis_name: str = MESH_AXIS_SPACE,
    clamp_max: float = GRAM_MATRIX_CLAMP_MAX,
    precision: PrecisionLike = None,
) -> jax.Array:
    """Global Gram from a row-sharded feature map: psum of partials.

    ``global_pixels`` is B*H_global*W (the normalization denominator
    also multiplies C). Clamp applies to the *global* raw sum, after the
    psum — identical semantics to the single-device op.
    """
    b, h, w, c = features.shape
    flat = features.reshape(b * h * w, c)
    partial_gram = jax.lax.dot_general(
        flat, flat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=gram_precision(precision),
        preferred_element_type=jnp.float32,
    )
    raw = jax.lax.psum(partial_gram, axis_name)
    raw = jnp.minimum(raw, clamp_max)
    return raw / (global_pixels * c)


#: Sentinel ``content_feats`` key under which the padded Laplacian
#: target (:func:`padded_lap_target`) rides through the sharded-loss
#: targets pytree. The response shards exactly like a content feature
#: map (row-sharded, stop-gradient, computed once from the content
#: image), so reusing the dict keeps every sharding helper
#: (``spatial_shardings``, ``compute_sharded_targets`` stacking) and
#: the shard_map in_specs working unchanged; -1 can never collide with
#: a real VGG layer index.
LAP_RESPONSE_KEY = -1


def validate_lap_shard_divisibility(
    global_h: int,
    n_space: int,
    pool: int,
) -> None:
    """Require per-shard heights to pool evenly for the sharded lap term.

    The non-overlapping ``pool x pool`` mean pool must land on the same
    windows per shard as it does whole-image, so each shard's height
    (``global_h / n_space``) must be a multiple of ``pool``. Violations
    raise loudly at build time — never silently drop the term the user
    asked for (the round-3 verdict's compose-or-reject rule).
    """
    shard_h = global_h // n_space
    if shard_h % pool != 0:
        msg = (
            f"--lap-w under --spatial-shards requires the per-shard "
            f"height ({global_h}/{n_space} = {shard_h}) to be divisible "
            f"by lap_pool={pool} so pooling windows align with the "
            "whole-image term; resize the input or adjust --lap-pool."
        )
        raise ValueError(msg)
    pooled_h = global_h // pool
    if pooled_h < 3 or pooled_h // n_space < 1:  # noqa: PLR2004
        msg = (
            f"lap_pool={pool} over {n_space} row shards leaves "
            f"{pooled_h} pooled rows ({pooled_h // n_space} per shard) "
            "— the 3x3 Laplacian stencil needs at least 3 global rows "
            "and 1 per shard; lower --lap-pool or --spatial-shards."
        )
        raise ValueError(msg)


def padded_lap_target(content_img: jax.Array, pool: int) -> jax.Array:
    """Whole-image Laplacian target padded for row sharding.

    ``ops.lap.lap_response`` is VALID in H, so its rows live at pooled
    center rows ``1 .. hp-2``. One zero row of padding on each side
    re-indexes the array by pooled *center* row (``hp`` rows total),
    which is exactly how :func:`sharded_lap` produces its per-shard
    responses — the padded target then row-shards like any content
    feature map and the zero rows land only at masked-out positions.
    """
    from style_transfer_visualizer_tpu.ops.lap import (  # noqa: PLC0415
        lap_response,
    )

    resp = lap_response(content_img, pool)
    return jax.lax.stop_gradient(
        jnp.pad(resp, ((0, 0), (1, 1), (0, 0), (0, 0))),
    )


def sharded_lap(
    x: jax.Array,
    target_pad: jax.Array,
    global_shape: tuple[int, ...],
    *,
    pool: int = 4,
    axis_name: str = MESH_AXIS_SPACE,
) -> jax.Array:
    """Global ``ops.lap.lap_loss`` from a row-sharded image block.

    Each shard mean-pools its own rows (exact: shard heights divide
    ``pool`` — ``validate_lap_shard_divisibility``), fetches one pooled
    halo row from each mesh neighbor (``ppermute``; global edges get
    zeros), and runs the 3x3 stencil VALID over the haloed block — one
    response row per local pooled row, centered at that row. The rows
    whose stencil would fall off the global image (pooled rows 0 and
    hp-1, only ever on the edge shards) are masked out of the squared
    error, the masked sums psum over the mesh, and the mean divides by
    the whole-image response count — so the result equals the
    single-device ``lap_loss`` on the gathered image.

    ``target_pad`` is this shard's row block of
    :func:`padded_lap_target` (one pooled-center row per local pooled
    row; zeros at the masked edge positions).
    """
    from style_transfer_visualizer_tpu.ops.lap import (  # noqa: PLC0415
        _avg_pool,
        laplacian_filter,
    )

    b, gh, gw, c = (int(d) for d in global_shape)
    hp, wp = gh // pool, gw // pool
    xp = _avg_pool(x.astype(jnp.float32), pool)
    local_hp = int(xp.shape[1])
    resp = laplacian_filter(_exchange_halos(xp, axis_name))
    diff = resp - target_pad.astype(jnp.float32)
    # Mask the two global edge rows (their stencil uses the zero halo).
    global_row = jax.lax.axis_index(axis_name) * local_hp + jnp.arange(
        local_hp,
    )
    valid = (global_row >= 1) & (global_row <= hp - 2)
    masked = jnp.square(diff) * valid[None, :, None, None]
    total = jax.lax.psum(jnp.sum(masked), axis_name)
    return total / (b * (hp - 2) * (wp - 2) * c)


def sharded_tv(
    x: jax.Array,
    global_shape: tuple[int, ...],
    *,
    axis_name: str = MESH_AXIS_SPACE,
) -> jax.Array:
    """Global ``ops.tv.tv_loss`` from a row-sharded image block.

    Horizontal differences are shard-local; vertical differences need
    one boundary row per shard pair — each shard fetches its lower
    neighbor's first row (``ppermute``) and adds the seam term, masked
    away on the last shard. Sums psum over the mesh and divide by the
    *global* difference counts, so the result equals the single-device
    ``tv_loss`` on the gathered image.
    """
    b, gh, gw, c = (int(d) for d in global_shape)
    xf = x.astype(jnp.float32)
    local_dx = jnp.sum(jnp.square(xf[:, :, 1:, :] - xf[:, :, :-1, :]))
    local_dy = jnp.sum(jnp.square(xf[:, 1:, :, :] - xf[:, :-1, :, :]))
    n = jax.lax.axis_size(axis_name)
    if n > 1:
        # Shard i+1's first row rides down to shard i; the last shard
        # receives zeros and its seam term is masked out.
        below_top = jax.lax.ppermute(
            xf[:, :1],
            axis_name,
            perm=[(i + 1, i) for i in range(n - 1)],
        )
        seam = jnp.sum(jnp.square(below_top - xf[:, -1:]))
        is_interior = jax.lax.axis_index(axis_name) < n - 1
        local_dy = local_dy + jnp.where(is_interior, seam, 0.0)
    sum_dx = jax.lax.psum(local_dx, axis_name)
    sum_dy = jax.lax.psum(local_dy, axis_name)
    return sum_dy / (b * (gh - 1) * gw * c) + sum_dx / (
        b * gh * (gw - 1) * c
    )


def _sharded_loss_shard_fn(
    params: Params,
    x: jax.Array,
    targets: Targets,
    style_w: float,
    content_w: float,
    style_layers: tuple[int, ...],
    content_layers: tuple[int, ...],
    global_shape: tuple[int, ...],
    axis_name: str,
    precision: PrecisionLike,
    tv_w: float = 0.0,
    style_weights: tuple[float, ...] | None = None,
    lap_w: float = 0.0,
    lap_pool: int = 4,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-shard loss body.

    Returns the replicated global ``(total, style_score,
    content_score)`` — the same decomposition the single-device loss
    reports, so callers can surface per-component telemetry. A nonzero
    ``tv_w`` adds the seam-exact sharded total-variation term
    (``sharded_tv``) to the total only, mirroring how the unsharded
    paths fold TV into the objective without touching the style/content
    telemetry split; a nonzero ``lap_w`` likewise adds the halo-exact
    sharded Laplacian term (``sharded_lap``) against the padded target
    riding at ``targets.content_feats[LAP_RESPONSE_KEY]``.
    """
    from style_transfer_visualizer_tpu.models.features import (  # noqa: PLC0415
        _resolve_style_weights,
        _weighted,
    )

    weight_of = dict(
        zip(
            style_layers,
            _resolve_style_weights(style_weights, style_layers),
            strict=True,
        ),
    )
    table = layer_table_from_params(params)
    taps = tuple(sorted(set(style_layers) | set(content_layers)))
    acts = sharded_extract_features(
        params, x, taps, axis_name=axis_name, precision=precision,
    )

    style_score = jnp.zeros((), jnp.float32)
    content_score = jnp.zeros((), jnp.float32)
    b, gh, gw, _ = global_shape
    for idx in taps:
        # Spatial dims halve at each pool crossed before this tap.
        layer_h = gh // (2 ** pools_before_in(table, idx))
        layer_w = gw // (2 ** pools_before_in(table, idx))
        if idx in style_layers:
            gram = sharded_gram(
                acts[idx],
                b * layer_h * layer_w,
                axis_name=axis_name,
                precision=precision,
            )
            style_score += _weighted(
                weight_of[idx],
                jnp.mean(jnp.square(gram - targets.style_grams[idx])),
            )
        if idx in content_layers:
            # Targets are sharded the same way; each shard contributes
            # its share of the global squared-error mean.
            local_sq = jnp.sum(
                jnp.square(acts[idx] - targets.content_feats[idx]),
            )
            global_sq = jax.lax.psum(local_sq, axis_name)
            n_elems = b * layer_h * layer_w * acts[idx].shape[-1]
            content_score += global_sq / n_elems
    total = style_w * style_score + content_w * content_score
    if tv_w:
        total = total + tv_w * sharded_tv(
            x, global_shape, axis_name=axis_name,
        )
    if lap_w:
        total = total + lap_w * sharded_lap(
            x,
            targets.content_feats[LAP_RESPONSE_KEY],
            global_shape,
            pool=lap_pool,
            axis_name=axis_name,
        )
    return total, style_score, content_score


def build_sharded_loss(
    mesh: Mesh,
    params: Params,
    targets: Targets,
    global_shape: tuple[int, ...],
    *,
    style_w: float,
    content_w: float,
    style_layers: tuple[int, ...],
    content_layers: tuple[int, ...],
    precision: PrecisionLike = None,
    axis_name: str = MESH_AXIS_SPACE,
    tv_w: float = 0.0,
    style_weights: tuple[float, ...] | None = None,
    lap_w: float = 0.0,
    lap_pool: int = 4,
):
    """Return loss_fn(image) computed with rows sharded over ``axis_name``.

    ``image`` must be sharded ``P(None, axis_name, None, None)`` on the
    mesh; ``targets.content_feats`` shard the same way, ``style_grams``
    and ``params`` are replicated. The returned scalar is replicated.
    With ``lap_w > 0`` the targets must carry the padded Laplacian
    response under ``LAP_RESPONSE_KEY`` (see :func:`make_spatial_loss`).
    """
    validate_shard_divisibility(
        int(global_shape[1]),
        mesh.shape[axis_name],
        tuple(set(style_layers) | set(content_layers)),
        layer_table_from_params(params),
    )
    if lap_w:
        validate_lap_shard_divisibility(
            int(global_shape[1]), mesh.shape[axis_name], lap_pool,
        )
    row_spec = P(None, axis_name, None, None)
    # Style Grams replicate; content activations row-shard like the image.
    from style_transfer_visualizer_tpu.models.features import (  # noqa: PLC0415
        Targets,
    )

    target_specs = Targets(
        style_grams={k: P() for k in targets.style_grams},
        content_feats={k: row_spec for k in targets.content_feats},
    )

    shard_fn = partial(
        _sharded_loss_shard_fn,
        style_w=style_w,
        content_w=content_w,
        style_layers=tuple(style_layers),
        content_layers=tuple(content_layers),
        global_shape=tuple(global_shape),
        axis_name=axis_name,
        precision=precision,
        tv_w=tv_w,
        style_weights=style_weights,
        lap_w=lap_w,
        lap_pool=lap_pool,
    )

    mapped = jax.shard_map(
        lambda p, x, t: shard_fn(p, x, t),
        mesh=mesh,
        in_specs=(P(), row_spec, target_specs),
        out_specs=(P(), P(), P()),
    )

    def loss_fn(image: jax.Array) -> jax.Array:
        return mapped(params, image, targets)[0]

    return loss_fn


def make_spatial_loss(
    mesh: Mesh,
    global_shape: tuple[int, ...],
    *,
    style_w: float,
    content_w: float,
    style_layers: tuple[int, ...],
    content_layers: tuple[int, ...],
    precision: PrecisionLike = None,
    axis_name: str = MESH_AXIS_SPACE,
    tv_w: float = 0.0,
    table: LayerTable = LAYER_TABLE,
    style_weights: tuple[float, ...] | None = None,
    lap_w: float = 0.0,
    lap_pool: int = 4,
):
    """Spatially-sharded loss with the single-device loss's contract.

    Returns ``loss_fn(params, image, targets) -> (total, (style_score,
    content_score))`` — a drop-in for ``models.features.total_loss`` in
    the jitted step builder, with rows sharded over ``axis_name``.
    Params and targets are runtime arguments (not closure constants) so
    the serialized HLO stays small on remote-compile backends; the
    divisibility check uses ``table`` (the params arrive later).

    With ``lap_w > 0`` the caller must ride the padded Laplacian target
    (:func:`padded_lap_target`) in ``targets.content_feats`` under
    ``LAP_RESPONSE_KEY``; it row-shards like every content feature.
    """
    validate_shard_divisibility(
        int(global_shape[1]),
        mesh.shape[axis_name],
        tuple(set(style_layers) | set(content_layers)),
        table,
    )
    if lap_w:
        validate_lap_shard_divisibility(
            int(global_shape[1]), mesh.shape[axis_name], lap_pool,
        )
    from style_transfer_visualizer_tpu.models.features import (  # noqa: PLC0415
        Targets,
    )

    row_spec = P(None, axis_name, None, None)

    def template_specs(targets: Targets) -> Targets:
        return Targets(
            style_grams={k: P() for k in targets.style_grams},
            content_feats={k: row_spec for k in targets.content_feats},
        )

    shard_fn = partial(
        _sharded_loss_shard_fn,
        style_w=style_w,
        content_w=content_w,
        style_layers=tuple(style_layers),
        content_layers=tuple(content_layers),
        global_shape=tuple(global_shape),
        axis_name=axis_name,
        precision=precision,
        tv_w=tv_w,
        style_weights=style_weights,
        lap_w=lap_w,
        lap_pool=lap_pool,
    )

    def loss_fn(params: Params, image: jax.Array, targets: Targets):
        mapped = jax.shard_map(
            lambda p, x, t: shard_fn(p, x, t),
            mesh=mesh,
            in_specs=(P(), row_spec, template_specs(targets)),
            out_specs=(P(), P(), P()),
        )
        total, style_score, content_score = mapped(params, image, targets)
        return total, (style_score, content_score)

    return loss_fn


def spatial_shardings(
    mesh: Mesh,
    targets,
    *,
    axis_name: str = MESH_AXIS_SPACE,
):
    """(image_sharding, targets_shardings) for the spatial loss layout."""
    from jax.sharding import NamedSharding  # noqa: PLC0415

    from style_transfer_visualizer_tpu.models.features import (  # noqa: PLC0415
        Targets,
    )

    row = NamedSharding(mesh, P(None, axis_name, None, None))
    replicated = NamedSharding(mesh, P())
    target_shardings = Targets(
        style_grams=dict.fromkeys(targets.style_grams, replicated),
        content_feats=dict.fromkeys(targets.content_feats, row),
    )
    return row, target_shardings


def compute_sharded_targets(
    mesh: Mesh,
    params: Params,
    style_img: jax.Array,
    content_img: jax.Array,
    style_layers: tuple[int, ...],
    content_layers: tuple[int, ...],
    *,
    precision: PrecisionLike = None,
    axis_name: str = MESH_AXIS_SPACE,
):
    """Targets for the sharded loss: replicated Grams, sharded content."""
    from style_transfer_visualizer_tpu.models.features import (  # noqa: PLC0415
        Targets,
    )

    taps = tuple(set(style_layers) | set(content_layers))
    arch_table = layer_table_from_params(params)
    validate_shard_divisibility(
        int(content_img.shape[1]), mesh.shape[axis_name], taps, arch_table,
    )
    validate_shard_divisibility(
        int(style_img.shape[1]), mesh.shape[axis_name], taps, arch_table,
    )
    row_spec = P(None, axis_name, None, None)
    b, gh, gw, _ = content_img.shape

    def shard_fn(params, style, content):
        table = layer_table_from_params(params)
        style_acts = sharded_extract_features(
            params, style, tuple(style_layers),
            axis_name=axis_name, precision=precision,
        )
        content_acts = sharded_extract_features(
            params, content, tuple(content_layers),
            axis_name=axis_name, precision=precision,
        )
        sb, sh, sw, _ = style.shape
        n_space = jax.lax.axis_size(axis_name)
        grams = {}
        for idx, act in style_acts.items():
            layer_h = (sh * n_space) // (2 ** pools_before_in(table, idx))
            layer_w = sw // (2 ** pools_before_in(table, idx))
            grams[idx] = jax.lax.stop_gradient(
                sharded_gram(
                    act, sb * layer_h * layer_w,
                    axis_name=axis_name, precision=precision,
                ),
            )
        feats = {
            idx: jax.lax.stop_gradient(act)
            for idx, act in content_acts.items()
        }
        return Targets(style_grams=grams, content_feats=feats)

    out_specs = Targets(
        style_grams={k: P() for k in style_layers},
        content_feats={k: row_spec for k in content_layers},
    )
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), row_spec, row_spec),
        out_specs=out_specs,
    )
    return mapped(params, style_img, content_img)


def build_dp_sp_update(
    mesh: Mesh,
    params: Params,
    stacked_targets,
    image_shape: tuple[int, ...],
    n_styles: int,
    *,
    optimizer: str = "adam",
    lr: float = 0.05,
    style_w: float = 1e4,
    content_w: float = 1.0,
    style_layers: tuple[int, ...] = (0, 5),
    content_layers: tuple[int, ...] = (2,),
    precision: PrecisionLike = None,
    lbfgs_max_iter: int = 1,
    lbfgs_max_eval: int = 1,
    lbfgs_history_size: int = 100,
    lbfgs_history_dtype: str = "float32",
    lbfgs_direction: str = "two-loop",
    tv_w: float = 0.0,
    style_weights: tuple[float, ...] | None = None,
    lap_w: float = 0.0,
    lap_pool: int = 4,
):
    """Full training step sharded over BOTH mesh axes (dp x sp).

    Images are stacked ``(S, 1, H, W, 3)`` with styles sharded over the
    ``style`` axis (data parallelism) and rows over the ``space`` axis
    (spatial/sequence parallelism): each device holds a row-block of its
    styles' images, halo-exchanges with its spatial neighbors inside the
    convolutions, and psums Gram partials over ICI.

    With ``optimizer="adam"`` the update runs shard-locally on each
    device's own pixel block — no gradient collective is needed because
    the problems are style-independent and pixel gradients are
    row-local. With ``optimizer="lbfgs"`` the curvature history shards
    like the pixels (a flat (m, N) ring whose N axis is exactly the
    row-block order, since row-major flattening keeps row blocks
    contiguous) and every two-loop dot product and norm goes global via
    psum/pmax over the space axis
    (``engine.optimizers.lbfgs_step(axis_name=...)``); elementwise math
    stays shard-local, so the sharded trajectory matches the
    single-device one.

    Returns ``(update_fn, initial_state, chunked_update_fn)`` where
    ``update_fn(images, state) -> (images, state, StepAux)`` is jitted
    with donated carries and ``chunked_update_fn(images, state, k)``
    fuses ``k`` steps into one dispatch (``lax.scan``). The aux carries
    per-style ``(S,)`` loss/style/content arrays (the same telemetry
    contract as the single-problem step). Weights and targets ride as
    runtime jit arguments, never baked HLO constants (BASELINE.md
    backend notes: baked constants explode remote compiles).
    """
    from style_transfer_visualizer_tpu.engine.optimizers import (  # noqa: PLC0415
        AdamState,
        StepAux,
        _adam_update_math,
        lbfgs_init,
        lbfgs_step,
    )
    from style_transfer_visualizer_tpu.models.features import (  # noqa: PLC0415
        Targets,
    )
    from style_transfer_visualizer_tpu.models.vgg19 import (  # noqa: PLC0415
        add_flipped_kernels,
    )

    # Pre-flipped kernels route every shard's conv backward through
    # the forward-conv form (_halo_conv_frozen).
    params = add_flipped_kernels(params)
    n_space = mesh.shape[MESH_AXIS_SPACE]
    validate_shard_divisibility(
        int(image_shape[1]),
        n_space,
        tuple(set(style_layers) | set(content_layers)),
        layer_table_from_params(params),
    )
    if lap_w:
        validate_lap_shard_divisibility(
            int(image_shape[1]), n_space, lap_pool,
        )
    n_global = 1
    for dim in image_shape:
        n_global *= int(dim)
    image_specs = P(MESH_AXIS_STYLE, None, MESH_AXIS_SPACE, None, None)
    # The padded Laplacian target rides with the content features (it
    # row-shards identically; broadcast over styles by the caller).
    feat_keys = list(content_layers) + (
        [LAP_RESPONSE_KEY] if lap_w else []
    )
    target_specs = Targets(
        style_grams={k: P(MESH_AXIS_STYLE) for k in style_layers},
        content_feats={
            k: P(MESH_AXIS_STYLE, None, MESH_AXIS_SPACE, None, None)
            for k in feat_keys
        },
    )

    def style_loss_fn(p, x_s, grams, feats):
        """Per-style sharded loss on this device's row block."""
        total, style_score, content_score = _sharded_loss_shard_fn(
            p,
            x_s,
            Targets(style_grams=grams, content_feats=feats),
            style_w=style_w,
            content_w=content_w,
            style_layers=tuple(style_layers),
            content_layers=tuple(content_layers),
            global_shape=tuple(image_shape),
            axis_name=MESH_AXIS_SPACE,
            precision=precision,
            tv_w=tv_w,
            style_weights=style_weights,
            lap_w=lap_w,
            lap_pool=lap_pool,
        )
        return total, (style_score, content_score)

    if optimizer == "adam":
        def block_fn(p, x_blk, targets_blk, state_blk):
            mu_blk, nu_blk, count = state_blk

            def loss_of(xb):
                per_style, scores = jax.vmap(
                    lambda x_s, g, f: style_loss_fn(p, x_s, g, f),
                )(xb, targets_blk.style_grams, targets_blk.content_feats)
                return jnp.sum(per_style), (per_style, *scores)

            (_, (per_style, style_scores, content_scores)), grad = (
                jax.value_and_grad(loss_of, has_aux=True)(x_blk)
            )
            # Shard-local Adam on this device's pixel block (shared
            # math with the single-device optimizer; shape-agnostic).
            delta, new_state = _adam_update_math(
                grad,
                AdamState(mu=mu_blk, nu=nu_blk, count=count),
                jnp.asarray(lr, jnp.float32),
            )
            aux = StepAux(
                loss=per_style,
                style_score=style_scores,
                content_score=content_scores,
                n_evals=jnp.ones_like(per_style, dtype=jnp.int32),
            )
            return (
                x_blk + delta,
                (new_state.mu, new_state.nu, new_state.count),
                aux,
            )

        state_specs = (image_specs, image_specs, P())

        def init_state_fn():
            zeros = jnp.zeros((n_styles, *image_shape), jnp.float32)
            return (zeros, jnp.zeros_like(zeros), jnp.zeros((), jnp.int32))

    elif optimizer == "lbfgs":
        def block_fn(p, x_blk, targets_blk, state_blk):
            block_shape = x_blk.shape[1:]
            n_local = 1
            for dim in block_shape:
                n_local *= int(dim)

            # The replicated weights must carry the image block's full
            # varying-axes type up front: the re-eval `lax.cond`
            # (style-varying predicate) and the outer `while_loop`
            # otherwise auto-pvary the same captured constants to two
            # different axis sets and collide. Targets stay as-is —
            # style Grams must remain space-invariant so the psum'd
            # Gram residual (and hence the loss) stays space-invariant.
            from style_transfer_visualizer_tpu.engine.optimizers import (  # noqa: PLC0415
                _vary_like,
            )

            p = jax.tree.map(lambda w: _vary_like(w, x_blk), p)

            def one_style(x_s, grams, feats, st):
                def vag(flat):
                    return jax.value_and_grad(
                        lambda f: style_loss_fn(
                            p, f.reshape(block_shape), grams, feats,
                        ),
                        has_aux=True,
                    )(flat)

                new_flat, new_st, aux = lbfgs_step(
                    vag, x_s.reshape(n_local), st, lr,
                    max_iter=lbfgs_max_iter,
                    max_eval=lbfgs_max_eval,
                    history_size=lbfgs_history_size,
                    axis_name=MESH_AXIS_SPACE,
                    direction_method=lbfgs_direction,
                )
                return new_flat.reshape(block_shape), new_st, aux

            return jax.vmap(one_style)(
                x_blk,
                targets_blk.style_grams,
                targets_blk.content_feats,
                state_blk,
            )

        from style_transfer_visualizer_tpu.engine.optimizers import (  # noqa: PLC0415
            LbfgsState,
        )

        # Flat-vector leaves shard their N axis over space (row-major
        # flattening keeps row blocks contiguous); ring metadata and
        # scalars replicate over space, everything shards over style.
        state_specs = LbfgsState(
            s_hist=P(MESH_AXIS_STYLE, None, MESH_AXIS_SPACE),
            y_hist=P(MESH_AXIS_STYLE, None, MESH_AXIS_SPACE),
            rho=P(MESH_AXIS_STYLE),
            hist_len=P(MESH_AXIS_STYLE),
            hist_pos=P(MESH_AXIS_STYLE),
            h_diag=P(MESH_AXIS_STYLE),
            prev_grad=P(MESH_AXIS_STYLE, MESH_AXIS_SPACE),
            direction=P(MESH_AXIS_STYLE, MESH_AXIS_SPACE),
            step_size=P(MESH_AXIS_STYLE),
            prev_loss=P(MESH_AXIS_STYLE),
            n_total_iters=P(MESH_AXIS_STYLE),
            func_evals=P(MESH_AXIS_STYLE),
        )

        def init_state_fn():
            return jax.vmap(
                lambda _: lbfgs_init(
                    n_global, lbfgs_history_size,
                    history_dtype=jnp.dtype(lbfgs_history_dtype),
                ),
            )(jnp.arange(n_styles))

    else:
        msg = f"Unknown optimizer: {optimizer!r}"
        raise ValueError(msg)

    aux_specs = StepAux(
        loss=P(MESH_AXIS_STYLE),
        style_score=P(MESH_AXIS_STYLE),
        content_score=P(MESH_AXIS_STYLE),
        n_evals=P(MESH_AXIS_STYLE),
    )
    mapped = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(P(), image_specs, target_specs, state_specs),
        out_specs=(image_specs, state_specs, aux_specs),
    )

    def update(images, state, p, targets):
        return mapped(p, images, targets, state)

    jitted = jax.jit(update, donate_argnums=(0, 1))

    # Allocate the state directly into its sharding — materializing the
    # L-BFGS history unsharded first would put the full S x m x N ring
    # on one device before the reshard.
    from jax.sharding import NamedSharding  # noqa: PLC0415

    state_shardings = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        state_specs,
        is_leaf=lambda leaf: isinstance(leaf, P),
    )
    init_state = jax.jit(
        init_state_fn, out_shardings=state_shardings,
    )()

    def update_fn(images, state):
        return jitted(images, state, params, stacked_targets)

    from style_transfer_visualizer_tpu.engine.step import (  # noqa: PLC0415
        make_chunked_update,
    )

    jitted_multi = make_chunked_update(update, n_extra_args=2)

    def chunked_update_fn(images, state, k: int):
        return jitted_multi(images, state, params, stacked_targets, k)

    return update_fn, init_state, chunked_update_fn
