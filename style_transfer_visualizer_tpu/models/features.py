"""Feature extraction taps and style/content losses (pure functions).

Equivalent in capability to the reference's ``StyleContentModel``
(core_model.py:149-328) but organized for XLA: instead of a module that
mutates target state, targets are a pytree computed once and closed over
by a jitted loss function. A tap at layer index *i* is the activation
*after* layer *i* runs — identical to the reference's block slicing, where
a block ends at (and includes) each tapped layer.

MaxPool uses 2x2/stride-2 floor semantics (torch ``ceil_mode=False``) and
convolutions are 3x3 stride-1 SAME, matching torchvision VGG19.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp

from style_transfer_visualizer_tpu.models.arch import (
    CONV,
    POOL,
    RELU,
    LayerTable,
    layer_table_from_params,
)
from style_transfer_visualizer_tpu.models.vgg19 import Params
from style_transfer_visualizer_tpu.ops.gram import gram_apply
from style_transfer_visualizer_tpu.ops.pool import maxpool_2x2, relu
from style_transfer_visualizer_tpu.ops.precision import (
    PrecisionLike,
    conv_bwd_precision,
    conv_precision,
)

_CONV_DIMS = ("NHWC", "HWIO", "NHWC")

if TYPE_CHECKING:
    from style_transfer_visualizer_tpu.type_defs import InitMethod

@dataclass(frozen=True)
class Targets:
    """Precomputed optimization targets (detached by construction).

    ``style_grams`` maps layer index -> (C, C) Gram matrix of the style
    image; ``content_feats`` maps layer index -> raw activation of the
    content image.
    """

    style_grams: dict[int, jax.Array]
    content_feats: dict[int, jax.Array]


def blend_targets(
    targets_seq: "list[Targets]",
    weights: "list[float]",
) -> Targets:
    """Weighted blend of style Gram targets (multi-style interpolation).

    Gram matrices are second moments of the style's feature
    distribution, so a convex combination of per-style Grams IS the
    target of a style *mixture* — the classic interpolation from the
    style-transfer literature (Gatys et al.; Dumoulin et al.'s style
    interpolation operates on the same statistics). Content targets
    come from the first entry; every entry was computed against the
    same content image, and style-only extras (``content_layers=()``)
    carry none. The reference has no multi-style blending
    (core_model.py:218-232 sets targets from exactly one style image).
    """
    if len(targets_seq) != len(weights) or not targets_seq:
        msg = "blend_targets needs one weight per Targets entry"
        raise ValueError(msg)
    grams: dict[int, jax.Array] = {}
    for idx in targets_seq[0].style_grams:
        acc = weights[0] * targets_seq[0].style_grams[idx]
        for t, w in zip(targets_seq[1:], weights[1:], strict=True):
            acc = acc + w * t.style_grams[idx]
        grams[idx] = jax.lax.stop_gradient(acc)
    return Targets(
        style_grams=grams,
        content_feats=targets_seq[0].content_feats,
    )


def targets_maybe_blended(
    one_targets,
    style_img: jax.Array,
    content_layers: tuple[int, ...],
    blend_imgs: "list[tuple[jax.Array, float]] | None",
) -> Targets:
    """Single-style targets, or the weighted multi-style Gram blend.

    ``one_targets(style_image, content_layers)`` is the caller's own
    target computation (plain, banded, sharded-grams, or coarse);
    blending calls it once with content layers (the first style) and
    style-only (``content_layers=()``) for the rest, then mixes the
    Grams by weight (:func:`blend_targets`).
    """
    if blend_imgs is None:
        return one_targets(style_img, content_layers)
    first = one_targets(blend_imgs[0][0], content_layers)
    extras = [one_targets(img, ()) for img, _ in blend_imgs[1:]]
    return blend_targets(
        [first, *extras], [weight for _, weight in blend_imgs],
    )


def _validate_layers(indices: tuple[int, ...], table: LayerTable) -> None:
    for idx in indices:
        if not 0 <= idx < len(table):
            msg = (
                f"Layer index {idx} out of range 0..{len(table) - 1}"
            )
            raise ValueError(msg)


def _apply_layer(
    params: Params,
    idx: int,
    kind: str,
    x: jax.Array,
    precision: PrecisionLike,
) -> jax.Array:
    if kind == CONV:
        layer = params[idx]
        if "w_flip" in layer:
            # Frozen-backbone VJP: backward is a plain forward conv on
            # the pre-flipped kernel (ops/frozen_conv.py) — faster than
            # XLA's transposed-conv autodiff on TPU.
            from style_transfer_visualizer_tpu.ops.frozen_conv import (  # noqa: PLC0415
                conv3x3_frozen,
            )

            return conv3x3_frozen(
                x, layer["w"], layer["w_flip"],
                conv_precision(precision, idx),
                conv_bwd_precision(precision, idx),
            ) + layer["b"]
        return jax.lax.conv_general_dilated(
            x,
            layer["w"],
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=_CONV_DIMS,
            precision=conv_precision(precision, idx),
        ) + layer["b"]
    if kind == RELU:
        return relu(x)
    return maxpool_2x2(x)


def _pallas_conv(
    params: Params,
    idx: int,
    x: jax.Array,
    precision: PrecisionLike,
    fuse_relu: bool,
) -> jax.Array:
    from style_transfer_visualizer_tpu.ops.gram import (  # noqa: PLC0415
        _running_on_tpu,
    )
    from style_transfer_visualizer_tpu.ops.pallas_conv import (  # noqa: PLC0415
        conv3x3_bias_relu,
        hwio_to_stencil,
    )

    layer = params[idx]
    return conv3x3_bias_relu(
        x,
        hwio_to_stencil(layer["w"]),
        layer["b"],
        fuse_relu,
        not _running_on_tpu(),
        conv_precision(precision, idx),
    )


def _sweep(
    params: Params,
    x: jax.Array,
    indices: tuple[int, ...],
    tap_set: frozenset[int],
    precision: PrecisionLike,
    conv_backend: str,
    table: LayerTable,
) -> tuple[jax.Array, dict[int, jax.Array]]:
    """Run a contiguous layer range, fusing conv+ReLU pairs on Pallas.

    A conv fuses with its following ReLU only when the conv itself is
    not a tap (style taps sample the PRE-ReLU conv output, matching the
    reference's block slicing) and the ReLU is inside the range. On the
    XLA backend conv and ReLU stay separate ops — a custom-VJP fused
    conv+bias+ReLU was built and measured at parity with this (the
    flipped-kernel backward conv costs exactly what XLA's transposed
    conv does), so the simpler formulation stands.
    """
    acts: dict[int, jax.Array] = {}
    i = 0
    while i < len(indices):
        idx = indices[i]
        kind = table[idx][0]
        if kind == CONV and conv_backend == "pallas":
            nxt = indices[i + 1] if i + 1 < len(indices) else None
            fuse = (
                nxt == idx + 1
                and table[nxt][0] == RELU
                and idx not in tap_set
            )
            x = _pallas_conv(params, idx, x, precision, fuse)
            if fuse:
                if nxt in tap_set:
                    acts[nxt] = x
                i += 2
                continue
            # One-way: every VGG conv is followed by a ReLU, so fusion
            # is only declined when the conv itself is tapped.
            if idx in tap_set:  # pragma: no branch
                acts[idx] = x
            i += 1
            continue
        x = _apply_layer(params, idx, kind, x, precision)
        if idx in tap_set:
            acts[idx] = x
        i += 1
    return x, acts


def extract_features(
    params: Params,
    x: jax.Array,
    taps: tuple[int, ...],
    *,
    precision: PrecisionLike = None,
    remat: bool = False,
    conv_backend: str = "xla",
) -> dict[int, jax.Array]:
    """Run the feature stack up to the deepest tap, recording activations.

    Layers beyond the last tap are never traced, so XLA compiles exactly
    the work required (the reference likewise drops trailing layers,
    core_model.py:120-146).

    With ``remat=True`` the stack is split into segments ending at each
    tap or pool, and each segment is wrapped in ``jax.checkpoint``: the
    backward pass recomputes intra-segment activations instead of
    keeping them live, trading ~1 extra forward of FLOPs for the HBM
    headroom that lets 4K-class inputs fit on a single chip.

    ``conv_backend="pallas"`` runs each 3x3 conv (+ its following ReLU,
    fused) through the Pallas stencil kernel (``ops.pallas_conv``).
    """
    if not taps:
        return {}
    # The layer table is derived from the params pytree's static
    # structure (models.arch), so the sweep adapts to whatever
    # architecture's weights it is handed — VGG19, VGG16, or a tiny
    # test stack — with no global switch.
    table = layer_table_from_params(params)
    _validate_layers(taps, table)
    tap_set = frozenset(taps)
    last = max(taps)
    acts: dict[int, jax.Array] = {}

    if not remat:
        _, acts = _sweep(
            params, x, tuple(range(last + 1)), tap_set, precision,
            conv_backend, table,
        )
        return acts

    # Segment boundaries: every tap (its activation must be an output)
    # and every pool (natural memory cliff).
    segments: list[list[int]] = []
    current: list[int] = []
    for idx in range(last + 1):
        current.append(idx)
        if idx in tap_set or table[idx][0] == POOL:
            segments.append(current)
            current = []
    # Defensive only: the loop ends at max(taps), which is itself a tap,
    # so the final segment always flushes inside the loop.
    if current:  # pragma: no cover
        segments.append(current)

    def run_segment(seg: tuple[int, ...], params: Params, x: jax.Array):
        return _sweep(
            params, x, seg, tap_set, precision, conv_backend, table,
        )

    for seg in segments:
        seg_t = tuple(seg)
        x, seg_acts = jax.checkpoint(
            partial(run_segment, seg_t),
        )(params, x)
        acts.update(seg_acts)
    return acts


@partial(
    jax.jit,
    static_argnames=(
        "style_layers", "content_layers", "precision", "gram_backend",
        "conv_backend",
    ),
)
def compute_targets(
    params: Params,
    style_img: jax.Array,
    content_img: jax.Array,
    style_layers: tuple[int, ...],
    content_layers: tuple[int, ...],
    precision: PrecisionLike = None,
    gram_backend: str = "xla",
    conv_backend: str = "xla",
) -> Targets:
    """Precompute style Gram targets and content activation targets.

    Jitted: the whole two-image feature sweep is one compiled
    computation (eager per-layer dispatch costs a compile + device
    roundtrip per op on remote-attached TPUs).
    """
    style_acts = extract_features(
        params, style_img, style_layers, precision=precision,
        conv_backend=conv_backend,
    )
    content_acts = extract_features(
        params, content_img, content_layers, precision=precision,
        conv_backend=conv_backend,
    )
    style_grams = {
        idx: jax.lax.stop_gradient(
            gram_apply(act, backend=gram_backend, precision=precision),
        )
        for idx, act in style_acts.items()
    }
    content_feats = {
        idx: jax.lax.stop_gradient(act)
        for idx, act in content_acts.items()
    }
    return Targets(style_grams=style_grams, content_feats=content_feats)


@partial(jax.jit, static_argnames=("content_layers", "precision"))
def compute_content_targets(
    params: Params,
    content_img: jax.Array,
    content_layers: tuple[int, ...],
    precision: PrecisionLike = None,
) -> dict[int, jax.Array]:
    """Content activation targets only (style grams unchanged).

    Used by the frame-sequence pipeline, where the style target is
    constant across the clip and only content targets change per frame.
    """
    acts = extract_features(
        params, content_img, content_layers, precision=precision,
    )
    return {
        idx: jax.lax.stop_gradient(act) for idx, act in acts.items()
    }


def _mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(a - b))


def _resolve_style_weights(
    style_weights: tuple[float, ...] | None,
    style_layers: tuple[int, ...],
) -> tuple[float, ...]:
    """Validated per-layer style weights (all 1.0 when unset).

    Weights are trace-time Python floats: a 1.0 weight leaves the layer
    term untouched (no multiply in the graph), so the default is
    bit-identical to the unweighted loss.
    """
    if style_weights is None:
        return (1.0,) * len(style_layers)
    if len(style_weights) != len(style_layers):
        msg = (
            f"style_weights has {len(style_weights)} entries for "
            f"{len(style_layers)} style layers"
        )
        raise ValueError(msg)
    return tuple(float(w) for w in style_weights)


def _weighted(w: float, term: jax.Array) -> jax.Array:
    """``w * term``, with the 1.0 fast path leaving the graph unchanged."""
    return term if w == 1.0 else w * term


def style_content_losses(
    params: Params,
    x: jax.Array,
    targets: Targets,
    style_layers: tuple[int, ...],
    content_layers: tuple[int, ...],
    *,
    precision: PrecisionLike = None,
    remat: bool = False,
    gram_backend: str = "xla",
    conv_backend: str = "xla",
    style_weights: tuple[float, ...] | None = None,
) -> tuple[list[jax.Array], list[jax.Array]]:
    """Per-layer style (Gram MSE) and content (feature MSE) losses.

    ``style_weights`` scales each style layer's Gram MSE (Gatys-style
    per-layer weighting, one weight per entry of ``style_layers``);
    ``None`` weights every layer 1.0 — the reference's equal-weight sum
    (core_model.py:234-264 accumulates unweighted per-layer MSEs).
    """
    weights = _resolve_style_weights(style_weights, style_layers)
    taps = tuple(sorted(set(style_layers) | set(content_layers)))
    acts = extract_features(
        params, x, taps, precision=precision, remat=remat,
        conv_backend=conv_backend,
    )
    style_losses = [
        _weighted(
            w,
            _mse(
                gram_apply(
                    acts[idx], backend=gram_backend, precision=precision,
                ),
                targets.style_grams[idx],
            ),
        )
        for idx, w in zip(style_layers, weights, strict=True)
    ]
    content_losses = [
        _mse(acts[idx], targets.content_feats[idx])
        for idx in content_layers
    ]
    return style_losses, content_losses


@partial(
    jax.jit,
    static_argnames=(
        "style_layers", "content_layers", "precision", "remat",
        "gram_backend", "conv_backend", "style_weights",
    ),
)
def total_loss(
    params: Params,
    x: jax.Array,
    targets: Targets,
    style_w: jax.Array | float,
    content_w: jax.Array | float,
    style_layers: tuple[int, ...],
    content_layers: tuple[int, ...],
    precision: PrecisionLike = None,
    remat: bool = False,
    gram_backend: str = "xla",
    conv_backend: str = "xla",
    style_weights: tuple[float, ...] | None = None,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Weighted total loss plus (style_score, content_score) aux.

    Empty layer lists contribute a zero scalar, mirroring the reference's
    zero-fallback (optimization.py:296-307). ``style_weights`` applies
    per-layer Gatys weights inside the style score (see
    :func:`style_content_losses`).
    """
    style_losses, content_losses = style_content_losses(
        params, x, targets, style_layers, content_layers,
        precision=precision, remat=remat, gram_backend=gram_backend,
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


def initialize_input(
    content_img: jax.Array,
    method: InitMethod,
    key: jax.Array | None = None,
) -> jax.Array:
    """Build the optimization starting image.

    "content" clones the content image, "random" draws standard-normal
    noise, "white" is all-ones (reference core_model.py:66-100). JAX has
    no requires_grad; the caller differentiates with respect to this
    array explicitly.
    """
    if method == "content":
        return jnp.array(content_img)
    if method == "random":
        if key is None:
            msg = "random init requires a PRNG key"
            raise ValueError(msg)
        return jax.random.normal(
            key, content_img.shape, dtype=content_img.dtype,
        )
    if method == "white":
        return jnp.ones_like(content_img)
    msg = f"Unsupported initialization method: {method}"
    raise ValueError(msg)


# Register Targets as a pytree so it can cross jit boundaries.
jax.tree_util.register_pytree_node(
    Targets,
    lambda t: (
        (t.style_grams, t.content_feats),
        None,
    ),
    lambda _, children: Targets(*children),
)
