"""Builds the single jitted update step for a style-transfer run.

The whole hot loop of the reference — closure forward, backward, optimizer
update (optimization.py:162-327) — compiles here into ONE XLA computation
per step with the image and optimizer state donated, so pixels never leave
HBM and the host only dispatches. Metrics come back as device scalars; the
caller decides when to sync them.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax

from style_transfer_visualizer_tpu.engine.optimizers import (
    AdamState,
    LbfgsState,
    StepAux,
    adam_init,
    adam_step,
    lbfgs_init,
    lbfgs_step,
)
from style_transfer_visualizer_tpu.models.features import (
    Targets,
    total_loss,
)
from style_transfer_visualizer_tpu.models.vgg19 import (
    Params,
    add_flipped_kernels as vgg19_add_flipped,
)
from style_transfer_visualizer_tpu.ops.precision import (
    MIXED,
    PrecisionPolicy,
)
from style_transfer_visualizer_tpu.ops.lap import lap_loss
from style_transfer_visualizer_tpu.ops.tv import tv_loss

_PRECISIONS: dict[str, jax.lax.Precision | PrecisionPolicy] = {
    "highest": jax.lax.Precision.HIGHEST,
    "mixed": MIXED,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}

OptState = LbfgsState | AdamState

# update(image, opt_state) -> (image, opt_state, StepAux)
UpdateFn = Callable[
    [jax.Array, OptState], tuple[jax.Array, OptState, StepAux],
]


class StepBundle(NamedTuple):
    """A compiled update function with its initial optimizer state.

    ``chunked_update_fn(image, state, k)`` runs ``k`` steps as ONE
    device dispatch (``lax.scan`` over the update) and returns stacked
    per-step ``StepAux`` arrays of leading dimension ``k`` — this
    amortizes the per-dispatch host/tunnel overhead that otherwise
    dominates small-image steps (~11 ms/step of the 25 ms total at
    512px on the axon-attached v5e). One executable compiles per
    distinct ``k``.
    """

    update_fn: UpdateFn
    opt_state: OptState
    chunked_update_fn: Callable | None = None


def resolve_precision(name: str) -> jax.lax.Precision | PrecisionPolicy:
    """Map a config precision name to a lax.Precision or policy.

    "mixed" — the pipeline default — resolves to the
    :data:`~style_transfer_visualizer_tpu.ops.precision.MIXED` policy
    (bf16x3 convs with the first two blocks and the Gram contractions in
    f32), which holds the 1e-3 curve-parity gate at near-``high`` speed.
    """
    try:
        return _PRECISIONS[name]
    except KeyError:
        msg = f"Unknown precision: {name!r}"
        raise ValueError(msg) from None


def make_chunked_update(
    update: Callable,
    *,
    n_extra_args: int = 0,
    donate: bool = True,
) -> Callable:
    """Jit a k-step ``lax.scan`` over a single-step update function.

    ``update(image, state, *extra)`` must return ``(image, state,
    aux)``; the result is ``chunked(image, state, *extra, k)`` running
    ``k`` steps as one dispatch with per-step aux stacked along a
    leading ``k`` axis. ``k`` is a static argument (one executable per
    distinct chunk size). ``donate`` donates the carried image/state
    buffers — the scan reuses them anyway, and the per-dispatch
    donation overhead amortizes over ``k``.
    """
    def multi(image, state, *rest):
        *extra, k = rest

        def body(carry, _):
            img, st = carry
            img, st, aux = update(img, st, *extra)
            return (img, st), aux

        (img, st), auxes = jax.lax.scan(
            body, (image, state), None, length=k,
        )
        return img, st, auxes

    return jax.jit(
        multi,
        static_argnums=(2 + n_extra_args,),
        donate_argnums=(0, 1) if donate else (),
    )


def drive_chunked(
    chunked_update: Callable,
    image: jax.Array,
    state,
    steps: int,
    chunk: int,
):
    """Drive ``steps`` updates through a k-step dispatch, ``chunk`` at
    a time.

    The host-side splitting loop shared by the coarse warm start, the
    batch warm start, and the sequence pipeline's per-frame budget:
    ``chunked_update(image, state, k)`` runs ``k`` steps as one
    dispatch. Returns the final carries plus the *last* dispatch's
    stacked aux (None when ``steps`` is 0).
    """
    auxes = None
    remaining = steps
    while remaining > 0:
        k = min(chunk, remaining)
        image, state, auxes = chunked_update(image, state, k)
        remaining -= k
    return image, state, auxes


def build_update_step(
    params: Params,
    targets: Targets,
    image_shape: tuple[int, ...],
    *,
    optimizer: str,
    lr: float,
    style_w: float,
    content_w: float,
    tv_w: float = 0.0,
    lap_w: float = 0.0,
    lap_pool: int = 4,
    lap_target: jax.Array | None = None,
    style_layers: tuple[int, ...],
    content_layers: tuple[int, ...],
    precision: str = "highest",
    lbfgs_max_iter: int = 1,
    lbfgs_max_eval: int = 1,
    lbfgs_history_size: int = 100,
    lbfgs_history_dtype: str = "float32",
    lbfgs_direction: str = "two-loop",
    donate: bool | None = None,
    remat: bool = False,
    gram_backend: str = "xla",
    conv_backend: str = "xla",
    tile_rows: int = 0,
    loss_fn: Callable | None = None,
    style_weights: tuple[float, ...] | None = None,
) -> StepBundle:
    """Compile the per-step update for the given problem.

    The returned function has signature ``(image, opt_state) -> (image,
    opt_state, StepAux)`` with both carried buffers donated. ``image`` is
    the working (1, H, W, 3) array in (possibly normalized) model space.

    ``tile_rows > 0`` evaluates the loss as a ``lax.scan`` over row
    bands (``ops.tiled``) — exact, but with a much smaller compiled
    graph and per-band activation memory, for inputs whose whole-image
    graph exceeds the chip (4K-class).

    ``loss_fn`` swaps in a custom objective with the signature
    ``(params, image, targets) -> (total, (style_score,
    content_score))`` — e.g. the mesh-sharded spatial loss
    (``parallel.spatial.make_spatial_loss``); the optimizer machinery is
    shared unchanged. A custom ``loss_fn`` owns its own TV term (the
    sharded loss computes it seam-exactly per shard), so ``tv_w`` here
    applies only to the whole-image and banded paths.

    ``lap_w > 0`` adds the Laplacian detail-preservation term
    (``ops.lap``) against ``lap_target`` — the precomputed
    ``lap_response(content, lap_pool)`` — which rides as a runtime
    argument alongside the targets. Like TV it touches only the
    (pooled) image, so it composes with banded evaluation. A custom
    ``loss_fn`` owns ALL of its regularizers (the mesh-sharded spatial
    loss composes its own halo-exact lap term via
    ``parallel.spatial.sharded_lap``), so passing ``lap_w`` here
    alongside ``loss_fn`` is a plumbing error and raises rather than
    silently changing the objective.
    """
    prec = resolve_precision(precision)
    if lap_w and loss_fn is not None:
        msg = (
            "lap_w > 0 with a custom loss_fn: the loss_fn owns its own "
            "regularizers — compose the Laplacian term inside it (see "
            "parallel.spatial.sharded_lap) instead of passing lap_w."
        )
        raise ValueError(msg)
    use_lap = bool(lap_w)
    if use_lap and lap_target is None:
        msg = "lap_w > 0 requires a precomputed lap_target response"
        raise ValueError(msg)
    if not use_lap:
        lap_target = None
    if conv_backend != "pallas":
        # Ship pre-flipped kernels so the conv backward runs as a plain
        # forward conv (ops/frozen_conv.py; ~4% off the step on TPU).
        # Custom loss_fns benefit too: the mesh-sharded spatial loss
        # routes its halo convs through the same frozen-backward form
        # when the flipped copies are present (_halo_conv_frozen).
        params = vgg19_add_flipped(params)
    n = 1
    for dim in image_shape:
        n *= int(dim)

    # Weights and targets flow in as runtime arguments rather than
    # closure constants: baked-in constants bloat the serialized HLO
    # (hundreds of MB of content targets at 4K), which slows — or on
    # remote-compile backends outright rejects — compilation.
    def vag(flat: jax.Array, params: Params, tpack):
        targets, lap_t = tpack

        def loss_of(flat_x: jax.Array):
            img = flat_x.reshape(image_shape)
            if loss_fn is not None:
                return loss_fn(params, img, targets)
            if tile_rows > 0:
                from style_transfer_visualizer_tpu.ops.tiled import (  # noqa: PLC0415
                    tiled_total_loss,
                )

                total, aux = tiled_total_loss(
                    params, img, targets, style_w, content_w,
                    tuple(style_layers), tuple(content_layers),
                    tile_rows, prec, conv_backend,
                    style_weights=style_weights,
                )
            else:
                total, aux = total_loss(
                    params, img, targets, style_w, content_w,
                    tuple(style_layers), tuple(content_layers), prec,
                    remat, gram_backend, conv_backend,
                    style_weights=style_weights,
                )
            if tv_w:
                # TV touches only the image (no VGG activations), so
                # even at banded 4K sizes the whole-image term is a
                # negligible add outside the band scan.
                total = total + tv_w * tv_loss(img)
            if use_lap:
                total = total + lap_w * lap_loss(img, lap_t, lap_pool)
            return total, aux

        return jax.value_and_grad(loss_of, has_aux=True)(flat)

    if optimizer == "lbfgs":
        opt_state: OptState = lbfgs_init(
            n, lbfgs_history_size,
            history_dtype=jax.numpy.dtype(lbfgs_history_dtype),
        )

        def update(image, state: LbfgsState, params, tpack):
            flat = image.reshape(n)
            new_flat, new_state, aux = lbfgs_step(
                lambda f: vag(f, params, tpack), flat, state, lr,
                max_iter=lbfgs_max_iter,
                max_eval=lbfgs_max_eval,
                history_size=lbfgs_history_size,
                direction_method=lbfgs_direction,
            )
            return new_flat.reshape(image_shape), new_state, aux

    elif optimizer == "adam":
        # Adam moments carry the image's own shape: elementwise math
        # doesn't care, and skipping the flatten avoids a relayout
        # between the conv-backward output and the optimizer update.
        opt_state = adam_init(tuple(image_shape))

        def update(image, state: AdamState, params, tpack):
            return adam_step(
                lambda im: vag(im, params, tpack), image, state, lr,
            )

    else:
        msg = f"Unknown optimizer: {optimizer!r}"
        raise ValueError(msg)

    if donate is None:
        # Donation halves carried-buffer memory but costs a fixed
        # per-dispatch overhead on remote-attached backends (~19 ms
        # measured on axon-tunneled v5e). Default: donate only when the
        # carried state is large enough for memory to matter — L-BFGS
        # history is 2 * m * N floats, Adam state is 2 * N.
        state_bytes = sum(
            leaf.size * leaf.dtype.itemsize
            for leaf in jax.tree_util.tree_leaves(opt_state)
        )
        donate = state_bytes > 256 * 1024 * 1024
    jitted = jax.jit(
        update, donate_argnums=(0, 1) if donate else (),
    )

    def update_fn(image: jax.Array, state: OptState):
        return jitted(image, state, params, (targets, lap_target))

    # Chunks always donate: the k-step scan reuses the carried buffers
    # anyway, and the per-dispatch donation overhead amortizes over k.
    jitted_multi = make_chunked_update(update, n_extra_args=2)

    def chunked_update_fn(image: jax.Array, state: OptState, k: int):
        return jitted_multi(image, state, params, (targets, lap_target), k)

    return StepBundle(
        update_fn=update_fn,
        opt_state=opt_state,
        chunked_update_fn=chunked_update_fn,
    )
