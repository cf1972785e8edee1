"""Multi-style data parallelism: 1 content x S styles across the mesh.

Each style target defines an independent optimization of its own image;
the S problems are vmapped into one stacked update and sharded over the
``style`` mesh axis (BASELINE.json configs[2]). VGG19 weights are
replicated; per-style Gram targets, images, and optimizer states are
sharded. No collectives are needed in the step — the problems are
independent — so scaling is embarrassingly linear over ICI-connected
chips.
"""
from __future__ import annotations

from typing import TYPE_CHECKING, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from style_transfer_visualizer_tpu.constants import MESH_AXIS_STYLE
from style_transfer_visualizer_tpu.engine.optimizers import (
    StepAux,
    adam_init,
    adam_step,
    lbfgs_init,
    lbfgs_step,
)
from style_transfer_visualizer_tpu.engine.step import resolve_precision
from style_transfer_visualizer_tpu.ops.precision import PrecisionLike
from style_transfer_visualizer_tpu.ops.lap import lap_loss
from style_transfer_visualizer_tpu.ops.tv import tv_loss
from style_transfer_visualizer_tpu.models.features import (
    Targets,
    compute_content_targets,
    compute_targets,
    initialize_input,
    total_loss,
)

if TYPE_CHECKING:
    from collections.abc import Sequence

    from jax.sharding import Mesh

    from style_transfer_visualizer_tpu.models.vgg19 import Params


class MultiStyleBundle(NamedTuple):
    """Stacked update function with initial stacked optimizer state.

    ``chunked_update_fn(images, state, k)`` — when present — runs ``k``
    stacked steps as ONE dispatch (``lax.scan`` over the vmapped
    update), returning per-step aux stacked along a leading ``k`` axis;
    the same dispatch-amortization the single-run engine uses
    (engine/step.py StepBundle).
    """

    update_fn: object       # (images (S,*shape), opt_state) -> ...
    opt_state: object
    targets: Targets        # stacked along a leading style axis
    chunked_update_fn: object | None = None


def multi_style_targets(
    params: Params,
    content_img: jax.Array,
    style_imgs: Sequence[jax.Array],
    style_layers: tuple[int, ...],
    content_layers: tuple[int, ...],
    *,
    precision: PrecisionLike = None,
    gram_backend: str = "xla",
) -> Targets:
    """Per-style targets stacked along a leading style axis.

    Style images may have different sizes (Grams are size-independent
    C x C); content targets are identical across styles and broadcast.
    """
    # Style grams per style; the content sweep runs ONCE and its
    # activations broadcast to the style axis (they are identical for
    # every style — at 4K a single layer-21 copy is ~134 MB).
    per_style = [
        compute_targets(
            params, style, content_img, style_layers, (),
            precision=precision, gram_backend=gram_backend,
        )
        for style in style_imgs
    ]
    content_only = compute_content_targets(
        params, content_img, content_layers, precision,
    )
    n = len(style_imgs)
    stacked_grams = {
        idx: jnp.stack([t.style_grams[idx] for t in per_style])
        for idx in style_layers
    }
    stacked_feats = {
        idx: jnp.broadcast_to(feat, (n, *feat.shape))
        for idx, feat in content_only.items()
    }
    return Targets(style_grams=stacked_grams, content_feats=stacked_feats)


def initialize_multi_inputs(
    content_img: jax.Array,
    method: str,
    key: jax.Array,
    n_styles: int,
) -> jax.Array:
    """(S, 1, H, W, 3) starting images, one independent draw per style.

    Reuses the single-image initializer's dispatch; "random" draws an
    independent image per style (one RNG call with a leading axis).
    """
    if method == "random":
        return jax.random.normal(
            key, (n_styles, *content_img.shape), content_img.dtype,
        )
    single = initialize_input(content_img, method, key)
    return jnp.broadcast_to(single, (n_styles, *single.shape)).copy()


def build_multi_style_update(
    mesh: Mesh,
    params: Params,
    targets: Targets,
    image_shape: tuple[int, ...],
    n_styles: int,
    *,
    optimizer: str = "lbfgs",
    lr: float = 1.0,
    style_w: float = 1e5,
    content_w: float = 1.0,
    style_layers: tuple[int, ...] = (),
    content_layers: tuple[int, ...] = (),
    precision: str = "highest",
    lbfgs_max_iter: int = 1,
    lbfgs_max_eval: int = 1,
    lbfgs_history_size: int = 10,
    lbfgs_history_dtype: str = "float32",
    lbfgs_direction: str = "two-loop",
    remat: bool = False,
    gram_backend: str = "xla",
    tv_w: float = 0.0,
    lap_w: float = 0.0,
    lap_pool: int = 4,
    lap_target: jax.Array | None = None,
    style_weights: tuple[float, ...] | None = None,
) -> MultiStyleBundle:
    """Compile the stacked multi-style step sharded over the mesh.

    The returned ``update_fn(images, opt_state)`` expects images of
    shape ``(S, *image_shape)`` sharded on the style axis; both carried
    buffers are donated.
    """
    prec = resolve_precision(precision)
    if lap_w and lap_target is None:
        msg = "lap_w > 0 requires a precomputed lap_target response"
        raise ValueError(msg)
    if not lap_w:
        lap_target = None
    from style_transfer_visualizer_tpu.models.vgg19 import (  # noqa: PLC0415
        add_flipped_kernels,
    )

    # Pre-flipped kernels route the conv backward through the frozen-
    # backbone VJP (ops/frozen_conv.py) — replicated like the weights.
    params = add_flipped_kernels(params)
    n = 1
    for dim in image_shape:
        n *= int(dim)

    def single_vag(flat: jax.Array, p: Params, tpack):
        # The Laplacian target is the CONTENT's response — identical
        # for every style, so it rides unstacked (vmap axis None).
        style_targets, lap_t = tpack

        def loss_of(flat_x: jax.Array):
            img = flat_x.reshape(image_shape)
            total, aux = total_loss(
                p, img, style_targets, style_w, content_w,
                tuple(style_layers), tuple(content_layers), prec, remat,
                gram_backend, style_weights=style_weights,
            )
            if tv_w:
                total = total + tv_w * tv_loss(img)
            if lap_w:
                total = total + lap_w * lap_loss(img, lap_t, lap_pool)
            return total, aux

        return jax.value_and_grad(loss_of, has_aux=True)(flat)

    def style_shard_nd(ndim: int) -> NamedSharding:
        return NamedSharding(
            mesh, P(MESH_AXIS_STYLE, *([None] * (ndim - 1))),
        )

    if optimizer == "lbfgs":
        def single_update(flat, state, p, tpack):
            return lbfgs_step(
                lambda f: single_vag(f, p, tpack),
                flat, state, lr,
                max_iter=lbfgs_max_iter,
                max_eval=lbfgs_max_eval,
                history_size=lbfgs_history_size,
                direction_method=lbfgs_direction,
            )

        def init_state():
            return jax.vmap(
                lambda _: lbfgs_init(
                    n, lbfgs_history_size,
                    history_dtype=jnp.dtype(lbfgs_history_dtype),
                ),
            )(jnp.arange(n_styles))
    elif optimizer == "adam":
        # Image-shaped moments (see engine.optimizers.adam_init): the
        # per-style update runs entirely in the NHWC device layout.
        def single_update(img, state, p, tpack):
            return adam_step(
                lambda im: single_vag(im, p, tpack), img, state, lr,
            )

        def init_state():
            return jax.vmap(
                lambda _: adam_init(tuple(image_shape)),
            )(jnp.arange(n_styles))
    else:
        msg = f"Unknown optimizer: {optimizer!r}"
        raise ValueError(msg)

    # Allocate the stacked optimizer state directly into its sharding —
    # materializing it unsharded first would put the full S x history x N
    # L-BFGS buffers on one device (tens of GB at scale) before the
    # reshard.
    state_struct = jax.eval_shape(init_state)
    state_shardings = jax.tree.map(
        lambda leaf: style_shard_nd(leaf.ndim), state_struct,
    )
    opt_state = jax.jit(init_state, out_shardings=state_shardings)()

    def update(images: jax.Array, state, p: Params, step_targets):
        # L-BFGS needs flat vectors (dot products over history pairs);
        # Adam stays in image shape. The reshapes are no-ops when the
        # shape already matches.
        xs = (
            images.reshape(n_styles, n)
            if optimizer == "lbfgs"
            else images
        )
        new_xs, new_state, aux = jax.vmap(
            single_update, in_axes=(0, 0, None, (0, None)),
        )(xs, state, p, step_targets)
        return (
            new_xs.reshape(n_styles, *image_shape),
            new_state,
            aux,
        )

    style_sharding = NamedSharding(mesh, P(MESH_AXIS_STYLE))
    images_sharding = NamedSharding(
        mesh, P(MESH_AXIS_STYLE, *([None] * len(image_shape))),
    )
    target_shardings = jax.tree.map(
        lambda leaf: style_shard_nd(leaf.ndim), targets,
    )
    aux_shardings = StepAux(
        loss=style_sharding,
        style_score=style_sharding,
        content_score=style_sharding,
        n_evals=style_sharding,
    )
    # Weights ride as replicated runtime arguments, not closure
    # constants: baked-in weights bloat the serialized HLO and explode
    # remote compile times (BASELINE.md backend notes).
    replicated = NamedSharding(mesh, P())
    jitted = jax.jit(
        update,
        donate_argnums=(0, 1),
        in_shardings=(
            images_sharding, state_shardings, replicated,
            # The lap target (when present) replicates like the weights.
            (target_shardings, replicated),
        ),
        out_shardings=(images_sharding, state_shardings, aux_shardings),
    )
    targets = jax.device_put(targets, target_shardings)
    params = jax.device_put(params, replicated)
    if lap_target is not None:
        lap_target = jax.device_put(lap_target, replicated)
    tpack = (targets, lap_target)

    def update_fn(images: jax.Array, state):
        return jitted(images, state, params, tpack)

    from style_transfer_visualizer_tpu.engine.step import (  # noqa: PLC0415
        make_chunked_update,
    )

    jitted_multi = make_chunked_update(update, n_extra_args=2)

    def chunked_update_fn(images: jax.Array, state, k: int):
        return jitted_multi(images, state, params, tpack, k)

    return MultiStyleBundle(
        update_fn=update_fn, opt_state=opt_state, targets=targets,
        chunked_update_fn=chunked_update_fn,
    )
