"""Regional (masked) style transfer: different styles per image region.

Spatial style control after Gatys et al. 2017 ("Controlling Perceptual
Factors in Neural Style Transfer", arXiv:1611.07865 §4): each style s
carries a guidance mask m_s over the content image; at every style
layer the stylized features are weighted by the mask (downsampled to
the layer's resolution) before the Gram statistic, so style s's loss
only sees — and only paints — its own region.

Masked Gram via kernel reuse (TPU-first): weighting features by
``sqrt(m * P / mass)`` and calling the stock clamp-aware Gram kernel
computes ``sum_p m[p] F[p,c1] F[p,c2] / (mass * C)`` — the average
correlation over the masked region, directly comparable to the target
style's full-image Gram (same per-element normalization), and exactly
the standard Gram when the mask is all-ones. No new kernel, no new
VJP: the custom clamp-aware backward and the Pallas/XLA backend
choice carry over unchanged.

The reference supports one style per run and no spatial control
(core_model.py:218-232).
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import TYPE_CHECKING, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

import style_transfer_visualizer_tpu.image_io as stv_image_io
import style_transfer_visualizer_tpu.runtime as stv_runtime
from style_transfer_visualizer_tpu.engine.step import resolve_precision
from style_transfer_visualizer_tpu.models.features import (
    compute_targets,
    extract_features,
    initialize_input,
)
from style_transfer_visualizer_tpu.ops.gram import gram_apply
from style_transfer_visualizer_tpu.sequence import build_targets_update
from style_transfer_visualizer_tpu.utils.logging import logger

if TYPE_CHECKING:
    from style_transfer_visualizer_tpu.config import StyleTransferConfig
    from style_transfer_visualizer_tpu.models.vgg19 import Params

_MASK_EPS = 1e-6


@dataclass(frozen=True)
class RegionalTargets:
    """Targets for a masked multi-region run (a jit-crossing pytree).

    ``style_grams[s]`` maps layer index -> the (C, C) full-image Gram
    of style s; ``masks`` is (S, H, W) — a pixelwise partition of the
    content canvas (rows sum to 1 across S); ``content_feats`` is the
    usual content-layer activation dict.
    """

    style_grams: list[dict[int, jax.Array]]
    content_feats: dict[int, jax.Array]
    masks: jax.Array


jax.tree_util.register_pytree_node(
    RegionalTargets,
    lambda t: ((t.style_grams, t.content_feats, t.masks), None),
    lambda _, children: RegionalTargets(*children),
)


class RegionalResult(NamedTuple):
    """Outcome of a regional run."""

    output_path: Path
    final_loss: float
    elapsed_seconds: float
    total_steps: int


def load_region_masks(
    mask_paths: list[str | Path],
    height: int,
    width: int,
) -> jax.Array:
    """Load, resize, and partition-normalize the per-style masks.

    Masks decode as grayscale in [0, 1], bilinearly resized to the
    content's (H, W). Pixels are normalized so the S masks sum to 1 at
    every location (regions may overlap or feather — weights become
    proportional); where every mask is ~0 the styles share the pixel
    uniformly. A mask with no support at all is rejected — its style
    could never appear.
    """
    from PIL import Image  # noqa: PLC0415

    rows = []
    for p in mask_paths:
        with Image.open(p) as img:
            resized = img.convert("L").resize(
                (width, height), Image.Resampling.BILINEAR,
            )
        rows.append(
            np.asarray(resized, dtype=np.float32)[None] / 255.0,
        )
    stacked = np.concatenate(rows, axis=0)  # (S, H, W)
    for i, mask_path in enumerate(mask_paths):
        if stacked[i].sum() <= _MASK_EPS:
            msg = (
                f"Region mask {mask_path} is empty (all black) — its "
                "style would never appear"
            )
            raise ValueError(msg)
    total = stacked.sum(axis=0, keepdims=True)
    uniform = np.full_like(stacked, 1.0 / len(rows))
    normalized = np.where(
        total > _MASK_EPS, stacked / np.maximum(total, _MASK_EPS), uniform,
    )
    return jnp.asarray(normalized)


def masked_gram(
    features: jax.Array,
    mask: jax.Array,
    *,
    precision=None,
    gram_backend: str = "xla",
) -> jax.Array:
    """Region-average Gram: ``sum_p m F F / (mass * C)``.

    ``mask`` is (H, W) at any resolution; it is resized to the feature
    map's spatial dims (area-preserving bilinear) and applied as a
    ``sqrt(m * P / mass)`` feature weight so the stock Gram kernel's
    ``/ (P * C)`` normalization lands on ``/(mass * C)``. An all-ones
    mask reproduces the standard Gram bit-for-bit up to the sqrt
    round-trip. Note the reference's pre-normalization clamp
    (constants.GRAM_MATRIX_CLAMP_MAX) applies to the *scaled* raw sum,
    so under masking the effective clamp threshold on the regional
    correlation scales by ``mass / P`` — consistent in the all-ones
    limit, and irrelevant below the clamp (the overwhelmingly common
    case; BASELINE.md error attribution).
    """
    b, h, w, c = features.shape
    mask_l = jax.image.resize(mask, (h, w), method="linear")
    mask_l = jnp.maximum(mask_l, 0.0)
    mass = jnp.maximum(jnp.sum(mask_l), _MASK_EPS)
    scale = jnp.sqrt(mask_l * (b * h * w / mass))
    weighted = features * scale[None, :, :, None]
    return gram_apply(
        weighted, backend=gram_backend, precision=precision,
    )


def regional_style_loss(
    acts: dict[int, jax.Array],
    rt: RegionalTargets,
    style_layers: tuple[int, ...],
    *,
    precision=None,
    gram_backend: str = "xla",
    style_weights: tuple[float, ...] | None = None,
) -> jax.Array:
    """Sum over styles and layers of masked-Gram MSE vs each target.

    ``style_weights`` applies the same per-layer Gatys weighting as the
    unmasked loss (models/features.py), uniformly across regions.
    """
    from style_transfer_visualizer_tpu.models.features import (  # noqa: PLC0415
        _resolve_style_weights,
        _weighted,
    )

    weights = _resolve_style_weights(style_weights, style_layers)
    zero = jnp.zeros(())
    total = zero
    n_styles = rt.masks.shape[0]
    for s in range(n_styles):
        for idx, w in zip(style_layers, weights, strict=True):
            g = masked_gram(
                acts[idx], rt.masks[s],
                precision=precision, gram_backend=gram_backend,
            )
            total = total + _weighted(
                w, jnp.mean(jnp.square(g - rt.style_grams[s][idx])),
            )
    return total


def make_regional_loss(
    cfg: StyleTransferConfig,
):
    """``(params, image, RegionalTargets) -> (total, aux)`` closure."""
    opt_cfg = cfg.optimization
    prec = resolve_precision(cfg.hardware.precision)
    style_layers = tuple(opt_cfg.style_layers)
    content_layers = tuple(opt_cfg.content_layers)
    taps = tuple(sorted(set(style_layers) | set(content_layers)))

    def loss_fn(p: Params, img: jax.Array, rt):
        lap_t = None
        if opt_cfg.lap_w:
            # Threaded as (RegionalTargets, lap_target): the Laplacian
            # matches the whole content photo's edges — it is
            # region-agnostic, like the content term.
            rt, lap_t = rt
        acts = extract_features(p, img, taps, precision=prec)
        style_score = regional_style_loss(
            acts, rt, style_layers, precision=prec,
            style_weights=opt_cfg.style_weights_tuple(),
        )
        zero = jnp.zeros((), dtype=img.dtype)
        content_losses = [
            jnp.mean(jnp.square(acts[idx] - rt.content_feats[idx]))
            for idx in content_layers
        ]
        content_score = (
            jnp.sum(jnp.stack(content_losses)) if content_losses else zero
        )
        total = (
            opt_cfg.style_w * style_score
            + opt_cfg.content_w * content_score
        )
        if opt_cfg.tv_w:
            from style_transfer_visualizer_tpu.ops.tv import (  # noqa: PLC0415
                tv_loss,
            )

            total = total + opt_cfg.tv_w * tv_loss(img)
        if opt_cfg.lap_w:
            from style_transfer_visualizer_tpu.ops.lap import (  # noqa: PLC0415
                lap_loss,
            )

            total = total + opt_cfg.lap_w * lap_loss(
                img, lap_t, opt_cfg.lap_pool,
            )
        return total, (style_score, content_score)

    return loss_fn


def stylize_regional(
    content_path: str | Path,
    style_paths: list[str | Path],
    mask_paths: list[str | Path],
    config: StyleTransferConfig,
) -> RegionalResult:
    """One stylization painting each masked region with its own style.

    Per-style full-image Gram targets are computed once; the optimized
    image's features are mask-weighted per region before their Grams,
    so each style's loss acts on its own territory. The output saves
    as ``regional_{content}_x_{s0+s1+...}.png``; ``--preserve-color``
    composes (``match`` remaps every style onto the content's palette,
    ``luminance`` recolors the result).

    Regional runs carry the full single-run artifact contract
    (reference main.py:85-165) by driving ``main.run_with_artifacts``:
    timelapse MP4/GIF (intro/outro gallery panels show the first
    style), loss CSV or in-memory history + plot, and
    checkpoint/resume.
    """
    from style_transfer_visualizer_tpu.utils.cache import (  # noqa: PLC0415
        enable_persistent_compilation_cache,
    )

    if config.hardware.spatial_shards > 1:
        # Compose-or-reject rule (round-3/4 verdicts): the mask-weighted
        # per-region Grams have no sharded evaluation yet, and silently
        # running unsharded would hand the user a different memory
        # envelope than requested.
        msg = (
            "--spatial-shards is not supported in regional (masked) "
            "mode: the mask-weighted region Grams are evaluated "
            "whole-image. Run without --spatial-shards (banded "
            "evaluation auto-enables for 4K-class inputs)."
        )
        raise ValueError(msg)
    if len(style_paths) < 2:  # noqa: PLR2004
        msg = (
            "Regional transfer needs at least 2 --styles entries, got "
            f"{len(style_paths)}"
        )
        raise ValueError(msg)
    if len(mask_paths) != len(style_paths):
        msg = (
            f"Got {len(mask_paths)} --style-masks for "
            f"{len(style_paths)} --styles (need one mask per style)"
        )
        raise ValueError(msg)
    for style_path in style_paths:
        stv_runtime.validate_input_paths(str(content_path), str(style_path))
    for mask_path in mask_paths:
        if not Path(mask_path).exists():
            msg = f"Region mask not found: {mask_path}"
            raise FileNotFoundError(msg)
    stv_runtime.validate_parameters(config.video.quality)

    # Final-only mode disables all timelapse outputs (same cascade as
    # main.style_transfer).
    if config.video.final_only:
        config.video.create_video = False
        config.video.create_gif = False
        config.video.save_every = config.optimization.steps + 1

    enable_persistent_compilation_cache()
    device = stv_runtime.setup_device(config.hardware.device)
    key = stv_runtime.setup_random_seed(config.optimization.seed)
    with jax.default_device(device):
        return _regional_on_device(
            Path(content_path), [Path(p) for p in style_paths],
            [Path(p) for p in mask_paths], config, key,
        )


def _regional_on_device(
    content_path: Path,
    style_paths: list[Path],
    mask_paths: list[Path],
    config: StyleTransferConfig,
    key: jax.Array,
) -> RegionalResult:
    from style_transfer_visualizer_tpu.models.arch import (  # noqa: PLC0415
        get_architecture,
    )
    from style_transfer_visualizer_tpu.models.vgg19 import (  # noqa: PLC0415
        load_pretrained_params,
    )

    start = time.perf_counter()
    opt_cfg = config.optimization

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
    _, height, width, _ = content_img.shape
    masks = load_region_masks(list(mask_paths), height, width)

    params = load_pretrained_params(
        get_architecture(opt_cfg.model),
        allow_random=opt_cfg.allow_random_weights, seed=opt_cfg.seed,
    )
    prec = resolve_precision(config.hardware.precision)
    style_layers = tuple(opt_cfg.style_layers)
    content_layers = tuple(opt_cfg.content_layers)

    per_style = [
        compute_targets(
            params, s_img, content_img, style_layers,
            content_layers if i == 0 else (), prec,
        )
        for i, s_img in enumerate(style_imgs)
    ]
    rtargets = RegionalTargets(
        style_grams=[t.style_grams for t in per_style],
        content_feats=per_style[0].content_feats,
        masks=masks,
    )
    if opt_cfg.lap_w:
        from style_transfer_visualizer_tpu.ops.lap import (  # noqa: PLC0415
            lap_response,
        )

        rtargets = (
            rtargets, lap_response(content_img, opt_cfg.lap_pool),
        )

    update, update_many, init_state, run_params = build_targets_update(
        params, tuple(content_img.shape), config,
        loss_fn=make_regional_loss(config),
    )

    # Auto video-mode heuristic, as in main._run_on_device: long or
    # high-resolution timelapses promote realtime -> postprocess.
    if config.video.create_video:
        from style_transfer_visualizer_tpu.media.modes import (  # noqa: PLC0415
            select_video_mode,
        )

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

    from style_transfer_visualizer_tpu.main import (  # noqa: PLC0415
        run_with_artifacts,
    )

    x = initialize_input(content_img, opt_cfg.init_method, key)
    joined = "+".join(p.stem.replace(" ", "_") for p in style_paths)
    content_name = content_path.stem.replace(" ", "_")
    # RegionalTargets/run_params ride as runtime arguments of the jitted
    # update (not closure constants — the compile-time discipline from
    # BASELINE.md backend notes; jit caching keys on shapes only).
    result = run_with_artifacts(
        lambda img, st: update(img, st, run_params, rtargets),
        lambda img, st, k: update_many(img, st, run_params, rtargets, k),
        init_state(),
        x,
        config,
        content_path=content_path,
        style_path=style_paths[0],
        style_name=joined,
        chroma_source=chroma_source,
        final_name=f"regional_{content_name}_x_{joined}.png",
    )
    elapsed = time.perf_counter() - start
    logger.info(
        "Regional stylization (%d styles, loss %.4g, %.2fs): %s",
        len(style_paths), result.final_total_loss, elapsed,
        result.final_path,
    )
    return RegionalResult(
        output_path=result.final_path,
        final_loss=result.final_total_loss,
        elapsed_seconds=elapsed,
        total_steps=opt_cfg.steps,
    )
