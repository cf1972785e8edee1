"""Pure-JAX VGG19 feature stack with torchvision-compatible numbering.

The network is a flat table of (conv | relu | pool) layers whose indices
match ``torchvision.models.vgg19().features``, so the reference's layer
selections — style (0, 5, 10, 19, 28), content (21,) — address the same
activations (reference core_model.py:103-146).

TPU-first choices:
- NHWC activations and HWIO kernels: convolutions lower directly onto the
  MXU without layout transposes.
- The forward pass is a pure function of a params pytree; no module state.
- Weights come from a one-time torchvision-checkpoint conversion cached as
  ``.npz`` (same cache-hit/download logging contract as the reference's
  ``initialize_vgg``, core_model.py:103-117), with a seeded-random
  fallback for air-gapped environments.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from style_transfer_visualizer_tpu.models.arch import (
    CONV,
    POOL,
    RELU,
    VGG19,
    Architecture,
    pools_before_in,
)
from style_transfer_visualizer_tpu.utils.logging import logger

# CONV/RELU/POOL are re-exported: they predate models.arch as this
# module's public tags and tests/consumers address them as vgg19.CONV.
__all__ = [
    "CACHE_FILENAME",
    "CONV",
    "CONV_INDICES",
    "LAYER_TABLE",
    "NUM_LAYERS",
    "POOL",
    "RELU",
    "Params",
    "add_flipped_kernels",
    "convert_torch_state_dict",
    "init_random_params",
    "load_params_npz",
    "load_pretrained_params",
    "load_vgg19_params",
    "pools_before",
    "save_params_npz",
]

# VGG19 module-level constants (the default architecture); other
# families live in models.arch and flow through the same functions via
# their ``arch`` parameter.
LAYER_TABLE = VGG19.layer_table
NUM_LAYERS = VGG19.num_layers  # 37, matching torchvision indices 0..36
CONV_INDICES = VGG19.conv_indices


def pools_before(idx: int) -> int:
    """Number of 2x2 pools crossed at or before layer ``idx`` (VGG19).

    Spatial dims at a tap are the input dims divided by
    ``2**pools_before(idx)`` — load-bearing for Gram/content-loss
    normalization and for spatial-sharding divisibility checks. For
    other architectures use ``Architecture.pools_before`` or
    ``arch.pools_before_in(table, idx)`` with a derived table.
    """
    return pools_before_in(LAYER_TABLE, idx)

# Params: {layer_index: {"w": (3,3,in,out) f32, "b": (out,) f32}}
Params = dict[int, dict[str, jax.Array]]


def add_flipped_kernels(params: Params) -> Params:
    """Attach the backward-conv kernel to every conv layer.

    Adds ``"w_flip"`` (rot180 + I/O-transposed ``"w"``) to each conv
    entry; the feature sweep then routes through the frozen-backbone
    custom VJP (``ops.frozen_conv``), whose backward is a plain forward
    conv — measurably faster than XLA's transposed-conv autodiff on
    TPU. Idempotent; returns a new dict (inputs never mutated).
    """
    from style_transfer_visualizer_tpu.ops.frozen_conv import (  # noqa: PLC0415
        flip_kernel,
    )

    to_flip = {
        idx: layer["w"]
        for idx, layer in params.items()
        if "w" in layer and "w_flip" not in layer
    }
    # One jitted dispatch for all flips: eager per-layer ops cost
    # seconds each on remote-attached backends (BASELINE.md).
    flips = (
        jax.jit(lambda ws: {i: flip_kernel(w) for i, w in ws.items()})(
            to_flip,
        )
        if to_flip
        else {}
    )
    return {
        idx: {**layer, "w_flip": flips[idx]} if idx in flips else layer
        for idx, layer in params.items()
    }

_DEFAULT_CACHE_DIR = Path(
    os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"),
) / "style_transfer_visualizer_tpu"
CACHE_FILENAME = VGG19.cache_filename


def init_random_params(
    key: jax.Array | int,
    dtype: jnp.dtype = jnp.float32,
    arch: Architecture = VGG19,
) -> Params:
    """He-normal random conv weights (air-gapped / testing fallback).

    Weights are drawn host-side (numpy) and placed on device as one
    pytree transfer — per-layer device RNG calls would cost one compile
    + roundtrip each, which is prohibitive over remote-attached TPUs.
    """
    if isinstance(key, jax.Array):
        seed = int(jax.random.key_data(key)[-1])
    else:
        seed = int(key)
    rng = np.random.default_rng(seed)
    host: dict[int, dict[str, np.ndarray]] = {}
    for idx in arch.conv_indices:
        _, in_ch, out_ch = arch.layer_table[idx]
        fan_in = 3 * 3 * in_ch
        host[idx] = {
            "w": (
                rng.standard_normal((3, 3, in_ch, out_ch))
                * np.sqrt(2.0 / fan_in)
            ).astype(dtype),
            "b": np.zeros((out_ch,), dtype),
        }
    return jax.device_put(host)


def convert_torch_state_dict(
    state_dict: dict[str, Any],
    arch: Architecture = VGG19,
) -> Params:
    """Convert a torchvision VGG ``features`` state dict to our pytree.

    Accepts either bare ``{i}.weight`` keys (a ``.features`` submodule dump)
    or full-model ``features.{i}.weight`` keys. OIHW kernels are transposed
    to HWIO for NHWC convolution.
    """
    params: Params = {}
    for idx in arch.conv_indices:
        found = None
        for prefix in (f"features.{idx}", f"{idx}"):
            wkey, bkey = f"{prefix}.weight", f"{prefix}.bias"
            if wkey in state_dict and bkey in state_dict:
                found = (state_dict[wkey], state_dict[bkey])
                break
        if found is None:
            msg = f"State dict is missing conv layer {idx}"
            raise KeyError(msg)
        w_oihw, b = (np.asarray(t, dtype=np.float32) for t in found)
        _, in_ch, out_ch = arch.layer_table[idx]
        if w_oihw.shape != (out_ch, in_ch, 3, 3):
            msg = (
                f"Layer {idx}: expected OIHW {(out_ch, in_ch, 3, 3)}, "
                f"got {w_oihw.shape}"
            )
            raise ValueError(msg)
        params[idx] = {
            "w": jnp.asarray(w_oihw.transpose(2, 3, 1, 0)),
            "b": jnp.asarray(b),
        }
    return params


def save_params_npz(params: Params, path: Path) -> None:
    """Persist a params pytree as a flat .npz archive (atomically).

    Written via temp file + rename so an interrupted one-time conversion
    cannot leave a truncated cache that poisons every later run.
    """
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = {}
    for idx, layer in params.items():
        flat[f"w{idx}"] = np.asarray(layer["w"])
        flat[f"b{idx}"] = np.asarray(layer["b"])
    tmp = path.with_suffix(path.suffix + ".tmp")
    np.savez(tmp, **flat)
    # np.savez always appends .npz to a non-.npz name; the exists()
    # arm only guards against that contract changing.
    produced = (tmp if tmp.exists()  # pragma: no branch
                else tmp.with_suffix(tmp.suffix + ".npz"))
    produced.replace(path)


def load_params_npz(path: Path) -> Params:
    """Load a params pytree from a flat .npz archive.

    Conv indices come from the archive's own key set, so one loader
    serves every architecture's cache file.
    """
    with np.load(path) as data:
        indices = sorted(
            int(k[1:]) for k in data.files if k.startswith("w")
        )
        return {
            idx: {
                "w": jnp.asarray(data[f"w{idx}"]),
                "b": jnp.asarray(data[f"b{idx}"]),
            }
            for idx in indices
        }


def _find_torch_checkpoint(arch: Architecture = VGG19) -> Path | None:
    """Look for a torchvision checkpoint in conventional cache dirs."""
    candidates = []
    hub_dir = os.environ.get("TORCH_HOME")
    if hub_dir:
        candidates.append(Path(hub_dir) / "hub" / "checkpoints")
    candidates.append(Path.home() / ".cache" / "torch" / "hub" / "checkpoints")
    for directory in candidates:
        if not directory.is_dir():
            continue
        for pattern in arch.checkpoint_globs:
            for hit in sorted(directory.glob(pattern)):
                return hit
    return None


def _convert_checkpoint(
    checkpoint: Path,
    arch: Architecture = VGG19,
) -> Params:
    """Convert a torch .pth checkpoint (requires torch on the host)."""
    import torch  # noqa: PLC0415 - optional heavy dep, host-side only

    state = torch.load(checkpoint, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):  # pragma: no cover - full-model file
        state = state.state_dict()
    return convert_torch_state_dict(
        {k: v.numpy() for k, v in state.items()}, arch,
    )


def load_pretrained_params(
    arch: Architecture,
    cache_dir: Path | None = None,
    *,
    allow_random: bool = False,
    seed: int = 0,
) -> Params:
    """Load pretrained feature weights for ``arch``, converting and caching.

    Order: .npz cache hit -> torchvision checkpoint conversion -> seeded
    random init (only with ``allow_random=True``; logged loudly since
    stylization quality depends on pretrained features). Same cache-hit/
    convert logging contract as the reference's ``initialize_vgg``
    (core_model.py:103-117).
    """
    cache_dir = cache_dir or _DEFAULT_CACHE_DIR
    cache_path = cache_dir / arch.cache_filename
    model = arch.name.upper()

    if cache_path.exists():
        logger.info("Using cached %s weights at %s", model, cache_path)
        return load_params_npz(cache_path)

    checkpoint = _find_torch_checkpoint(arch)
    if checkpoint is not None:
        logger.info(
            "Converting %s weights from %s to %s",
            model, checkpoint, cache_path,
        )
        params = _convert_checkpoint(checkpoint, arch)
        save_params_npz(params, cache_path)
        return params

    if allow_random:
        logger.warning(
            "Pretrained %s weights unavailable (no cache at %s, no torch "
            "checkpoint found); using seeded random weights. Stylization "
            "quality will be poor.",
            model, cache_path,
        )
        return init_random_params(jax.random.key(seed), arch=arch)

    msg = (
        f"{model} weights not found. Place a torchvision checkpoint under "
        f"~/.cache/torch/hub/checkpoints/ or a converted archive at "
        f"{cache_path}, or pass allow_random=True."
    )
    raise FileNotFoundError(msg)


def load_vgg19_params(
    cache_dir: Path | None = None,
    *,
    allow_random: bool = False,
    seed: int = 0,
) -> Params:
    """Load pretrained VGG19 feature weights (the default architecture)."""
    return load_pretrained_params(
        VGG19, cache_dir, allow_random=allow_random, seed=seed,
    )
