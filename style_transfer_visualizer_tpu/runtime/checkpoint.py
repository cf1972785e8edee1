"""Resumable checkpoints for long optimization runs.

The reference has no checkpoint/resume (SURVEY §5); for multi-hour 4K
runs this is a cheap, worthwhile addition. A checkpoint is one ``.npz``
holding the working image, the flattened optimizer-state pytree, and the
step index; writes go through a temp file + atomic rename so an
interrupted save never corrupts the previous checkpoint.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, NamedTuple

import jax
import numpy as np

from style_transfer_visualizer_tpu.utils.logging import logger

_META_KEY = "__meta__"
_IMAGE_KEY = "image"
_STATE_PREFIX = "state_"


class Checkpoint(NamedTuple):
    """A restored checkpoint."""

    step: int
    image: jax.Array
    opt_state: Any


def save_checkpoint(
    path: str | Path,
    step: int,
    image: jax.Array,
    opt_state: Any,
) -> Path:
    """Atomically persist (step, image, optimizer state) to ``path``."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    # np.savez stores bfloat16 (an ml_dtypes extension type) as an
    # opaque void dtype that cannot be loaded back; persist such leaves
    # as uint16 bit patterns and record which ones to reinterpret.
    bf16_leaves: list[int] = []
    state_arrays: dict[str, np.ndarray] = {}
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        if arr.dtype == jax.numpy.bfloat16:
            bf16_leaves.append(i)
            arr = arr.view(np.uint16)
        state_arrays[f"{_STATE_PREFIX}{i}"] = arr
    payload: dict[str, np.ndarray] = {
        _IMAGE_KEY: np.asarray(image),
        _META_KEY: np.frombuffer(
            json.dumps(
                {
                    "step": step,
                    "n_leaves": len(leaves),
                    "bf16_leaves": bf16_leaves,
                },
            ).encode(),
            dtype=np.uint8,
        ),
        **state_arrays,
    }

    tmp = path.with_suffix(path.suffix + ".tmp")
    np.savez(tmp, **payload)
    # np.savez appends .npz to names without it; the exists() arm only
    # guards against that contract changing.
    produced = (tmp if tmp.exists()  # pragma: no branch
                else tmp.with_suffix(tmp.suffix + ".npz"))
    produced.replace(path)
    logger.info("Checkpoint saved at step %d: %s", step, path)
    return path


def load_checkpoint(path: str | Path, opt_state_like: Any) -> Checkpoint:
    """Restore a checkpoint; ``opt_state_like`` supplies the pytree shape."""
    path = Path(path)
    if not path.is_file():
        msg = f"Checkpoint not found: {path}"
        raise FileNotFoundError(msg)

    with np.load(path) as data:
        meta = json.loads(bytes(data[_META_KEY].tobytes()).decode())
        image = jax.numpy.asarray(data[_IMAGE_KEY])
        bf16_leaves = set(meta.get("bf16_leaves", ()))
        leaves = []
        for i in range(meta["n_leaves"]):
            arr = data[f"{_STATE_PREFIX}{i}"]
            if i in bf16_leaves:
                arr = arr.view(jax.numpy.bfloat16)
            leaves.append(jax.numpy.asarray(arr))
    treedef = jax.tree_util.tree_structure(opt_state_like)
    if treedef.num_leaves != len(leaves):
        msg = (
            f"Checkpoint has {len(leaves)} state leaves but the current "
            f"optimizer expects {treedef.num_leaves} — was it saved with "
            "a different optimizer configuration?"
        )
        raise ValueError(msg)
    # Migration shim: Adam moments moved from flat (N,) vectors to the
    # image's own shape, and a checkpoint written by an older build
    # should still resume. Only flat<->shaped reshapes are accepted —
    # a blanket same-size reshape would silently scramble state whose
    # sizes coincide for any other reason (e.g. a transposed layout).
    # Multi-style (vmapped) moments carry a leading style axis on both
    # sides — (S, N) <-> (S, 1, H, W, C) — so the same rule applies per
    # style when the leading dims agree and one side is flat below it.
    like_leaves = jax.tree_util.tree_leaves(opt_state_like)
    reshaped = []
    for i, (leaf, like) in enumerate(zip(leaves, like_leaves)):
        if leaf.dtype != like.dtype:
            # E.g. an f32 L-BFGS curvature ring resumed under
            # --lbfgs-history-dtype bfloat16 (or vice versa): the
            # current configuration wins, at the cost of one rounding.
            logger.info(
                "Casting checkpoint state leaf %d from %s to %s to "
                "match the current optimizer configuration.",
                i, leaf.dtype, like.dtype,
            )
            leaf = leaf.astype(like.dtype)
        if leaf.shape == like.shape:
            reshaped.append(leaf)
            continue
        flat_migration = (
            leaf.size == like.size
            and (leaf.ndim == 1 or like.ndim == 1)
        )
        batched_flat_migration = (
            leaf.size == like.size
            and leaf.ndim >= 1
            and like.ndim >= 1
            and leaf.shape[0] == like.shape[0]
            and (leaf.ndim == 2 or like.ndim == 2)
        )
        if not (flat_migration or batched_flat_migration):
            msg = (
                f"Checkpoint state leaf {i} has shape {leaf.shape} but "
                f"the current optimizer expects {like.shape} — the "
                "checkpoint was saved with an incompatible configuration."
            )
            raise ValueError(msg)
        reshaped.append(leaf.reshape(like.shape))
    leaves = reshaped
    opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    logger.info(
        "Resumed checkpoint from step %d: %s", meta["step"], path,
    )
    return Checkpoint(step=meta["step"], image=image, opt_state=opt_state)
