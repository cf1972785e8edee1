"""Device-side loss history with batched host synchronization.

Per-step loss scalars stay on the device: they are appended into a
fixed-capacity ring buffer by a tiny donated-buffer jitted write, and only
materialize as Python floats at the ``log_every`` cadence (one transfer of
three scalars) — the same host-sync discipline as the reference's
LossAccumulator (loss_accumulator.py:95-210), but with JAX async dispatch
instead of CUDA streams.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from style_transfer_visualizer_tpu.type_defs import LossHistory

DEFAULT_HISTORY_CAPACITY = 2048


@dataclass(slots=True)
class LoggedLoss:
    """Host-synced scalar losses."""

    step: int
    style_loss: float
    content_loss: float
    total_loss: float


@partial(jax.jit, donate_argnums=(0,))
def _ring_write(
    buffer: jax.Array,
    idx: jax.Array,
    style: jax.Array,
    content: jax.Array,
    total: jax.Array,
) -> jax.Array:
    row = jnp.stack([style, content, total]).astype(buffer.dtype)
    return jax.lax.dynamic_update_slice(buffer, row[None, :], (idx, 0))


@partial(jax.jit, donate_argnums=(0,))
def _ring_write_block(
    buffer: jax.Array,
    start: jax.Array,
    rows: jax.Array,
) -> jax.Array:
    """Write k rows at ``start``, wrapping modulo the capacity.

    A modular scatter keeps the row-block shape fixed, so one
    executable serves every write offset — slicing the block into
    head/tail pieces would compile a distinct executable per wrap
    length (dozens over a long run when gcd(chunk, capacity) == 1).
    Callers must pass k <= capacity (duplicate scatter indices have
    unspecified write order).
    """
    idx = (start + jnp.arange(rows.shape[0])) % buffer.shape[0]
    return buffer.at[idx].set(rows.astype(buffer.dtype))


class LossAccumulator:
    """Ring-buffered device-side loss history with cadence-gated syncs."""

    def __init__(
        self,
        *,
        log_every: int,
        history_capacity: int | None,
        track_history: bool,
        device: jax.Device | None = None,
    ) -> None:
        self._log_every = max(1, log_every)
        self._capacity = max(1, history_capacity or DEFAULT_HISTORY_CAPACITY)
        self._track_history = track_history
        self._device = device

        self._buffer: jax.Array | None = None
        if track_history:
            buf = jnp.zeros((self._capacity, 3), jnp.float32)
            self._buffer = (
                jax.device_put(buf, device) if device is not None else buf
            )
        self._write_index = 0
        self._count = 0
        self._total_records = 0
        self._truncated = False

        self._pending: tuple[int, jax.Array, jax.Array, jax.Array] | None = (
            None
        )
        self._last_logged: LoggedLoss | None = None

    @property
    def capacity(self) -> int:
        """Maximum in-memory history entries."""
        return self._capacity

    @property
    def tracks_history(self) -> bool:
        """Whether per-step history is being recorded."""
        return self._track_history

    @property
    def history_truncated(self) -> bool:
        """Whether the ring buffer has overwritten old entries."""
        return self._truncated

    def accumulate(
        self,
        step_idx: int,
        style_loss: jax.Array,
        content_loss: jax.Array,
        total_loss: jax.Array,
        *,
        force: bool = False,
    ) -> LoggedLoss | None:
        """Record device scalars; sync to floats only on cadence."""
        self._pending = (step_idx, style_loss, content_loss, total_loss)

        if self._track_history and self._buffer is not None:
            self._buffer = _ring_write(
                self._buffer,
                jnp.asarray(self._write_index, jnp.int32),
                style_loss,
                content_loss,
                total_loss,
            )
            self._write_index = (self._write_index + 1) % self._capacity
            self._count = min(self._count + 1, self._capacity)
            self._total_records += 1
            if self._total_records > self._capacity:
                self._truncated = True

        if force or step_idx % self._log_every == 0:
            return self._sync_pending()
        return None

    def accumulate_batch(
        self,
        first_step: int,
        style_losses: jax.Array,
        content_losses: jax.Array,
        total_losses: jax.Array,
        *,
        force: bool = False,
    ) -> LoggedLoss | None:
        """Record a chunk of k consecutive per-step device scalars.

        The chunk comes from a multi-step dispatch (``lax.scan`` over
        the update); every step lands in the ring buffer. A host sync
        happens whenever a ``log_every`` boundary falls inside the
        chunk, reporting the chunk's LAST step — when chunks divide
        ``log_every`` (the runner guarantees this whenever CSV logging
        is active) that is exactly the cadence step; otherwise the
        display/non-finite checks stay within one chunk of cadence.
        """
        k = int(style_losses.shape[0])
        if k == 0:
            return None
        last_step = first_step + k - 1
        self._pending = (
            last_step,
            style_losses[-1],
            content_losses[-1],
            total_losses[-1],
        )

        if self._track_history and self._buffer is not None:
            rows = jnp.stack(
                [style_losses, content_losses, total_losses], axis=1,
            )
            if k >= self._capacity:
                rows = rows[-self._capacity:]
                k_eff = self._capacity
                self._buffer = _ring_write_block(
                    self._buffer, jnp.asarray(0, jnp.int32), rows,
                )
                self._write_index = 0
            else:
                k_eff = k
                self._buffer = _ring_write_block(
                    self._buffer,
                    jnp.asarray(self._write_index, jnp.int32),
                    rows,
                )
                self._write_index = (
                    self._write_index + k
                ) % self._capacity
            self._count = min(self._count + k_eff, self._capacity)
            self._total_records += k
            if self._total_records > self._capacity:
                self._truncated = True

        crossed_boundary = (
            last_step // self._log_every
            != (first_step - 1) // self._log_every
        )
        if force or crossed_boundary:
            return self._sync_pending()
        return None

    def latest(self) -> LoggedLoss | None:
        """Most recent host-synced values."""
        return self._last_logged

    def export_history(self) -> LossHistory:
        """Unroll the ring buffer into per-series host lists."""
        empty: LossHistory = {
            "style_loss": [], "content_loss": [], "total_loss": [],
        }
        if not self._track_history or self._count == 0:
            return empty
        buf = np.asarray(self._buffer)
        start = (self._write_index - self._count) % self._capacity
        rows = np.take(
            buf,
            (start + np.arange(self._count)) % self._capacity,
            axis=0,
        )
        return {
            "style_loss": rows[:, 0].tolist(),
            "content_loss": rows[:, 1].tolist(),
            "total_loss": rows[:, 2].tolist(),
        }

    def _sync_pending(self) -> LoggedLoss | None:
        if self._pending is None:
            return None
        step_idx, style, content, total = self._pending
        # One fused transfer for all three scalars.
        vals = np.asarray(jnp.stack([style, content, total]))
        logged = LoggedLoss(
            step=step_idx,
            style_loss=float(vals[0]),
            content_loss=float(vals[1]),
            total_loss=float(vals[2]),
        )
        self._last_logged = logged
        return logged
