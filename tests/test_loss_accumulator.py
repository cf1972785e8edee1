"""Device ring-buffer loss history behavior."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_visualizer_tpu.engine.loss_accumulator import (
    LossAccumulator,
)


def _acc(**kw) -> LossAccumulator:
    defaults = {
        "log_every": 2, "history_capacity": 4, "track_history": True,
    }
    defaults.update(kw)
    return LossAccumulator(**defaults)


def _push(acc: LossAccumulator, step: int, base: float):
    return acc.accumulate(
        step,
        jnp.asarray(base),
        jnp.asarray(base + 0.5),
        jnp.asarray(base + 1.0),
    )


class TestCadence:
    def test_sync_only_on_cadence(self) -> None:
        acc = _acc(log_every=3)
        assert _push(acc, 1, 1.0) is None
        assert _push(acc, 2, 2.0) is None
        logged = _push(acc, 3, 3.0)
        assert logged is not None
        assert logged.step == 3
        assert logged.style_loss == 3.0
        assert logged.content_loss == 3.5
        assert logged.total_loss == 4.0

    def test_force_syncs(self) -> None:
        acc = _acc(log_every=100)
        logged = acc.accumulate(
            1, jnp.asarray(1.0), jnp.asarray(2.0), jnp.asarray(3.0),
            force=True,
        )
        assert logged is not None

    def test_latest_tracks_last_sync(self) -> None:
        acc = _acc(log_every=1)
        _push(acc, 1, 5.0)
        assert acc.latest() is not None
        assert acc.latest().style_loss == 5.0


class TestRingBuffer:
    def test_export_in_order_without_wrap(self) -> None:
        acc = _acc(history_capacity=8, log_every=100)
        for i in range(1, 4):
            _push(acc, i, float(i))
        hist = acc.export_history()
        assert hist["style_loss"] == [1.0, 2.0, 3.0]
        assert hist["total_loss"] == [2.0, 3.0, 4.0]
        assert acc.history_truncated is False

    def test_export_wrapped_order(self) -> None:
        acc = _acc(history_capacity=3, log_every=100)
        for i in range(1, 6):  # 5 entries into capacity 3
            _push(acc, i, float(i))
        hist = acc.export_history()
        assert hist["style_loss"] == [3.0, 4.0, 5.0]
        assert acc.history_truncated is True

    def test_no_history_mode(self) -> None:
        acc = _acc(track_history=False, log_every=1)
        logged = _push(acc, 1, 1.0)
        assert logged is not None
        hist = acc.export_history()
        assert hist["style_loss"] == []
        assert acc.tracks_history is False

    def test_empty_export(self) -> None:
        acc = _acc()
        assert acc.export_history() == {
            "style_loss": [], "content_loss": [], "total_loss": [],
        }

    def test_capacity_property(self) -> None:
        assert _acc(history_capacity=16).capacity == 16
        assert _acc(history_capacity=None).capacity == 2048


class TestHostSyncDiscipline:
    def test_no_float_materialization_off_cadence(self, monkeypatch) -> None:
        """Off-cadence accumulate must not pull scalars to the host."""
        acc = _acc(log_every=1000)
        calls = {"n": 0}
        orig = np.asarray

        def counting_asarray(x, *a, **k):
            import jax

            if isinstance(x, jax.Array):
                calls["n"] += 1
            return orig(x, *a, **k)

        import style_transfer_visualizer_tpu.engine.loss_accumulator as mod

        monkeypatch.setattr(mod.np, "asarray", counting_asarray)
        for i in range(1, 20):
            _push(acc, i, float(i))
        assert calls["n"] == 0


class TestBatchAccumulate:
    """Chunked (multi-step dispatch) recording."""

    def _arrays(self, values):
        import jax.numpy as jnp

        arr = jnp.asarray(values, jnp.float32)
        return arr * 0.6, arr * 0.4, arr

    def test_batch_syncs_only_on_cadence(self) -> None:
        acc = LossAccumulator(
            log_every=4, history_capacity=16, track_history=True,
        )
        s, c, t = self._arrays([4.0, 3.0])
        assert acc.accumulate_batch(1, s, c, t) is None   # ends at 2
        logged = acc.accumulate_batch(3, s, c, t)          # ends at 4
        assert logged is not None
        assert logged.step == 4
        assert logged.total_loss == pytest.approx(3.0)

    def test_batch_history_order_and_wrap(self) -> None:
        acc = LossAccumulator(
            log_every=100, history_capacity=5, track_history=True,
        )
        s, c, t = self._arrays([1.0, 2.0, 3.0])
        acc.accumulate_batch(1, s, c, t)
        s, c, t = self._arrays([4.0, 5.0, 6.0])
        acc.accumulate_batch(4, s, c, t)
        hist = acc.export_history()
        # Capacity 5: the oldest entry (1.0) was overwritten.
        assert hist["total_loss"] == pytest.approx(
            [2.0, 3.0, 4.0, 5.0, 6.0],
        )
        assert acc.history_truncated

    def test_batch_larger_than_capacity_keeps_tail(self) -> None:
        acc = LossAccumulator(
            log_every=100, history_capacity=4, track_history=True,
        )
        s, c, t = self._arrays([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
        acc.accumulate_batch(1, s, c, t)
        hist = acc.export_history()
        assert hist["total_loss"] == pytest.approx([3.0, 4.0, 5.0, 6.0])
        assert acc.history_truncated

    def test_batch_mixes_with_single_steps(self) -> None:
        acc = LossAccumulator(
            log_every=100, history_capacity=8, track_history=True,
        )
        import jax.numpy as jnp

        acc.accumulate(1, jnp.asarray(0.6), jnp.asarray(0.4),
                       jnp.asarray(1.0))
        s, c, t = self._arrays([2.0, 3.0])
        acc.accumulate_batch(2, s, c, t)
        hist = acc.export_history()
        assert hist["total_loss"] == pytest.approx([1.0, 2.0, 3.0])

    def test_empty_batch_is_noop(self) -> None:
        acc = LossAccumulator(
            log_every=1, history_capacity=4, track_history=True,
        )
        s, c, t = self._arrays([])
        assert acc.accumulate_batch(1, s, c, t) is None
        assert acc.export_history()["total_loss"] == []


def test_sync_pending_without_pending_returns_none() -> None:
    acc = LossAccumulator(
        log_every=10, history_capacity=4, track_history=True,
    )
    assert acc._sync_pending() is None
