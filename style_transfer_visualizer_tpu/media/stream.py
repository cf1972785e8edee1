"""Asynchronous device-to-host frame streaming.

The reference pulls every timelapse frame synchronously
(optimization.py:447-452), stalling the accelerator while the host
converts and encodes. Here the runner submits a *device* uint8 frame (the
packing already happened on-TPU) plus a delivery callback; a worker
thread materializes the frame and delivers it. The optimizer keeps
dispatching steps while the transfer and encoder run; a bounded queue
provides backpressure so an unbounded encoder backlog cannot exhaust
memory. FIFO delivery preserves the frame order contract (intro
crossfade before the first stylized frame).
"""
from __future__ import annotations

import queue
import threading
from collections.abc import Callable
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    import jax

FrameCallback = Callable[[np.ndarray], None]
_SENTINEL = None


class AsyncFrameStream:
    """Bounded FIFO pipeline: device frame -> host numpy -> callback."""

    def __init__(self, max_queue: int = 4) -> None:
        self._queue: queue.Queue = queue.Queue(maxsize=max_queue)
        self._error: BaseException | None = None
        self._worker = threading.Thread(
            target=self._run, name="stv-frame-stream", daemon=True,
        )
        self._closed = False
        self._worker.start()

    def submit(
        self,
        device_frame: jax.Array | np.ndarray,
        deliver: FrameCallback,
    ) -> None:
        """Enqueue a frame for host materialization and delivery.

        Blocks only when the queue is full (encoder backpressure). Raises
        any error the worker hit on a previous frame.
        """
        self._raise_pending()
        if self._closed:
            msg = "Cannot submit frames after stream close."
            raise RuntimeError(msg)
        self._queue.put((device_frame, deliver))

    def drain(self) -> None:
        """Block until every submitted frame has been delivered."""
        self._queue.join()
        self._raise_pending()

    def close(self) -> None:
        """Drain, stop the worker, and surface any pending error."""
        if self._closed:
            return
        self._closed = True
        self._queue.join()
        self._queue.put(_SENTINEL)
        self._worker.join()
        self._raise_pending()

    def _raise_pending(self) -> None:
        if self._error is not None:
            error, self._error = self._error, None
            raise error

    def _run(self) -> None:
        while True:
            item = self._queue.get()
            if item is _SENTINEL:
                self._queue.task_done()
                return
            device_frame, deliver = item
            try:
                if self._error is None:
                    # np.asarray blocks until the device computation that
                    # produced the frame completes — on this thread, not
                    # the dispatch thread.
                    deliver(np.asarray(device_frame))
            except BaseException as exc:  # noqa: BLE001
                self._error = exc
            finally:
                self._queue.task_done()
