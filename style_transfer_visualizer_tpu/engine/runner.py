"""Optimization loop orchestration: dispatch, metrics, frames, callbacks.

The reference drives a re-entrant torch closure per step
(optimization.py:162-327); here each step is one dispatch of a pre-built
jitted update with donated buffers. The host thread never blocks on the
device except at the ``log_every`` metrics cadence and at ``save_every``
frame extractions, so TPU steps pipeline back-to-back.

Behavioral contracts kept from the reference:
- metrics/frames/callbacks fire once per *accepted* step regardless of how
  many function evaluations L-BFGS consumed internally,
- the one-shot intro crossfade precedes the first saved stylized frame,
- closure-evaluation telemetry is reported at the end of the run,
- non-finite losses produce warnings (checked at sync cadence rather than
  every step, so the hot loop stays sync-free),
- CSV logging failures degrade to in-memory history via the error callback.
"""
from __future__ import annotations

import math
import sys
import time
from collections.abc import Callable, Mapping
from dataclasses import dataclass
from typing import TYPE_CHECKING, Protocol

import jax
import numpy as np
from tqdm import tqdm

import style_transfer_visualizer_tpu.image_io as stv_image_io
from style_transfer_visualizer_tpu.constants import (
    CSV_LOGGING_RECOMMENDED_STEPS,
)
from style_transfer_visualizer_tpu.engine.loss_accumulator import (
    DEFAULT_HISTORY_CAPACITY,
    LoggedLoss,
    LossAccumulator,
)
from style_transfer_visualizer_tpu.engine.loss_logger import LossCSVLogger
from style_transfer_visualizer_tpu.utils.logging import logger

# Upper bound on steps fused per dispatch: keeps the scan executable's
# compile time and the progress/interrupt granularity reasonable.
_MAX_CHUNK = 50
# Chunk used when no cadence constrains alignment (measured sweet spot:
# k=25 reaches the device-compute floor at 512px, BASELINE.md). Public:
# the coarse warm start and batch loop dispatch at the same sweet spot.
DEFAULT_CHUNK = 25


def aligned_chunk(cadences: list[int]) -> int:
    """Largest dispatch chunk that divides every per-step cadence.

    The alignment-critical policy shared by the single-run engine and
    the batch loop (main._resolve_batch_chunk): gcd of the cadences,
    capped by shrinking *along divisors* — a plain min() cap would
    break the divides-every-cadence invariant (e.g. gcd 60 capped to
    50 skips every 60-step CSV row). No cadences means nothing
    constrains alignment: use the measured sweet spot.
    """
    if not cadences:
        return DEFAULT_CHUNK
    chunk = math.gcd(*cadences)
    if chunk > _MAX_CHUNK:
        chunk = max(
            d
            for d in range(1, _MAX_CHUNK + 1)
            if chunk % d == 0
        )
    return max(1, chunk)


if TYPE_CHECKING:
    from style_transfer_visualizer_tpu.config import StyleTransferConfig
    from style_transfer_visualizer_tpu.engine.optimizers import StepAux
    from style_transfer_visualizer_tpu.engine.step import OptState, UpdateFn
    from style_transfer_visualizer_tpu.media.sinks import VideoFrameSink
    from style_transfer_visualizer_tpu.type_defs import LossHistory


class ProgressReporter(Protocol):
    """The slice of tqdm's interface the runner relies on."""

    def update(self, n: float | None = 1) -> bool | None:
        """Advance the display."""

    def set_postfix(
        self,
        ordered_dict: Mapping[str, object] | None = None,
        refresh: bool | None = True,
        **kwargs: object,
    ) -> None:
        """Show supplementary values."""

    def close(self) -> None:
        """Release display resources."""


@dataclass(slots=True)
class StepMetrics:
    """Host-synced scalars surfaced to callbacks (may be empty off-cadence)."""

    step: int
    style_loss: float | None = None
    content_loss: float | None = None
    total_loss: float | None = None

    @property
    def has_values(self) -> bool:
        """True when all three loss values are populated."""
        return (
            self.style_loss is not None
            and self.content_loss is not None
            and self.total_loss is not None
        )


@dataclass(slots=True)
class OptimizationCallbacks:
    """Optional hooks around optimization events."""

    on_step_start: Callable[[int], None] | None = None
    on_step_end: Callable[[StepMetrics], None] | None = None
    on_video_frame: Callable[[np.ndarray, int], None] | None = None
    on_logging_error: Callable[[Exception], None] | None = None


class OptimizationRunner:
    """Run the jitted update loop with logging, frames, and callbacks."""

    def __init__(
        self,
        update_fn: UpdateFn,
        opt_state: OptState,
        input_img: jax.Array,
        config: StyleTransferConfig,
        *,
        progress_bar: ProgressReporter | None = None,
        callbacks: OptimizationCallbacks | None = None,
        video_writer: VideoFrameSink | None = None,
        gif_collector: VideoFrameSink | None = None,
        intro_last_frame: np.ndarray | None = None,
        intro_crossfade_frames: int = 0,
        frame_fetcher: Callable[[jax.Array], object] | None = None,
        chroma_source: jax.Array | None = None,
        async_frames: bool = True,
        start_step: int = 0,
        checkpoint_path: object | None = None,
        chunked_update_fn: Callable | None = None,
    ) -> None:
        self.update_fn = update_fn
        self.chunked_update_fn = chunked_update_fn
        self.opt_state = opt_state
        self.input_img = input_img
        self.config = config

        self._progress_bar = progress_bar
        self._owns_progress_bar = False
        self.callbacks = callbacks or OptimizationCallbacks()

        self.video_writer = video_writer
        self.gif_collector = gif_collector
        self.intro_last_frame = intro_last_frame
        self.intro_crossfade_frames = intro_crossfade_frames
        self.intro_transition_done = intro_last_frame is None

        self._frame_fetcher = frame_fetcher or self._default_frame_fetcher
        # Content image in [0,1] RGB for luminance-only color
        # preservation of timelapse frames (--preserve-color luminance);
        # None leaves frame colors untouched.
        self._chroma_source = chroma_source
        self._async_frames = async_frames
        self._frame_stream = None

        self._step_index = start_step
        self._start_step = start_step
        self._checkpoint_path = checkpoint_path

        self.loss_logger: LossCSVLogger | None = None
        self._accumulator: LossAccumulator | None = None
        self._latest_logged: LoggedLoss | None = None
        self._configure_logging()
        # Running device-side eval counter: one cached-executable add per
        # step (async), one transfer at the end of the run.
        self._eval_total: jax.Array | int = 0

    @property
    def progress_bar(self) -> ProgressReporter:
        """The active progress reporter (run() must have started)."""
        if self._progress_bar is None:
            msg = "Progress bar not initialized. Call run() before use."
            raise RuntimeError(msg)
        return self._progress_bar

    @property
    def total_steps(self) -> int:
        """Configured step count."""
        return self.config.optimization.steps

    @property
    def latest_logged(self) -> LoggedLoss | None:
        """Most recent host-synced loss row (None before first cadence)."""
        return self._latest_logged

    def run(self) -> tuple[jax.Array, LossHistory, float]:
        """Execute the loop; return (image, loss history, elapsed seconds)."""
        if self._progress_bar is None:
            self._progress_bar = tqdm(
                total=self.total_steps,
                initial=self._start_step,
                desc="Style Transfer",
            )
            self._owns_progress_bar = True

        chunk = self._resolve_chunk_size()
        start_time = time.time()
        try:
            while self._step_index < self.total_steps:
                step_idx = self._step_index + 1
                remaining = self.total_steps - self._step_index
                # Stay chunked only while chunk ends stay aligned to the
                # cadence grid (resume offsets may start misaligned).
                if (
                    chunk > 1
                    and remaining >= chunk
                    and self._step_index % chunk == 0
                ):
                    self.input_img, self.opt_state, auxes = (
                        self.chunked_update_fn(
                            self.input_img, self.opt_state, chunk,
                        )
                    )
                    self._finalize_chunk(step_idx, chunk, auxes)
                    continue

                if self.callbacks.on_step_start is not None:
                    self.callbacks.on_step_start(step_idx)

                self.input_img, self.opt_state, aux = self.update_fn(
                    self.input_img, self.opt_state,
                )
                self._finalize_step(step_idx, aux)
        finally:
            self._cleanup()

        jax.block_until_ready(self.input_img)
        elapsed = time.time() - start_time
        self._log_summary()

        history: LossHistory
        if self._accumulator is not None and self._accumulator.tracks_history:
            history = self._accumulator.export_history()
        else:
            history = {}
        return self.input_img, history, elapsed

    # ------------------------------------------------------------------
    # internals

    def _default_frame_fetcher(self, image: jax.Array) -> jax.Array:
        # Denorm + scrub + uint8 packing stay on the device; only H*W*3
        # bytes cross the host boundary, and (in async mode) on a worker
        # thread that never stalls step dispatch.
        prepared = stv_image_io.prepare_image_for_output(
            image, normalize=self.config.optimization.normalize,
        )
        if self._chroma_source is not None:
            from style_transfer_visualizer_tpu.ops.color import (  # noqa: PLC0415
                luminance_transfer,
            )

            prepared = luminance_transfer(prepared, self._chroma_source)
        return stv_image_io.pack_uint8_frame(prepared)

    def _configure_logging(self) -> None:
        out_cfg = self.config.output
        steps = self.total_steps
        track_history = True
        self.loss_logger = None

        if out_cfg.log_loss:
            try:
                self.loss_logger = LossCSVLogger(
                    out_cfg.log_loss,
                    out_cfg.log_every,
                    resume=self._start_step > 0,
                )
                logger.info(
                    "Loss CSV logging enabled: %s", out_cfg.log_loss,
                )
                track_history = False
            except OSError as exc:
                logger.error("Failed to initialize CSV logging: %s", exc)
                if self.callbacks.on_logging_error is not None:
                    self.callbacks.on_logging_error(exc)
                track_history = True

        capacity = min(steps, DEFAULT_HISTORY_CAPACITY)
        self._accumulator = LossAccumulator(
            log_every=out_cfg.log_every,
            history_capacity=capacity,
            track_history=track_history,
        )

        if track_history and steps > capacity:
            logger.warning(
                "Long run detected (%d steps). In-memory loss history is "
                "capped at %d entries; enable --log-loss for a full CSV.",
                steps, capacity,
            )
        elif track_history and steps > CSV_LOGGING_RECOMMENDED_STEPS:
            logger.warning(
                "Long run detected (%d steps). Consider enabling "
                "--log-loss to capture every step.",
                steps,
            )

    def _resolve_chunk_size(self) -> int:
        """Steps fused into one dispatch (``lax.scan`` over the update).

        The chunk must divide every cadence whose contract is per-step
        host work at exact steps: CSV logging (rows at every
        ``log_every`` step), frame extraction (``save_every`` when a
        sink is attached), and checkpointing. The in-memory ring buffer
        is NOT a constraint — chunked dispatch records every step's
        losses on device regardless. A user value
        (``hardware.steps_per_dispatch``) folds into the same gcd so it
        can tune but never break alignment; per-step callbacks force
        single-step dispatch (their contract is one call per accepted
        step).
        """
        if self.chunked_update_fn is None:
            return 1
        if (
            self.callbacks.on_step_start is not None
            or self.callbacks.on_step_end is not None
        ):
            return 1
        requested = getattr(
            self.config.hardware, "steps_per_dispatch", 0,
        )
        if requested == 1:
            return 1
        cadences = []
        if self.loss_logger is not None:
            cadences.append(self.config.output.log_every)
        if self.video_writer is not None or self.gif_collector is not None:
            cadences.append(self.config.video.save_every)
        if self.config.output.checkpoint_every:
            cadences.append(self.config.output.checkpoint_every)
        if requested > 1:
            cadences.append(requested)
        return aligned_chunk(cadences)

    def _finalize_chunk(self, first_step: int, k: int, auxes) -> None:
        """Bookkeeping for a k-step dispatch (stacked StepAux arrays)."""
        last_step = first_step + k - 1
        self._step_index = last_step
        self._eval_total = self._eval_total + auxes.n_evals.sum()

        logged = None
        if self._accumulator is not None:
            logged = self._accumulator.accumulate_batch(
                first_step,
                auxes.style_score,
                auxes.content_score,
                auxes.loss,
            )
            if logged is not None and self.loss_logger is not None:
                self.loss_logger.log(
                    logged.step,
                    logged.style_loss,
                    logged.content_loss,
                    logged.total_loss,
                )
        if logged is not None:
            self._latest_logged = logged
            self._warn_nonfinite(logged)
            metrics = StepMetrics(
                step=logged.step,
                style_loss=logged.style_loss,
                content_loss=logged.content_loss,
                total_loss=logged.total_loss,
            )
        else:
            metrics = StepMetrics(step=last_step)

        self._maybe_write_video_frame(metrics)
        self._maybe_save_checkpoint(last_step)
        self.progress_bar.update(k)

    def _finalize_step(self, step_idx: int, aux: StepAux) -> None:
        self._step_index = step_idx
        self._eval_total = self._eval_total + aux.n_evals

        logged = self._record_losses(step_idx, aux)
        if logged is not None:
            self._latest_logged = logged
            self._warn_nonfinite(logged)
            metrics = StepMetrics(
                step=logged.step,
                style_loss=logged.style_loss,
                content_loss=logged.content_loss,
                total_loss=logged.total_loss,
            )
        else:
            metrics = StepMetrics(step=step_idx)

        self._maybe_write_video_frame(metrics)
        self._maybe_save_checkpoint(step_idx)
        self.progress_bar.update(1)
        if self.callbacks.on_step_end is not None:
            self.callbacks.on_step_end(metrics)

    def _maybe_save_checkpoint(self, step_idx: int) -> None:
        cadence = self.config.output.checkpoint_every
        if (
            not cadence
            or self._checkpoint_path is None
            or step_idx % cadence != 0
        ):
            return
        from style_transfer_visualizer_tpu.runtime.checkpoint import (  # noqa: PLC0415
            save_checkpoint,
        )

        save_checkpoint(
            self._checkpoint_path, step_idx, self.input_img, self.opt_state,
        )

    def _record_losses(
        self, step_idx: int, aux: StepAux,
    ) -> LoggedLoss | None:
        if self._accumulator is None:
            return None
        logged = self._accumulator.accumulate(
            step_idx, aux.style_score, aux.content_score, aux.loss,
        )
        if logged is not None and self.loss_logger is not None:
            self.loss_logger.log(
                logged.step,
                logged.style_loss,
                logged.content_loss,
                logged.total_loss,
            )
        return logged

    def _warn_nonfinite(self, logged: LoggedLoss) -> None:
        # Checked at the sync cadence so the hot loop stays async; the
        # reference checks every step at the cost of a device sync
        # (optimization.py:375-400).
        if not math.isfinite(logged.style_loss):
            logger.warning(
                "Non-finite style score at step %d", logged.step,
            )
        if not math.isfinite(logged.content_loss):
            logger.warning(
                "Non-finite content score at step %d", logged.step,
            )
        if not math.isfinite(logged.total_loss):
            logger.warning(
                "Non-finite total loss at step %d, using previous loss",
                logged.step,
            )

    def _maybe_write_video_frame(self, metrics: StepMetrics) -> None:
        save_every = self.config.video.save_every
        step_idx = metrics.step
        if (
            not save_every  # pragma: no branch (config bounds it >= 1)
            or step_idx % save_every != 0
            or (self.video_writer is None and self.gif_collector is None)
        ):
            return

        device_frame = self._frame_fetcher(self.input_img)
        if self._async_frames:
            if self._frame_stream is None:
                from style_transfer_visualizer_tpu.media.stream import (  # noqa: PLC0415
                    AsyncFrameStream,
                )

                self._frame_stream = AsyncFrameStream()
            self._frame_stream.submit(
                device_frame,
                lambda frame, m=metrics: self._deliver_frame(frame, m),
            )
        else:
            self._deliver_frame(np.asarray(device_frame), metrics)

    def _deliver_frame(self, img_np: np.ndarray, metrics: StepMetrics) -> None:
        step_idx = metrics.step

        if (
            self.intro_last_frame is not None
            # One-way by invariant: the frame is cleared in the same
            # statement group that sets the done flag (below), and the
            # constructor derives done from the frame's presence.
            and not self.intro_transition_done  # pragma: no branch
        ):
            from style_transfer_visualizer_tpu.media.segments import (  # noqa: PLC0415
                append_crossfade,
            )

            if (
                self.video_writer is not None
                and self.config.video.intro_enabled
            ):
                append_crossfade(
                    self.video_writer,
                    self.intro_last_frame,
                    img_np,
                    self.intro_crossfade_frames,
                )
            if (
                self.gif_collector is not None
                and self.config.video.gif_include_intro
            ):
                append_crossfade(
                    self.gif_collector,
                    self.intro_last_frame,
                    img_np,
                    self.intro_crossfade_frames,
                )
            self.intro_transition_done = True
            self.intro_last_frame = None

        if self.video_writer is not None:
            self.video_writer.append_data(img_np)
        if self.gif_collector is not None:
            self.gif_collector.append_data(img_np)

        self._update_progress_postfix(metrics)

        if self.callbacks.on_video_frame is not None:
            self.callbacks.on_video_frame(img_np, step_idx)

    def _update_progress_postfix(self, metrics: StepMetrics) -> None:
        display = metrics
        if not metrics.has_values and self._latest_logged is not None:
            display = StepMetrics(
                step=self._latest_logged.step,
                style_loss=self._latest_logged.style_loss,
                content_loss=self._latest_logged.content_loss,
                total_loss=self._latest_logged.total_loss,
            )
        postfix: dict[str, str] = {}
        if display.style_loss is not None:
            postfix["style"] = f"{display.style_loss:.4f}"
        if display.content_loss is not None:
            postfix["content"] = f"{display.content_loss:.4f}"
        if display.total_loss is not None:
            postfix["loss"] = f"{display.total_loss:.4f}"
        if postfix:
            self.progress_bar.set_postfix(postfix)

    def _log_summary(self) -> None:
        steps_run = self._step_index - self._start_step
        if steps_run <= 0:
            return
        # Single host sync for the whole run's evaluation telemetry.
        total_evals = int(np.asarray(self._eval_total))
        logger.info(
            "Optimization finished with %d accepted steps and %d closure "
            "evaluations (%.2f closures/step).",
            steps_run,
            total_evals,
            total_evals / steps_run,
        )

    def _cleanup(self) -> None:
        """Close every resource; never let one failure skip the others.

        Runs inside ``run()``'s finally: when the loop itself raised, a
        cleanup error must not replace it, so close errors are logged.
        A frame-stream error (a sink rejected a frame on the worker
        thread) is a real run failure and is re-raised when it is the
        only thing that went wrong.
        """
        loop_failed = sys.exc_info()[1] is not None
        stream_error: BaseException | None = None

        if self._frame_stream is not None:
            stream, self._frame_stream = self._frame_stream, None
            try:
                stream.close()
            except BaseException as exc:  # noqa: BLE001
                stream_error = exc
                logger.error("Error closing frame stream: %s", exc)

        if self.loss_logger is not None:
            try:
                self.loss_logger.close()
            except OSError as exc:
                logger.error("Error closing loss logger: %s", exc)

        if self._owns_progress_bar and self._progress_bar is not None:
            try:
                self._progress_bar.close()
            except Exception as exc:  # noqa: BLE001
                logger.error("Error closing progress bar: %s", exc)

        if stream_error is not None and not loop_failed:
            raise stream_error
