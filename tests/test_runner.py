"""OptimizationRunner orchestration with fake update functions and sinks."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_visualizer_tpu.engine.optimizers import StepAux
from style_transfer_visualizer_tpu.engine.runner import (
    OptimizationCallbacks,
    OptimizationRunner,
    StepMetrics,
)


class MemorySink:
    """In-memory VideoFrameSink for orchestration tests."""

    def __init__(self) -> None:
        self.frames: list[np.ndarray] = []
        self.closed = False
        self._size: tuple[int, int] | None = None

    def append_data(self, frame: np.ndarray) -> None:
        self.frames.append(np.array(frame))
        self._size = (frame.shape[1], frame.shape[0])

    def close(self) -> None:
        self.closed = True


class NullBar:
    """Progress reporter spy."""

    def __init__(self) -> None:
        self.updates = 0
        self.postfixes: list[dict] = []
        self.closed = False

    def update(self, n=1):
        self.updates += n

    def set_postfix(self, ordered_dict=None, refresh=True, **kw):
        self.postfixes.append(dict(ordered_dict or {}))

    def close(self):
        self.closed = True


def fake_update(step_value: float = 1.0):
    """Update fn writing a recognizable, decreasing loss per step."""
    counter = {"n": 0}

    def update(img, state):
        counter["n"] += 1
        loss = jnp.asarray(10.0 / counter["n"])
        aux = StepAux(
            loss=loss,
            style_score=loss * 0.6,
            content_score=loss * 0.4,
            n_evals=jnp.asarray(2, jnp.int32),
        )
        return img + step_value, state, aux

    return update


@pytest.fixture
def runner_factory(make_style_transfer_config):
    def _make(*, steps=4, video=None, output=None, **runner_kw):
        cfg = make_style_transfer_config(
            optimization={"steps": steps},
            video=video or {},
            output=output or {},
        )
        img = jnp.zeros((1, 8, 8, 3), jnp.float32)
        bar = runner_kw.pop("progress_bar", NullBar())
        runner = OptimizationRunner(
            runner_kw.pop("update_fn", fake_update()),
            opt_state=None,
            input_img=img,
            config=cfg,
            progress_bar=bar,
            **runner_kw,
        )
        return runner, bar

    return _make


class TestRunLoop:
    def test_runs_all_steps(self, runner_factory) -> None:
        runner, bar = runner_factory(steps=5)
        img, history, elapsed = runner.run()
        assert bar.updates == 5
        assert elapsed >= 0
        assert float(np.asarray(img)[0, 0, 0, 0]) == 5.0

    def test_history_recorded(self, runner_factory) -> None:
        runner, _ = runner_factory(steps=4, output={"log_every": 1})
        _, history, _ = runner.run()
        assert len(history["total_loss"]) == 4
        np.testing.assert_allclose(
            history["total_loss"], [10.0, 5.0, 10 / 3, 2.5], rtol=1e-5,
        )

    def test_closure_telemetry_logged(self, runner_factory, caplog) -> None:
        runner, _ = runner_factory(steps=3)
        runner.run()
        assert "6 closure" in caplog.text
        assert "2.00 closures/step" in caplog.text

    def test_callbacks_fire_per_step(self, runner_factory) -> None:
        starts, ends = [], []
        cb = OptimizationCallbacks(
            on_step_start=starts.append,
            on_step_end=lambda m: ends.append(m.step),
        )
        runner, _ = runner_factory(steps=3, callbacks=cb)
        runner.run()
        assert starts == [1, 2, 3]
        assert ends == [1, 2, 3]

    def test_metrics_values_on_cadence(self, runner_factory) -> None:
        seen: list[StepMetrics] = []
        cb = OptimizationCallbacks(on_step_end=seen.append)
        runner, _ = runner_factory(
            steps=4, callbacks=cb, output={"log_every": 2},
        )
        runner.run()
        assert [m.has_values for m in seen] == [False, True, False, True]


class TestFrames:
    def test_frames_on_save_every(self, runner_factory) -> None:
        sink = MemorySink()
        runner, _ = runner_factory(
            steps=6, video={"save_every": 2}, video_writer=sink,
        )
        runner.run()
        assert len(sink.frames) == 3
        assert sink.frames[0].dtype == np.uint8
        assert sink.frames[0].shape == (8, 8, 3)

    def test_gif_receives_frames_too(self, runner_factory) -> None:
        vid, gif = MemorySink(), MemorySink()
        runner, _ = runner_factory(
            steps=4, video={"save_every": 2},
            video_writer=vid, gif_collector=gif,
        )
        runner.run()
        assert len(vid.frames) == len(gif.frames) == 2

    def test_no_sinks_no_fetch(self, runner_factory) -> None:
        fetches = {"n": 0}

        def fetcher(img):
            fetches["n"] += 1
            return np.zeros((8, 8, 3), np.uint8)

        runner, _ = runner_factory(
            steps=4, video={"save_every": 1}, frame_fetcher=fetcher,
        )
        runner.run()
        assert fetches["n"] == 0

    def test_intro_crossfade_once_before_first_frame(
        self, runner_factory,
    ) -> None:
        sink = MemorySink()
        intro = np.full((8, 8, 3), 200, np.uint8)
        runner, _ = runner_factory(
            steps=4, video={"save_every": 2},
            video_writer=sink,
            intro_last_frame=intro,
            intro_crossfade_frames=3,
        )
        runner.run()
        # 3 crossfade frames + 2 stylized frames
        assert len(sink.frames) == 5
        assert runner.intro_transition_done is True
        assert runner.intro_last_frame is None

    def test_on_video_frame_callback(self, runner_factory) -> None:
        frames = []
        cb = OptimizationCallbacks(
            on_video_frame=lambda f, s: frames.append(s),
        )
        sink = MemorySink()
        runner, _ = runner_factory(
            steps=4, video={"save_every": 2},
            video_writer=sink, callbacks=cb,
        )
        runner.run()
        assert frames == [2, 4]

    def test_postfix_updates_with_latest_losses(self, runner_factory) -> None:
        sink = MemorySink()
        runner, bar = runner_factory(
            steps=4, video={"save_every": 2}, video_writer=sink,
            output={"log_every": 2},
        )
        runner.run()
        assert bar.postfixes  # set at frame steps that land on cadence
        assert "loss" in bar.postfixes[-1]


class TestLoggingConfig:
    def test_csv_logging_disables_history(
        self, runner_factory, tmp_path,
    ) -> None:
        csv_path = tmp_path / "loss.csv"
        runner, _ = runner_factory(
            steps=4,
            output={"log_loss": str(csv_path), "log_every": 1},
        )
        _, history, _ = runner.run()
        assert history == {}
        lines = csv_path.read_text().strip().splitlines()
        assert len(lines) == 5  # header + 4 rows

    def test_csv_failure_falls_back_to_memory(
        self, runner_factory, caplog,
    ) -> None:
        errors = []
        cb = OptimizationCallbacks(on_logging_error=errors.append)
        runner, _ = runner_factory(
            steps=2,
            output={"log_loss": "/proc/definitely/not/writable.csv",
                    "log_every": 1},
            callbacks=cb,
        )
        _, history, _ = runner.run()
        assert len(errors) == 1
        assert "Failed to initialize CSV logging" in caplog.text
        assert len(history["total_loss"]) == 2

    def test_long_run_capacity_warning(
        self, make_style_transfer_config, caplog,
    ) -> None:
        cfg = make_style_transfer_config(optimization={"steps": 5000})
        OptimizationRunner(
            fake_update(), None, jnp.zeros((1, 4, 4, 3)), cfg,
            progress_bar=NullBar(),
        )
        assert "capped at 2048" in caplog.text

    def test_nonfinite_warning(self, runner_factory, caplog) -> None:
        def nan_update(img, state):
            nan = jnp.asarray(float("nan"))
            return img, state, StepAux(
                loss=nan, style_score=nan, content_score=nan,
                n_evals=jnp.asarray(1, jnp.int32),
            )

        runner, _ = runner_factory(
            steps=1, update_fn=nan_update, output={"log_every": 1},
        )
        runner.run()
        assert "Non-finite style score at step 1" in caplog.text
        assert "Non-finite total loss at step 1" in caplog.text


class TestProgressBar:
    def test_owned_bar_created_and_closed(
        self, make_style_transfer_config,
    ) -> None:
        cfg = make_style_transfer_config(optimization={"steps": 2})
        runner = OptimizationRunner(
            fake_update(), None, jnp.zeros((1, 4, 4, 3)), cfg,
        )
        runner.run()  # creates its own tqdm and closes it

    def test_bar_access_before_run_raises(
        self, make_style_transfer_config,
    ) -> None:
        cfg = make_style_transfer_config()
        runner = OptimizationRunner(
            fake_update(), None, jnp.zeros((1, 4, 4, 3)), cfg,
        )
        with pytest.raises(RuntimeError, match="Progress bar"):
            _ = runner.progress_bar


class TestHostSyncDiscipline:
    def test_no_host_sync_off_cadence(
        self, runner_factory, monkeypatch,
    ) -> None:
        """Between log_every flushes the loop must not pull device data.

        Mirrors the reference's guard that .item() is never called
        between flushes (reference test_optimization.py:943-970).
        """
        import jax

        import style_transfer_visualizer_tpu.engine.loss_accumulator as acc

        syncs = {"n": 0}
        orig = np.asarray

        def counting(x, *a, **k):
            if isinstance(x, jax.Array):
                syncs["n"] += 1
            return orig(x, *a, **k)

        monkeypatch.setattr(acc.np, "asarray", counting)
        runner, _ = runner_factory(
            steps=10, output={"log_every": 5},
        )
        runner.run()
        # Two cadence flushes (steps 5 and 10) plus two end-of-run
        # transfers (eval-count telemetry, history export). Nothing
        # per-step.
        assert syncs["n"] == 4


class TestCleanupRobustness:
    def test_stream_error_surfaces_after_run(self, runner_factory) -> None:
        """A sink that explodes on the worker thread fails the run."""
        class ExplodingSink(MemorySink):
            def append_data(self, frame):
                raise OSError("encoder died")

        runner, _ = runner_factory(
            steps=2, video={"save_every": 1},
            video_writer=ExplodingSink(),
        )
        with pytest.raises(OSError, match="encoder died"):
            runner.run()

    def test_logger_close_error_does_not_skip_bar(
        self, runner_factory, caplog, monkeypatch,
    ) -> None:
        runner, bar = runner_factory(
            steps=1, output={"log_every": 1},
        )
        # Give the runner a logger whose close explodes.
        class BadLogger:
            def log(self, *a): pass
            def close(self):
                raise OSError("disk full")

        runner.loss_logger = BadLogger()
        runner._owns_progress_bar = True
        runner.run()
        assert "Error closing loss logger" in caplog.text
        assert bar.closed  # progress bar still closed

    def test_loop_exception_not_masked_by_stream_error(
        self, runner_factory, caplog,
    ) -> None:
        """When the loop raises, a stream close error must not replace it."""
        class ExplodingSink(MemorySink):
            def append_data(self, frame):
                raise OSError("encoder died")

        calls = {"n": 0}

        def failing_update(img, state):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise RuntimeError("device OOM")
            return fake_update()(img, state)

        runner, _ = runner_factory(
            steps=5, video={"save_every": 1},
            update_fn=failing_update,
            video_writer=ExplodingSink(),
        )
        with pytest.raises(RuntimeError, match="device OOM"):
            runner.run()


def fake_chunked(step_value: float = 1.0):
    """Chunked companion to fake_update: k steps in one call."""
    counter = {"n": 0}

    def chunked(img, state, k):
        losses = []
        for _ in range(k):
            counter["n"] += 1
            losses.append(10.0 / counter["n"])
        arr = jnp.asarray(losses)
        aux = StepAux(
            loss=arr,
            style_score=arr * 0.6,
            content_score=arr * 0.4,
            n_evals=jnp.full((k,), 2, jnp.int32),
        )
        return img + step_value * k, state, aux

    return chunked


class TestAlignedChunk:
    """The shared cadence-alignment policy (single-run + batch loops)."""

    def test_no_cadences_uses_measured_default(self) -> None:
        from style_transfer_visualizer_tpu.engine.runner import (
            DEFAULT_CHUNK,
            aligned_chunk,
        )

        assert aligned_chunk([]) == DEFAULT_CHUNK

    def test_gcd_of_cadences(self) -> None:
        from style_transfer_visualizer_tpu.engine.runner import (
            aligned_chunk,
        )

        assert aligned_chunk([6, 4]) == 2
        assert aligned_chunk([20]) == 20

    def test_oversize_gcd_shrinks_along_divisors(self) -> None:
        """A plain min() cap would skip every 60-step cadence hit."""
        from style_transfer_visualizer_tpu.engine.runner import (
            _MAX_CHUNK,
            aligned_chunk,
        )

        chunk = aligned_chunk([120])
        assert chunk <= _MAX_CHUNK
        assert 120 % chunk == 0
        assert chunk == 40

    def test_coprime_cadences_fall_to_single_step(self) -> None:
        from style_transfer_visualizer_tpu.engine.runner import (
            aligned_chunk,
        )

        assert aligned_chunk([3, 7]) == 1


class TestDriveChunked:
    """The shared host-side chunk-splitting loop (engine.step)."""

    @staticmethod
    def _counting_update():
        calls: list[int] = []

        def chunked(x, state, k):
            calls.append(k)
            return x + k, state, {"loss": jnp.full((k,), float(x + k))}

        return chunked, calls

    def test_splits_steps_into_chunks(self) -> None:
        from style_transfer_visualizer_tpu.engine.step import drive_chunked

        chunked, calls = self._counting_update()
        x, state, aux = drive_chunked(chunked, 0, "st", 60, 25)
        assert calls == [25, 25, 10]
        assert x == 60
        assert state == "st"
        assert aux["loss"].shape == (10,)  # last dispatch's stacked aux

    def test_zero_steps_is_a_no_op(self) -> None:
        from style_transfer_visualizer_tpu.engine.step import drive_chunked

        chunked, calls = self._counting_update()
        x, state, aux = drive_chunked(chunked, 7, "st", 0, 25)
        assert calls == []
        assert (x, state, aux) == (7, "st", None)


class TestChunkedDispatch:
    """Multi-step dispatch: same results, fewer host round trips."""

    def test_chunk_size_resolution(self, runner_factory) -> None:
        # No chunked fn -> single steps.
        runner, _ = runner_factory(steps=10)
        assert runner._resolve_chunk_size() == 1
        # Sink attached: save_every constrains the chunk.
        runner, _ = runner_factory(
            steps=10, output={"log_every": 6},
            video={"save_every": 4},
            chunked_update_fn=fake_chunked(),
            video_writer=MemorySink(),
        )
        assert runner._resolve_chunk_size() == 4
        # CSV logging active: its cadence constrains too (gcd).
        runner, _ = runner_factory(
            steps=10, output={"log_every": 6},
            video={"save_every": 4},
            chunked_update_fn=fake_chunked(),
            video_writer=MemorySink(),
        )
        runner.loss_logger = object()  # stand-in: CSV active
        assert runner._resolve_chunk_size() == 2
        # No cadence constraints: the measured default chunk.
        runner, _ = runner_factory(
            steps=100, output={"log_every": 6},
            video={"save_every": 4},
            chunked_update_fn=fake_chunked(),
        )
        assert runner._resolve_chunk_size() == 25
        # User request folds into the gcd (cannot break alignment).
        runner, _ = runner_factory(
            steps=10, video={"save_every": 8},
            chunked_update_fn=fake_chunked(),
            video_writer=MemorySink(),
        )
        runner.config.hardware.steps_per_dispatch = 4
        assert runner._resolve_chunk_size() == 4
        # Per-step callbacks force single-step dispatch.
        runner, _ = runner_factory(
            steps=10,
            chunked_update_fn=fake_chunked(),
            callbacks=OptimizationCallbacks(on_step_end=lambda m: None),
        )
        assert runner._resolve_chunk_size() == 1
        # A gcd above the cap shrinks along DIVISORS (60 -> 30, never
        # 50, which would skip every 60-step frame).
        runner, _ = runner_factory(
            steps=300, video={"save_every": 60},
            chunked_update_fn=fake_chunked(),
            video_writer=MemorySink(),
        )
        assert runner._resolve_chunk_size() == 30

    def test_unaligned_chunk_still_syncs_near_cadence(
        self, runner_factory,
    ) -> None:
        """chunk=25 with log_every=10: every chunk crosses a boundary."""
        runner, _ = runner_factory(
            steps=50, output={"log_every": 10},
            chunked_update_fn=fake_chunked(),
        )
        assert runner._resolve_chunk_size() == 25
        runner.run()
        # The latest logged losses are from a chunk end, within one
        # chunk of the cadence (not stale by 2+ chunks).
        assert runner._latest_logged is not None
        assert runner._latest_logged.step == 50

    @pytest.mark.parametrize("optimizer", ["adam", "lbfgs"])
    def test_chunked_run_matches_single_step(
        self, make_style_transfer_config, optimizer,
    ) -> None:
        """Real jitted bundle: fused dispatch is bit-identical."""
        import jax

        from style_transfer_visualizer_tpu.engine.step import (
            build_update_step,
        )
        from style_transfer_visualizer_tpu.models import vgg19
        from style_transfer_visualizer_tpu.models.features import (
            compute_targets,
        )

        params = vgg19.init_random_params(jax.random.key(0))
        key = jax.random.key(3)
        content = jax.random.uniform(key, (1, 32, 32, 3), jnp.float32)
        style = jax.random.uniform(
            jax.random.fold_in(key, 1), (1, 32, 32, 3), jnp.float32,
        )
        layers = ((0, 5), (2,))
        targets = compute_targets(params, style, content, *layers)

        def run_with(steps_per_dispatch: int):
            bundle = build_update_step(
                params, targets, tuple(content.shape),
                optimizer=optimizer, lr=0.05, style_w=10.0, content_w=1.0,
                style_layers=layers[0], content_layers=layers[1],
                precision="highest", lbfgs_history_size=4,
            )
            cfg = make_style_transfer_config(
                optimization={"steps": 12},
                output={"log_every": 3},
                video={"save_every": 6},
            )
            cfg.hardware.steps_per_dispatch = steps_per_dispatch
            sink = MemorySink()
            runner = OptimizationRunner(
                bundle.update_fn,
                bundle.opt_state,
                jnp.array(content),
                cfg,
                progress_bar=NullBar(),
                video_writer=sink,
                async_frames=False,
                chunked_update_fn=bundle.chunked_update_fn,
            )
            img, history, _ = runner.run()
            return np.asarray(img), history, len(sink.frames)

    # chunked (auto -> gcd(3, 6) = 3) vs forced single-step
        img_c, hist_c, frames_c = run_with(0)
        img_s, hist_s, frames_s = run_with(1)
        # The scan body may fuse differently than the standalone
        # executable, so allow accumulation-order noise only.
        np.testing.assert_allclose(img_c, img_s, rtol=1e-4, atol=1e-5)
        assert frames_c == frames_s == 2
        for series in ("style_loss", "content_loss", "total_loss"):
            np.testing.assert_allclose(
                hist_c[series], hist_s[series], rtol=1e-4, atol=1e-8,
            )
        assert len(hist_c["total_loss"]) == 12

    def test_chunked_resume_alignment(self, runner_factory) -> None:
        """A misaligned start runs single steps until the chunk grid."""
        seen = []

        def tracking_chunked(img, state, k):
            seen.append(("chunk", k))
            return fake_chunked()(img, state, k)

        calls = {"n": 0}
        inner = fake_update()

        def tracking_update(img, state):
            calls["n"] += 1
            return inner(img, state)

        runner, _ = runner_factory(
            steps=10, video={"save_every": 4},
            update_fn=tracking_update,
            chunked_update_fn=tracking_chunked,
            video_writer=MemorySink(),
            start_step=2,
        )
        runner.run()
        # Steps 3,4 single (to reach the grid), 5-8 chunked, 9,10 single
        # (remainder below chunk size).
        assert calls["n"] == 4
        assert seen == [("chunk", 4)]
        assert runner._step_index == 10

    def test_chunked_eval_telemetry(self, runner_factory, caplog) -> None:
        import logging

        runner, _ = runner_factory(
            steps=8, video={"save_every": 4},
            chunked_update_fn=fake_chunked(),
            video_writer=MemorySink(),
        )
        with caplog.at_level(logging.INFO):
            runner.run()
        assert "2.00 closures/step" in caplog.text


class TestCsvCadenceWrites:
    """CSV rows land at the log_every cadence on both dispatch paths."""

    def test_single_step_dispatch_writes_rows(
        self, runner_factory, tmp_path,
    ) -> None:
        csv = tmp_path / "loss.csv"
        runner, _ = runner_factory(
            steps=4, output={"log_loss": str(csv), "log_every": 2},
        )
        runner.run()
        rows = csv.read_text().strip().splitlines()
        assert rows[0] == "step,style_loss,content_loss,total_loss"
        assert [r.split(",")[0] for r in rows[1:]] == ["2", "4"]

    def test_chunked_dispatch_writes_rows(
        self, runner_factory, tmp_path,
    ) -> None:
        csv = tmp_path / "loss.csv"
        runner, _ = runner_factory(
            steps=4, output={"log_loss": str(csv), "log_every": 2},
            chunked_update_fn=fake_chunked(),
        )
        assert runner._resolve_chunk_size() > 1
        runner.run()
        rows = csv.read_text().strip().splitlines()
        assert [r.split(",")[0] for r in rows[1:]] == ["2", "4"]


class TestLongRunAdvisory:
    def test_csv_recommended_between_2000_and_capacity(
        self, runner_factory, caplog,
    ) -> None:
        import logging

        with caplog.at_level(logging.WARNING):
            runner_factory(steps=2020)
        assert "Consider enabling" in caplog.text


class TestGifIntroCrossfade:
    def test_crossfade_precedes_first_gif_frame(
        self, runner_factory,
    ) -> None:
        gif = MemorySink()
        intro = np.full((8, 8, 3), 200, np.uint8)
        runner, _ = runner_factory(
            steps=2,
            video={"save_every": 1, "gif_include_intro": True},
            gif_collector=gif,
            intro_last_frame=intro,
            intro_crossfade_frames=3,
        )
        runner.run()
        assert len(gif.frames) == 5  # 3 crossfade + 2 cadence frames
        # The first crossfade frame sits closer to the intro frame's
        # value (200) than the final stylized frame does.
        intro_val = 200
        first = abs(int(gif.frames[0][0, 0, 0]) - intro_val)
        last = abs(int(gif.frames[-1][0, 0, 0]) - intro_val)
        assert first < last


class TestResumeAtCompletion:
    def test_resuming_a_finished_run_does_nothing(
        self, runner_factory,
    ) -> None:
        runner, bar = runner_factory(steps=3, start_step=3)
        _, history, _ = runner.run()
        assert bar.updates == 0


class TestCleanupEdges:
    def test_progress_bar_close_error_logged_not_raised(
        self, make_style_transfer_config, monkeypatch, caplog,
    ) -> None:
        import logging

        import style_transfer_visualizer_tpu.engine.runner as runner_mod

        class ExplodingBar:
            def __init__(self, *a, **k) -> None:
                pass

            def update(self, n=1) -> None:
                pass

            def set_postfix(self, *a, **k) -> None:
                pass

            def close(self) -> None:
                raise RuntimeError("bar broke")

        monkeypatch.setattr(runner_mod, "tqdm", ExplodingBar)
        cfg = make_style_transfer_config(optimization={"steps": 2})
        runner = OptimizationRunner(
            fake_update(),
            opt_state=None,
            input_img=jnp.zeros((1, 8, 8, 3), jnp.float32),
            config=cfg,
        )
        with caplog.at_level(logging.ERROR):
            runner.run()  # must complete despite the close failure
        assert "Error closing progress bar" in caplog.text

    def test_sink_error_on_worker_thread_fails_the_run(
        self, runner_factory,
    ) -> None:
        class BadSink(MemorySink):
            def append_data(self, frame) -> None:
                raise ValueError("frame rejected")

        runner, _ = runner_factory(
            steps=2,
            video={"save_every": 1},
            video_writer=BadSink(),
        )
        with pytest.raises(ValueError, match="frame rejected"):
            runner.run()


def test_record_losses_without_accumulator_is_none() -> None:
    """Telemetry accessor degrades to None when logging is disabled."""
    runner = OptimizationRunner.__new__(OptimizationRunner)
    runner._accumulator = None
    aux = StepAux(
        loss=jnp.asarray(1.0),
        style_score=jnp.asarray(0.5),
        content_score=jnp.asarray(0.5),
        n_evals=jnp.asarray(1, jnp.int32),
    )
    assert runner._record_losses(1, aux) is None


def test_stream_close_error_raises_when_loop_succeeded(
    runner_factory, monkeypatch,
) -> None:
    """A frame-stream close failure IS the run failure when the loop
    itself completed (runner._cleanup re-raises it)."""
    import style_transfer_visualizer_tpu.media.stream as stream_mod

    def bad_close(self) -> None:
        raise RuntimeError("frame worker wedged")

    monkeypatch.setattr(stream_mod.AsyncFrameStream, "close", bad_close)
    sink = MemorySink()
    runner, _ = runner_factory(
        steps=2, video={"save_every": 1}, video_writer=sink,
    )
    with pytest.raises(RuntimeError, match="frame worker wedged"):
        runner.run()


class TestBranchDirections:
    """One-way branch directions flagged by the branch coverage tool."""

    def test_csv_init_failure_without_error_callback(
        self, runner_factory, monkeypatch, caplog,
    ) -> None:
        import logging

        import style_transfer_visualizer_tpu.engine.runner as runner_mod

        def boom(*a, **k):
            raise OSError("no csv for you")

        monkeypatch.setattr(runner_mod, "LossCSVLogger", boom)
        runner, _ = runner_factory(
            steps=2, output={"log_loss": "x.csv"},
        )
        with caplog.at_level(logging.ERROR):
            runner.run()  # degrades to in-memory, no callback to fire
        assert "Failed to initialize CSV logging" in caplog.text

    def test_chunk_stays_single_step_with_start_callback_only(
        self, runner_factory,
    ) -> None:
        starts: list[int] = []
        cb = OptimizationCallbacks(on_step_start=starts.append)
        runner, _ = runner_factory(
            steps=3, callbacks=cb,
            chunked_update_fn=lambda img, st, k: (_ for _ in ()).throw(
                AssertionError("chunked path must not be used"),
            ),
        )
        runner.run()
        assert starts == [1, 2, 3]

    def test_finalize_chunk_without_accumulator(
        self, runner_factory,
    ) -> None:
        runner, bar = runner_factory(steps=2)
        runner._accumulator = None  # telemetry disabled by a caller
        auxes = StepAux(
            loss=jnp.ones((2,)),
            style_score=jnp.ones((2,)),
            content_score=jnp.ones((2,)),
            n_evals=jnp.ones((2,), jnp.int32),
        )
        runner._finalize_chunk(1, 2, auxes)
        assert bar.updates == 2

    def test_checkpoint_cadence_without_path_skips(
        self, runner_factory, tmp_path,
    ) -> None:
        runner, _ = runner_factory(
            steps=4, output={"checkpoint_every": 2},
            checkpoint_path=None,
        )
        runner.run()  # no checkpoint path: cadence is a no-op

    def test_intro_crossfade_skipped_when_video_intro_disabled(
        self, runner_factory,
    ) -> None:
        sink = MemorySink()
        intro = np.zeros((8, 8, 3), np.uint8)
        runner, _ = runner_factory(
            steps=2,
            video={"save_every": 1, "intro_enabled": False},
            video_writer=sink,
            intro_last_frame=intro,
            intro_crossfade_frames=3,
        )
        runner.run()
        # No crossfade frames: exactly one stylized frame per step.
        assert len(sink.frames) == 2

    def test_intro_crossfade_skipped_for_gif_when_not_included(
        self, runner_factory,
    ) -> None:
        gif = MemorySink()
        intro = np.zeros((8, 8, 3), np.uint8)
        runner, _ = runner_factory(
            steps=2,
            video={"save_every": 1, "gif_include_intro": False},
            gif_collector=gif,
            intro_last_frame=intro,
            intro_crossfade_frames=3,
        )
        runner.run()
        assert len(gif.frames) == 2
