"""Orchestrator wiring tests with stubbed pipeline seams."""
from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

import style_transfer_visualizer_tpu.main as stv_main
from style_transfer_visualizer_tpu.engine.optimizers import StepAux
from style_transfer_visualizer_tpu.engine.step import StepBundle


class StubWriter:
    def __init__(self) -> None:
        self.frames: list[np.ndarray] = []
        self.closed = False
        self._size: tuple[int, int] | None = None

    def append_data(self, frame: np.ndarray) -> None:
        self.frames.append(np.array(frame))
        self._size = (frame.shape[1], frame.shape[0])

    def close(self) -> None:
        self.closed = True


def _fake_bundle(shape) -> StepBundle:
    def update(img, state):
        aux = StepAux(
            loss=jnp.asarray(1.0),
            style_score=jnp.asarray(0.6),
            content_score=jnp.asarray(0.4),
            n_evals=jnp.asarray(1, jnp.int32),
        )
        return img * 0.99, state, aux

    return StepBundle(update_fn=update, opt_state=None)


@pytest.fixture
def patched_pipeline(monkeypatch):
    """Stub the expensive seams; record what the orchestrator wires up."""
    recorded: dict = {}

    def fake_prepare(content_img, style_img, config, key, blend_imgs=None):
        recorded["input_shape"] = tuple(content_img.shape)
        recorded["blend_imgs"] = blend_imgs
        recorded["style_img"] = jnp.array(style_img)
        return _fake_bundle(content_img.shape), jnp.array(content_img)

    monkeypatch.setattr(
        stv_main, "_prepare_model_and_input", fake_prepare,
    )

    writers: dict[str, StubWriter | None] = {"video": None, "gif": None}

    def fake_video_writer(cfg, out, name):
        recorded["video_name"] = name
        if not cfg.create_video:
            return None
        writers["video"] = StubWriter()
        return writers["video"]

    def fake_gif_collector(cfg, out, name):
        recorded["gif_name"] = name
        if not cfg.create_gif:
            return None
        writers["gif"] = StubWriter()
        return writers["gif"]

    monkeypatch.setattr(
        stv_main.stv_encode, "setup_video_writer", fake_video_writer,
    )
    monkeypatch.setattr(
        stv_main.stv_encode, "setup_gif_collector", fake_gif_collector,
    )
    recorded["writers"] = writers
    return recorded


class TestStyleTransferOrchestration:
    def test_final_only_disables_video(
        self, patched_pipeline, make_input_paths, make_style_transfer_config,
    ) -> None:
        cfg = make_style_transfer_config(
            optimization={"steps": 3},
            video={"final_only": True, "create_video": True,
                   "create_gif": True},
        )
        result = stv_main.style_transfer(make_input_paths(), cfg)
        assert cfg.video.create_video is False
        assert cfg.video.create_gif is False
        assert cfg.video.save_every == 4
        assert patched_pipeline["writers"]["video"] is None
        assert result.shape == (1, 64, 64, 3)
        assert float(jnp.max(result)) <= 1.0

    def test_video_run_writes_frames_and_closes(
        self, patched_pipeline, make_input_paths, make_style_transfer_config,
    ) -> None:
        cfg = make_style_transfer_config(
            optimization={"steps": 4},
            video={"save_every": 2, "mode": "postprocess",
                   "intro_enabled": False, "final_frame_compare": False},
        )
        stv_main.style_transfer(make_input_paths(), cfg)
        video = patched_pipeline["writers"]["video"]
        assert video is not None
        assert len(video.frames) == 2
        assert video.closed

    def test_intro_and_outro_emitted(
        self, patched_pipeline, make_input_paths, make_style_transfer_config,
    ) -> None:
        cfg = make_style_transfer_config(
            optimization={"steps": 2},
            video={
                "save_every": 1, "mode": "postprocess", "fps": 2,
                "intro_duration_seconds": 1.0,
                "outro_duration_seconds": 1.0,
            },
        )
        stv_main.style_transfer(make_input_paths(), cfg)
        video = patched_pipeline["writers"]["video"]
        # intro fade(2)+hold(2) + crossfade(1) + 2 stylized
        #   + outro hold(2)+crossfade(1)+hold(2)
        assert len(video.frames) == 12

    def test_gif_only_run(
        self, patched_pipeline, make_input_paths, make_style_transfer_config,
    ) -> None:
        cfg = make_style_transfer_config(
            optimization={"steps": 2},
            video={"create_video": False, "create_gif": True,
                   "save_every": 1, "final_frame_compare": False},
        )
        stv_main.style_transfer(make_input_paths(), cfg)
        assert patched_pipeline["writers"]["video"] is None
        gif = patched_pipeline["writers"]["gif"]
        assert len(gif.frames) == 2
        assert gif.closed

    def test_names_derived_from_stems(
        self, patched_pipeline, make_input_paths, make_style_transfer_config,
    ) -> None:
        cfg = make_style_transfer_config(video={"create_video": False})
        stv_main.style_transfer(make_input_paths(), cfg)
        assert patched_pipeline["video_name"] == "timelapse_content_x_style.mp4"
        assert patched_pipeline["gif_name"] == "timelapse_content_x_style.gif"

    def test_outputs_saved(
        self, patched_pipeline, make_input_paths, make_style_transfer_config,
        tmp_path,
    ) -> None:
        out_dir = tmp_path / "results"
        cfg = make_style_transfer_config(
            output={"output": str(out_dir)},
            video={"create_video": False},
        )
        stv_main.style_transfer(make_input_paths(), cfg)
        assert (out_dir / "stylized_content_x_style.png").exists()

    def test_auto_mode_promotion_logged(
        self, patched_pipeline, make_input_paths, make_style_transfer_config,
        caplog, monkeypatch,
    ) -> None:
        cfg = make_style_transfer_config(
            optimization={"steps": 2400},
            video={"save_every": 1, "intro_enabled": False,
                   "final_frame_compare": False},
        )
        stv_main.style_transfer(make_input_paths(), cfg)
        assert cfg.video.mode == "postprocess"
        assert "Auto-selected postprocess" in caplog.text

    def test_missing_content_raises(
        self, make_style_transfer_config, style_image,
    ) -> None:
        from style_transfer_visualizer_tpu.type_defs import InputPaths

        cfg = make_style_transfer_config()
        with pytest.raises(FileNotFoundError, match="Content image"):
            stv_main.style_transfer(
                InputPaths("/none.png", str(style_image)), cfg,
            )

    def test_bad_quality_raises(
        self, make_input_paths, make_style_transfer_config,
    ) -> None:
        cfg = make_style_transfer_config()
        object.__setattr__(cfg.video, "quality", 99)  # bypass validation
        with pytest.raises(ValueError, match="quality"):
            stv_main.style_transfer(make_input_paths(), cfg)


class TestPreserveColor:
    """--preserve-color wiring through the single-run orchestrator."""

    @staticmethod
    def _chroma(rgb) -> np.ndarray:
        from style_transfer_visualizer_tpu.ops.color import rgb_to_yiq

        return np.asarray(rgb_to_yiq(jnp.asarray(rgb)))[..., 1:]

    def test_luminance_result_keeps_content_chroma(
        self, patched_pipeline, make_input_paths, make_style_transfer_config,
    ) -> None:
        paths = make_input_paths()
        cfg = make_style_transfer_config(
            optimization={"steps": 1, "preserve_color": "luminance"},
            video={"create_video": False},
        )
        result = stv_main.style_transfer(paths, cfg)
        import style_transfer_visualizer_tpu.image_io as stv_image_io

        content = stv_image_io.load_image_to_host_array(paths.content_path)
        # Solid-green content: the stylized output must carry its
        # chrominance (up to gamut clipping at the [0,1] boundary).
        np.testing.assert_allclose(
            self._chroma(result), self._chroma(content), atol=0.02,
        )

    def test_luminance_recolors_saved_png_and_frames(
        self, patched_pipeline, make_input_paths, make_style_transfer_config,
        tmp_path,
    ) -> None:
        paths = make_input_paths()
        out_dir = tmp_path / "out_lum"
        cfg = make_style_transfer_config(
            output={"output": str(out_dir)},
            optimization={"steps": 2, "preserve_color": "luminance"},
            video={"create_video": False, "create_gif": True,
                   "save_every": 1, "gif_include_intro": False,
                   "gif_include_outro": False,
                   "final_frame_compare": False},
        )
        stv_main.style_transfer(paths, cfg)
        import style_transfer_visualizer_tpu.image_io as stv_image_io

        content = stv_image_io.load_image_to_host_array(paths.content_path)
        png = stv_image_io.load_image_to_host_array(
            out_dir / "stylized_content_x_style.png",
        )
        np.testing.assert_allclose(
            self._chroma(png), self._chroma(content), atol=0.03,
        )
        gif = patched_pipeline["writers"]["gif"]
        assert len(gif.frames) == 2
        frame = gif.frames[-1].astype(np.float32) / 255.0
        np.testing.assert_allclose(
            self._chroma(frame), self._chroma(content[0]), atol=0.03,
        )

    def test_match_remaps_style_onto_content_palette(
        self, patched_pipeline, make_input_paths, make_style_transfer_config,
    ) -> None:
        paths = make_input_paths()
        cfg = make_style_transfer_config(
            optimization={
                "steps": 1, "preserve_color": "match", "normalize": False,
            },
            video={"create_video": False},
        )
        stv_main.style_transfer(paths, cfg)
        import style_transfer_visualizer_tpu.image_io as stv_image_io

        content = stv_image_io.load_image_to_host_array(paths.content_path)
        # Solid-blue style matched onto solid-green content collapses to
        # the content's mean color: the targets see the content palette.
        style_seen = np.asarray(patched_pipeline["style_img"])
        np.testing.assert_allclose(
            style_seen.mean(axis=(0, 1, 2)),
            content.mean(axis=(0, 1, 2)),
            atol=1e-2,
        )

    def test_off_leaves_style_and_result_untouched(
        self, patched_pipeline, make_input_paths, make_style_transfer_config,
    ) -> None:
        paths = make_input_paths()
        cfg = make_style_transfer_config(
            optimization={"steps": 1, "normalize": False},
            video={"create_video": False},
        )
        result = stv_main.style_transfer(paths, cfg)
        import style_transfer_visualizer_tpu.image_io as stv_image_io

        style = stv_image_io.load_image_to_host_array(paths.style_path)
        np.testing.assert_allclose(
            np.asarray(patched_pipeline["style_img"]), style, atol=1e-6,
        )
        # Off: result keeps the (scaled) content colors verbatim — no
        # chroma substitution happened.
        content = stv_image_io.load_image_to_host_array(paths.content_path)
        np.testing.assert_allclose(
            np.asarray(result), content * 0.99, atol=1e-5,
        )


class FailingCloseWriter(StubWriter):
    def close(self) -> None:
        super().close()
        msg = "encode blew up"
        raise OSError(msg)


class TestSinkCloseAccounting:
    """A close failure in one sink must not mislabel the other's artifact."""

    @pytest.fixture
    def recorded_save(self, monkeypatch):
        saved: dict = {}

        def fake_save_outputs(img, metrics, out, elapsed, opts):
            saved["opts"] = opts

        monkeypatch.setattr(
            stv_main.stv_runtime, "save_outputs", fake_save_outputs,
        )
        return saved

    def _run_with_failing(
        self, patched_pipeline, make_input_paths,
        make_style_transfer_config, monkeypatch, *, failing: str,
    ):
        def fake_video_writer(cfg, out, name):
            w = FailingCloseWriter() if failing == "video" else StubWriter()
            patched_pipeline["writers"]["video"] = w
            return w

        def fake_gif_collector(cfg, out, name):
            w = FailingCloseWriter() if failing == "gif" else StubWriter()
            patched_pipeline["writers"]["gif"] = w
            return w

        monkeypatch.setattr(
            stv_main.stv_encode, "setup_video_writer", fake_video_writer,
        )
        monkeypatch.setattr(
            stv_main.stv_encode, "setup_gif_collector", fake_gif_collector,
        )
        cfg = make_style_transfer_config(
            optimization={"steps": 2},
            video={"create_video": True, "create_gif": True,
                   "save_every": 1, "intro_enabled": False,
                   "final_frame_compare": False},
        )
        with pytest.raises(OSError, match="encode blew up"):
            stv_main.style_transfer(make_input_paths(), cfg)

    def test_gif_close_failure_keeps_video_created(
        self, patched_pipeline, recorded_save, make_input_paths,
        make_style_transfer_config, monkeypatch,
    ) -> None:
        self._run_with_failing(
            patched_pipeline, make_input_paths, make_style_transfer_config,
            monkeypatch, failing="gif",
        )
        opts = recorded_save["opts"]
        assert opts.video_created is True
        assert opts.gif_created is False

    def test_video_close_failure_keeps_gif_created(
        self, patched_pipeline, recorded_save, make_input_paths,
        make_style_transfer_config, monkeypatch,
    ) -> None:
        self._run_with_failing(
            patched_pipeline, make_input_paths, make_style_transfer_config,
            monkeypatch, failing="video",
        )
        opts = recorded_save["opts"]
        assert opts.video_created is False
        assert opts.gif_created is True

    def test_both_sinks_closed_despite_first_failure(
        self, patched_pipeline, recorded_save, make_input_paths,
        make_style_transfer_config, monkeypatch,
    ) -> None:
        self._run_with_failing(
            patched_pipeline, make_input_paths, make_style_transfer_config,
            monkeypatch, failing="video",
        )
        assert patched_pipeline["writers"]["video"].closed
        assert patched_pipeline["writers"]["gif"].closed


class FakeRunner:
    """Capture OptimizationRunner wiring without running real steps."""

    captured: dict = {}
    latest_logged = None

    def __init__(self, update_fn, opt_state, input_img, config, **kwargs):
        FakeRunner.captured = dict(kwargs)
        FakeRunner.captured["input_img"] = input_img
        self._img = input_img

    def run(self):
        return self._img, {}, 0.0


class TestIntroWiring:
    """Intro segment metadata must reach the runner exactly as prepared."""

    @pytest.fixture
    def fake_runner(self, monkeypatch):
        FakeRunner.captured = {}
        monkeypatch.setattr(stv_main, "OptimizationRunner", FakeRunner)
        return FakeRunner

    def test_intro_info_propagates_to_runner(
        self, patched_pipeline, fake_runner, make_input_paths,
        make_style_transfer_config, monkeypatch,
    ) -> None:
        sentinel = np.full((64, 64, 3), 7, np.uint8)

        def fake_prepare_intro(cfg, writer, paths, gif_options=None):
            return sentinel, 5

        monkeypatch.setattr(
            stv_main.stv_segments, "prepare_intro_segment",
            fake_prepare_intro,
        )
        cfg = make_style_transfer_config(
            optimization={"steps": 1},
            video={"mode": "postprocess", "final_frame_compare": False},
        )
        stv_main.style_transfer(make_input_paths(), cfg)
        assert fake_runner.captured["intro_last_frame"] is sentinel
        assert fake_runner.captured["intro_crossfade_frames"] == 5

    def test_missing_intro_segment_handled(
        self, patched_pipeline, fake_runner, make_input_paths,
        make_style_transfer_config, monkeypatch,
    ) -> None:
        """prepare_intro_segment=None (e.g. intro disabled) -> no intro."""
        monkeypatch.setattr(
            stv_main.stv_segments, "prepare_intro_segment",
            lambda *a, **k: None,
        )
        cfg = make_style_transfer_config(
            optimization={"steps": 1},
            video={"mode": "postprocess", "final_frame_compare": False},
        )
        stv_main.style_transfer(make_input_paths(), cfg)
        assert fake_runner.captured["intro_last_frame"] is None
        assert fake_runner.captured["intro_crossfade_frames"] == 0

    def test_intro_not_prepared_without_any_sink_request(
        self, patched_pipeline, fake_runner, make_input_paths,
        make_style_transfer_config, monkeypatch,
    ) -> None:
        """No video writer + gif intro off -> intro work is skipped."""
        def boom(*a, **k):
            msg = "intro must not be prepared"
            raise AssertionError(msg)

        monkeypatch.setattr(
            stv_main.stv_segments, "prepare_intro_segment", boom,
        )
        cfg = make_style_transfer_config(
            optimization={"steps": 1},
            video={"create_video": False, "create_gif": True,
                   "gif_include_intro": False,
                   "final_frame_compare": False},
        )
        stv_main.style_transfer(make_input_paths(), cfg)
        assert fake_runner.captured["intro_last_frame"] is None

    def test_resume_start_step_clamped_to_steps(
        self, patched_pipeline, fake_runner, make_input_paths,
        make_style_transfer_config, monkeypatch, tmp_path,
    ) -> None:
        """A checkpoint past --steps resumes at steps, not beyond."""
        from style_transfer_visualizer_tpu.runtime import checkpoint

        restored = jnp.zeros((1, 64, 64, 3), jnp.float32)

        def fake_load(path, like):
            return checkpoint.Checkpoint(
                step=99, image=restored, opt_state=None,
            )

        monkeypatch.setattr(checkpoint, "load_checkpoint", fake_load)
        cfg = make_style_transfer_config(
            optimization={"steps": 3},
            video={"create_video": False},
            output={"resume_from": str(tmp_path / "ck.npz")},
        )
        stv_main.style_transfer(make_input_paths(), cfg)
        assert fake_runner.captured["start_step"] == 3
        assert fake_runner.captured["input_img"] is restored


class TestMaybeAppendFinalSegments:
    """Outro gating: final_frame_compare x sink availability."""

    @pytest.fixture
    def recorded_append(self, monkeypatch):
        calls: list = []

        def fake_append(cfg, writer, paths, final_frame, **kwargs):
            calls.append({"writer": writer, **kwargs})

        monkeypatch.setattr(
            stv_main.stv_segments, "append_final_comparison_frame",
            fake_append,
        )
        return calls

    def _gif_options(self, sink, *, outro: bool):
        return stv_main.stv_segments.GifSegmentOptions(
            sink=sink, include_intro=False, include_outro=outro,
        )

    def _call(self, cfg, writer, gif_options, tmp_path):
        from PIL import Image

        content = tmp_path / "c.png"
        style = tmp_path / "s.png"
        Image.new("RGB", (8, 8)).save(content)
        Image.new("RGB", (8, 8)).save(style)
        stv_main._maybe_append_final_segments(
            cfg.video, writer, gif_options, content, style,
            jnp.zeros((1, 8, 8, 3)), normalize=True,
        )

    def test_disabled_compare_skips(
        self, recorded_append, make_style_transfer_config, tmp_path,
    ) -> None:
        cfg = make_style_transfer_config(
            video={"final_frame_compare": False},
        )
        self._call(cfg, StubWriter(), None, tmp_path)
        assert recorded_append == []

    def test_no_sinks_skips(
        self, recorded_append, make_style_transfer_config, tmp_path,
    ) -> None:
        cfg = make_style_transfer_config(
            video={"final_frame_compare": True},
        )
        self._call(
            cfg, None, self._gif_options(StubWriter(), outro=False),
            tmp_path,
        )
        assert recorded_append == []

    def test_gif_outro_without_video_appends(
        self, recorded_append, make_style_transfer_config, tmp_path,
    ) -> None:
        """The reference's gif-outro-only path (test_main.py:794-896)."""
        cfg = make_style_transfer_config(
            video={"final_frame_compare": True},
        )
        sink = StubWriter()
        self._call(cfg, None, self._gif_options(sink, outro=True), tmp_path)
        assert len(recorded_append) == 1
        assert recorded_append[0]["gif_options"].sink is sink

    def test_video_without_gif_appends(
        self, recorded_append, make_style_transfer_config, tmp_path,
    ) -> None:
        cfg = make_style_transfer_config(
            video={"final_frame_compare": True},
        )
        writer = StubWriter()
        self._call(cfg, writer, None, tmp_path)
        assert len(recorded_append) == 1
        assert recorded_append[0]["writer"] is writer
        assert "gif_options" not in recorded_append[0]


class TestResolveTileRows:
    def _config(self, make_style_transfer_config, tile_rows):
        return make_style_transfer_config(
            optimization={"tile_rows": tile_rows, "style_layers": [0],
                          "content_layers": [2]},
        )

    def test_explicit_valid(self, make_style_transfer_config) -> None:
        cfg = self._config(make_style_transfer_config, 32)
        assert stv_main._resolve_tile_rows(cfg, 64, 64) == 32

    def test_explicit_invalid_raises(
        self, make_style_transfer_config,
    ) -> None:
        cfg = self._config(make_style_transfer_config, 48)
        with pytest.raises(ValueError, match="divisible by tile_rows"):
            stv_main._resolve_tile_rows(cfg, 64, 64)

    def test_explicit_zero_disables(
        self, make_style_transfer_config,
    ) -> None:
        cfg = self._config(make_style_transfer_config, 0)
        assert stv_main._resolve_tile_rows(cfg, 4096, 4096) == 0

    def test_auto_small_input_whole_image(
        self, make_style_transfer_config,
    ) -> None:
        cfg = self._config(make_style_transfer_config, -1)
        assert stv_main._resolve_tile_rows(cfg, 512, 512) == 0

    def test_auto_large_input_tiles(
        self, make_style_transfer_config, monkeypatch, caplog,
    ) -> None:
        import logging

        from style_transfer_visualizer_tpu.ops import tiled

        monkeypatch.setattr(
            tiled, "auto_tile_rows", lambda h, w, taps, table=None: 432,
        )
        cfg = self._config(make_style_transfer_config, -1)
        with caplog.at_level(logging.INFO):
            rows = stv_main._resolve_tile_rows(cfg, 2160, 3840)
        assert rows == 432
        assert "Auto-enabling banded" in caplog.text

    def test_auto_untileable_height_warns_whole_image(
        self, make_style_transfer_config, monkeypatch, caplog,
    ) -> None:
        import logging

        from style_transfer_visualizer_tpu.ops import tiled

        monkeypatch.setattr(
            tiled, "auto_tile_rows", lambda h, w, taps, table=None: None,
        )
        cfg = self._config(make_style_transfer_config, -1)
        with caplog.at_level(logging.WARNING):
            rows = stv_main._resolve_tile_rows(cfg, 2161, 3840)
        assert rows == 0
        assert "admits no exact band tiling" in caplog.text


class TestResolveBatchChunk:
    def _config(self, make_style_transfer_config, **kw):
        return make_style_transfer_config(**kw)

    def _bundle(self, *, chunked):
        class B:
            chunked_update_fn = (lambda *a: None) if chunked else None

        return B()

    def test_no_chunked_path_is_stepwise(
        self, make_style_transfer_config,
    ) -> None:
        cfg = self._config(make_style_transfer_config)
        assert stv_main._resolve_batch_chunk(
            self._bundle(chunked=False), cfg,
        ) == 1

    def test_explicit_one_disables(
        self, make_style_transfer_config,
    ) -> None:
        cfg = self._config(
            make_style_transfer_config,
            hardware={"steps_per_dispatch": 1},
        )
        assert stv_main._resolve_batch_chunk(
            self._bundle(chunked=True), cfg,
        ) == 1

    def test_unconstrained_uses_default(
        self, make_style_transfer_config,
    ) -> None:
        from style_transfer_visualizer_tpu.engine.runner import (
            DEFAULT_CHUNK,
        )

        cfg = self._config(
            make_style_transfer_config, video={"create_video": False},
        )
        assert stv_main._resolve_batch_chunk(
            self._bundle(chunked=True), cfg,
        ) == DEFAULT_CHUNK

    def test_checkpoint_cadence_folds(
        self, make_style_transfer_config,
    ) -> None:
        cfg = self._config(
            make_style_transfer_config,
            output={"checkpoint_every": 10},
        )
        assert stv_main._resolve_batch_chunk(
            self._bundle(chunked=True), cfg,
        ) == 10

    def test_gif_cadence_folds_with_checkpoint(
        self, make_style_transfer_config,
    ) -> None:
        cfg = self._config(
            make_style_transfer_config,
            output={"checkpoint_every": 4},
            video={"create_gif": True, "save_every": 6},
        )
        assert stv_main._resolve_batch_chunk(
            self._bundle(chunked=True), cfg,
        ) == 2

    def test_video_cadence_folds(
        self, make_style_transfer_config,
    ) -> None:
        """Batch MP4 frames need chunk boundaries on save_every too."""
        cfg = self._config(
            make_style_transfer_config,
            video={"create_video": True, "save_every": 15},
        )
        assert stv_main._resolve_batch_chunk(
            self._bundle(chunked=True), cfg,
        ) == 15

    def test_oversize_gcd_drops_to_divisor(
        self, make_style_transfer_config,
    ) -> None:
        from style_transfer_visualizer_tpu.engine.runner import _MAX_CHUNK

        cfg = self._config(
            make_style_transfer_config,
            output={"checkpoint_every": 120},
            video={"create_video": False},
        )
        chunk = stv_main._resolve_batch_chunk(
            self._bundle(chunked=True), cfg,
        )
        assert chunk <= _MAX_CHUNK
        assert 120 % chunk == 0
        assert chunk == 40  # largest divisor of 120 <= 50


class TestAutoRematBatched:
    """Batch remat keys on pixels x styles vs the measured HBM ceiling."""

    def test_sixteen_styles_512px_whole_activation(self) -> None:
        assert not stv_main._auto_remat_batched(512 * 512, 16)

    def test_twenty_four_styles_512px_whole_activation(self) -> None:
        assert not stv_main._auto_remat_batched(512 * 512, 24)

    def test_thirty_two_styles_512px_remats(self) -> None:
        assert stv_main._auto_remat_batched(512 * 512, 32)

    def test_high_res_few_styles_remats(self) -> None:
        assert stv_main._auto_remat_batched(1920 * 1088, 4)


class TestPrepareModelAndInput:
    def test_real_prepare_with_tiny_model(
        self, monkeypatch, make_style_transfer_config,
    ) -> None:
        import jax

        from style_transfer_visualizer_tpu.models import vgg19

        monkeypatch.setattr(
            stv_main,
            "load_pretrained_params",
            lambda *a, **kw: vgg19.init_random_params(jax.random.key(0)),
        )
        cfg = make_style_transfer_config(
            optimization={"steps": 1, "style_layers": [0],
                          "content_layers": [2], "init_method": "content"},
        )
        content = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.3
        style = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.7
        bundle, x0 = stv_main._prepare_model_and_input(
            content, style, cfg, jax.random.key(0),
        )
        np.testing.assert_array_equal(np.asarray(x0), np.asarray(content))
        x1, st, aux = bundle.update_fn(x0, bundle.opt_state)
        assert np.isfinite(float(aux.loss))


class TestPrepareModelAndInputBranches:
    """Threshold-gated branches of _prepare_model_and_input."""

    def _tiny_params(self, monkeypatch):
        import jax

        from style_transfer_visualizer_tpu.models import vgg19

        monkeypatch.setattr(
            stv_main,
            "load_pretrained_params",
            lambda *a, **kw: vgg19.init_random_params(jax.random.key(0)),
        )

    def test_auto_remat_over_threshold_logs(
        self, monkeypatch, make_style_transfer_config, caplog,
    ) -> None:
        import jax

        self._tiny_params(monkeypatch)
        # 64x64 = 4096 pixels; a 1024 threshold forces the auto path.
        monkeypatch.setattr(stv_main, "AUTO_REMAT_PIXEL_THRESHOLD", 1024)
        cfg = make_style_transfer_config(
            optimization={"steps": 1, "style_layers": [0],
                          "content_layers": [2], "init_method": "content"},
        )
        assert cfg.optimization.remat is False
        content = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.3
        style = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.7
        bundle, x0 = stv_main._prepare_model_and_input(
            content, style, cfg, jax.random.key(0),
        )
        assert "Auto-enabling feature rematerialization" in caplog.text
        _, _, aux = bundle.update_fn(x0, bundle.opt_state)
        assert np.isfinite(float(aux.loss))

    def test_tiled_style_autotile_and_pallas_gram_notice(
        self, monkeypatch, make_style_transfer_config, caplog,
    ) -> None:
        import jax

        self._tiny_params(monkeypatch)
        # Force the style image over the auto-tile threshold so its own
        # banding is resolved, and request the Pallas Gram backend so
        # the does-not-apply-while-tiling notice fires.
        monkeypatch.setattr(stv_main, "AUTO_TILE_PIXEL_THRESHOLD", 1)
        cfg = make_style_transfer_config(
            optimization={"steps": 1, "style_layers": [0, 5],
                          "content_layers": [2], "init_method": "content",
                          "tile_rows": 16},
            hardware={"gram_backend": "pallas"},
        )
        content = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.3
        style = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.7
        bundle, x0 = stv_main._prepare_model_and_input(
            content, style, cfg, jax.random.key(0),
        )
        assert "does not apply while tiling" in caplog.text
        _, _, aux = bundle.update_fn(x0, bundle.opt_state)
        assert np.isfinite(float(aux.loss))

    def test_spatial_platform_falls_back_to_default_backend(
        self, monkeypatch, make_style_transfer_config,
    ) -> None:
        """Without a pinned default device, jax.default_backend rules."""
        import jax

        self._tiny_params(monkeypatch)
        old = jax.config.jax_default_device
        jax.config.update("jax_default_device", None)
        try:
            cfg = make_style_transfer_config(
                optimization={"steps": 1, "style_layers": [0],
                              "content_layers": [2],
                              "init_method": "content"},
                hardware={"spatial_shards": 2},
            )
            content = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.3
            style = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.7
            bundle, x0 = stv_main._prepare_model_and_input(
                content, style, cfg, jax.random.key(0),
            )
            _, _, aux = bundle.update_fn(x0, bundle.opt_state)
            assert np.isfinite(float(aux.loss))
        finally:
            jax.config.update("jax_default_device", old)


class TestCustomCheckpointPathSingleRun:
    def test_checkpoint_written_to_custom_path(
        self, patched_pipeline, make_input_paths,
        make_style_transfer_config, tmp_path,
    ) -> None:
        ckpt = tmp_path / "elsewhere" / "single.npz"
        cfg = make_style_transfer_config(
            optimization={"steps": 4},
            output={"checkpoint_every": 2,
                    "checkpoint_path": str(ckpt)},
            video={"create_video": False},
        )
        stv_main.style_transfer(make_input_paths(), cfg)
        assert ckpt.exists()
        assert not (Path(cfg.output.output) / "checkpoint.npz").exists()


class TestPrepareBranchDirections:
    """Remaining one-way branches in _prepare_model_and_input."""

    def _tiny_params(self, monkeypatch):
        import jax

        from style_transfer_visualizer_tpu.models import vgg19

        monkeypatch.setattr(
            stv_main,
            "load_pretrained_params",
            lambda *a, **kw: vgg19.init_random_params(jax.random.key(0)),
        )

    def test_explicit_conv_backend_logs_nothing(
        self, monkeypatch, make_style_transfer_config, caplog,
    ) -> None:
        import jax

        self._tiny_params(monkeypatch)
        cfg = make_style_transfer_config(
            optimization={"steps": 1, "style_layers": [0],
                          "content_layers": [2], "init_method": "content"},
            hardware={"conv_backend": "xla"},
        )
        content = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.3
        style = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.7
        bundle, x0 = stv_main._prepare_model_and_input(
            content, style, cfg, jax.random.key(0),
        )
        assert "Conv backend resolved" not in caplog.text
        _, _, aux = bundle.update_fn(x0, bundle.opt_state)
        assert np.isfinite(float(aux.loss))

    def test_forced_remat_single_run(
        self, monkeypatch, make_style_transfer_config,
    ) -> None:
        import jax

        self._tiny_params(monkeypatch)
        cfg = make_style_transfer_config(
            optimization={"steps": 1, "style_layers": [0],
                          "content_layers": [2], "init_method": "content",
                          "remat": True},
        )
        content = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.3
        style = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.7
        bundle, x0 = stv_main._prepare_model_and_input(
            content, style, cfg, jax.random.key(0),
        )
        _, _, aux = bundle.update_fn(x0, bundle.opt_state)
        assert np.isfinite(float(aux.loss))
