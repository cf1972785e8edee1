"""Media pipeline: mode heuristic, segments, encoders, async stream."""
from __future__ import annotations

import time
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from style_transfer_visualizer_tpu.config import VideoConfig
from style_transfer_visualizer_tpu.media import encode, modes, segments
from style_transfer_visualizer_tpu.media.sinks import ensure_rgb_uint8
from style_transfer_visualizer_tpu.media.stream import AsyncFrameStream


class MemorySink:
    def __init__(self) -> None:
        self.frames: list[np.ndarray] = []
        self._size: tuple[int, int] | None = None

    def append_data(self, frame: np.ndarray) -> None:
        self.frames.append(np.array(frame))
        self._size = (frame.shape[1], frame.shape[0])

    def close(self) -> None:
        pass


def _video_cfg(**kw) -> VideoConfig:
    return VideoConfig.model_validate(kw)


class TestEnsureRgbUint8:
    def test_valid_passthrough(self, sample_frame) -> None:
        out = ensure_rgb_uint8(sample_frame)
        np.testing.assert_array_equal(out, sample_frame)

    def test_float_coerced(self) -> None:
        frame = np.full((4, 4, 3), 254.6, np.float32)
        out = ensure_rgb_uint8(frame)
        assert out.dtype == np.uint8
        assert out[0, 0, 0] == 255

    def test_bad_shape(self) -> None:
        with pytest.raises(ValueError, match="RGB"):
            ensure_rgb_uint8(np.zeros((4, 4), np.uint8))


class TestBlending:
    def test_blend_midpoint(self) -> None:
        a = np.zeros((2, 2, 3), np.uint8)
        b = np.full((2, 2, 3), 200, np.uint8)
        mid = segments.blend_frames(a, b, 0.5)
        assert int(mid[0, 0, 0]) == 100

    def test_blend_shape_mismatch(self) -> None:
        with pytest.raises(ValueError, match="share shape"):
            segments.blend_frames(
                np.zeros((2, 2, 3), np.uint8),
                np.zeros((3, 3, 3), np.uint8),
                0.5,
            )

    def test_fade_counts(self) -> None:
        sink = MemorySink()
        a = np.zeros((2, 2, 3), np.uint8)
        b = np.full((2, 2, 3), 255, np.uint8)
        segments.append_fade_transition(sink, a, b, 4)
        assert len(sink.frames) == 4
        np.testing.assert_array_equal(sink.frames[-1], b)  # ends on target

    def test_fade_zero_frames_emits_end(self) -> None:
        sink = MemorySink()
        b = np.full((2, 2, 3), 9, np.uint8)
        segments.append_fade_transition(
            sink, np.zeros_like(b), b, 0,
        )
        assert len(sink.frames) == 1

    def test_crossfade_excludes_endpoints(self) -> None:
        sink = MemorySink()
        a = np.zeros((2, 2, 3), np.uint8)
        b = np.full((2, 2, 3), 100, np.uint8)
        segments.append_crossfade(sink, a, b, 4)
        assert len(sink.frames) == 4
        assert 0 < int(sink.frames[0][0, 0, 0]) < 100
        assert 0 < int(sink.frames[-1][0, 0, 0]) < 100

    def test_crossfade_capped(self) -> None:
        sink = MemorySink()
        segments.append_crossfade(
            sink,
            np.zeros((2, 2, 3), np.uint8),
            np.ones((2, 2, 3), np.uint8),
            100,
            max_frames=5,
        )
        assert len(sink.frames) == 5

    def test_crossfade_zero_noop(self) -> None:
        sink = MemorySink()
        segments.append_crossfade(
            sink, np.zeros((2, 2, 3), np.uint8),
            np.ones((2, 2, 3), np.uint8), 0,
        )
        assert sink.frames == []


class TestModeHeuristic:
    SIZE_HD = (1920, 1080)

    def _select(self, cfg, size, steps):
        return modes.select_video_mode(
            cfg, frame_size=size, total_steps=steps,
        )

    def test_short_run_stays_realtime(self) -> None:
        mode, reason, est = self._select(
            _video_cfg(save_every=20), self.SIZE_HD, 1500,
        )
        assert mode == "realtime"
        assert reason is None
        assert est == 75

    def test_long_run_promotes(self) -> None:
        mode, reason, est = self._select(
            _video_cfg(save_every=1), self.SIZE_HD, 2400,
        )
        assert mode == "postprocess"
        assert "long-run" in reason
        assert est == 2400

    def test_ultra_res_promotes(self) -> None:
        mode, reason, _ = self._select(
            _video_cfg(save_every=10), (3840, 2160), 2800,
        )
        assert mode == "postprocess"
        assert "4K-class" in reason

    def test_high_res_promotes(self) -> None:
        mode, reason, _ = self._select(
            _video_cfg(save_every=1), (2560, 1440), 2000,
        )
        assert mode == "postprocess"
        assert "high-res" in reason

    def test_high_fps_promotes(self) -> None:
        mode, reason, _ = self._select(
            _video_cfg(save_every=1, fps=48), self.SIZE_HD, 2000,
        )
        assert mode == "postprocess"
        assert "fps" in reason

    def test_dense_sampling_promotes(self) -> None:
        mode, reason, _ = self._select(
            _video_cfg(save_every=5), self.SIZE_HD, 10000,
        )
        assert mode == "postprocess"
        assert "--save-every" in reason

    def test_explicit_mode_wins(self) -> None:
        cfg = _video_cfg(save_every=1, mode="realtime")
        cfg.mode_override = True
        mode, reason, _ = self._select(cfg, self.SIZE_HD, 99999)
        assert mode == "realtime"
        assert reason is None

    def test_postprocess_mode_passthrough(self) -> None:
        cfg = _video_cfg(mode="postprocess")
        mode, reason, _ = self._select(cfg, self.SIZE_HD, 10)
        assert mode == "postprocess"
        assert reason is None

    def test_zero_estimated_frames(self) -> None:
        mode, _, est = self._select(
            _video_cfg(save_every=100), self.SIZE_HD, 50,
        )
        assert mode == "realtime"
        assert est == 0


@pytest.fixture
def image_pair(tmp_path: Path) -> tuple[Path, Path]:
    content = tmp_path / "c.png"
    style = tmp_path / "s.png"
    Image.new("RGB", (96, 80), (20, 180, 20)).save(content)
    Image.new("RGB", (64, 64), (20, 20, 180)).save(style)
    return content, style


class TestIntroSegment:
    def test_disabled_returns_none(self, image_pair) -> None:
        cfg = _video_cfg(intro_enabled=False)
        assert segments.prepare_intro_segment(
            cfg, MemorySink(), image_pair,
        ) is None

    def test_no_sinks_returns_none(self, image_pair) -> None:
        cfg = _video_cfg()
        assert segments.prepare_intro_segment(cfg, None, image_pair) is None

    def test_fade_and_hold_counts(self, image_pair) -> None:
        sink = MemorySink()
        cfg = _video_cfg(fps=10, intro_duration_seconds=2.0)
        result = segments.prepare_intro_segment(cfg, sink, image_pair)
        assert result is not None
        intro_frame, crossfade = result
        # fade: fps*1s = 10 frames; hold: fps*2s = 20 frames
        assert len(sink.frames) == 30
        assert crossfade == 5  # fps * 0.5s
        assert intro_frame.shape == (80, 96, 3)
        np.testing.assert_array_equal(sink.frames[-1], intro_frame)

    def test_gif_receives_intro_when_requested(self, image_pair) -> None:
        gif = MemorySink()
        cfg = _video_cfg(fps=4, intro_duration_seconds=1.0)
        opts = segments.GifSegmentOptions(sink=gif, include_intro=True)
        result = segments.prepare_intro_segment(
            cfg, None, image_pair, gif_options=opts,
        )
        assert result is not None
        assert len(gif.frames) == 4 + 4  # fade + hold

    def test_small_content_upscaled_for_render(self, tmp_path) -> None:
        content = tmp_path / "small_c.png"
        style = tmp_path / "small_s.png"
        Image.new("RGB", (64, 64), "red").save(content)
        Image.new("RGB", (64, 64), "blue").save(style)
        frame = segments.build_intro_frame(content, style)
        assert frame.shape == (64, 64, 3)  # resized back to content size


class TestOutroSegment:
    def test_disabled_noop(self, image_pair, sample_frame) -> None:
        cfg = _video_cfg(final_frame_compare=False)
        sink = MemorySink()
        segments.append_final_comparison_frame(
            cfg, sink, image_pair, sample_frame,
        )
        assert sink.frames == []

    def test_sequence_counts(self, image_pair) -> None:
        sink = MemorySink()
        cfg = _video_cfg(fps=4, outro_duration_seconds=2.0)
        last = np.full((80, 96, 3), 90, np.uint8)
        segments.append_final_comparison_frame(
            cfg, sink, image_pair, last,
        )
        # hold last: 4 frames; crossfade: 2; outro hold: 8
        assert len(sink.frames) == 4 + 2 + 8
        np.testing.assert_array_equal(sink.frames[0], last)

    def test_writer_size_respected(self, image_pair) -> None:
        sink = MemorySink()
        sink._size = (128, 112)  # pretend encoder output dims
        cfg = _video_cfg(fps=2, outro_duration_seconds=1.0)
        last = np.full((80, 96, 3), 90, np.uint8)
        segments.append_final_comparison_frame(
            cfg, sink, image_pair, last,
        )
        assert sink.frames[-1].shape == (112, 128, 3)

    def test_gif_outro(self, image_pair) -> None:
        gif = MemorySink()
        cfg = _video_cfg(fps=2, outro_duration_seconds=1.0)
        opts = segments.GifSegmentOptions(sink=gif, include_outro=True)
        segments.append_final_comparison_frame(
            cfg, None, image_pair,
            np.zeros((80, 96, 3), np.uint8), gif_options=opts,
        )
        assert gif.frames


class TestPostprocessWriter:
    def test_spills_then_errors_after_close(
        self, tmp_path, sample_frame, monkeypatch,
    ) -> None:
        monkeypatch.setattr(encode, "ffmpeg_available", lambda: True)
        cfg = _video_cfg()
        out = tmp_path / "v.mp4"
        writer = encode.PostprocessVideoWriter(cfg, out)
        writer.append_data(sample_frame)
        writer.append_data(sample_frame)
        spill_dirs = list(tmp_path.glob("stv_frames_*"))
        assert len(spill_dirs) == 1
        assert len(list(spill_dirs[0].iterdir())) == 2
        assert writer._size == (64, 48)

        # ffmpeg disappearing between init and close: cleanup still runs.
        monkeypatch.setattr(encode, "ffmpeg_available", lambda: False)
        with pytest.raises(RuntimeError, match="ffmpeg"):
            writer.close()
        assert not spill_dirs[0].exists()
        with pytest.raises(RuntimeError, match="closed"):
            writer.append_data(sample_frame)

    def test_close_empty_noop(self, tmp_path, monkeypatch) -> None:
        monkeypatch.setattr(encode, "ffmpeg_available", lambda: True)
        writer = encode.PostprocessVideoWriter(
            _video_cfg(), tmp_path / "v.mp4",
        )
        writer.close()  # no frames -> no encode attempt, no error
        writer.close()  # idempotent


class TestGifCollector:
    def test_real_gif_roundtrip(self, tmp_path) -> None:
        out = tmp_path / "t.gif"
        collector = encode.GifFrameCollector(out, fps=5)
        # Distinct frames: Pillow merges identical consecutive GIF frames.
        for value in (0, 120, 250):
            collector.append_data(
                np.full((48, 64, 3), value, np.uint8),
            )
        collector.close()
        assert out.exists()
        with Image.open(out) as gif:
            assert gif.n_frames == 3
        assert not list(tmp_path.glob("stv_gif_*"))

    def test_append_after_close_raises(self, tmp_path, sample_frame) -> None:
        collector = encode.GifFrameCollector(tmp_path / "t.gif", fps=5)
        collector.close()
        with pytest.raises(RuntimeError, match="closed"):
            collector.append_data(sample_frame)

    def test_frame_duration_encodes_fps(self, tmp_path) -> None:
        """fps=5 must land as 200 ms GIF frames — the writer's duration
        unit is milliseconds; seconds would silently produce 0 ms."""
        out = tmp_path / "t.gif"
        collector = encode.GifFrameCollector(out, fps=5)
        for value in (0, 250):
            collector.append_data(np.full((16, 16, 3), value, np.uint8))
        collector.close()
        with Image.open(out) as gif:
            assert gif.info["duration"] == 200


class TestSetupFunctions:
    def test_video_disabled(self, tmp_path) -> None:
        assert encode.setup_video_writer(
            _video_cfg(create_video=False), tmp_path, "v.mp4",
        ) is None

    def test_postprocess_writer_selected(self, tmp_path, monkeypatch) -> None:
        monkeypatch.setattr(encode, "ffmpeg_available", lambda: True)
        writer = encode.setup_video_writer(
            _video_cfg(mode="postprocess"), tmp_path, "v.mp4",
        )
        assert isinstance(writer, encode.PostprocessVideoWriter)
        writer.close()

    def test_realtime_requires_ffmpeg(self, tmp_path, monkeypatch) -> None:
        monkeypatch.setattr(encode, "ffmpeg_available", lambda: False)
        with pytest.raises(RuntimeError, match="ffmpeg"):
            encode.setup_video_writer(_video_cfg(), tmp_path, "v.mp4")

    def test_gif_disabled(self, tmp_path) -> None:
        assert encode.setup_gif_collector(
            _video_cfg(create_gif=False), tmp_path, "t.gif",
        ) is None

    def test_gif_enabled(self, tmp_path) -> None:
        collector = encode.setup_gif_collector(
            _video_cfg(create_gif=True), tmp_path, "t.gif",
        )
        assert isinstance(collector, encode.GifFrameCollector)
        collector.close()


class TestQualityMapping:
    def test_best_quality_lowest_crf(self) -> None:
        assert encode.quality_to_crf(10) == 0
        assert encode.quality_to_crf(1) == 45  # int-truncated, as imageio

    def test_metadata_args(self) -> None:
        args = encode.build_mp4_metadata_args("My Title", None)
        joined = " ".join(args)
        assert "title=My Title" in joined
        assert "artist=Style Transfer Visualizer" in joined
        assert "creation_time=" in joined
        assert "encoder=style_transfer_visualizer v" in joined


class TestAsyncFrameStream:
    def test_fifo_order_preserved(self) -> None:
        stream = AsyncFrameStream(max_queue=2)
        delivered: list[int] = []
        for i in range(10):
            frame = np.full((2, 2, 3), i, np.uint8)
            stream.submit(
                frame,
                lambda f, i=i: (time.sleep(0.001), delivered.append(i)),
            )
        stream.close()
        assert delivered == list(range(10))

    def test_error_propagates_on_close(self) -> None:
        stream = AsyncFrameStream()

        def boom(frame):
            raise ValueError("sink exploded")

        stream.submit(np.zeros((2, 2, 3), np.uint8), boom)
        with pytest.raises(ValueError, match="sink exploded"):
            stream.close()

    def test_submit_after_close_raises(self) -> None:
        stream = AsyncFrameStream()
        stream.close()
        with pytest.raises(RuntimeError, match="after stream close"):
            stream.submit(np.zeros((2, 2, 3), np.uint8), lambda f: None)

    def test_drain_blocks_until_delivered(self) -> None:
        stream = AsyncFrameStream()
        delivered = []
        stream.submit(
            np.zeros((2, 2, 3), np.uint8),
            lambda f: (time.sleep(0.05), delivered.append(1)),
        )
        stream.drain()
        assert delivered == [1]
        stream.close()


class _FakeProc:
    def __init__(self, cmd):
        self.cmd = cmd
        self.stdin = __import__("io").BytesIO()
        self.returncode = 0
        self._closed = False

    def wait(self):
        return self.returncode

    def communicate(self):
        return b"", b""


class TestFfmpegPipeWriter:
    @pytest.fixture
    def fake_ffmpeg(self, monkeypatch):
        procs = []

        def fake_popen(cmd, stdin=None, stderr=None):
            proc = _FakeProc(cmd)
            procs.append(proc)
            return proc

        monkeypatch.setattr(encode, "ffmpeg_available", lambda: True)
        monkeypatch.setattr(encode.subprocess, "Popen", fake_popen)
        return procs

    def test_spawn_args_and_frame_bytes(
        self, fake_ffmpeg, tmp_path, sample_frame,
    ) -> None:
        cfg = _video_cfg(fps=24, quality=10, metadata_title="T")
        writer = encode.FfmpegPipeWriter(cfg, tmp_path / "v.mp4")
        writer.append_data(sample_frame)  # 64x48
        cmd = fake_ffmpeg[0].cmd
        joined = " ".join(cmd)
        assert "-s 64x48" in joined
        assert "-r 24" in joined
        assert "-vcodec libx264" in joined
        assert "-crf 0" in joined  # quality 10 -> crf 0
        assert "title=T" in joined
        # 64x48 not macroblock-aligned in height: scaled to 64x48? 48 is
        # a multiple of 16, 64 too -> no scale filter.
        assert "scale=" not in joined
        assert (
            len(fake_ffmpeg[0].stdin.getvalue())
            == sample_frame.size
        )
        writer.close()
        assert writer._size == (64, 48)

    def test_macroblock_scaling(self, fake_ffmpeg, tmp_path) -> None:
        cfg = _video_cfg()
        writer = encode.FfmpegPipeWriter(cfg, tmp_path / "v.mp4")
        writer.append_data(np.zeros((50, 70, 3), np.uint8))
        joined = " ".join(fake_ffmpeg[0].cmd)
        assert "scale=80:64" in joined  # padded up to multiples of 16
        # _size is the ACCEPTED INPUT size (outro frames are built to it
        # and appended); alignment is internal to the encoder.
        assert writer._size == (70, 50)
        writer.close()

    def test_outro_roundtrip_with_unaligned_size(
        self, fake_ffmpeg, tmp_path,
    ) -> None:
        """Outro frames built at writer._size must be accepted (the
        aligned-output-size bug crashed every non-multiple-of-16 run)."""
        from PIL import Image

        content = tmp_path / "c.png"
        style = tmp_path / "s.png"
        Image.new("RGB", (100, 100), (0, 200, 0)).save(content)
        Image.new("RGB", (100, 100), (0, 0, 200)).save(style)
        cfg = _video_cfg(fps=2, outro_duration_seconds=1.0)
        writer = encode.FfmpegPipeWriter(cfg, tmp_path / "v.mp4")
        writer.append_data(np.zeros((100, 100, 3), np.uint8))
        segments.append_final_comparison_frame(
            cfg, writer, (content, style),
            np.zeros((100, 100, 3), np.uint8),
        )
        writer.close()

    def test_frame_size_change_rejected(
        self, fake_ffmpeg, tmp_path, sample_frame,
    ) -> None:
        writer = encode.FfmpegPipeWriter(_video_cfg(), tmp_path / "v.mp4")
        writer.append_data(sample_frame)
        with pytest.raises(ValueError, match="does not match"):
            writer.append_data(np.zeros((32, 32, 3), np.uint8))

    def test_append_after_close(self, fake_ffmpeg, tmp_path, sample_frame):
        writer = encode.FfmpegPipeWriter(_video_cfg(), tmp_path / "v.mp4")
        writer.append_data(sample_frame)
        writer.close()
        with pytest.raises(RuntimeError, match="closed"):
            writer.append_data(sample_frame)

    def test_missing_binary_raises(self, monkeypatch, tmp_path) -> None:
        monkeypatch.setattr(encode, "ffmpeg_available", lambda: False)
        with pytest.raises(RuntimeError, match="ffmpeg binary not found"):
            encode.FfmpegPipeWriter(_video_cfg(), tmp_path / "v.mp4")


class TestEncodeFailureModes:
    def test_postprocess_requires_ffmpeg_upfront(
        self, tmp_path, monkeypatch,
    ) -> None:
        monkeypatch.setattr(encode, "ffmpeg_available", lambda: False)
        with pytest.raises(RuntimeError, match="ffmpeg binary not found"):
            encode.PostprocessVideoWriter(_video_cfg(), tmp_path / "v.mp4")

    def test_nonzero_exit_raises(self, tmp_path, monkeypatch, sample_frame):
        class FailingProc(_FakeProc):
            def wait(self):
                self.returncode = 1
                return 1

        monkeypatch.setattr(encode, "ffmpeg_available", lambda: True)
        monkeypatch.setattr(
            encode.subprocess, "Popen",
            lambda cmd, stdin=None, stderr=None: FailingProc(cmd),
        )
        writer = encode.FfmpegPipeWriter(_video_cfg(), tmp_path / "v.mp4")
        writer.append_data(sample_frame)
        with pytest.raises(OSError, match="ffmpeg exited with 1"):
            writer.close()

    def test_quality_crf_truncates_like_imageio(self) -> None:
        assert encode.quality_to_crf(4) == 30
        assert encode.quality_to_crf(1) == 45
        assert encode.quality_to_crf(10) == 0


class TestStreamErrorOnSubmit:
    def test_pending_error_surfaces_on_next_submit(self) -> None:
        stream = AsyncFrameStream()

        def boom(frame):
            raise ValueError("sink exploded")

        stream.submit(np.zeros((2, 2, 3), np.uint8), boom)
        time.sleep(0.1)  # let the worker consume and record the error
        with pytest.raises(ValueError, match="sink exploded"):
            stream.submit(np.zeros((2, 2, 3), np.uint8), lambda f: None)


class TestModeHeuristicGuards:
    """Degenerate inputs stay realtime (reference video.py:649-660)."""

    def test_save_every_zero_never_promotes(self) -> None:
        # The schema forbids save_every<1; the heuristic still guards
        # against it for internal callers that disable frames outright.
        cfg = _video_cfg()
        object.__setattr__(cfg, "save_every", 0)
        mode, reason, frames = modes.select_video_mode(
            cfg, frame_size=(3840, 2160), total_steps=10_000_000,
        )
        assert (mode, reason, frames) == ("realtime", None, 0)

    def test_zero_estimated_frames_never_promotes(self) -> None:
        cfg = _video_cfg(save_every=100)
        mode, reason, frames = modes.select_video_mode(
            cfg, frame_size=(3840, 2160), total_steps=50,
        )
        assert (mode, reason, frames) == ("realtime", None, 0)

    def test_nonpositive_frame_dims_never_promote(self) -> None:
        cfg = _video_cfg(save_every=1)
        mode, reason, _ = modes.select_video_mode(
            cfg, frame_size=(0, 2160), total_steps=10_000_000,
        )
        assert (mode, reason) == ("realtime", None)


class TestWriterCloseEdges:
    def test_pipe_writer_close_without_frames_is_noop(
        self, tmp_path, monkeypatch,
    ) -> None:
        monkeypatch.setattr(encode, "ffmpeg_available", lambda: True)
        writer = encode.FfmpegPipeWriter(_video_cfg(), tmp_path / "v.mp4")
        writer.close()  # never spawned ffmpeg
        writer.close()  # idempotent
        assert not (tmp_path / "v.mp4").exists()

    def test_postprocess_close_encodes_spilled_frames(
        self, tmp_path, monkeypatch, sample_frame,
    ) -> None:
        monkeypatch.setattr(encode, "ffmpeg_available", lambda: True)

        class RecordingWriter:
            instances: list[RecordingWriter] = []

            def __init__(self, config, output_path) -> None:
                self.frames: list[np.ndarray] = []
                self.closed = False
                RecordingWriter.instances.append(self)

            def append_data(self, frame) -> None:
                self.frames.append(np.array(frame))

            def close(self) -> None:
                self.closed = True

        monkeypatch.setattr(encode, "FfmpegPipeWriter", RecordingWriter)
        writer = encode.PostprocessVideoWriter(
            _video_cfg(), tmp_path / "v.mp4",
        )
        writer.append_data(sample_frame)
        writer.append_data(sample_frame)
        spill_dir = writer._temp_dir
        writer.close()
        (encoder,) = RecordingWriter.instances
        assert len(encoder.frames) == 2
        np.testing.assert_array_equal(encoder.frames[0], sample_frame)
        assert encoder.closed
        assert not spill_dir.exists()
        writer.close()  # idempotent after encode

    def test_gif_collector_close_idempotent(
        self, tmp_path, sample_frame,
    ) -> None:
        gif = encode.GifFrameCollector(tmp_path / "t.gif", fps=5)
        gif.append_data(sample_frame)
        gif.close()
        gif.close()
        assert (tmp_path / "t.gif").exists()

    def test_unsupported_video_mode_rejected(
        self, tmp_path, monkeypatch,
    ) -> None:
        monkeypatch.setattr(encode, "ffmpeg_available", lambda: True)
        cfg = _video_cfg(create_video=True)
        object.__setattr__(cfg, "mode", "broadcast")
        with pytest.raises(ValueError, match="Unsupported video mode"):
            encode.setup_video_writer(cfg, tmp_path, "v.mp4")


class TestStreamCloseEdges:
    def test_double_close_is_noop(self) -> None:
        stream = AsyncFrameStream()
        stream.submit(np.zeros((2, 2, 3), np.uint8), lambda f: None)
        stream.close()
        stream.close()


class TestBlendFallbacks:
    def test_numpy_path_when_native_unavailable(self, monkeypatch) -> None:
        monkeypatch.setattr(segments, "_frameops", False)
        a = np.zeros((4, 4, 3), np.uint8)
        b = np.full((4, 4, 3), 100, np.uint8)
        out = segments.blend_frames(a, b, 0.25)
        assert int(out[0, 0, 0]) == 25

    def test_failed_native_import_cached_as_false(self, monkeypatch) -> None:
        import sys

        from style_transfer_visualizer_tpu import native as native_pkg

        monkeypatch.setattr(segments, "_frameops", None)
        monkeypatch.setitem(
            sys.modules,
            "style_transfer_visualizer_tpu.native.frameops",
            None,
        )
        monkeypatch.delattr(native_pkg, "frameops", raising=False)
        a = np.zeros((2, 2, 3), np.uint8)
        b = np.full((2, 2, 3), 80, np.uint8)
        out = segments.blend_frames(a, b, 0.5)
        assert int(out[0, 0, 0]) == 40
        assert segments._frameops is False


def test_intro_frame_rejects_degenerate_content(monkeypatch) -> None:
    """Zero-dimension content (corrupt/truncated file) fails loudly."""

    class FakeImg:
        size = (0, 64)

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    monkeypatch.setattr(segments.Image, "open", lambda _p: FakeImg())
    with pytest.raises(ValueError, match="invalid dimensions"):
        segments.build_intro_frame(Path("c.png"), Path("s.png"))


class TestBranchDirections:
    """One-way branch directions flagged by the branch coverage tool."""

    def test_intro_frame_no_resize_at_native_size(self, tmp_path) -> None:
        """Content already >= the render minimum skips both upscales."""
        content = tmp_path / "c128.png"
        style = tmp_path / "s128.png"
        Image.new("RGB", (128, 128), "red").save(content)
        Image.new("RGB", (128, 128), "blue").save(style)
        frame = segments.build_intro_frame(content, style)
        assert frame.shape == (128, 128, 3)

    def test_outro_frame_no_resize_at_writer_min(self, tmp_path) -> None:
        """A 512px writer matches the render floor exactly: no resize."""
        content = tmp_path / "c.png"
        style = tmp_path / "s.png"
        Image.new("RGB", (64, 64), "red").save(content)
        Image.new("RGB", (64, 64), "blue").save(style)
        from style_transfer_visualizer_tpu.image_grid.core import (
            FrameParams,
        )

        out = segments.build_outro_frame(
            (content, style),
            Image.new("RGB", (512, 512), "green"),
            FrameParams(),
            target_width=512,
            target_height=512,
        )
        assert out.shape == (512, 512, 3)

    def test_outro_render_cached_across_same_size_sinks(
        self, image_pair, monkeypatch,
    ) -> None:
        calls = {"n": 0}
        real = segments.build_outro_frame

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(segments, "build_outro_frame", counting)
        vid, gif = MemorySink(), MemorySink()
        last = np.full((64, 64, 3), 128, np.uint8)
        vid.append_data(last)
        gif.append_data(last)
        cfg = _video_cfg(fps=2, outro_duration_seconds=1.0)
        segments.append_final_comparison_frame(
            cfg, vid, image_pair, last,
            gif_options=segments.GifSegmentOptions(
                sink=gif, include_outro=True,
            ),
        )
        assert calls["n"] == 1  # second sink reuses the cached render

    def test_metadata_args_use_explicit_title_and_artist(self) -> None:
        from style_transfer_visualizer_tpu.media.encode import (
            build_mp4_metadata_args,
        )

        args = build_mp4_metadata_args("My Title", "Me")
        joined = " ".join(args)
        assert "title=My Title" in joined
        assert "artist=Me" in joined

    def test_frame_validator_custom_message(self) -> None:
        with pytest.raises(ValueError, match="custom boom"):
            ensure_rgb_uint8(
                np.zeros((4, 4), np.uint8), message="custom boom",
            )

    def test_stream_skips_delivery_after_error(self) -> None:
        from style_transfer_visualizer_tpu.media.stream import (
            AsyncFrameStream,
        )

        import threading

        delivered = []
        gate = threading.Event()

        def bad(frame) -> None:
            # Hold the worker until the second frame is enqueued so the
            # poisoned-stream skip is deterministic.
            gate.wait(timeout=5)
            raise ValueError("first delivery fails")

        stream = AsyncFrameStream()
        stream.submit(np.zeros((2, 2, 3), np.uint8), bad)
        stream.submit(np.ones((2, 2, 3), np.uint8), delivered.append)
        gate.set()
        # The second frame is consumed but never delivered.
        with pytest.raises(ValueError, match="first delivery fails"):
            stream.close()
        assert delivered == []


class TestModeHeuristicSecondClauses:
    """Area/fps matches whose frame counts stay under the thresholds."""

    def test_4k_area_under_frame_threshold_stays_realtime(self) -> None:
        cfg = _video_cfg(save_every=1)
        mode, reason, frames = modes.select_video_mode(
            cfg, frame_size=(3840, 2160), total_steps=100,
        )
        assert (mode, reason, frames) == ("realtime", None, 100)

    def test_high_res_under_frame_threshold_stays_realtime(self) -> None:
        cfg = _video_cfg(save_every=10)
        mode, reason, frames = modes.select_video_mode(
            cfg, frame_size=(2560, 1440), total_steps=2000,
        )
        assert (mode, reason, frames) == ("realtime", None, 200)

    def test_high_fps_under_frame_threshold_stays_realtime(self) -> None:
        cfg = _video_cfg(save_every=10, fps=60)
        mode, reason, frames = modes.select_video_mode(
            cfg, frame_size=(640, 480), total_steps=1000,
        )
        assert (mode, reason, frames) == ("realtime", None, 100)


class TestResolveWriterDimensionsFallback:
    def test_nonpositive_writer_size_falls_back_to_frame(self) -> None:
        """A writer advertising degenerate dims (0x0) must not zero the
        outro canvas; the last frame's own shape wins."""
        sink = MemorySink()
        sink._size = (0, 0)
        last = np.full((80, 96, 3), 90, np.uint8)
        last_rgb, w, h = segments.resolve_writer_dimensions(sink, last)
        assert (w, h) == (96, 80)
        np.testing.assert_array_equal(last_rgb, last)
