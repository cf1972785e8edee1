"""Video decoding boundary and video-in/video-out sequence wiring."""
from __future__ import annotations

import io
from pathlib import Path

import jax
import numpy as np
import pytest
from PIL import Image

import style_transfer_visualizer_tpu.media.decode as decode
import style_transfer_visualizer_tpu.sequence as seq
import style_transfer_visualizer_tpu.sequence_cli as seq_cli
from style_transfer_visualizer_tpu.models import vgg19

# Distinct solid palette colors survive GIF quantization exactly.
_COLORS = ((255, 0, 0), (0, 255, 0), (0, 0, 255))


def make_gif(path: Path, *, size: int = 64, duration_ms: int = 100) -> Path:
    frames = [Image.new("RGB", (size, size), c) for c in _COLORS]
    frames[0].save(
        path, save_all=True, append_images=frames[1:],
        duration=duration_ms, loop=0,
    )
    return path


@pytest.fixture
def gif_clip(tmp_path: Path) -> Path:
    return make_gif(tmp_path / "clip.gif")


@pytest.fixture
def style_file(tmp_path: Path) -> Path:
    p = tmp_path / "style.png"
    Image.new("RGB", (64, 64), (200, 30, 30)).save(p)
    return p


class TestIsVideoFile:
    def test_gif_file(self, gif_clip: Path) -> None:
        assert decode.is_video_file(gif_clip)

    def test_directory_is_not(self, tmp_path: Path) -> None:
        assert not decode.is_video_file(tmp_path)

    def test_png_is_not(self, style_file: Path) -> None:
        assert not decode.is_video_file(style_file)

    def test_missing_mp4_is_not(self, tmp_path: Path) -> None:
        assert not decode.is_video_file(tmp_path / "missing.mp4")


class TestPilProbe:
    def test_gif_geometry(self, gif_clip: Path) -> None:
        info = decode.probe_video(gif_clip)
        assert (info.width, info.height) == (64, 64)
        assert info.n_frames == 3
        assert info.fps == pytest.approx(10.0)

    def test_missing_file(self, tmp_path: Path) -> None:
        with pytest.raises(FileNotFoundError, match="Video file not found"):
            decode.probe_video(tmp_path / "nope.gif")

    def test_unspecified_duration_falls_back(self, tmp_path: Path) -> None:
        clip = make_gif(tmp_path / "c.gif", duration_ms=0)
        assert decode.probe_video(clip).fps == pytest.approx(10.0)


class TestPilFrames:
    def test_iter_yields_rgb_frames_in_order(self, gif_clip: Path) -> None:
        frames = list(decode.iter_video_frames(gif_clip))
        assert len(frames) == 3
        for frame, color in zip(frames, _COLORS, strict=True):
            assert frame.shape == (64, 64, 3)
            assert frame.dtype == np.uint8
            assert tuple(frame[0, 0]) == color

    def test_extract_writes_ordered_pngs(
        self, gif_clip: Path, tmp_path: Path,
    ) -> None:
        out = decode.extract_frames(gif_clip, tmp_path / "frames")
        assert [p.name for p in out] == [
            "frame_00000.png", "frame_00001.png", "frame_00002.png",
        ]
        with Image.open(out[1]) as img:
            assert img.getpixel((0, 0)) == _COLORS[1]
        # discover_frames reproduces the extraction order.
        assert seq.discover_frames(tmp_path / "frames") == out

    def test_extract_stride_and_cap(
        self, gif_clip: Path, tmp_path: Path,
    ) -> None:
        strided = decode.extract_frames(
            gif_clip, tmp_path / "s", stride=2,
        )
        assert len(strided) == 2  # frames 0 and 2
        with Image.open(strided[1]) as img:
            assert img.getpixel((0, 0)) == _COLORS[2]
        capped = decode.extract_frames(
            gif_clip, tmp_path / "c", max_frames=1,
        )
        assert len(capped) == 1

    def test_extract_rejects_bad_stride(
        self, gif_clip: Path, tmp_path: Path,
    ) -> None:
        with pytest.raises(ValueError, match="stride must be >= 1"):
            decode.extract_frames(gif_clip, tmp_path / "x", stride=0)

    def test_extract_empty_clip_raises(
        self, tmp_path: Path, monkeypatch,
    ) -> None:
        clip = make_gif(tmp_path / "c.gif")
        monkeypatch.setattr(
            decode, "iter_video_frames", lambda _p: iter(()),
        )
        with pytest.raises(ValueError, match="No frames decoded"):
            decode.extract_frames(clip, tmp_path / "out")


_FFMPEG_STDERR = """Input #0, mov,mp4,m4a,3gp,3g2,mj2, from 'clip.mp4':
  Duration: 00:00:01.00, start: 0.000000, bitrate: 100 kb/s
  Stream #0:0[0x1](und): Video: h264 (High), yuv420p(progressive), \
640x360 [SAR 1:1 DAR 16:9], 25 fps, 25 tbr, 12800 tbn (default)
At least one output file must be specified
"""


class _FakeCompleted:
    def __init__(self, stderr: str) -> None:
        self.stderr = stderr
        self.returncode = 1


class TestFfmpegProbe:
    def test_requires_ffmpeg(self, tmp_path: Path, monkeypatch) -> None:
        clip = tmp_path / "clip.mp4"
        clip.write_bytes(b"not really a video")
        monkeypatch.setattr(decode, "ffmpeg_available", lambda: False)
        with pytest.raises(RuntimeError, match="requires an ffmpeg binary"):
            decode.probe_video(clip)

    def test_parses_stream_line(self, tmp_path: Path, monkeypatch) -> None:
        clip = tmp_path / "clip.mp4"
        clip.write_bytes(b"x")
        monkeypatch.setattr(decode, "ffmpeg_available", lambda: True)
        monkeypatch.setattr(
            decode.subprocess, "run",
            lambda *a, **k: _FakeCompleted(_FFMPEG_STDERR),
        )
        info = decode.probe_video(clip)
        assert info == decode.VideoInfo(640, 360, 25.0, None)

    def test_zero_fps_stream_falls_back_to_default(
        self, tmp_path: Path, monkeypatch,
    ) -> None:
        """A '0 fps' stream line takes the default rate, not 0."""
        clip = tmp_path / "clip.mp4"
        clip.write_bytes(b"x")
        monkeypatch.setattr(decode, "ffmpeg_available", lambda: True)
        monkeypatch.setattr(
            decode.subprocess, "run",
            lambda *a, **k: _FakeCompleted(
                "Stream #0:0: Video: h264, yuv420p, 640x360, 0 fps",
            ),
        )
        info = decode.probe_video(clip)
        assert info.fps == pytest.approx(10.0)

    def test_no_video_stream(self, tmp_path: Path, monkeypatch) -> None:
        clip = tmp_path / "clip.mp4"
        clip.write_bytes(b"x")
        monkeypatch.setattr(decode, "ffmpeg_available", lambda: True)
        monkeypatch.setattr(
            decode.subprocess, "run",
            lambda *a, **k: _FakeCompleted("Audio: aac only"),
        )
        with pytest.raises(ValueError, match="no video stream"):
            decode.probe_video(clip)

    def test_unparsable_dimensions(self, tmp_path: Path, monkeypatch) -> None:
        clip = tmp_path / "clip.mp4"
        clip.write_bytes(b"x")
        monkeypatch.setattr(decode, "ffmpeg_available", lambda: True)
        monkeypatch.setattr(
            decode.subprocess, "run",
            lambda *a, **k: _FakeCompleted("Stream: Video: h264, weird"),
        )
        with pytest.raises(ValueError, match="dimensions"):
            decode.probe_video(clip)

    def test_fps_fallback(self, tmp_path: Path, monkeypatch) -> None:
        clip = tmp_path / "clip.mp4"
        clip.write_bytes(b"x")
        monkeypatch.setattr(decode, "ffmpeg_available", lambda: True)
        monkeypatch.setattr(
            decode.subprocess, "run",
            lambda *a, **k: _FakeCompleted("Stream: Video: h264, 32x16,"),
        )
        assert decode.probe_video(clip).fps == pytest.approx(10.0)


class _FakePopen:
    """Stands in for the rawvideo decode pipe."""

    def __init__(self, stdout_bytes: bytes, returncode: int = 0) -> None:
        self.stdout = io.BytesIO(stdout_bytes)
        self._returncode = returncode

    def wait(self) -> int:
        return self._returncode


class TestFfmpegFrames:
    def _patch(self, monkeypatch, fake: _FakePopen) -> None:
        monkeypatch.setattr(decode, "ffmpeg_available", lambda: True)
        monkeypatch.setattr(
            decode.subprocess, "Popen", lambda *a, **k: fake,
        )

    def test_yields_frames(self, tmp_path: Path, monkeypatch) -> None:
        info = decode.VideoInfo(2, 2, 10.0, None)
        raw = bytes(range(12)) + bytes(range(12, 24))
        self._patch(monkeypatch, _FakePopen(raw))
        frames = list(decode._iter_ffmpeg_frames(tmp_path / "c.mp4", info))
        assert len(frames) == 2
        assert frames[0].shape == (2, 2, 3)
        assert frames[0][0, 0, 0] == 0
        assert frames[1][1, 1, 2] == 23

    def test_truncated_frame(self, tmp_path: Path, monkeypatch) -> None:
        info = decode.VideoInfo(2, 2, 10.0, None)
        self._patch(monkeypatch, _FakePopen(b"12345"))
        with pytest.raises(ValueError, match="Truncated frame"):
            list(decode._iter_ffmpeg_frames(tmp_path / "c.mp4", info))

    def test_decoder_failure_reports_stderr(
        self, tmp_path: Path, monkeypatch,
    ) -> None:
        info = decode.VideoInfo(2, 2, 10.0, None)
        self._patch(monkeypatch, _FakePopen(b"", returncode=3))
        with pytest.raises(RuntimeError, match="ffmpeg decode"):
            list(decode._iter_ffmpeg_frames(tmp_path / "c.mp4", info))

    def test_iter_video_frames_routes_containers_to_ffmpeg(
        self, tmp_path: Path, monkeypatch,
    ) -> None:
        clip = tmp_path / "c.mp4"
        clip.write_bytes(b"x")
        monkeypatch.setattr(
            decode, "probe_video", lambda _p: decode.VideoInfo(2, 1, 10.0, None),
        )
        self._patch(monkeypatch, _FakePopen(bytes(6)))
        frames = list(decode.iter_video_frames(clip))
        assert len(frames) == 1
        assert frames[0].shape == (1, 2, 3)


class TestSequenceVideoInput:
    def test_gif_in_gif_out(
        self, gif_clip, style_file, make_style_transfer_config, tmp_path,
    ) -> None:
        cfg = make_style_transfer_config(
            optimization={
                "steps": 1, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "init_method": "content",
            },
        )
        params = vgg19.init_random_params(jax.random.key(0))
        out_dir = tmp_path / "out"
        result = seq.stylize_sequence(
            gif_clip, style_file, cfg, out_dir, params=params,
            output_video="restyled.gif",
        )
        assert len(result.frame_paths) == 3
        clip = out_dir / "restyled.gif"
        assert clip.exists()
        with Image.open(clip) as img:
            assert img.n_frames == 3
            # Output rate defaults to the SOURCE clip's 10 fps.
            assert img.info["duration"] == 100
        # The decoded-frame tempdir is removed after the run.
        assert not list(out_dir.glob("_decoded_frames_*"))

    def test_explicit_output_fps_wins(
        self, gif_clip, style_file, make_style_transfer_config, tmp_path,
    ) -> None:
        cfg = make_style_transfer_config(
            optimization={
                "steps": 1, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "init_method": "content",
            },
        )
        params = vgg19.init_random_params(jax.random.key(0))
        out_dir = tmp_path / "out"
        seq.stylize_sequence(
            gif_clip, style_file, cfg, out_dir, params=params,
            output_video="restyled.gif", output_fps=5.0, max_frames=2,
        )
        with Image.open(out_dir / "restyled.gif") as img:
            assert img.n_frames == 2
            assert img.info["duration"] == 200

    def test_directory_stride_and_cap(
        self, style_file, make_style_transfer_config, tmp_path,
    ) -> None:
        frames_dir = tmp_path / "frames"
        frames_dir.mkdir()
        for i in range(5):
            Image.new("RGB", (64, 64), (10 * i, 0, 0)).save(
                frames_dir / f"frame_{i}.png",
            )
        cfg = make_style_transfer_config(
            optimization={
                "steps": 1, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "init_method": "content",
            },
        )
        params = vgg19.init_random_params(jax.random.key(0))
        result = seq.stylize_sequence(
            frames_dir, style_file, cfg, tmp_path / "o", params=params,
            frame_stride=2, max_frames=2,
        )
        # Frames 0 and 2 survive the stride; the cap stops there.
        assert [p.name for p in result.frame_paths] == [
            "stylized_frame_0.png", "stylized_frame_2.png",
        ]

    def test_stride_past_everything_raises(
        self, style_file, make_style_transfer_config, tmp_path,
    ) -> None:
        frames_dir = tmp_path / "frames"
        frames_dir.mkdir()
        Image.new("RGB", (64, 64), "red").save(frames_dir / "f.png")
        cfg = make_style_transfer_config()
        with pytest.raises(ValueError, match="after striding"):
            seq.stylize_sequence(
                frames_dir, style_file, cfg, tmp_path / "o",
                params=vgg19.init_random_params(jax.random.key(0)),
                max_frames=0,
            )

    def test_mp4_output_requires_ffmpeg(
        self, gif_clip, style_file, make_style_transfer_config, tmp_path,
        monkeypatch,
    ) -> None:
        import style_transfer_visualizer_tpu.media.encode as encode

        monkeypatch.setattr(encode, "ffmpeg_available", lambda: False)
        cfg = make_style_transfer_config(
            optimization={
                "steps": 1, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "init_method": "content",
            },
        )
        params = vgg19.init_random_params(jax.random.key(0))
        with pytest.raises(RuntimeError, match="ffmpeg"):
            seq.stylize_sequence(
                gif_clip, style_file, cfg, tmp_path / "o", params=params,
                output_video="restyled.mp4", max_frames=1,
            )

    def test_unsupported_output_suffix(
        self, gif_clip, style_file, make_style_transfer_config, tmp_path,
    ) -> None:
        cfg = make_style_transfer_config(
            optimization={
                "steps": 1, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "init_method": "content",
            },
        )
        params = vgg19.init_random_params(jax.random.key(0))
        with pytest.raises(ValueError, match="Unsupported --output-video"):
            seq.stylize_sequence(
                gif_clip, style_file, cfg, tmp_path / "o", params=params,
                output_video="restyled.txt", max_frames=1,
            )


class TestSequenceCliVideoFlags:
    def test_flags_forward(
        self, gif_clip, style_file, tmp_path, monkeypatch,
    ) -> None:
        captured: dict = {}

        def fake_stylize(frames, style, cfg, out, **kw):
            captured.update(kw, frames=frames)
            return seq.SequenceResult(frame_paths=[], total_steps=0)

        monkeypatch.setattr(seq_cli, "stylize_sequence", fake_stylize)
        rc = seq_cli.main([
            "--frames", str(gif_clip),
            "--style", str(style_file),
            "--output", str(tmp_path / "o"),
            "--output-video", "restyled.mp4",
            "--max-frames", "4",
            "--frame-stride", "2",
            "--fps", "12",
            "--allow-random-weights",
        ])
        assert rc == 0
        assert captured["frames"] == str(gif_clip)
        assert captured["output_video"] == "restyled.mp4"
        assert captured["max_frames"] == 4
        assert captured["frame_stride"] == 2
        assert captured["output_fps"] == 12.0

    def test_fps_defaults_to_none(
        self, gif_clip, style_file, tmp_path, monkeypatch,
    ) -> None:
        captured: dict = {}

        def fake_stylize(frames, style, cfg, out, **kw):
            captured.update(kw)
            return seq.SequenceResult(frame_paths=[], total_steps=0)

        monkeypatch.setattr(seq_cli, "stylize_sequence", fake_stylize)
        seq_cli.main([
            "--frames", str(gif_clip),
            "--style", str(style_file),
            "--output", str(tmp_path / "o"),
            "--allow-random-weights",
        ])
        assert captured["output_fps"] is None
        assert captured["output_video"] is None
