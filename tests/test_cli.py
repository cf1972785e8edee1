"""Main CLI: parser contract, merge behavior, end-to-end subprocess run."""
from __future__ import annotations

import argparse
import logging
import subprocess
import sys
from pathlib import Path

import pytest

import style_transfer_visualizer_tpu.cli as stv_cli
from style_transfer_visualizer_tpu.config import (
    StyleTransferConfig,
    build_config_from_cli,
)


def _parse(argv: list[str]) -> argparse.Namespace:
    return stv_cli.build_arg_parser().parse_args(argv)


class TestParser:
    def test_suppress_defaults(self) -> None:
        args = _parse(["--content", "c.png", "--style", "s.png"])
        assert not hasattr(args, "steps")
        assert not hasattr(args, "output")
        assert not hasattr(args, "video_mode")
        assert args.log_every == 10  # real default (not suppressed)

    def test_all_groups_parse(self) -> None:
        args = _parse([
            "--content", "c.png", "--style", "s.png",
            "--output", "o", "--no-plot", "--log-loss", "l.csv",
            "--log-every", "5", "--compare-inputs", "--compare-result",
            "--steps", "10", "--style-w", "2.0", "--content-w", "3.0",
            "--lr", "0.5", "--init-method", "white", "--seed", "7",
            "--no-normalize", "--style-layers", "0,5",
            "--content-layers", "21", "--optimizer", "adam",
            "--allow-random-weights",
            "--save-every", "4", "--fps", "24", "--quality", "7",
            "--no-video", "--final-only", "--no-intro",
            "--intro-duration", "3", "--no-final-frame-compare",
            "--outro-duration", "4", "--metadata-title", "T",
            "--metadata-artist", "A", "--gif", "--gif-include-intro",
            "--gif-include-outro", "--video-mode", "postprocess",
            "--device", "cpu", "--precision", "default",
        ])
        assert args.steps == 10
        assert args.optimizer == "adam"
        assert args.create_gif is True
        assert args.final_frame_compare is False
        assert args.video_mode == "postprocess"
        assert args.precision == "default"

    def test_gif_flag_conflict_last_wins(self) -> None:
        args = _parse([
            "--content", "c", "--style", "s", "--gif", "--no-gif",
        ])
        assert args.create_gif is False

    def test_invalid_choice_rejected(self) -> None:
        with pytest.raises(SystemExit):
            _parse([
                "--content", "c", "--style", "s",
                "--init-method", "zeros",
            ])


class TestMainEntry:
    def test_requires_content_and_style(self, monkeypatch, capsys) -> None:
        monkeypatch.setattr(sys, "argv", ["style-visualizer"])
        with pytest.raises(SystemExit) as exc:
            stv_cli.main()
        assert exc.value.code == 2
        assert "--content" in capsys.readouterr().err

    def test_validate_config_only_exits_zero(
        self, monkeypatch, tmp_path, caplog,
    ) -> None:
        toml = tmp_path / "c.toml"
        toml.write_text("[optimization]\nsteps = 2\n")
        monkeypatch.setattr(
            sys, "argv",
            ["style-visualizer", "--config", str(toml),
             "--validate-config-only"],
        )
        with pytest.raises(SystemExit) as exc:
            stv_cli.main()
        assert exc.value.code == 0
        assert "validated successfully" in caplog.text

    def test_validate_config_only_requires_config(
        self, monkeypatch, capsys,
    ) -> None:
        monkeypatch.setattr(
            sys, "argv", ["style-visualizer", "--validate-config-only"],
        )
        with pytest.raises(SystemExit) as exc:
            stv_cli.main()
        assert exc.value.code == 2
        assert "requires --config" in capsys.readouterr().err

    def test_styles_routes_to_batch_pipeline(
        self, monkeypatch, content_image, style_image, caplog,
    ) -> None:
        called = {}

        def fake_batch(content, styles, cfg):
            called["content"] = content
            called["styles"] = styles
            return []

        monkeypatch.setattr(
            stv_cli.stv_main, "multi_style_transfer", fake_batch,
        )
        args = _parse([
            "--content", str(content_image),
            "--styles", f"{style_image}, ,{style_image}",
            "--device", "cpu",
        ])
        stv_cli.run_from_args(args)
        assert "Multi-style batch" in caplog.text
        # Empty segments are dropped; the rest arrive in order.
        assert called["styles"] == [str(style_image), str(style_image)]

    def test_run_from_args_invokes_pipeline(
        self, monkeypatch, content_image, style_image, caplog,
    ) -> None:
        called = {}

        def fake_style_transfer(paths, cfg):
            called["paths"] = paths
            called["cfg"] = cfg

        monkeypatch.setattr(
            stv_cli.stv_main, "style_transfer", fake_style_transfer,
        )
        args = _parse([
            "--content", str(content_image), "--style", str(style_image),
            "--steps", "3", "--device", "cpu",
        ])
        stv_cli.run_from_args(args)
        assert called["cfg"].optimization.steps == 3
        assert called["paths"].content_path == str(content_image)
        assert "Steps: 3" in caplog.text
        assert "Optimizer: lbfgs" in caplog.text

    def test_comparisons_requested(
        self, monkeypatch, content_image, style_image, tmp_path,
    ) -> None:
        monkeypatch.setattr(
            stv_cli.stv_main, "style_transfer", lambda p, c: None,
        )
        recorded = {}

        def fake_render(**kwargs):
            recorded.update(kwargs)
            return []

        monkeypatch.setattr(
            stv_cli, "render_requested_comparisons", fake_render,
        )
        args = _parse([
            "--content", str(content_image), "--style", str(style_image),
            "--output", str(tmp_path), "--compare-inputs",
        ])
        stv_cli.run_from_args(args)
        assert recorded["request"].include_inputs is True
        assert recorded["request"].include_result is False


@pytest.mark.integration
class TestEndToEnd:
    def test_subprocess_final_only_run(self, tmp_path: Path) -> None:
        """The real CLI binary on tiny images must exit 0 in <180s."""
        from PIL import Image

        content = tmp_path / "c.png"
        style = tmp_path / "s.png"
        Image.new("RGB", (64, 64), (0, 180, 0)).save(content)
        Image.new("RGB", (64, 64), (0, 0, 180)).save(style)
        out_dir = tmp_path / "out"

        code = (
            "import jax; jax.config.update('jax_platforms','cpu');"
            "import sys; sys.argv=["
            f"'style-visualizer','--content',r'{content}',"
            f"'--style',r'{style}','--steps','2','--final-only',"
            f"'--device','cpu','--allow-random-weights',"
            f"'--output',r'{out_dir}','--no-plot'];"
            "from style_transfer_visualizer_tpu.cli import main; main()"
        )
        result = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=180,
            check=False,
        )
        assert result.returncode == 0, result.stderr[-2000:]
        assert "Style transfer completed" in result.stderr
        assert (out_dir / "stylized_c_x_s.png").exists()


class TestParseIntListExport:
    def test_reexport(self) -> None:
        assert stv_cli.parse_int_list("1,2") == [1, 2]


class TestLogParameters:
    def test_parallel_and_dispatch_settings_logged(
        self, caplog, content_image, style_image,
    ) -> None:
        from style_transfer_visualizer_tpu.type_defs import InputPaths

        cfg = StyleTransferConfig.model_validate({
            "hardware": {"spatial_shards": 2, "steps_per_dispatch": 5},
            "optimization": {"tile_rows": 2},
        })
        args = argparse.Namespace(config="run.toml")
        stv_cli.log_parameters(
            InputPaths(str(content_image), str(style_image)), cfg, args,
        )
        assert "Loaded config from: run.toml" in caplog.text
        assert "Spatial Shards: 2" in caplog.text
        assert "Tile Rows: 2" in caplog.text
        assert "Steps per Dispatch: 5" in caplog.text

    def test_lap_and_explicit_coarse_logged(
        self, caplog, content_image, style_image,
    ) -> None:
        from style_transfer_visualizer_tpu.type_defs import InputPaths

        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "lap_w": 2.5, "lap_pool": 8, "coarse_steps": 40,
                "pyramid_levels": 3,
            },
        })
        args = argparse.Namespace(config=None)
        stv_cli.log_parameters(
            InputPaths(str(content_image), str(style_image)), cfg, args,
        )
        assert "Laplacian Weight: 2.5 (pool 8)" in caplog.text
        assert (
            "Coarse Warm Start: 40 steps across 2 pyramid level(s)"
            in caplog.text
        )
        # coarse_steps=0 (explicitly disabled) logs no warm-start line.
        caplog.clear()
        cfg.optimization.coarse_steps = 0
        stv_cli.log_parameters(
            InputPaths(str(content_image), str(style_image)), cfg, args,
        )
        assert "Coarse Warm Start" not in caplog.text

    def test_gif_details_logged_when_enabled(
        self, caplog, content_image, style_image,
    ) -> None:
        from style_transfer_visualizer_tpu.type_defs import InputPaths

        cfg = StyleTransferConfig.model_validate(
            {"video": {"create_gif": True, "gif_include_intro": True}},
        )
        args = argparse.Namespace(config=None)
        stv_cli.log_parameters(
            InputPaths(str(content_image), str(style_image)), cfg, args,
        )
        assert "GIF Intro Included: Yes" in caplog.text
        assert "GIF Outro Included: No" in caplog.text

    def test_style_layer_weights_logged_when_set(
        self, caplog, content_image, style_image,
    ) -> None:
        from style_transfer_visualizer_tpu.type_defs import InputPaths

        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "style_layers": [0, 5],
                "style_layer_weights": [1.0, 0.5],
            },
        })
        args = argparse.Namespace(config=None)
        stv_cli.log_parameters(
            InputPaths(str(content_image), str(style_image)), cfg, args,
        )
        assert "Style Layer Weights: [1.0, 0.5]" in caplog.text


class TestMultiStyleCli:
    def test_styles_routes_to_multi(
        self, monkeypatch, content_image, style_image, tmp_path,
    ) -> None:
        called = {}

        def fake_multi(content, styles, cfg):
            called["content"] = content
            called["styles"] = styles
            return []

        monkeypatch.setattr(
            stv_cli.stv_main, "multi_style_transfer", fake_multi,
        )
        args = _parse([
            "--content", str(content_image),
            "--styles", f"{style_image}, {style_image}",
            "--device", "cpu",
        ])
        stv_cli.run_from_args(args)
        assert called["content"] == str(content_image)
        assert len(called["styles"]) == 2

    def test_real_multi_style_run(self, tmp_path: Path) -> None:
        """End-to-end multi-style batch on the CPU mesh (2 styles)."""
        import jax
        import jax.numpy as jnp
        from PIL import Image

        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content = tmp_path / "c.png"
        s1 = tmp_path / "s1.png"
        s2 = tmp_path / "s2.png"
        Image.new("RGB", (64, 64), (0, 180, 0)).save(content)
        Image.new("RGB", (64, 64), (180, 0, 0)).save(s1)
        Image.new("RGB", (64, 64), (0, 0, 180)).save(s2)

        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 2, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "allow_random_weights": True, "init_method": "content",
            },
            "hardware": {"device": "cpu"},
            "output": {"output": str(tmp_path / "out")},
            "video": {"create_video": False},
        })
        saved = multi_style_transfer(
            str(content), [str(s1), str(s2)], cfg,
        )
        assert [p.name for p in saved] == [
            "stylized_c_x_s1.png", "stylized_c_x_s2.png",
        ]
        for p in saved:
            assert p.exists()


class TestMultiStyleDeviceFit:
    def test_style_axis_is_largest_divisor(self, tmp_path, monkeypatch):
        """3 styles on 8 devices -> 3-wide style axis (largest divisor)."""
        import jax
        import jax.numpy as jnp
        from PIL import Image

        from style_transfer_visualizer_tpu.config import (
    StyleTransferConfig,
    build_config_from_cli,
)
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content = tmp_path / "c.png"
        Image.new("RGB", (64, 64), (0, 180, 0)).save(content)
        styles = []
        for i in range(3):
            p = tmp_path / f"s{i}.png"
            Image.new("RGB", (64, 64), (60 * i, 0, 180)).save(p)
            styles.append(str(p))

        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 1, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "allow_random_weights": True, "init_method": "content",
            },
            "hardware": {"device": "cpu"},
            "output": {"output": str(tmp_path / "out")},
            "video": {"create_video": False},
        })
        saved = multi_style_transfer(str(content), styles, cfg)
        assert len(saved) == 3


class TestMultiStylePreserveColor:
    """--preserve-color through the batch (multi-style) orchestrator."""

    def test_luminance_outputs_keep_content_chroma(self, tmp_path) -> None:
        import numpy as np
        from PIL import Image

        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )
        from style_transfer_visualizer_tpu.main import multi_style_transfer
        from style_transfer_visualizer_tpu.ops.color import rgb_to_yiq

        content = tmp_path / "c.png"
        s1 = tmp_path / "s1.png"
        s2 = tmp_path / "s2.png"
        # Mid-range content palette: chroma assertions stay in gamut.
        Image.new("RGB", (64, 64), (60, 150, 80)).save(content)
        Image.new("RGB", (64, 64), (180, 0, 0)).save(s1)
        Image.new("RGB", (64, 64), (0, 0, 180)).save(s2)

        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 2, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "allow_random_weights": True, "init_method": "content",
                "preserve_color": "luminance",
            },
            "hardware": {"device": "cpu"},
            "output": {"output": str(tmp_path / "out")},
            "video": {"create_video": False},
        })
        saved = multi_style_transfer(
            str(content), [str(s1), str(s2)], cfg,
        )

        def chroma(path):
            arr = np.asarray(Image.open(path)).astype(np.float32) / 255.0
            return np.asarray(rgb_to_yiq(arr))[..., 1:]

        assert len(saved) == 2
        for p in saved:
            np.testing.assert_allclose(
                chroma(p), chroma(content), atol=0.03,
            )


class TestMultiStyleArtifacts:
    """Batch mode keeps the logging/checkpoint contract (sans video)."""

    def _setup(self, tmp_path):
        from PIL import Image

        content = tmp_path / "c.png"
        s1 = tmp_path / "s1.png"
        s2 = tmp_path / "s2.png"
        Image.new("RGB", (64, 64), (0, 180, 0)).save(content)
        Image.new("RGB", (64, 64), (180, 0, 0)).save(s1)
        Image.new("RGB", (64, 64), (0, 0, 180)).save(s2)
        return content, [s1, s2]

    def _config(self, tmp_path, **output):
        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )

        return StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 4, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "allow_random_weights": True, "init_method": "content",
            },
            "hardware": {"device": "cpu"},
            "output": {
                "output": str(tmp_path / "out"),
                "log_every": 2,
                **output,
            },
            # The container has no ffmpeg; MP4-path tests enable video
            # explicitly against stub writers.
            "video": {"create_video": False},
        })

    def test_per_style_csv_logging(self, tmp_path) -> None:
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        cfg = self._config(
            tmp_path, log_loss=str(tmp_path / "out" / "losses.csv"),
        )
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        for name in ("losses_s1.csv", "losses_s2.csv"):
            csv_file = tmp_path / "out" / name
            assert csv_file.exists()
            lines = csv_file.read_text().strip().splitlines()
            assert lines[0] == "step,style_loss,content_loss,total_loss"
            assert len(lines) == 3  # header + steps 2 and 4

    def test_per_style_loss_plots(self, tmp_path) -> None:
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        assert (tmp_path / "out" / "loss_plot_s1.png").exists()
        assert (tmp_path / "out" / "loss_plot_s2.png").exists()

    def test_chunked_dispatch_logs_interior_steps(self, tmp_path) -> None:
        """One 4-step dispatch still emits CSV rows for interior steps."""
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        cfg = self._config(
            tmp_path, log_loss=str(tmp_path / "out" / "losses.csv"),
        )
        cfg.hardware.steps_per_dispatch = 4
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        for name in ("losses_s1.csv", "losses_s2.csv"):
            lines = (
                (tmp_path / "out" / name).read_text().strip().splitlines()
            )
            # Steps 2 (interior to the chunk) and 4 (boundary).
            assert [ln.split(",")[0] for ln in lines] == [
                "step", "2", "4",
            ]

    def test_chunked_dispatch_matches_stepwise(self, tmp_path) -> None:
        """k scanned batch steps produce the same PNGs as k eager steps."""
        import numpy as np
        from PIL import Image

        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        results = {}
        for label, per_dispatch in (("eager", 1), ("chunked", 4)):
            cfg = self._config(tmp_path)
            cfg.output.output = str(tmp_path / f"out_{label}")
            cfg.hardware.steps_per_dispatch = per_dispatch
            saved = multi_style_transfer(
                str(content), [str(s) for s in styles], cfg,
            )
            results[label] = [
                np.asarray(Image.open(p), dtype=np.int16) for p in saved
            ]
        for eager, chunked in zip(results["eager"], results["chunked"]):
            # uint8 pixels; allow 1 count of scan-vs-eager rounding drift.
            assert np.abs(eager - chunked).max() <= 1

    def test_checkpoint_and_resume(self, tmp_path) -> None:
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path, checkpoint_every=2)
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        ckpt = tmp_path / "out" / "checkpoint.npz"
        assert ckpt.exists()

        cfg2 = self._config(
            tmp_path, checkpoint_every=2, resume_from=str(ckpt),
        )
        saved = multi_style_transfer(
            str(content), [str(s) for s in styles], cfg2,
        )
        assert all(p.exists() for p in saved)

    def test_video_promotes_to_postprocess_per_style(
        self, tmp_path, caplog, monkeypatch,
    ) -> None:
        """Batch MP4 rides per-style postprocess writers, never realtime."""
        import logging

        from style_transfer_visualizer_tpu import main as stv_main
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        writers: dict[str, object] = {}

        class StubWriter:
            def __init__(self) -> None:
                self.frames: list = []
                self.closed = False

            def append_data(self, frame) -> None:
                self.frames.append(frame)

            def close(self) -> None:
                self.closed = True

        def fake_setup(video_cfg, out_dir, name):
            assert video_cfg.mode == "postprocess"
            writers[name] = StubWriter()
            return writers[name]

        monkeypatch.setattr(
            stv_main.stv_encode, "setup_video_writer", fake_setup,
        )
        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        cfg.video.create_video = True
        cfg.video.mode = "realtime"
        cfg.video.save_every = 2
        cfg.video.final_frame_compare = False  # isolate the cadence
        cfg.video.intro_enabled = False
        with caplog.at_level(logging.INFO):
            multi_style_transfer(
                str(content), [str(s) for s in styles], cfg,
            )
        assert "promoting" in caplog.text
        assert sorted(writers) == [
            "timelapse_c_x_s1.mp4", "timelapse_c_x_s2.mp4",
        ]
        for writer in writers.values():
            assert len(writer.frames) == 2  # steps 2 and 4
            assert writer.closed

    def test_video_without_ffmpeg_fails_fast(self, tmp_path) -> None:
        """No ffmpeg -> postprocess writer raises before optimization."""
        import pytest

        from style_transfer_visualizer_tpu.main import multi_style_transfer
        from style_transfer_visualizer_tpu.media import encode

        if encode.ffmpeg_available():  # pragma: no cover - env-dependent
            pytest.skip("ffmpeg present; fail-fast path not reachable")
        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        cfg.video.create_video = True
        with pytest.raises(RuntimeError, match="ffmpeg"):
            multi_style_transfer(
                str(content), [str(s) for s in styles], cfg,
            )

    def test_per_style_gifs(self, tmp_path) -> None:
        """--gif in batch mode yields one timelapse GIF per style."""
        from PIL import Image

        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        cfg.video.create_gif = True
        cfg.video.save_every = 2
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        for name in ("timelapse_c_x_s1.gif", "timelapse_c_x_s2.gif"):
            gif = tmp_path / "out" / name
            assert gif.exists()
            with Image.open(gif) as img:
                assert img.n_frames == 2  # steps 2 and 4

    def test_gif_ends_on_final_image_off_cadence(self, tmp_path) -> None:
        """steps=3, save_every=2: frames at step 2 plus the final image."""
        import numpy as np
        from PIL import Image

        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        cfg.optimization.steps = 3
        cfg.video.create_gif = True
        cfg.video.save_every = 2
        saved = multi_style_transfer(
            str(content), [str(s) for s in styles], cfg,
        )
        for i, name in enumerate(
            ("timelapse_c_x_s1.gif", "timelapse_c_x_s2.gif"),
        ):
            with Image.open(tmp_path / "out" / name) as img:
                assert img.n_frames == 2
                img.seek(img.n_frames - 1)
                last = np.asarray(img.convert("RGB"), dtype=np.int16)
            final = np.asarray(
                Image.open(saved[i]), dtype=np.int16,
            )
            # GIF palette quantization costs a few counts per channel.
            assert np.abs(last - final).max() <= 16

    def test_chunked_dispatch_respects_gif_cadence(self, tmp_path) -> None:
        """steps_per_dispatch folds to the frame cadence gcd."""
        from PIL import Image

        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        cfg.video.create_gif = True
        cfg.video.save_every = 2
        cfg.hardware.steps_per_dispatch = 4
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        for name in ("timelapse_c_x_s1.gif", "timelapse_c_x_s2.gif"):
            with Image.open(tmp_path / "out" / name) as img:
                assert img.n_frames == 2

    def test_profile_dir_writes_trace(self, tmp_path) -> None:
        """--profile-dir captures the batch loop like the single-run path."""
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        profile_dir = tmp_path / "trace"
        cfg = self._config(tmp_path, profile_dir=str(profile_dir))
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        assert any(profile_dir.rglob("*.xplane.pb"))

    def test_gif_with_checkpoint_resume(self, tmp_path) -> None:
        """GIF frames, checkpoints, and chunking share one cadence grid."""
        from PIL import Image

        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path, checkpoint_every=2)
        cfg.video.create_gif = True
        cfg.video.save_every = 2
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        ckpt = tmp_path / "out" / "checkpoint.npz"
        assert ckpt.exists()

        cfg2 = self._config(
            tmp_path, checkpoint_every=2, resume_from=str(ckpt),
        )
        cfg2.optimization.steps = 6
        cfg2.output.output = str(tmp_path / "out2")
        cfg2.video.create_gif = True
        cfg2.video.save_every = 2
        multi_style_transfer(str(content), [str(s) for s in styles], cfg2)
        # Resumed at step 4 of 6: frames at the step-6 cadence only.
        with Image.open(
            tmp_path / "out2" / "timelapse_c_x_s1.gif",
        ) as img:
            assert img.n_frames == 1

    def test_gif_outro_appended_per_style(self, tmp_path) -> None:
        """--gif-include-outro adds the comparison segment to each GIF."""
        from PIL import Image

        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        cfg.video.create_gif = True
        cfg.video.save_every = 2
        cfg.video.gif_include_outro = True
        cfg.video.final_frame_compare = True
        cfg.video.outro_duration_seconds = 0.5
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        for name in ("timelapse_c_x_s1.gif", "timelapse_c_x_s2.gif"):
            with Image.open(tmp_path / "out" / name) as img:
                # 2 stylized frames + hold/crossfade/comparison outro.
                assert img.n_frames > 4

    def test_outro_targets_each_styles_paths(
        self, tmp_path, monkeypatch,
    ) -> None:
        """The comparison segment pairs the content with EACH style."""
        from style_transfer_visualizer_tpu import main as stv_main
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        calls: list = []

        def fake_append(video_cfg, writer, paths, frame, gif_options=None):
            calls.append(
                {"paths": paths, "gif": gif_options.sink
                 if gif_options else None},
            )

        monkeypatch.setattr(
            stv_main.stv_segments, "append_final_comparison_frame",
            fake_append,
        )
        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        cfg.video.create_gif = True
        cfg.video.save_every = 2
        cfg.video.gif_include_outro = True
        cfg.video.final_frame_compare = True
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        assert [c["paths"][1].name for c in calls] == ["s1.png", "s2.png"]
        assert all(c["paths"][0].name == "c.png" for c in calls)
        assert calls[0]["gif"] is not calls[1]["gif"]

    def test_gif_intro_appended_per_style(self, tmp_path) -> None:
        """--gif-include-intro prepends fade/hold/crossfade to each GIF."""
        from PIL import Image

        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        cfg.video.create_gif = True
        cfg.video.save_every = 2
        cfg.video.gif_include_intro = True
        cfg.video.intro_duration_seconds = 0.5
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        for name in ("timelapse_c_x_s1.gif", "timelapse_c_x_s2.gif"):
            with Image.open(tmp_path / "out" / name) as img:
                # fade-in + hold + crossfade precede the 2 cadence frames
                assert img.n_frames > 4

    def test_intro_crossfades_into_first_frame_per_style(
        self, tmp_path, monkeypatch,
    ) -> None:
        """Each style's crossfade targets ITS first stylized frame."""
        from style_transfer_visualizer_tpu import main as stv_main
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        calls: list = []
        real_prepare = stv_main.stv_segments.prepare_intro_segment

        def fake_crossfade(sink, from_frame, to_frame, n_frames, **kw):
            calls.append({"sink": sink})

        monkeypatch.setattr(
            stv_main.stv_segments, "append_crossfade", fake_crossfade,
        )
        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        cfg.video.create_gif = True
        cfg.video.save_every = 2
        cfg.video.gif_include_intro = True
        cfg.video.intro_duration_seconds = 0.5
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        assert real_prepare is stv_main.stv_segments.prepare_intro_segment
        assert len(calls) == 2  # one crossfade per style, fired once
        assert calls[0]["sink"] is not calls[1]["sink"]

    def test_mp4_outro_on_by_default(self, tmp_path, monkeypatch) -> None:
        """Batch MP4s get the outro comparison without extra flags."""
        from style_transfer_visualizer_tpu import main as stv_main
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        calls: list = []

        def fake_append(video_cfg, writer, paths, frame, gif_options=None):
            calls.append({"writer": writer, "style": paths[1].name})

        monkeypatch.setattr(
            stv_main.stv_segments, "append_final_comparison_frame",
            fake_append,
        )

        class StubWriter:
            def append_data(self, frame) -> None:
                pass

            def close(self) -> None:
                pass

        monkeypatch.setattr(
            stv_main.stv_encode, "setup_video_writer",
            lambda *a, **k: StubWriter(),
        )
        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        cfg.video.create_video = True
        cfg.video.save_every = 2
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        assert [c["style"] for c in calls] == ["s1.png", "s2.png"]
        assert all(c["writer"] is not None for c in calls)
        assert calls[0]["writer"] is not calls[1]["writer"]

    def test_no_outro_without_flags(self, tmp_path, monkeypatch) -> None:
        """Default gif runs (outro off) stay stylized-frames-only."""
        from style_transfer_visualizer_tpu import main as stv_main
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        calls: list = []
        monkeypatch.setattr(
            stv_main.stv_segments, "append_final_comparison_frame",
            lambda *a, **k: calls.append(a),
        )
        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        cfg.video.create_gif = True
        cfg.video.save_every = 2
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        assert calls == []

    def test_pngs_survive_gif_close_failure(
        self, tmp_path, monkeypatch,
    ) -> None:
        """A failed GIF encode still saves every stylized PNG."""
        import pytest

        from style_transfer_visualizer_tpu.main import multi_style_transfer
        from style_transfer_visualizer_tpu.media.encode import (
            GifFrameCollector,
        )

        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        cfg.video.create_gif = True
        cfg.video.save_every = 2

        def boom(self) -> None:
            msg = "encoder exploded"
            raise RuntimeError(msg)

        monkeypatch.setattr(GifFrameCollector, "close", boom)
        with pytest.raises(RuntimeError, match="encoder exploded"):
            multi_style_transfer(
                str(content), [str(s) for s in styles], cfg,
            )
        for name in ("stylized_c_x_s1.png", "stylized_c_x_s2.png"):
            assert (tmp_path / "out" / name).exists()


class TestMultiStyleSpatialCombined:
    """--styles x --spatial-shards: dp x sp on one mesh."""

    def _inputs(self, tmp_path):
        from PIL import Image

        content = tmp_path / "c.png"
        s1 = tmp_path / "s1.png"
        s2 = tmp_path / "s2.png"
        Image.new("RGB", (64, 64), (0, 180, 0)).save(content)
        Image.new("RGB", (96, 72), (180, 0, 0)).save(s1)  # odd style size
        Image.new("RGB", (64, 64), (0, 0, 180)).save(s2)
        return content, [s1, s2]

    def test_dp_sp_end_to_end(self, tmp_path) -> None:
        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._inputs(tmp_path)
        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 3, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0, 5], "content_layers": [2],
                "allow_random_weights": True, "init_method": "content",
            },
            "hardware": {"device": "cpu", "spatial_shards": 2},
            "output": {
                "output": str(tmp_path / "out"),
                "log_every": 1,
                "log_loss": str(tmp_path / "out" / "l.csv"),
            },
            "video": {"create_video": False},
        })
        saved = multi_style_transfer(
            str(content), [str(s) for s in styles], cfg,
        )
        assert [p.name for p in saved] == [
            "stylized_c_x_s1.png", "stylized_c_x_s2.png",
        ]
        for p in saved:
            assert p.exists()
        # Per-style CSVs carry the sharded per-style telemetry.
        for name in ("l_s1.csv", "l_s2.csv"):
            lines = (tmp_path / "out" / name).read_text().splitlines()
            assert len(lines) == 4  # header + 3 steps

    def test_dp_sp_per_style_gifs(self, tmp_path) -> None:
        """Sharded batch frames gather off the mesh into per-style GIFs."""
        from PIL import Image

        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._inputs(tmp_path)
        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 2, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "allow_random_weights": True, "init_method": "content",
            },
            "hardware": {"device": "cpu", "spatial_shards": 2},
            "output": {"output": str(tmp_path / "out")},
            "video": {
                "create_video": False, "create_gif": True,
                "save_every": 1,
            },
        })
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        for name in ("timelapse_c_x_s1.gif", "timelapse_c_x_s2.gif"):
            with Image.open(tmp_path / "out" / name) as img:
                assert img.n_frames == 2

    def test_dp_sp_sink_close_failure_raises_after_save(
        self, tmp_path, monkeypatch,
    ) -> None:
        """A sharded batch re-raises close errors, PNGs already saved."""
        import style_transfer_visualizer_tpu.media.stream as stream_mod
        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        def bad_close(self) -> None:
            raise RuntimeError("sharded worker stuck")

        monkeypatch.setattr(
            stream_mod.AsyncFrameStream, "close", bad_close,
        )
        content, styles = self._inputs(tmp_path)
        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 2, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "allow_random_weights": True, "init_method": "content",
            },
            "hardware": {"device": "cpu", "spatial_shards": 2},
            "output": {"output": str(tmp_path / "out")},
            "video": {
                "create_video": False, "create_gif": True,
                "save_every": 1,
            },
        })
        with pytest.raises(RuntimeError, match="sharded worker stuck"):
            multi_style_transfer(
                str(content), [str(s) for s in styles], cfg,
            )
        assert (tmp_path / "out" / "stylized_c_x_s1.png").exists()
        assert (tmp_path / "out" / "stylized_c_x_s2.png").exists()

    def test_dp_sp_lbfgs_end_to_end(self, tmp_path) -> None:
        """L-BFGS with its history sharded over the space axis runs e2e."""
        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._inputs(tmp_path)
        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 2, "optimizer": "lbfgs",
                "style_layers": [0], "content_layers": [2],
                "allow_random_weights": True,
                "lbfgs_history_size": 4,
            },
            "hardware": {"device": "cpu", "spatial_shards": 2},
            "output": {"output": str(tmp_path / "out")},
            "video": {"create_video": False},
        })
        saved = multi_style_transfer(
            str(content), [str(s) for s in styles], cfg,
        )
        assert len(saved) == 2
        for p in saved:
            assert p.exists()


class TestMultiStyleEdges:
    """Batch-mode validation, cascades, and failure-path accounting."""

    _setup = TestMultiStyleArtifacts._setup
    _config = TestMultiStyleArtifacts._config

    def test_empty_style_list_rejected(self, tmp_path) -> None:
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, _ = self._setup(tmp_path)
        with pytest.raises(ValueError, match="at least one style"):
            multi_style_transfer(str(content), [], self._config(tmp_path))

    def test_final_only_disables_batch_media(self, tmp_path) -> None:
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        cfg.video.create_gif = True
        cfg.video.final_only = True
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        out = tmp_path / "out"
        assert (out / "stylized_c_x_s1.png").exists()
        assert not list(out.glob("*.gif"))

    def test_indivisible_spatial_shards_rejected(self, tmp_path) -> None:
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        cfg.hardware.spatial_shards = 3  # 8 CPU devices % 3 != 0
        with pytest.raises(ValueError, match="must divide"):
            multi_style_transfer(
                str(content), [str(s) for s in styles], cfg,
            )

    def test_batch_pallas_conv_downgraded_with_warning(
        self, tmp_path, caplog,
    ) -> None:
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        cfg.hardware.conv_backend = "pallas"
        with caplog.at_level(logging.WARNING):
            multi_style_transfer(
                str(content), [str(s) for s in styles], cfg,
            )
        assert "not supported in batch" in caplog.text
        assert (tmp_path / "out" / "stylized_c_x_s1.png").exists()

    def test_custom_checkpoint_path_in_batch(self, tmp_path) -> None:
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        ckpt = tmp_path / "elsewhere" / "batch.npz"
        cfg = self._config(
            tmp_path, checkpoint_every=2, checkpoint_path=str(ckpt),
        )
        multi_style_transfer(str(content), [str(s) for s in styles], cfg)
        assert ckpt.exists()

    def test_csv_init_failure_degrades_gracefully(
        self, tmp_path, monkeypatch, caplog,
    ) -> None:
        import style_transfer_visualizer_tpu.engine.loss_logger as ll
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        def boom(*a, **k):
            raise OSError("csv target unwritable")

        monkeypatch.setattr(ll.LossCSVLogger, "__init__", boom)
        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path, log_loss=str(tmp_path / "losses.csv"))
        with caplog.at_level(logging.ERROR):
            multi_style_transfer(
                str(content), [str(s) for s in styles], cfg,
            )
        assert "Failed to initialize CSV logging" in caplog.text
        assert (tmp_path / "out" / "stylized_c_x_s1.png").exists()

    def test_csv_close_failure_logged_not_raised(
        self, tmp_path, monkeypatch, caplog,
    ) -> None:
        import style_transfer_visualizer_tpu.engine.loss_logger as ll
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        def bad_close(self) -> None:
            raise OSError("flush failed")

        monkeypatch.setattr(ll.LossCSVLogger, "close", bad_close)
        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path, log_loss=str(tmp_path / "losses.csv"))
        with caplog.at_level(logging.ERROR):
            multi_style_transfer(
                str(content), [str(s) for s in styles], cfg,
            )
        assert "Error closing loss logger" in caplog.text
        assert (tmp_path / "out" / "stylized_c_x_s1.png").exists()

    def test_frame_stream_close_failure_is_a_close_error(
        self, tmp_path, monkeypatch,
    ) -> None:
        import style_transfer_visualizer_tpu.media.stream as stream_mod
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        def bad_close(self) -> None:
            raise RuntimeError("worker stuck")

        monkeypatch.setattr(
            stream_mod.AsyncFrameStream, "close", bad_close,
        )
        content, styles = self._setup(tmp_path)
        cfg = self._config(tmp_path)
        cfg.video.create_gif = True
        cfg.video.save_every = 2
        with pytest.raises(RuntimeError, match="worker stuck"):
            multi_style_transfer(
                str(content), [str(s) for s in styles], cfg,
            )
        # The stylized PNGs were persisted before the error re-raised.
        assert (tmp_path / "out" / "stylized_c_x_s1.png").exists()
        assert (tmp_path / "out" / "stylized_c_x_s2.png").exists()


class TestAppendBatchOutrosGuards:
    def test_missing_paths_is_a_noop(self, make_style_transfer_config):
        import jax.numpy as jnp

        from style_transfer_visualizer_tpu.main import _append_batch_outros

        cfg = make_style_transfer_config()
        cfg.video.final_frame_compare = True
        sink_calls = []
        _append_batch_outros(
            cfg, jnp.zeros((2, 1, 8, 8, 3)), None, None,
            [sink_calls], [None], normalize=False,
        )
        assert sink_calls == []

    def test_styles_without_outro_sinks_are_skipped(
        self, tmp_path, monkeypatch, make_style_transfer_config,
    ) -> None:
        import jax.numpy as jnp

        from style_transfer_visualizer_tpu import main as stv_main
        from style_transfer_visualizer_tpu.main import _append_batch_outros

        calls = []
        monkeypatch.setattr(
            stv_main.stv_segments, "append_final_comparison_frame",
            lambda *a, **k: calls.append(a),
        )
        from PIL import Image

        c = tmp_path / "c.png"
        s1 = tmp_path / "s1.png"
        s2 = tmp_path / "s2.png"
        for p in (c, s1, s2):
            Image.new("RGB", (16, 16), "blue").save(p)
        cfg = make_style_transfer_config()
        cfg.video.final_frame_compare = True
        cfg.video.gif_include_outro = False  # gif-only style: no outro
        gif_sinks = [object(), None]
        video_sinks = [None, object()]  # only style 2 gets an outro
        _append_batch_outros(
            cfg, jnp.zeros((2, 1, 16, 16, 3)), c, [s1, s2],
            gif_sinks, video_sinks, normalize=False,
        )
        assert len(calls) == 1
        assert calls[0][2][1] == s2


class TestLbfgsHistoryFlags:
    def test_flags_parse_and_merge(self) -> None:
        args = _parse([
            "--content", "c.png", "--style", "s.png",
            "--lbfgs-history-size", "20",
            "--lbfgs-history-dtype", "bfloat16",
        ])
        cfg = build_config_from_cli(vars(args))
        assert cfg.optimization.lbfgs_history_size == 20
        assert cfg.optimization.lbfgs_history_dtype == "bfloat16"

    def test_log_parameters_reports_history(
        self, caplog, content_image, style_image,
    ) -> None:
        from style_transfer_visualizer_tpu.type_defs import InputPaths

        cfg = StyleTransferConfig.model_validate(
            {"optimization": {"optimizer": "lbfgs"}},
        )
        stv_cli.log_parameters(
            InputPaths(str(content_image), str(style_image)),
            cfg,
            argparse.Namespace(config=None),
        )
        assert (
            "L-BFGS History: 100 pairs (bfloat16), compact direction"
            in caplog.text
        )

    def test_direction_flag_parses_and_merges(self) -> None:
        args = _parse([
            "--content", "c.png", "--style", "s.png",
            "--lbfgs-direction", "compact",
        ])
        cfg = build_config_from_cli(vars(args))
        assert cfg.optimization.lbfgs_direction == "compact"


class TestTvWeightFlag:
    def test_flag_parses_merges_and_is_echoed(
        self, caplog, content_image, style_image,
    ) -> None:
        from style_transfer_visualizer_tpu.type_defs import InputPaths

        args = _parse([
            "--content", "c.png", "--style", "s.png", "--tv-w", "0.25",
        ])
        cfg = build_config_from_cli(vars(args))
        assert cfg.optimization.tv_w == 0.25
        stv_cli.log_parameters(
            InputPaths(str(content_image), str(style_image)),
            cfg,
            argparse.Namespace(config=None),
        )
        assert "TV Weight: 0.25" in caplog.text

    def test_default_is_zero_and_unlogged(
        self, caplog, content_image, style_image,
    ) -> None:
        """tv_w = 0 reproduces the reference loss; the echo stays quiet."""
        from style_transfer_visualizer_tpu.type_defs import InputPaths

        args = _parse(["--content", "c.png", "--style", "s.png"])
        cfg = build_config_from_cli(vars(args))
        assert cfg.optimization.tv_w == 0.0
        stv_cli.log_parameters(
            InputPaths(str(content_image), str(style_image)),
            cfg,
            argparse.Namespace(config=None),
        )
        assert "TV Weight" not in caplog.text


class TestPreserveColorFlag:
    def test_flag_parses_merges_and_is_echoed(
        self, caplog, content_image, style_image,
    ) -> None:
        from style_transfer_visualizer_tpu.type_defs import InputPaths

        args = _parse([
            "--content", "c.png", "--style", "s.png",
            "--preserve-color", "luminance",
        ])
        cfg = build_config_from_cli(vars(args))
        assert cfg.optimization.preserve_color == "luminance"
        stv_cli.log_parameters(
            InputPaths(str(content_image), str(style_image)),
            cfg,
            argparse.Namespace(config=None),
        )
        assert "Color Preservation: luminance" in caplog.text

    def test_default_is_off_and_unlogged(
        self, caplog, content_image, style_image,
    ) -> None:
        from style_transfer_visualizer_tpu.type_defs import InputPaths

        args = _parse(["--content", "c.png", "--style", "s.png"])
        cfg = build_config_from_cli(vars(args))
        assert cfg.optimization.preserve_color == "off"
        stv_cli.log_parameters(
            InputPaths(str(content_image), str(style_image)),
            cfg,
            argparse.Namespace(config=None),
        )
        assert "Color Preservation" not in caplog.text

    def test_rejects_unknown_scheme(self) -> None:
        with pytest.raises(SystemExit):
            _parse([
                "--content", "c.png", "--style", "s.png",
                "--preserve-color", "sepia",
            ])


def test_styles_with_only_whitespace_segments_exits() -> None:
    """--styles ' , ' has no usable paths and must fail loudly."""
    args = _parse([
        "--content", "c.png", "--styles", " , ", "--device", "cpu",
    ])
    with pytest.raises(SystemExit, match="contains no paths"):
        stv_cli.run_from_args(args)


class TestLogParametersInvertedFlags:
    """The opposite direction of every log ternary/conditional."""

    def test_inverted_configuration_logged(
        self, caplog, content_image, style_image,
    ) -> None:
        from style_transfer_visualizer_tpu.type_defs import InputPaths

        cfg = StyleTransferConfig.model_validate({
            "optimization": {"optimizer": "adam", "normalize": False},
            "video": {
                "create_video": False,
                "intro_enabled": False,
                "final_frame_compare": False,
                "create_gif": True,
                "gif_include_intro": True,
                "gif_include_outro": True,
                "metadata_title": "T",
                "metadata_artist": "A",
            },
            "output": {"plot_losses": False},
        })
        stv_cli.log_parameters(
            InputPaths(str(content_image), str(style_image)),
            cfg,
            argparse.Namespace(config=None),
        )
        text = caplog.text
        assert "Optimizer: adam" in text
        assert "L-BFGS History" not in text
        assert "Normalization: Disabled" in text
        assert "Video Creation: Disabled" in text
        assert "Video Intro: Disabled" in text
        assert "Final Frame Compare: Disabled" in text
        assert "Metadata Title: T" in text
        assert "Metadata Artist: A" in text
        assert "Loss Plotting: Disabled" in text


def test_main_accepts_styles_without_style(
    monkeypatch, content_image, style_image,
) -> None:
    """--styles alone satisfies the required-style check in main()."""
    called = {}

    def fake_batch(content, styles, cfg):
        called["styles"] = styles
        return []

    monkeypatch.setattr(
        stv_cli.stv_main, "multi_style_transfer", fake_batch,
    )
    monkeypatch.setattr(sys, "argv", [
        "style-visualizer", "--content", str(content_image),
        "--styles", str(style_image), "--device", "cpu",
    ])
    stv_cli.main()
    assert called["styles"] == [str(style_image)]


class TestMultiStyleBranchDirections:
    """Remaining one-way orchestration branches in the batch loop."""

    def _setup(self, tmp_path):
        from PIL import Image

        content = tmp_path / "c.png"
        s1 = tmp_path / "s1.png"
        s2 = tmp_path / "s2.png"
        Image.new("RGB", (64, 64), (0, 180, 0)).save(content)
        Image.new("RGB", (64, 64), (180, 0, 0)).save(s1)
        Image.new("RGB", (64, 64), (0, 0, 180)).save(s2)
        return content, [s1, s2]

    def _config(self, tmp_path, *, optimization=None, video=None,
                output=None):
        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )

        return StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 4, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "allow_random_weights": True, "init_method": "content",
                **(optimization or {}),
            },
            "hardware": {"device": "cpu"},
            "output": {"output": str(tmp_path / "out"), **(output or {})},
            "video": {"create_video": False, **(video or {})},
        })

    def _run(self, tmp_path, cfg):
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content, styles = self._setup(tmp_path)
        return multi_style_transfer(
            str(content), [str(s) for s in styles], cfg,
        )

    def test_forced_remat_batch(self, tmp_path) -> None:
        """--remat short-circuits the batched auto threshold."""
        cfg = self._config(
            tmp_path, optimization={"steps": 2, "remat": True},
        )
        saved = self._run(tmp_path, cfg)
        assert all(p.exists() for p in saved)

    def test_gif_outro_excluded_skips_render(self, tmp_path) -> None:
        """GIF sinks present but outro excluded: no comparison frames."""
        from PIL import Image

        cfg = self._config(
            tmp_path,
            optimization={"steps": 2},
            video={
                "create_gif": True, "save_every": 1,
                "gif_include_outro": False, "intro_enabled": False,
                "gif_include_intro": False,
            },
        )
        self._run(tmp_path, cfg)
        with Image.open(tmp_path / "out" / "timelapse_c_x_s1.gif") as gif:
            # steps frames + forced final frame, no outro hold/crossfade
            assert gif.n_frames <= 3

    def test_video_stub_with_intro_and_outro(
        self, tmp_path, monkeypatch,
    ) -> None:
        """Batch MP4 writers receive intro and outro segments."""
        from style_transfer_visualizer_tpu import main as stv_main

        writers = {}

        class StubWriter:
            def __init__(self) -> None:
                self.frames = []
                self._size = None
                self.closed = False

            def append_data(self, frame) -> None:
                self.frames.append(frame)
                self._size = (frame.shape[1], frame.shape[0])

            def close(self) -> None:
                self.closed = True

        def fake_setup(video_cfg, out_dir, name):
            writers[name] = StubWriter()
            return writers[name]

        monkeypatch.setattr(
            stv_main.stv_encode, "setup_video_writer", fake_setup,
        )
        cfg = self._config(
            tmp_path,
            optimization={"steps": 2},
            video={
                "create_video": True, "mode": "postprocess",
                "save_every": 1, "fps": 2,
            },
        )
        self._run(tmp_path, cfg)
        assert len(writers) == 2
        for writer in writers.values():
            # intro fade/hold + stylized frames + outro > bare steps
            assert len(writer.frames) > 2
            assert writer.closed

    def test_csv_base_without_suffix_gets_csv_extension(
        self, tmp_path,
    ) -> None:
        cfg = self._config(
            tmp_path,
            optimization={"steps": 2},
            output={"log_loss": str(tmp_path / "out" / "losses"),
                    "log_every": 1},
        )
        self._run(tmp_path, cfg)
        assert (tmp_path / "out" / "losses_s1.csv").exists()
        assert (tmp_path / "out" / "losses_s2.csv").exists()

    def test_plotting_disabled_skips_history(self, tmp_path) -> None:
        cfg = self._config(
            tmp_path,
            optimization={"steps": 2},
            output={"plot_losses": False},
        )
        self._run(tmp_path, cfg)
        assert not (tmp_path / "out" / "loss_plot_s1.png").exists()

    def test_checkpoint_cadence_misaligned_step(self, tmp_path) -> None:
        """A final step off the cadence skips the checkpoint write."""
        cfg = self._config(
            tmp_path,
            optimization={"steps": 4},
            output={"checkpoint_every": 3},
        )
        self._run(tmp_path, cfg)


class TestBatchIntroGateCombos:
    """Intro prepared by one sink family, declined by the other."""

    _setup = TestMultiStyleBranchDirections._setup
    _config = TestMultiStyleBranchDirections._config
    _run = TestMultiStyleBranchDirections._run

    def _stub_video(self, monkeypatch):
        from style_transfer_visualizer_tpu import main as stv_main

        writers = {}

        class StubWriter:
            def __init__(self) -> None:
                self.frames = []
                self._size = None

            def append_data(self, frame) -> None:
                self.frames.append(frame)
                self._size = (frame.shape[1], frame.shape[0])

            def close(self) -> None:
                pass

        def fake_setup(video_cfg, out_dir, name):
            writers[name] = StubWriter()
            return writers[name]

        monkeypatch.setattr(
            stv_main.stv_encode, "setup_video_writer", fake_setup,
        )
        return writers

    def test_gif_intro_prepared_video_intro_disabled(
        self, tmp_path, monkeypatch,
    ) -> None:
        """The GIF wants the intro; the MP4 must not receive it."""
        writers = self._stub_video(monkeypatch)
        cfg = self._config(
            tmp_path,
            optimization={"steps": 2},
            video={
                "create_video": True, "mode": "postprocess",
                "create_gif": True, "save_every": 1, "fps": 2,
                "intro_enabled": False, "gif_include_intro": True,
                "final_frame_compare": False,
            },
        )
        self._run(tmp_path, cfg)
        for writer in writers.values():
            assert len(writer.frames) == 2  # stylized frames only

    def test_video_intro_prepared_gif_intro_declined(
        self, tmp_path, monkeypatch,
    ) -> None:
        """The MP4 carries the intro; the GIF skips its crossfade."""
        from PIL import Image

        writers = self._stub_video(monkeypatch)
        cfg = self._config(
            tmp_path,
            optimization={"steps": 2},
            video={
                "create_video": True, "mode": "postprocess",
                "create_gif": True, "save_every": 1, "fps": 2,
                "intro_enabled": True, "gif_include_intro": False,
                "final_frame_compare": False,
            },
        )
        self._run(tmp_path, cfg)
        for writer in writers.values():
            assert len(writer.frames) > 2  # fade + hold + crossfade
        with Image.open(tmp_path / "out" / "timelapse_c_x_s1.gif") as gif:
            assert gif.n_frames <= 3  # no intro material


def test_gif_intro_excluded_logged_no(
    caplog, content_image, style_image,
) -> None:
    from style_transfer_visualizer_tpu.type_defs import InputPaths

    cfg = StyleTransferConfig.model_validate({
        "video": {"create_gif": True, "gif_include_intro": False,
                  "gif_include_outro": False},
    })
    stv_cli.log_parameters(
        InputPaths(str(content_image), str(style_image)),
        cfg,
        argparse.Namespace(config=None),
    )
    assert "GIF Intro Included: No" in caplog.text
    assert "GIF Outro Included: No" in caplog.text


def test_run_from_args_with_config_not_validate_only(
    monkeypatch, content_image, style_image, tmp_path,
) -> None:
    """--config without --validate-config-only proceeds to the run."""
    toml = tmp_path / "r.toml"
    toml.write_text("[optimization]\nsteps = 3\n")
    called = {}
    monkeypatch.setattr(
        stv_cli.stv_main, "style_transfer",
        lambda paths, cfg: called.setdefault(
            "steps", cfg.optimization.steps,
        ),
    )
    args = _parse([
        "--content", str(content_image), "--style", str(style_image),
        "--config", str(toml), "--device", "cpu",
    ])
    stv_cli.run_from_args(args)
    assert called["steps"] == 3


def test_main_with_style_flag_proceeds(
    monkeypatch, content_image, style_image,
) -> None:
    """--style (not --styles) satisfies the required-style check."""
    called = {}
    monkeypatch.setattr(
        stv_cli, "run_from_args", lambda args: called.setdefault(
            "style", args.style,
        ),
    )
    monkeypatch.setattr(sys, "argv", [
        "style-visualizer", "--content", str(content_image),
        "--style", str(style_image),
    ])
    stv_cli.main()
    assert called["style"] == str(style_image)


def test_coarse_steps_logged(
    caplog, content_image, style_image,
) -> None:
    from style_transfer_visualizer_tpu.type_defs import InputPaths

    cfg = StyleTransferConfig.model_validate(
        {"optimization": {"coarse_steps": 40}},
    )
    stv_cli.log_parameters(
        InputPaths(str(content_image), str(style_image)),
        cfg,
        argparse.Namespace(config=None),
    )
    assert "Coarse Warm Start: 40 steps across 1 pyramid level(s)" in (
        caplog.text
    )
