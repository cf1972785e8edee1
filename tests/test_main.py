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

    def fake_prepare(content_img, style_img, config, key):
        recorded["input_shape"] = tuple(content_img.shape)
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


class TestPrepareModelAndInput:
    def test_real_prepare_with_tiny_model(
        self, monkeypatch, make_style_transfer_config,
    ) -> None:
        import jax

        from style_transfer_visualizer_tpu.models import vgg19

        monkeypatch.setattr(
            stv_main,
            "load_vgg19_params",
            lambda **kw: vgg19.init_random_params(jax.random.key(0)),
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
