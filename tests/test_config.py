"""Config schema, TOML loading, and CLI merge tests."""
from __future__ import annotations

from pathlib import Path

import pytest
from pydantic import ValidationError

from style_transfer_visualizer_tpu import config_defaults as d
from style_transfer_visualizer_tpu.config import (
    ConfigLoader,
    OptimizationConfig,
    StyleTransferConfig,
    VideoConfig,
    build_config_from_cli,
    parse_int_list,
)


class TestDefaults:
    def test_root_defaults(self) -> None:
        cfg = StyleTransferConfig.model_validate({})
        assert cfg.optimization.steps == d.DEFAULT_STEPS
        assert cfg.optimization.style_w == d.DEFAULT_STYLE_WEIGHT
        assert cfg.optimization.optimizer == "lbfgs"
        assert cfg.video.save_every == d.DEFAULT_SAVE_EVERY
        assert cfg.video.mode == "realtime"
        assert cfg.video.mode_override is False
        assert cfg.hardware.device == "tpu"
        assert cfg.hardware.precision == "mixed"
        assert cfg.output.output == "out"
        assert cfg.output.plot_losses is True

    def test_style_layers_default(self) -> None:
        cfg = OptimizationConfig.model_validate({})
        assert cfg.style_layers == [0, 5, 10, 19, 28]
        assert cfg.content_layers == [21]

    def test_mode_override_excluded_from_dump(self) -> None:
        dump = VideoConfig.model_validate({}).model_dump()
        assert "mode_override" not in dump


class TestValidationBounds:
    @pytest.mark.parametrize(
        ("field", "value"),
        [
            ("steps", 0),
            ("style_w", -1.0),
            ("content_w", -0.5),
            ("tv_w", -0.1),
            ("lr", 0.0),
            ("seed", -1),
            ("lbfgs_max_iter", 0),
            ("lbfgs_max_eval", 0),
            ("lbfgs_history_size", 0),
        ],
    )
    def test_optimization_bounds(self, field: str, value: float) -> None:
        with pytest.raises(ValidationError):
            OptimizationConfig.model_validate({field: value})

    @pytest.mark.parametrize(
        ("field", "value"),
        [
            ("save_every", 0),
            ("fps", 0),
            ("fps", 61),
            ("quality", 0),
            ("quality", 11),
            ("intro_duration_seconds", -1.0),
            ("outro_duration_seconds", -0.1),
        ],
    )
    def test_video_bounds(self, field: str, value: float) -> None:
        with pytest.raises(ValidationError):
            VideoConfig.model_validate({field: value})

    def test_bad_init_method(self) -> None:
        with pytest.raises(ValidationError):
            OptimizationConfig.model_validate({"init_method": "zeros"})

    def test_bad_video_mode(self) -> None:
        with pytest.raises(ValidationError):
            VideoConfig.model_validate({"mode": "streaming"})

    def test_bad_optimizer(self) -> None:
        with pytest.raises(ValidationError):
            OptimizationConfig.model_validate({"optimizer": "sgd"})


class TestTomlLoader:
    def test_load_missing_file(self) -> None:
        with pytest.raises(FileNotFoundError):
            ConfigLoader.load("/nonexistent/config.toml")

    def test_load_sections(self, tmp_path: Path) -> None:
        toml = tmp_path / "config.toml"
        toml.write_text(
            "[optimization]\nsteps = 42\nstyle_w = 2.5\n"
            "[video]\nfps = 24\nmode = \"postprocess\"\n"
            "[hardware]\ndevice = \"cpu\"\n"
            "[output]\noutput = \"myout\"\n",
        )
        cfg = ConfigLoader.load(str(toml))
        assert cfg.optimization.steps == 42
        assert cfg.optimization.style_w == 2.5
        assert cfg.video.fps == 24
        assert cfg.video.mode == "postprocess"
        assert cfg.hardware.device == "cpu"
        assert cfg.output.output == "myout"

    def test_partial_file_fills_defaults(self, tmp_path: Path) -> None:
        toml = tmp_path / "config.toml"
        toml.write_text("[optimization]\nsteps = 7\n")
        cfg = ConfigLoader.load(str(toml))
        assert cfg.optimization.steps == 7
        assert cfg.video.fps == d.DEFAULT_FPS

    def test_reference_config_toml_parses(self) -> None:
        ref = Path("/root/reference/config.toml")
        if not ref.is_file():
            pytest.skip("reference config not mounted")
        cfg = ConfigLoader.load(str(ref))
        assert cfg.optimization.steps >= 1


class TestParseIntList:
    def test_string(self) -> None:
        assert parse_int_list("0,5,10") == [0, 5, 10]

    def test_list_passthrough(self) -> None:
        assert parse_int_list([1, 2]) == [1, 2]

    def test_invalid(self) -> None:
        with pytest.raises(ValueError, match="invalid literal"):
            parse_int_list("a,b")


class TestCliMerge:
    def test_cli_overrides_defaults(self) -> None:
        cfg = build_config_from_cli({"steps": 10, "fps": 30, "device": "cpu"})
        assert cfg.optimization.steps == 10
        assert cfg.video.fps == 30
        assert cfg.hardware.device == "cpu"

    def test_cli_overrides_toml(self, tmp_path: Path) -> None:
        toml = tmp_path / "c.toml"
        toml.write_text("[optimization]\nsteps = 5\nlr = 0.5\n")
        base = ConfigLoader.load(str(toml))
        cfg = build_config_from_cli({"steps": 99}, base_config=base)
        assert cfg.optimization.steps == 99
        assert cfg.optimization.lr == 0.5  # TOML value survives

    def test_absent_keys_do_not_override(self) -> None:
        cfg = build_config_from_cli({})
        assert cfg.optimization.steps == d.DEFAULT_STEPS

    def test_flag_overrides(self) -> None:
        cfg = build_config_from_cli(
            {"no_video": True, "no_intro": True, "final_only": True,
             "no_normalize": True, "no_plot": True},
        )
        assert cfg.video.create_video is False
        assert cfg.video.intro_enabled is False
        assert cfg.video.final_only is True
        assert cfg.optimization.normalize is False
        assert cfg.output.plot_losses is False

    def test_durations_clamped_nonnegative(self) -> None:
        cfg = build_config_from_cli(
            {"intro_duration": -3.0, "outro_duration": 2.0},
        )
        assert cfg.video.intro_duration_seconds == 0.0
        assert cfg.video.outro_duration_seconds == 2.0

    def test_video_mode_sets_override(self) -> None:
        cfg = build_config_from_cli({"video_mode": "postprocess"})
        assert cfg.video.mode == "postprocess"
        assert cfg.video.mode_override is True

    def test_toml_nondefault_mode_counts_as_override(
        self, tmp_path: Path,
    ) -> None:
        toml = tmp_path / "c.toml"
        toml.write_text("[video]\nmode = \"postprocess\"\n")
        cfg = build_config_from_cli(
            {}, base_config=ConfigLoader.load(str(toml)),
        )
        assert cfg.video.mode_override is True

    def test_layer_lists_parsed(self) -> None:
        cfg = build_config_from_cli(
            {"style_layers": "1,2,3", "content_layers": "4"},
        )
        assert cfg.optimization.style_layers == [1, 2, 3]
        assert cfg.optimization.content_layers == [4]

    def test_csv_disables_plot(self, caplog: pytest.LogCaptureFixture) -> None:
        cfg = build_config_from_cli({"log_loss": "loss.csv"})
        assert cfg.output.plot_losses is False
        assert "disabled" in caplog.text

    def test_loader_callable_used(self, tmp_path: Path) -> None:
        toml = tmp_path / "c.toml"
        toml.write_text("[optimization]\nsteps = 3\n")
        calls: list[str] = []

        def spy_loader(path: str) -> StyleTransferConfig:
            calls.append(path)
            return ConfigLoader.load(path)

        cfg = build_config_from_cli({"config": str(toml)}, loader=spy_loader)
        assert calls == [str(toml)]
        assert cfg.optimization.steps == 3

    def test_optimizer_override(self) -> None:
        cfg = build_config_from_cli({"optimizer": "adam", "lr": 0.05})
        assert cfg.optimization.optimizer == "adam"

    def test_precision_override(self) -> None:
        cfg = build_config_from_cli({"precision": "default"})
        assert cfg.hardware.precision == "default"


class TestAssignmentValidation:
    def test_cli_values_respect_bounds(self) -> None:
        """CLI overrides must enforce the same bounds as TOML values."""
        with pytest.raises(ValidationError):
            build_config_from_cli({"fps": 0})
        with pytest.raises(ValidationError):
            build_config_from_cli({"quality": 99})
        with pytest.raises(ValidationError):
            build_config_from_cli({"steps": -5})
        with pytest.raises(ValidationError):
            build_config_from_cli({"save_every": 0})

    def test_valid_cli_values_still_merge(self) -> None:
        cfg = build_config_from_cli({"fps": 60, "quality": 1, "steps": 1})
        assert cfg.video.fps == 60
        assert cfg.video.quality == 1


def test_hardware_and_kernel_flags_merge() -> None:
    cfg = build_config_from_cli({
        "steps": 1,
        "remat": True,
        "gram_backend": "pallas",
        "conv_backend": "xla",
        "spatial_shards": 2,
        "steps_per_dispatch": 5,
    })
    assert cfg.optimization.remat is True
    assert cfg.hardware.gram_backend == "pallas"
    assert cfg.hardware.conv_backend == "xla"
    assert cfg.hardware.spatial_shards == 2
    assert cfg.hardware.steps_per_dispatch == 5


class TestLbfgsHistoryDtype:
    def test_default_is_bfloat16(self) -> None:
        """Measured-fastest ring is the default (round-4 re-decision)."""
        cfg = OptimizationConfig.model_validate({})
        assert cfg.lbfgs_history_dtype == "bfloat16"

    def test_invalid_dtype_rejected(self) -> None:
        with pytest.raises(ValidationError):
            OptimizationConfig.model_validate(
                {"lbfgs_history_dtype": "float16"},
            )

    def test_cli_merge(self) -> None:
        """float32 remains the torch-bit-layout opt-in."""
        cfg = build_config_from_cli({"lbfgs_history_dtype": "float32"})
        assert cfg.optimization.lbfgs_history_dtype == "float32"

    def test_history_size_cli_merge(self) -> None:
        cfg = build_config_from_cli({"lbfgs_history_size": 20})
        assert cfg.optimization.lbfgs_history_size == 20


class TestLbfgsDirection:
    def test_default_is_compact(self) -> None:
        """Measured-fastest direction is the default (round-4)."""
        cfg = OptimizationConfig.model_validate({})
        assert cfg.lbfgs_direction == "compact"

    def test_invalid_direction_rejected(self) -> None:
        with pytest.raises(ValidationError):
            OptimizationConfig.model_validate(
                {"lbfgs_direction": "cholesky"},
            )

    def test_cli_merge(self) -> None:
        """two-loop remains the torch-recursion opt-in."""
        cfg = build_config_from_cli({"lbfgs_direction": "two-loop"})
        assert cfg.optimization.lbfgs_direction == "two-loop"


class TestModelSelection:
    def test_default_is_vgg19_with_reference_layers(self) -> None:
        cfg = OptimizationConfig.model_validate({})
        assert cfg.model == "vgg19"
        assert tuple(cfg.style_layers) == d.DEFAULT_STYLE_LAYERS
        assert tuple(cfg.content_layers) == d.DEFAULT_CONTENT_LAYERS

    def test_vgg16_remaps_default_layers(self) -> None:
        cfg = OptimizationConfig.model_validate({"model": "vgg16"})
        assert cfg.style_layers == [0, 5, 10, 17, 24]
        assert cfg.content_layers == [19]

    def test_vgg16_keeps_explicit_layers(self) -> None:
        cfg = OptimizationConfig.model_validate(
            {"model": "vgg16", "style_layers": [0, 2],
             "content_layers": [7]},
        )
        assert cfg.style_layers == [0, 2]
        assert cfg.content_layers == [7]

    def test_unknown_model_rejected(self) -> None:
        with pytest.raises(ValidationError):
            OptimizationConfig.model_validate({"model": "resnet50"})

    def test_cli_merge_remaps(self) -> None:
        cfg = build_config_from_cli({"model": "vgg16"})
        assert cfg.optimization.model == "vgg16"
        assert cfg.optimization.style_layers == [0, 5, 10, 17, 24]

    def test_cli_merge_explicit_layers_win(self) -> None:
        cfg = build_config_from_cli(
            {"model": "vgg16", "style_layers": "0,2",
             "content_layers": "7"},
        )
        assert cfg.optimization.style_layers == [0, 2]
        assert cfg.optimization.content_layers == [7]

    def test_toml_model_remaps(self, tmp_path: Path) -> None:
        toml = tmp_path / "c.toml"
        toml.write_text('[optimization]\nmodel = "vgg16"\n')
        cfg = ConfigLoader.load(str(toml))
        assert cfg.optimization.content_layers == [19]


def test_custom_loader_injected() -> None:
    """build_config_from_cli accepts an injected TOML loader."""
    calls = []

    def fake_loader(path: str) -> StyleTransferConfig:
        calls.append(path)
        return StyleTransferConfig.model_validate(
            {"optimization": {"steps": 77}},
        )

    cfg = build_config_from_cli({"config": "x.toml"}, loader=fake_loader)
    assert calls == ["x.toml"]
    assert cfg.optimization.steps == 77


def test_default_loader_used_for_config_path(tmp_path) -> None:
    """Without an injected loader, ConfigLoader.load reads the TOML."""
    toml = tmp_path / "c.toml"
    toml.write_text("[optimization]\nsteps = 55\n")
    cfg = build_config_from_cli({"config": str(toml)})
    assert cfg.optimization.steps == 55
