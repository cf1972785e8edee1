"""Coarse-to-fine warm start (engine/coarse.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_visualizer_tpu.engine.coarse import (
    coarse_dims,
    coarse_init,
    plan_pyramid,
    pyramid_dims,
)
from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.features import (
    compute_targets,
    total_loss,
)


class TestAutoCoarseResolution:
    """--coarse-steps -1 (the default) resolves against content size."""

    def test_explicit_values_pass_through(self) -> None:
        from style_transfer_visualizer_tpu.engine.coarse import (
            resolve_coarse_steps,
        )

        assert resolve_coarse_steps(0, 4000, 4000, 1500) == 0
        assert resolve_coarse_steps(40, 4000, 4000, 1500) == 40

    def test_small_content_stays_off(self) -> None:
        """Below 1MP the default run keeps the reference trajectory."""
        from style_transfer_visualizer_tpu.engine.coarse import (
            resolve_coarse_steps,
        )

        assert resolve_coarse_steps(-1, 512, 512, 1500) == 0
        assert resolve_coarse_steps(-1, 999, 1000, 1500) == 0

    def test_large_content_auto_enables(self) -> None:
        from style_transfer_visualizer_tpu.engine.coarse import (
            resolve_coarse_steps,
        )

        assert resolve_coarse_steps(-1, 1000, 1000, 1500) == 300
        assert resolve_coarse_steps(-1, 1088, 1920, 200) == 40
        # Tiny step budgets still get at least one coarse step.
        assert resolve_coarse_steps(-1, 1088, 1920, 3) == 1

    def test_config_default_is_auto(self) -> None:
        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )

        cfg = StyleTransferConfig.model_validate({})
        assert cfg.optimization.coarse_steps == -1

    def test_orchestrator_writes_resolution_back(
        self, make_style_transfer_config,
    ) -> None:
        import style_transfer_visualizer_tpu.main as stv_main

        cfg = make_style_transfer_config()
        assert cfg.optimization.coarse_steps == -1
        big = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
        stv_main._resolve_auto_coarse(cfg, big)
        assert (
            cfg.optimization.coarse_steps
            == cfg.optimization.steps // 5
            or cfg.optimization.coarse_steps == 1
        )
        small_cfg = make_style_transfer_config()
        stv_main._resolve_auto_coarse(
            small_cfg, jnp.zeros((1, 64, 64, 3), jnp.float32),
        )
        assert small_cfg.optimization.coarse_steps == 0

    def test_cli_echo_reports_auto(
        self, caplog, content_image, style_image,
    ) -> None:
        import argparse

        import style_transfer_visualizer_tpu.cli as stv_cli
        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )
        from style_transfer_visualizer_tpu.type_defs import InputPaths

        cfg = StyleTransferConfig.model_validate({})
        stv_cli.log_parameters(
            InputPaths(str(content_image), str(style_image)),
            cfg,
            argparse.Namespace(config=None),
        )
        assert "Coarse Warm Start: auto" in caplog.text


class TestCoarseDims:
    def test_halves_and_aligns(self) -> None:
        assert coarse_dims(512, 512) == (256, 256)
        assert coarse_dims(1088, 1920) == (544, 960)

    def test_rounds_down_to_pool_alignment(self) -> None:
        assert coarse_dims(100, 110) == (48, 48)

    def test_too_small_returns_none(self) -> None:
        assert coarse_dims(63, 512) is None
        assert coarse_dims(512, 40) is None


@pytest.fixture
def tiny_setup(make_style_transfer_config):
    params = vgg19.init_random_params(jax.random.key(0))
    key = jax.random.key(7)
    content = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32)
    style = jax.random.uniform(
        jax.random.fold_in(key, 1), (1, 64, 64, 3), jnp.float32,
    )
    cfg = make_style_transfer_config(
        optimization={
            "steps": 2, "optimizer": "adam", "lr": 0.05,
            "style_layers": [0], "content_layers": [2],
            "init_method": "random", "coarse_steps": 30,
        },
    )
    return params, content, style, cfg


class TestCoarseInit:
    def test_returns_full_res_image(self, tiny_setup) -> None:
        params, content, style, cfg = tiny_setup
        warm = coarse_init(params, content, style, cfg, jax.random.key(2))
        assert warm is not None
        assert warm.shape == content.shape
        assert np.all(np.isfinite(np.asarray(warm)))

    def test_disabled_returns_none(self, tiny_setup) -> None:
        params, content, style, cfg = tiny_setup
        cfg.optimization.coarse_steps = 0
        assert coarse_init(
            params, content, style, cfg, jax.random.key(2),
        ) is None

    def test_lap_term_active_at_coarse_level(
        self, tiny_setup, caplog,
    ) -> None:
        """Each level matches the Laplacian of its own resized content."""
        import logging

        params, content, style, cfg = tiny_setup
        cfg.optimization.lap_w = 2.0
        cfg.optimization.lap_pool = 4  # 32//4 = 8 pooled rows: active
        with caplog.at_level(logging.INFO):
            warm = coarse_init(
                params, content, style, cfg, jax.random.key(2),
            )
        assert warm is not None
        assert np.all(np.isfinite(np.asarray(warm)))
        assert "too small for lap_pool" not in caplog.text

    def test_lap_term_skipped_at_too_small_level(
        self, tiny_setup, caplog,
    ) -> None:
        """Levels with a sub-3x3 pooled response drop the term loudly."""
        import logging

        params, content, style, cfg = tiny_setup
        cfg.optimization.lap_w = 2.0
        cfg.optimization.lap_pool = 16  # 32//16 = 2 pooled rows: skip
        with caplog.at_level(logging.INFO):
            warm = coarse_init(
                params, content, style, cfg, jax.random.key(2),
            )
        assert warm is not None
        assert "too small for lap_pool" in caplog.text

    def test_too_small_returns_none(self, tiny_setup, caplog) -> None:
        params, _, _, cfg = tiny_setup
        small_c = jnp.ones((1, 48, 48, 3), jnp.float32) * 0.4
        small_s = jnp.ones((1, 48, 48, 3), jnp.float32) * 0.6
        assert coarse_init(
            params, small_c, small_s, cfg, jax.random.key(2),
        ) is None
        assert "too small to halve" in caplog.text

    def test_warm_start_beats_cold_at_equal_full_res_budget(
        self, tiny_setup,
    ) -> None:
        """The warmed init starts closer to the optimum than random."""
        params, content, style, cfg = tiny_setup
        sl, cl = (0,), (2,)
        targets = compute_targets(params, style, content, sl, cl)

        def loss_of(img):
            total, _ = total_loss(
                params, img, targets, 1e4, 1.0, sl, cl,
            )
            return float(total)

        cold = jax.random.normal(
            jax.random.key(2), content.shape, content.dtype,
        )
        warm = coarse_init(params, content, style, cfg, jax.random.key(2))
        assert loss_of(warm) < loss_of(cold)

    def test_composes_with_content_init(self, tiny_setup) -> None:
        """init_method=content seeds the coarse problem, not the output."""
        params, content, style, cfg = tiny_setup
        cfg.optimization.init_method = "content"
        cfg.optimization.coarse_steps = 5
        warm = coarse_init(params, content, style, cfg, jax.random.key(2))
        # The coarse phase moved the pixels: not a plain content upsample.
        assert not np.allclose(np.asarray(warm), np.asarray(content))

    def test_degenerate_blend_matches_single_style(self, tiny_setup) -> None:
        """blend_imgs with weights (1, 0) reproduces the plain coarse
        warm start bit-for-bit (the coarse phase blends the same styles
        at its own resolution)."""
        params, content, style, cfg = tiny_setup
        other = jax.random.uniform(
            jax.random.key(9), content.shape, content.dtype,
        )
        plain = coarse_init(params, content, style, cfg, jax.random.key(2))
        blended = coarse_init(
            params, content, style, cfg, jax.random.key(2),
            blend_imgs=[(style, 1.0), (other, 0.0)],
        )
        np.testing.assert_array_equal(np.asarray(blended), np.asarray(plain))

    def test_nondegenerate_blend_changes_warm_start(self, tiny_setup) -> None:
        params, content, style, cfg = tiny_setup
        other = jax.random.uniform(
            jax.random.key(9), content.shape, content.dtype,
        )
        plain = coarse_init(params, content, style, cfg, jax.random.key(2))
        blended = coarse_init(
            params, content, style, cfg, jax.random.key(2),
            blend_imgs=[(style, 0.5), (other, 0.5)],
        )
        assert not np.array_equal(np.asarray(blended), np.asarray(plain))


class TestCoarseMemoryPolicy:
    """The coarse phase follows the main phase's memory policy at its
    own (halved) shape — remat past the threshold, banded evaluation
    past the tile threshold, resolved backends threaded through."""

    @pytest.fixture
    def capture_build(self, monkeypatch):
        import style_transfer_visualizer_tpu.engine.step as step_mod

        captured: dict = {}
        real = step_mod.build_update_step

        def spy(*args, **kwargs):
            captured.update(kwargs)
            return real(*args, **kwargs)

        monkeypatch.setattr(step_mod, "build_update_step", spy)
        return captured

    def test_small_coarse_stays_whole_image(
        self, tiny_setup, capture_build,
    ) -> None:
        params, content, style, cfg = tiny_setup
        cfg.optimization.coarse_steps = 1
        warm = coarse_init(params, content, style, cfg, jax.random.key(2))
        assert warm is not None
        assert capture_build["remat"] is False
        assert capture_build["tile_rows"] == 0

    def test_coarse_auto_remats_past_threshold(
        self, tiny_setup, capture_build, monkeypatch,
    ) -> None:
        import style_transfer_visualizer_tpu.engine.coarse as coarse_mod

        params, content, style, cfg = tiny_setup
        monkeypatch.setattr(
            coarse_mod, "AUTO_REMAT_PIXEL_THRESHOLD", 32 * 32,
        )
        cfg.optimization.coarse_steps = 1
        warm = coarse_init(params, content, style, cfg, jax.random.key(2))
        assert warm is not None
        assert capture_build["remat"] is True
        assert capture_build["tile_rows"] == 0

    def test_coarse_tiles_past_tile_threshold(
        self, tiny_setup, capture_build, monkeypatch, caplog,
    ) -> None:
        import logging

        import style_transfer_visualizer_tpu.engine.coarse as coarse_mod

        params, content, style, cfg = tiny_setup
        monkeypatch.setattr(
            coarse_mod, "AUTO_TILE_PIXEL_THRESHOLD", 32 * 32,
        )
        cfg.optimization.coarse_steps = 1
        with caplog.at_level(logging.INFO):
            warm = coarse_init(
                params, content, style, cfg, jax.random.key(2),
            )
        assert warm is not None
        assert capture_build["tile_rows"] > 0
        assert capture_build["remat"] is False
        assert "Coarse phase uses banded evaluation" in caplog.text

    def test_no_valid_band_falls_back_to_whole_image(
        self, tiny_setup, capture_build, monkeypatch, caplog,
    ) -> None:
        """auto_tile_rows finding no exact band means untiled coarse."""
        import logging

        import style_transfer_visualizer_tpu.engine.coarse as coarse_mod
        import style_transfer_visualizer_tpu.ops.tiled as tiled_mod

        params, content, style, cfg = tiny_setup
        monkeypatch.setattr(
            coarse_mod, "AUTO_TILE_PIXEL_THRESHOLD", 32 * 32,
        )
        monkeypatch.setattr(
            tiled_mod, "auto_tile_rows", lambda *a, **k: None,
        )
        cfg.optimization.coarse_steps = 1
        with caplog.at_level(logging.INFO):
            warm = coarse_init(
                params, content, style, cfg, jax.random.key(2),
            )
        assert warm is not None
        assert capture_build["tile_rows"] == 0
        assert "banded evaluation" not in caplog.text

    def test_user_remat_flag_applies_to_coarse(
        self, tiny_setup, capture_build,
    ) -> None:
        """An explicit --remat is honored below the auto threshold."""
        params, content, style, cfg = tiny_setup
        cfg.optimization.coarse_steps = 1
        cfg.optimization.remat = True
        warm = coarse_init(params, content, style, cfg, jax.random.key(2))
        assert warm is not None
        assert capture_build["remat"] is True

    def test_explicit_tile_rows_off_wins(
        self, tiny_setup, capture_build, monkeypatch,
    ) -> None:
        import style_transfer_visualizer_tpu.engine.coarse as coarse_mod

        params, content, style, cfg = tiny_setup
        monkeypatch.setattr(
            coarse_mod, "AUTO_TILE_PIXEL_THRESHOLD", 32 * 32,
        )
        cfg.optimization.coarse_steps = 1
        cfg.optimization.tile_rows = 0  # explicit whole-image switch
        warm = coarse_init(params, content, style, cfg, jax.random.key(2))
        assert warm is not None
        assert capture_build["tile_rows"] == 0

    def test_backends_threaded_through(
        self, tiny_setup, monkeypatch,
    ) -> None:
        """Resolved --gram/conv-backend selections reach the coarse step."""
        import types

        import style_transfer_visualizer_tpu.engine.coarse as coarse_mod
        import style_transfer_visualizer_tpu.engine.step as step_mod

        params, content, style, cfg = tiny_setup
        cfg.optimization.coarse_steps = 1
        captured: dict = {}

        def fake_build(*args, **kwargs):
            captured.update(kwargs)
            return types.SimpleNamespace(
                opt_state=None,
                chunked_update_fn=lambda x, state, k: (
                    x, state, types.SimpleNamespace(loss=jnp.zeros((k,))),
                ),
            )

        target_kwargs: dict = {}
        real_targets = coarse_mod.compute_targets

        def spy_targets(*args, **kwargs):
            target_kwargs.update(kwargs)
            kwargs.pop("gram_backend", None)
            kwargs.pop("conv_backend", None)
            return real_targets(*args, **kwargs)

        monkeypatch.setattr(step_mod, "build_update_step", fake_build)
        monkeypatch.setattr(coarse_mod, "compute_targets", spy_targets)
        warm = coarse_init(
            params, content, style, cfg, jax.random.key(2),
            gram_backend="custom_gram", conv_backend="custom_conv",
        )
        assert warm is not None
        assert captured["gram_backend"] == "custom_gram"
        assert captured["conv_backend"] == "custom_conv"
        assert target_kwargs["gram_backend"] == "custom_gram"
        assert target_kwargs["conv_backend"] == "custom_conv"


class TestMainWiring:
    def test_initial_image_uses_warm_start(
        self, tiny_setup, monkeypatch,
    ) -> None:
        import style_transfer_visualizer_tpu.main as stv_main

        params, content, style, cfg = tiny_setup
        sentinel = jnp.full(content.shape, 0.123, jnp.float32)
        monkeypatch.setattr(
            "style_transfer_visualizer_tpu.engine.coarse.coarse_init",
            lambda *a, **k: sentinel,
        )
        out = stv_main._initial_image(
            params, content, style, cfg, jax.random.key(0),
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(sentinel))

    def test_initial_image_falls_back_when_coarse_declines(
        self, tiny_setup, monkeypatch,
    ) -> None:
        import style_transfer_visualizer_tpu.main as stv_main

        params, content, style, cfg = tiny_setup
        cfg.optimization.init_method = "content"
        monkeypatch.setattr(
            "style_transfer_visualizer_tpu.engine.coarse.coarse_init",
            lambda *a, **k: None,
        )
        out = stv_main._initial_image(
            params, content, style, cfg, jax.random.key(0),
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(content))

    def test_cli_merge(self) -> None:
        from style_transfer_visualizer_tpu.config import (
            build_config_from_cli,
        )

        cfg = build_config_from_cli({"coarse_steps": 40})
        assert cfg.optimization.coarse_steps == 40


class TestPyramidDims:
    def test_two_levels_matches_coarse_dims(self) -> None:
        assert pyramid_dims(512, 512, 2) == [coarse_dims(512, 512)]
        assert pyramid_dims(1088, 1920, 2) == [coarse_dims(1088, 1920)]

    def test_deep_pyramid_is_coarsest_first(self) -> None:
        assert pyramid_dims(512, 512, 4) == [
            (64, 64), (128, 128), (256, 256),
        ]

    def test_too_deep_levels_dropped(self) -> None:
        # 128px: 1/8 res would be 16px (< 32 minimum) — starts at 1/4.
        assert pyramid_dims(128, 128, 4) == [(32, 32), (64, 64)]

    def test_all_levels_too_small(self) -> None:
        assert pyramid_dims(48, 48, 3) == []


class TestPlanPyramid:
    def test_budget_splits_evenly(self) -> None:
        assert plan_pyramid(512, 512, 10, levels=3) == [
            (128, 128, 5), (256, 256, 5),
        ]

    def test_remainder_goes_to_coarsest(self) -> None:
        assert plan_pyramid(512, 512, 11, levels=3) == [
            (128, 128, 6), (256, 256, 5),
        ]

    def test_tiny_budget_runs_coarsest_only(self) -> None:
        assert plan_pyramid(512, 512, 1, levels=3) == [(128, 128, 1)]

    def test_zero_steps_empty(self) -> None:
        assert plan_pyramid(512, 512, 0, levels=3) == []

    def test_too_small_logs_and_skips(self, caplog) -> None:
        import logging

        with caplog.at_level(logging.INFO):
            assert plan_pyramid(48, 512, 10, levels=2) == []
        assert "too small to halve" in caplog.text


class TestPyramidInit:
    def test_three_level_warm_start(
        self, make_style_transfer_config, caplog,
    ) -> None:
        import logging

        params = vgg19.init_random_params(jax.random.key(0))
        key = jax.random.key(3)
        content = jax.random.uniform(key, (1, 128, 128, 3), jnp.float32)
        style = jax.random.uniform(
            jax.random.fold_in(key, 1), (1, 128, 128, 3), jnp.float32,
        )
        cfg = make_style_transfer_config(
            optimization={
                "steps": 1, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "init_method": "random", "coarse_steps": 4,
                "pyramid_levels": 3,
            },
        )
        with caplog.at_level(logging.INFO):
            warm = coarse_init(params, content, style, cfg, key)
        assert warm is not None
        assert warm.shape == content.shape
        assert np.all(np.isfinite(np.asarray(warm)))
        # Both levels ran, coarsest first, each warm-starting the next.
        assert "2 steps at 32x32" in caplog.text
        assert "2 steps at 64x64" in caplog.text
        assert caplog.text.index("32x32") < caplog.text.index("64x64")

    def test_default_levels_is_single_half_res(self, tiny_setup) -> None:
        params, content, style, cfg = tiny_setup
        assert cfg.optimization.pyramid_levels == 2
        warm = coarse_init(params, content, style, cfg, jax.random.key(2))
        assert warm is not None
        assert warm.shape == content.shape

    def test_cli_merge(self) -> None:
        from style_transfer_visualizer_tpu.config import (
            build_config_from_cli,
        )

        cfg = build_config_from_cli(
            {"coarse_steps": 8, "pyramid_levels": 4},
        )
        assert cfg.optimization.pyramid_levels == 4

    def test_levels_bounds_validated(self) -> None:
        import pydantic

        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )

        with pytest.raises(pydantic.ValidationError):
            StyleTransferConfig.model_validate(
                {"optimization": {"pyramid_levels": 1}},
            )
        with pytest.raises(pydantic.ValidationError):
            StyleTransferConfig.model_validate(
                {"optimization": {"pyramid_levels": 7}},
            )


class TestBatchCoarse:
    def test_multi_style_warm_start_end_to_end(self, tmp_path) -> None:
        """--coarse-steps in batch mode runs the vmapped half-res phase."""
        import logging

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
                "coarse_steps": 3,
            },
            "hardware": {"device": "cpu"},
            "output": {"output": str(tmp_path / "out")},
            "video": {"create_video": False},
        })
        logging.getLogger("style_transfer_tpu").setLevel(logging.INFO)
        saved = multi_style_transfer(
            str(content), [str(s1), str(s2)], cfg,
        )
        assert all(p.exists() for p in saved)

    def test_batch_lap_pyramid_and_match_compose(self, tmp_path) -> None:
        """Batch mode composes lap term, 3-level pyramid, and match.

        One run covers the vmapped path's Laplacian target (full-res
        AND per coarse level), the multi-level ladder's resize
        warm-start between batch coarse levels, and ``match`` color
        preservation of every style before its targets.
        """
        from PIL import Image

        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content = tmp_path / "c.png"
        s1 = tmp_path / "s1.png"
        s2 = tmp_path / "s2.png"
        Image.new("RGB", (128, 128), (0, 180, 0)).save(content)
        Image.new("RGB", (64, 64), (180, 0, 0)).save(s1)
        Image.new("RGB", (64, 64), (0, 0, 180)).save(s2)
        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 2, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "allow_random_weights": True, "init_method": "content",
                "coarse_steps": 4, "pyramid_levels": 3,
                "lap_w": 2.0, "lap_pool": 4,
                "preserve_color": "match",
            },
            "hardware": {"device": "cpu"},
            "output": {"output": str(tmp_path / "out")},
            "video": {"create_video": False},
        })
        saved = multi_style_transfer(
            str(content), [str(s1), str(s2)], cfg,
        )
        assert all(p.exists() for p in saved)

    def test_batch_coarse_lap_skips_at_tiny_level(
        self, tmp_path, caplog,
    ) -> None:
        """A coarse level too small for lap_pool drops the term loudly."""
        import logging

        from PIL import Image

        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content = tmp_path / "c.png"
        s1 = tmp_path / "s1.png"
        Image.new("RGB", (64, 64), (0, 180, 0)).save(content)
        Image.new("RGB", (64, 64), (180, 0, 0)).save(s1)
        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 1, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "allow_random_weights": True, "init_method": "content",
                "coarse_steps": 2, "lap_w": 2.0, "lap_pool": 16,
            },
            "hardware": {"device": "cpu"},
            "output": {"output": str(tmp_path / "out")},
            "video": {"create_video": False},
        })
        with caplog.at_level(logging.INFO):
            multi_style_transfer(str(content), [str(s1)], cfg)
        assert "too small for lap_pool" in caplog.text

    def test_batch_warm_start_logged(self, tmp_path, caplog) -> None:
        import logging

        from PIL import Image

        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content = tmp_path / "c.png"
        s1 = tmp_path / "s1.png"
        Image.new("RGB", (64, 64), (0, 180, 0)).save(content)
        Image.new("RGB", (64, 64), (180, 0, 0)).save(s1)
        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 1, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "allow_random_weights": True, "init_method": "content",
                "coarse_steps": 2,
            },
            "hardware": {"device": "cpu"},
            "output": {"output": str(tmp_path / "out")},
            "video": {"create_video": False},
        })
        with caplog.at_level(logging.INFO):
            multi_style_transfer(str(content), [str(s1)], cfg)
        assert "vmapped steps at 32x32" in caplog.text

    def test_dp_sp_batch_runs_warm_start(
        self, tmp_path, caplog,
    ) -> None:
        """Coarse warm start composes with dp x sp batch mode.

        The coarse levels run style-sharded only (small problems need
        no row sharding) and the warm full-res stack reshards onto the
        dp x sp layout — no silent degradation (round-3 verdict #3).
        """
        import logging

        from PIL import Image

        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content = tmp_path / "c.png"
        s1 = tmp_path / "s1.png"
        Image.new("RGB", (64, 64), (0, 180, 0)).save(content)
        Image.new("RGB", (64, 64), (180, 0, 0)).save(s1)
        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 1, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "allow_random_weights": True, "init_method": "content",
                "coarse_steps": 2,
            },
            "hardware": {"device": "cpu", "spatial_shards": 2},
            "output": {"output": str(tmp_path / "out")},
            "video": {"create_video": False},
        })
        with caplog.at_level(logging.INFO):
            saved = multi_style_transfer(str(content), [str(s1)], cfg)
        assert "vmapped steps at 32x32" in caplog.text
        assert "not applied" not in caplog.text
        assert all(p.exists() for p in saved)

    def test_batch_too_small_skips_with_log(
        self, tmp_path, caplog, monkeypatch,
    ) -> None:
        import logging

        from PIL import Image

        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        monkeypatch.setattr(
            "style_transfer_visualizer_tpu.engine.coarse.pyramid_dims",
            lambda h, w, levels: [],
        )
        content = tmp_path / "c.png"
        s1 = tmp_path / "s1.png"
        Image.new("RGB", (64, 64), (0, 180, 0)).save(content)
        Image.new("RGB", (64, 64), (180, 0, 0)).save(s1)
        cfg = StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 1, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "allow_random_weights": True, "init_method": "content",
                "coarse_steps": 2,
            },
            "hardware": {"device": "cpu"},
            "output": {"output": str(tmp_path / "out")},
            "video": {"create_video": False},
        })
        with caplog.at_level(logging.INFO):
            multi_style_transfer(str(content), [str(s1)], cfg)
        assert "too small to halve" in caplog.text


class TestBatchCoarseMemory:
    """Batch warm start honors the batch remat policy and never
    materializes the full-res init stack it is about to replace."""

    @pytest.fixture
    def batch_setup(self, tiny_setup):
        from style_transfer_visualizer_tpu.parallel.mesh import create_mesh

        params, content, style, cfg = tiny_setup
        mesh = create_mesh(
            n_style=1, n_space=1, devices=jax.devices()[:1],
        )
        return mesh, params, content, style, cfg

    def test_coarse_bundle_gets_batch_remat(
        self, batch_setup, monkeypatch,
    ) -> None:
        import style_transfer_visualizer_tpu.main as stv_main
        import style_transfer_visualizer_tpu.parallel.multistyle as ms

        mesh, params, content, style, cfg = batch_setup
        cfg.optimization.coarse_steps = 1
        captured: dict = {}
        real = ms.build_multi_style_update

        def spy(*args, **kwargs):
            captured.update(kwargs)
            return real(*args, **kwargs)

        monkeypatch.setattr(ms, "build_multi_style_update", spy)
        monkeypatch.setattr(
            stv_main, "_auto_remat_batched", lambda px, s: True,
        )
        images = stv_main._multi_initial_images(
            mesh, params, content, [style], cfg, jax.random.key(0),
            1, "xla", 1,
        )
        assert images.shape == (1, 1, 64, 64, 3)
        assert captured["remat"] is True

    def test_user_remat_flag_wins_over_batch_auto_rule(
        self, batch_setup, monkeypatch,
    ) -> None:
        """--remat short-circuits; the auto rule is never consulted."""
        import style_transfer_visualizer_tpu.main as stv_main
        import style_transfer_visualizer_tpu.parallel.multistyle as ms

        mesh, params, content, style, cfg = batch_setup
        cfg.optimization.coarse_steps = 1
        cfg.optimization.remat = True
        captured: dict = {}
        real = ms.build_multi_style_update

        def spy(*args, **kwargs):
            captured.update(kwargs)
            return real(*args, **kwargs)

        def explode(px, s):
            raise AssertionError("auto rule must not run under --remat")

        monkeypatch.setattr(ms, "build_multi_style_update", spy)
        monkeypatch.setattr(stv_main, "_auto_remat_batched", explode)
        stv_main._multi_initial_images(
            mesh, params, content, [style], cfg, jax.random.key(0),
            1, "xla", 1,
        )
        assert captured["remat"] is True

    def test_no_eager_full_res_init_on_warm_start(
        self, batch_setup, monkeypatch,
    ) -> None:
        import style_transfer_visualizer_tpu.main as stv_main
        import style_transfer_visualizer_tpu.parallel.multistyle as ms

        mesh, params, content, style, cfg = batch_setup
        cfg.optimization.coarse_steps = 1
        init_shapes: list[tuple] = []
        real = ms.initialize_multi_inputs

        def spy(content_img, *args, **kwargs):
            init_shapes.append(tuple(content_img.shape))
            return real(content_img, *args, **kwargs)

        monkeypatch.setattr(ms, "initialize_multi_inputs", spy)
        stv_main._multi_initial_images(
            mesh, params, content, [style], cfg, jax.random.key(0),
            1, "xla", 1,
        )
        # Only the coarse-resolution init is built; the (S,1,H,W,3)
        # full-res stack would be discarded by the upsample anyway.
        assert init_shapes == [(1, 32, 32, 3)]

    def test_fallback_builds_full_res_init(self, batch_setup) -> None:
        import style_transfer_visualizer_tpu.main as stv_main

        mesh, params, content, style, cfg = batch_setup
        cfg.optimization.coarse_steps = 0
        images = stv_main._multi_initial_images(
            mesh, params, content, [style], cfg, jax.random.key(0),
            1, "xla", 1,
        )
        assert images.shape == (1, 1, 64, 64, 3)


class TestResumeInterplay:
    def test_single_run_resume_skips_coarse(
        self, tiny_setup, caplog, monkeypatch,
    ) -> None:
        import logging

        import style_transfer_visualizer_tpu.main as stv_main

        params, content, style, cfg = tiny_setup
        cfg.output.resume_from = "some_checkpoint.npz"
        cfg.optimization.init_method = "content"

        def explode(*a, **k):
            raise AssertionError("coarse must not run when resuming")

        monkeypatch.setattr(
            "style_transfer_visualizer_tpu.engine.coarse.coarse_init",
            explode,
        )
        with caplog.at_level(logging.INFO):
            out = stv_main._initial_image(
                params, content, style, cfg, jax.random.key(0),
            )
        assert "skipped: resuming" in caplog.text
        np.testing.assert_array_equal(np.asarray(out), np.asarray(content))

    def test_batch_resume_skips_coarse(self, tmp_path, caplog) -> None:
        import logging

        from PIL import Image

        from style_transfer_visualizer_tpu.config import (
            StyleTransferConfig,
        )
        from style_transfer_visualizer_tpu.main import multi_style_transfer

        content = tmp_path / "c.png"
        s1 = tmp_path / "s1.png"
        Image.new("RGB", (64, 64), (0, 180, 0)).save(content)
        Image.new("RGB", (64, 64), (180, 0, 0)).save(s1)

        base = StyleTransferConfig.model_validate({
            "optimization": {
                "steps": 2, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "allow_random_weights": True, "init_method": "content",
            },
            "hardware": {"device": "cpu"},
            "output": {"output": str(tmp_path / "out"),
                       "checkpoint_every": 2},
            "video": {"create_video": False},
        })
        multi_style_transfer(str(content), [str(s1)], base)
        ckpt = tmp_path / "out" / "checkpoint.npz"
        assert ckpt.exists()

        resumed = base.model_copy(deep=True)
        resumed.optimization.steps = 3
        resumed.optimization.coarse_steps = 2
        resumed.output.resume_from = str(ckpt)
        with caplog.at_level(logging.INFO):
            multi_style_transfer(str(content), [str(s1)], resumed)
        assert "skipped: resuming" in caplog.text


class TestSequenceCoarse:
    def test_frame_zero_warm_start(
        self, tmp_path, make_style_transfer_config, caplog,
    ) -> None:
        """--coarse-steps seeds frame 0 of a sequence run."""
        import logging

        from PIL import Image

        from style_transfer_visualizer_tpu import sequence as seq

        frames = tmp_path / "frames"
        frames.mkdir()
        for i in range(2):
            Image.new("RGB", (64, 64), (10 * i, 120, 60)).save(
                frames / f"f{i:02d}.png",
            )
        style_file = tmp_path / "style.png"
        Image.new("RGB", (64, 64), (180, 20, 20)).save(style_file)

        cfg = make_style_transfer_config(
            optimization={
                "steps": 2, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "init_method": "random", "coarse_steps": 2,
                "allow_random_weights": True,
            },
        )
        params = vgg19.init_random_params(jax.random.key(0))
        with caplog.at_level(logging.INFO):
            result = seq.stylize_sequence(
                frames, style_file, cfg, tmp_path / "out", params=params,
            )
        assert len(result.frame_paths) == 2
        assert "Coarse warm start: 2 steps at 32x32" in caplog.text

    def test_frame_zero_falls_back_when_coarse_declines(
        self, tmp_path, make_style_transfer_config, monkeypatch,
    ) -> None:
        from PIL import Image

        from style_transfer_visualizer_tpu import sequence as seq

        monkeypatch.setattr(
            "style_transfer_visualizer_tpu.engine.coarse.coarse_init",
            lambda *a, **k: None,
        )
        frames = tmp_path / "frames"
        frames.mkdir()
        Image.new("RGB", (64, 64), (10, 120, 60)).save(frames / "f0.png")
        style_file = tmp_path / "style.png"
        Image.new("RGB", (64, 64), (180, 20, 20)).save(style_file)
        cfg = make_style_transfer_config(
            optimization={
                "steps": 1, "optimizer": "adam", "lr": 0.05,
                "style_layers": [0], "content_layers": [2],
                "init_method": "content", "coarse_steps": 2,
                "allow_random_weights": True,
            },
        )
        params = vgg19.init_random_params(jax.random.key(0))
        result = seq.stylize_sequence(
            frames, style_file, cfg, tmp_path / "out", params=params,
        )
        assert len(result.frame_paths) == 1
