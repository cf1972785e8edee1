"""Infrastructure odds and ends: compile cache, graft entry, exports."""
from __future__ import annotations

import os
from pathlib import Path

import jax
import pytest

import style_transfer_visualizer_tpu.utils.cache as cache_mod


class TestCompilationCache:
    def test_enable_sets_config(self, tmp_path, monkeypatch) -> None:
        monkeypatch.setattr(cache_mod, "_enabled", False)
        monkeypatch.delenv("STV_NO_XLA_CACHE", raising=False)
        cache_mod.enable_persistent_compilation_cache(tmp_path / "xla")
        assert (tmp_path / "xla").is_dir()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")

    def test_opt_out_env(self, tmp_path, monkeypatch) -> None:
        monkeypatch.setattr(cache_mod, "_enabled", False)
        monkeypatch.setenv("STV_NO_XLA_CACHE", "1")
        cache_mod.enable_persistent_compilation_cache(tmp_path / "nope")
        assert not (tmp_path / "nope").exists()

    def test_idempotent(self, tmp_path, monkeypatch) -> None:
        monkeypatch.setattr(cache_mod, "_enabled", False)
        monkeypatch.delenv("STV_NO_XLA_CACHE", raising=False)
        cache_mod.enable_persistent_compilation_cache(tmp_path / "a")
        cache_mod.enable_persistent_compilation_cache(tmp_path / "b")
        assert not (tmp_path / "b").exists()  # second call is a no-op


class TestGraftEntry:
    def test_entry_compiles_and_runs(self) -> None:
        import sys

        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        import __graft_entry__ as graft

        fn, args = graft.entry()
        loss, style_score, content_score, grad = jax.jit(fn)(*args)
        assert grad.shape == (1, 128, 128, 3)
        assert float(loss) > 0

    def test_dryrun_multichip_all_device_counts(self) -> None:
        import sys

        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        import __graft_entry__ as graft

        for n in (1, 2, 4, 8):
            graft.dryrun_multichip(n)


class TestNativeLoader:
    def test_build_idempotent(self) -> None:
        from style_transfer_visualizer_tpu.native import loader

        first = loader.build_library()
        second = loader.build_library()
        assert first == second
        assert first.exists()

    def test_missing_compiler_raises(self, monkeypatch) -> None:
        from style_transfer_visualizer_tpu.native import loader

        monkeypatch.setattr(loader, "_compiler", lambda: None)
        monkeypatch.setattr(
            loader, "_SO_PATH", Path("/nonexistent/f.so"),
        )
        with pytest.raises(loader.NativeBuildError, match="compiler"):
            loader.build_library()


def test_profile_dir_writes_trace(
    make_style_transfer_config, make_input_paths, tmp_path,
) -> None:
    """--profile-dir captures a jax.profiler trace of the loop."""
    from style_transfer_visualizer_tpu.main import style_transfer

    profile_dir = tmp_path / "trace"
    cfg = make_style_transfer_config(
        optimization={
            "style_layers": [0],
            "content_layers": [2],
            "allow_random_weights": True,
            "optimizer": "adam",
            "steps": 2,
        },
        video={"final_only": True},
        output={"profile_dir": str(profile_dir)},
    )
    style_transfer(make_input_paths(), cfg)
    traces = list(profile_dir.rglob("*"))
    assert any(p.is_file() for p in traces), traces


class TestBranchDirections:
    """One-way branch directions flagged by the branch coverage tool."""

    def test_accumulator_places_buffer_on_explicit_device(self) -> None:
        import jax

        from style_transfer_visualizer_tpu.engine.loss_accumulator import (
            LossAccumulator,
        )

        acc = LossAccumulator(
            log_every=1, history_capacity=4, track_history=True,
            device=jax.devices("cpu")[0],
        )
        assert acc.tracks_history

    def test_single_device_mesh_accepts_explicit_device(self) -> None:
        import jax

        from style_transfer_visualizer_tpu.parallel.mesh import (
            single_device_mesh,
        )

        mesh = single_device_mesh(jax.devices("cpu")[0])
        assert mesh.devices.shape == (1, 1)

    def test_save_array_as_image_accepts_hwc(self, tmp_path) -> None:
        import numpy as np
        from PIL import Image

        from style_transfer_visualizer_tpu.image_io import (
            save_array_as_image,
        )

        path = tmp_path / "hwc.png"
        save_array_as_image(np.full((4, 4, 3), 0.5, np.float32), path)
        with Image.open(path) as img:
            assert img.size == (4, 4)


class TestDryrunPlatformEscapeHatch:
    """STV_DRYRUN_PLATFORM overrides the dry run's CPU pin (round-4
    weak #6: the default ordering never exercises real chips)."""

    def test_explicit_platform_is_honored(self, monkeypatch) -> None:
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        import __graft_entry__ as graft

        monkeypatch.setenv("STV_DRYRUN_PLATFORM", "cpu")
        devices = graft._mesh_devices(4)
        assert len(devices) == 4
        assert all(d.platform == "cpu" for d in devices)

    def test_too_few_devices_on_platform_raises(self, monkeypatch) -> None:
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        import __graft_entry__ as graft

        monkeypatch.setenv("STV_DRYRUN_PLATFORM", "cpu")
        with pytest.raises(RuntimeError, match="needs 64"):
            graft._mesh_devices(64)
