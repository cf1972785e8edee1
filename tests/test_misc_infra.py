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
