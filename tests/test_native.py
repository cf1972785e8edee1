"""Native frameops: build, bindings, and parity with the numpy path."""
from __future__ import annotations

import numpy as np
import pytest

pytest.importorskip(
    "style_transfer_visualizer_tpu.native.frameops",
    reason="no C compiler available",
)

from style_transfer_visualizer_tpu.native import frameops  # noqa: E402


class TestBlend:
    def test_endpoints(self) -> None:
        a = np.full((8, 8, 3), 10, np.uint8)
        b = np.full((8, 8, 3), 250, np.uint8)
        np.testing.assert_array_equal(frameops.blend_u8(a, b, 0.0), a)
        np.testing.assert_array_equal(frameops.blend_u8(a, b, 1.0), b)

    def test_midpoint(self) -> None:
        a = np.zeros((4, 4, 3), np.uint8)
        b = np.full((4, 4, 3), 200, np.uint8)
        out = frameops.blend_u8(a, b, 0.5)
        assert int(out[0, 0, 0]) == 100

    def test_matches_float_reference_within_one(self) -> None:
        rng = np.random.default_rng(0)
        a = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        b = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        for alpha in (0.1, 0.33, 0.5, 0.77):
            ours = frameops.blend_u8(a, b, alpha).astype(np.int16)
            ref = np.rint(
                a.astype(np.float32) * (1 - alpha)
                + b.astype(np.float32) * alpha,
            ).astype(np.int16)
            assert np.abs(ours - ref).max() <= 1  # fixed-point LSB

    def test_shape_mismatch(self) -> None:
        with pytest.raises(ValueError, match="share shape"):
            frameops.blend_u8(
                np.zeros((2, 2, 3), np.uint8),
                np.zeros((3, 3, 3), np.uint8),
                0.5,
            )


class TestPack:
    def test_pack_and_clamp(self) -> None:
        src = np.asarray([[-0.5, 0.0, 0.5, 1.0, 2.0]], np.float32)
        out = frameops.pack_f32_to_u8(src)
        assert list(out[0]) == [0, 0, 128, 255, 255]


class TestLoader:
    """Build-and-load lifecycle of the shared object."""

    @pytest.fixture
    def isolated_cache(self, tmp_path, monkeypatch):
        from style_transfer_visualizer_tpu.native import loader

        cache = tmp_path / "cache"
        monkeypatch.setattr(loader, "_CACHE_DIR", cache)
        monkeypatch.setattr(loader, "_SO_PATH", cache / "frameops.so")
        return loader

    def test_build_compiles_fresh_so(self, isolated_cache) -> None:
        loader = isolated_cache
        so = loader.build_library()
        assert so.exists()
        assert so == loader._SO_PATH

    def test_build_is_idempotent(self, isolated_cache) -> None:
        loader = isolated_cache
        first = loader.build_library()
        mtime = first.stat().st_mtime_ns
        assert loader.build_library() == first
        assert first.stat().st_mtime_ns == mtime

    def test_no_compiler_raises(self, isolated_cache, monkeypatch) -> None:
        loader = isolated_cache
        monkeypatch.setattr(loader, "_compiler", lambda: None)
        with pytest.raises(loader.NativeBuildError, match="compiler"):
            loader.build_library()

    def test_compile_failure_raises_with_stderr(
        self, isolated_cache, monkeypatch,
    ) -> None:
        loader = isolated_cache

        class FailedRun:
            returncode = 1
            stderr = "synthetic compile explosion"

        monkeypatch.setattr(
            loader.subprocess, "run", lambda *a, **k: FailedRun(),
        )
        with pytest.raises(loader.NativeBuildError, match="explosion"):
            loader.build_library()

    def test_corrupt_so_gets_one_forced_rebuild(
        self, isolated_cache,
    ) -> None:
        loader = isolated_cache
        loader._CACHE_DIR.mkdir(parents=True)
        loader._SO_PATH.write_bytes(b"not an ELF object")
        # Make the stale corrupt file newer than the source so the
        # cached-artifact fast path keeps it until the load fails.
        lib = loader.load_library()
        assert lib.blend_u8 is not None

    def test_persistently_unloadable_raises(
        self, isolated_cache, monkeypatch,
    ) -> None:
        loader = isolated_cache

        def fake_build(force: bool = False):  # noqa: FBT001, FBT002
            loader._CACHE_DIR.mkdir(parents=True, exist_ok=True)
            loader._SO_PATH.write_bytes(b"garbage")
            return loader._SO_PATH

        monkeypatch.setattr(loader, "build_library", fake_build)
        with pytest.raises(loader.NativeBuildError, match="load failed"):
            loader.load_library()

    def test_compiler_discovery_prefers_available(self) -> None:
        from style_transfer_visualizer_tpu.native import loader

        cc = loader._compiler()
        assert cc is not None  # this image ships g++/gcc


def test_segments_use_native_when_available() -> None:
    from style_transfer_visualizer_tpu.media.segments import blend_frames

    a = np.zeros((4, 4, 3), np.uint8)
    b = np.full((4, 4, 3), 100, np.uint8)
    out = blend_frames(a, b, 0.25)
    assert int(out[0, 0, 0]) == 25


def test_compiler_discovery_none_when_nothing_found(monkeypatch) -> None:
    from style_transfer_visualizer_tpu.native import loader

    monkeypatch.setattr(loader.shutil, "which", lambda _: None)
    assert loader._compiler() is None


def test_stale_so_rebuilt_when_source_newer(tmp_path, monkeypatch) -> None:
    """An .so older than its source recompiles instead of loading stale."""
    import os

    from style_transfer_visualizer_tpu.native import loader

    cache = tmp_path / "cache"
    monkeypatch.setattr(loader, "_CACHE_DIR", cache)
    monkeypatch.setattr(loader, "_SO_PATH", cache / "frameops.so")
    so = loader.build_library()
    src_mtime = loader._SOURCE.stat().st_mtime
    os.utime(so, (src_mtime - 100, src_mtime - 100))
    rebuilt = loader.build_library()
    assert rebuilt.stat().st_mtime >= src_mtime
