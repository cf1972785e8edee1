"""Output directory setup and artifact persistence."""
from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import pytest
from PIL import Image

from style_transfer_visualizer_tpu.runtime.output import (
    save_outputs,
    setup_output_directory,
    stylized_image_path_from_names,
    stylized_image_path_from_paths,
)
from style_transfer_visualizer_tpu.type_defs import SaveOptions


def test_setup_creates_dir(tmp_path: Path) -> None:
    target = tmp_path / "a" / "b"
    out = setup_output_directory(str(target))
    assert out == target
    assert out.is_dir()


def test_setup_falls_back_on_oserror(tmp_path: Path, monkeypatch) -> None:
    calls = {}

    class ExplodingPath(type(Path())):
        def mkdir(self, *a, **k):
            if "fallback" not in str(self):
                raise OSError("denied")
            calls["fallback"] = True
            return super().mkdir(*a, **k)

    def factory(p: str):
        if p == "style_transfer_output":
            return tmp_path / "fallback"
        return ExplodingPath(p)

    out = setup_output_directory(str(tmp_path / "denied"), factory)
    assert out == tmp_path / "fallback"


def test_canonical_names() -> None:
    p = stylized_image_path_from_names(Path("/o"), "cat", "wave")
    assert p == Path("/o/stylized_cat_x_wave.png")
    p2 = stylized_image_path_from_paths(
        Path("/o"), Path("/in/my cat.jpg"), Path("/in/the wave.png"),
    )
    assert p2 == Path("/o/stylized_my_cat_x_the_wave.png")


def test_save_outputs_writes_png_and_plot(tmp_path: Path, caplog) -> None:
    img = jnp.full((1, 8, 8, 3), 0.5, dtype=jnp.float32)
    metrics = {"style_loss": [1.0, 0.5], "content_loss": [0.1, 0.05],
               "total_loss": [1.1, 0.55]}
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    opts = SaveOptions(
        content_name="c", style_name="s",
        video_name="v.mp4", gif_name=None, normalize=False,
        video_created=True, gif_created=False, plot_losses=True,
    )
    save_outputs(img, metrics, out_dir, 1.23, opts)
    final = out_dir / "stylized_c_x_s.png"
    assert final.exists()
    with Image.open(final) as im:
        assert im.size == (8, 8)
    assert (out_dir / "loss_plot.png").exists()
    assert "completed in" in caplog.text
    assert "Video saved to" in caplog.text


def test_save_outputs_creates_missing_dir(tmp_path: Path) -> None:
    img = jnp.zeros((1, 4, 4, 3), dtype=jnp.float32)
    out_dir = tmp_path / "newdir"
    opts = SaveOptions(content_name="c", style_name="s", plot_losses=False)
    save_outputs(img, {}, out_dir, 0.1, opts)
    assert (out_dir / "stylized_c_x_s.png").exists()


def test_save_outputs_gif_logged_only_if_exists(
    tmp_path: Path, caplog: pytest.LogCaptureFixture,
) -> None:
    img = jnp.zeros((1, 4, 4, 3), dtype=jnp.float32)
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    (out_dir / "t.gif").write_bytes(b"GIF89a")
    opts = SaveOptions(
        content_name="c", style_name="s", gif_name="t.gif",
        gif_created=True, video_created=False, plot_losses=False,
    )
    save_outputs(img, {}, out_dir, 0.1, opts)
    assert "GIF saved to" in caplog.text


def test_save_outputs_falls_back_when_dir_uncreatable(
    tmp_path, monkeypatch,
) -> None:
    """An uncreatable output dir reroutes artifacts to the fallback."""
    import style_transfer_visualizer_tpu.runtime.output as output_mod

    monkeypatch.chdir(tmp_path)
    real_mkdir = Path.mkdir

    def deny_first(self, *a, **k):
        if self.name == "denied":
            raise OSError("permission denied")
        return real_mkdir(self, *a, **k)

    monkeypatch.setattr(Path, "mkdir", deny_first)
    img = jnp.full((1, 4, 4, 3), 0.5, jnp.float32)
    opts = SaveOptions(
        content_name="c", style_name="s", video_name=None, gif_name=None,
        normalize=False, video_created=False, gif_created=False,
        plot_losses=False,
    )
    output_mod.save_outputs(img, {}, tmp_path / "denied", 1.0, opts)
    fallback = tmp_path / "style_transfer_output"
    assert (fallback / "stylized_c_x_s.png").exists()
