"""Runtime comparison rendering (CLI --compare-* behavior)."""
from __future__ import annotations

from pathlib import Path

import pytest
from PIL import Image

from style_transfer_visualizer_tpu.runtime.comparison import (
    ComparisonRequest,
    comparison_output_path,
    render_requested_comparisons,
)


@pytest.fixture
def inputs(tmp_path: Path) -> tuple[Path, Path, Path]:
    content = tmp_path / "cat.png"
    style = tmp_path / "wave.png"
    Image.new("RGB", (96, 64), (10, 160, 10)).save(content)
    Image.new("RGB", (64, 64), (10, 10, 160)).save(style)
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    return content, style, out_dir


def test_output_path_variants(tmp_path: Path) -> None:
    base = comparison_output_path(
        tmp_path, Path("c.png"), Path("s.png"), include_result=False,
    )
    final = comparison_output_path(
        tmp_path, Path("c.png"), Path("s.png"), include_result=True,
    )
    assert base.name == "comparison_c_x_s.png"
    assert final.name == "comparison_c_x_s_final.png"


def test_inputs_only(inputs) -> None:
    content, style, out_dir = inputs
    saved = render_requested_comparisons(
        content_path=content, style_path=style, output_dir=out_dir,
        request=ComparisonRequest(include_inputs=True, include_result=False),
    )
    assert len(saved) == 1
    with Image.open(saved[0]) as im:
        assert im.size == (96, 64)  # canvas follows content image


def test_result_missing_warns_and_skips(inputs, caplog) -> None:
    content, style, out_dir = inputs
    saved = render_requested_comparisons(
        content_path=content, style_path=style, output_dir=out_dir,
        request=ComparisonRequest(include_inputs=False, include_result=True),
    )
    assert saved == []
    assert "Expected stylized result missing" in caplog.text


def test_result_present_renders_final(inputs) -> None:
    content, style, out_dir = inputs
    stylized = out_dir / "stylized_cat_x_wave.png"
    Image.new("RGB", (96, 64), (120, 60, 60)).save(stylized)
    saved = render_requested_comparisons(
        content_path=content, style_path=style, output_dir=out_dir,
        request=ComparisonRequest(include_inputs=True, include_result=True),
    )
    assert [p.name for p in saved] == [
        "comparison_cat_x_wave.png",
        "comparison_cat_x_wave_final.png",
    ]


def test_explicit_result_path(inputs) -> None:
    content, style, out_dir = inputs
    custom = out_dir / "custom_result.png"
    Image.new("RGB", (96, 64), (1, 2, 3)).save(custom)
    saved = render_requested_comparisons(
        content_path=content, style_path=style, output_dir=out_dir,
        request=ComparisonRequest(
            include_inputs=False, include_result=True, result_path=custom,
        ),
    )
    assert len(saved) == 1


def test_include_result_without_result_path_renders_two_panel(
    tmp_path,
) -> None:
    """include_result with no stylized image degrades to two panels."""
    from PIL import Image

    from style_transfer_visualizer_tpu.runtime.comparison import (
        render_comparison_image,
    )

    content = tmp_path / "c.png"
    style = tmp_path / "s.png"
    Image.new("RGB", (64, 48), "red").save(content)
    Image.new("RGB", (64, 48), "blue").save(style)
    out = render_comparison_image(
        content, style,
        output_dir=tmp_path,
        include_result=True,
        result_path=None,
    )
    assert out.exists()
