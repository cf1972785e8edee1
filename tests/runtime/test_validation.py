"""Input path and parameter validation."""
from __future__ import annotations

import pytest

from style_transfer_visualizer_tpu.runtime.validation import (
    validate_input_paths,
    validate_parameters,
)


def test_valid_paths(content_image, style_image) -> None:
    validate_input_paths(str(content_image), str(style_image))


def test_missing_content(style_image) -> None:
    with pytest.raises(FileNotFoundError, match="Content image not found"):
        validate_input_paths("/nope.png", str(style_image))


def test_missing_style(content_image) -> None:
    with pytest.raises(FileNotFoundError, match="Style image not found"):
        validate_input_paths(str(content_image), "/nope.png")


@pytest.mark.parametrize("quality", [0, 11, -3])
def test_bad_quality(quality: int) -> None:
    with pytest.raises(ValueError, match="Video quality"):
        validate_parameters(quality)


@pytest.mark.parametrize("quality", [1, 5, 10])
def test_good_quality(quality: int) -> None:
    validate_parameters(quality)
