"""Compatibility wrapper around the shared gallery CLI.

Mirrors the reference's legacy shim (tools/compare_grid.py:6-23) so
scripts importing the tool path keep working.
"""
from __future__ import annotations

from style_transfer_visualizer_tpu.gallery import (
    parse_wall_color as _parse_hex_color,
    positive_int,
    size_2d,
)
from style_transfer_visualizer_tpu.gallery.cli import build_parser, main

__all__ = [
    "_parse_hex_color",
    "build_parser",
    "main",
    "positive_int",
    "size_2d",
]


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
