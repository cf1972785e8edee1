"""Image-grid rendering: gallery walls, framed panels, comparison grids.

Host-side PIL compositing shared by the video intro/outro segments and
the standalone ``compare-grid`` tool (the reference shares it the same
way, video.py:22-25).
"""

from style_transfer_visualizer_tpu.image_grid.core import (
    FrameParams,
    build_framed_panel,
    make_wall_canvas,
)
from style_transfer_visualizer_tpu.image_grid.layouts import (
    make_gallery_comparison,
    make_horizontal_grid,
)
from style_transfer_visualizer_tpu.image_grid.naming import (
    default_comparison_name,
    save_comparison_grid,
    save_gallery_comparison,
)

__all__ = [
    "FrameParams",
    "build_framed_panel",
    "default_comparison_name",
    "make_gallery_comparison",
    "make_horizontal_grid",
    "make_wall_canvas",
    "save_comparison_grid",
    "save_gallery_comparison",
]
