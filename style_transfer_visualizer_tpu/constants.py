"""Implementation-level constants shared across the framework.

Behavioral constants (normalization statistics, clamp thresholds, size
limits, encoder settings, auto-video-mode thresholds) mirror the reference
implementation so outputs match; TPU-specific constants (layouts, precision,
mesh axis names) are new to this framework.

Reference parity: constants.py:11-43 in
/root/reference/src/style_transfer_visualizer/.
"""
from __future__ import annotations

# --- Normalization (torchvision ImageNet statistics) ---------------------
IMAGENET_MEAN: tuple[float, float, float] = (0.485, 0.456, 0.406)
IMAGENET_STD: tuple[float, float, float] = (0.229, 0.224, 0.225)

# --- Numerical stability --------------------------------------------------
# Per-element ceiling applied to the raw (un-normalized) Gram matrix before
# dividing by the element count; keeps style gradients from exploding.
GRAM_MATRIX_CLAMP_MAX = 5e5

# --- Image size limits ------------------------------------------------
MIN_DIMENSION = 64       # hard error below this
MAX_DIMENSION = 3000     # soft warning above this

# --- Video encoding ---------------------------------------------------
VIDEO_CODEC = "libx264"
ENCODING_BLOCK_SIZE = 16         # output dims padded to this macroblock size
VIDEO_QUALITY_MIN = 1
VIDEO_QUALITY_MAX = 10

# --- Palette ----------------------------------------------------------
COLOR_MODE_RGB = "RGB"
COLOR_BLACK = (0, 0, 0)
COLOR_WHITE = (255, 255, 255)
COLOR_BEIGE = (240, 236, 226)
COLOR_GREY = (60, 67, 74)

# --- Loss logging -----------------------------------------------------
CSV_LOGGING_RECOMMENDED_STEPS = 2000

# --- Canvas -----------------------------------------------------------
RESOLUTION_FULL_HD = (1920, 1080)

# --- TPU-specific -----------------------------------------------------
# Device arrays are NHWC so convolutions map directly onto the MXU; the
# reference's NCHW view shape has no equivalent here.
IMAGE_LAYOUT = "NHWC"

# Mesh axis names used by the parallel subsystem.
MESH_AXIS_STYLE = "style"    # data parallelism over style images
MESH_AXIS_SPACE = "space"    # spatial sharding of feature maps (tiled Gram)

# Inputs at or above this pixel count auto-enable banded (scan-tiled)
# loss evaluation: the largest whole-image fwd+bwd graph this hardware
# class compiles and fits is ~3.8MP (1440p, BASELINE.md); 4K is 8.3MP.
AUTO_TILE_PIXEL_THRESHOLD = 4_200_000

# Single-run inputs at or above this pixel count auto-enable feature
# rematerialization (only relevant between this and the tiling
# threshold; 1440p/3.8MP measured 44% faster whole-image, BASELINE.md).
AUTO_REMAT_PIXEL_THRESHOLD = 2048 * 2048

# Batch (multi-style) runs remat by per-device pixels x styles.
# Activation memory is the only driver there (the vmapped graph does
# not grow with S): measured at 512px mixed, 24 styles (6.3M-equiv)
# fits whole-activation at 74.3 style-steps/s while 32 (8.4M) OOMs —
# and rematerializing 16 styles costs 29% (58.6 vs 75.5, BASELINE.md).
BATCH_AUTO_REMAT_PIXEL_THRESHOLD = 2560 * 2560
