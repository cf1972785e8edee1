"""User-facing configuration defaults.

Values match the reference defaults (config_defaults.py:5-41) so a
config written for the reference behaves identically here; TPU-specific
knobs (optimizer choice, matmul precision, L-BFGS history size) are new.
"""
from __future__ import annotations

from style_transfer_visualizer_tpu.type_defs import (
    ConvBackendName,
    GramBackendName,
    InitMethod,
    OptimizerName,
    PrecisionName,
)

# --- Output ---------------------------------------------------------------
DEFAULT_OUTPUT_DIR = "out"
# Host-sync cadence for loss scalars (and CSV row cadence).
DEFAULT_LOG_EVERY = 10

# --- Hardware ---------------------------------------------------------
DEFAULT_DEVICE = "tpu"
# "mixed" runs bf16x3 convs with the first two VGG blocks and the Gram
# contractions in f32 — the measured sweet spot that holds the 1e-3
# curve-parity gate with ~2.5x margin (per-eval loss error 6e-5 vs
# "high"'s 1.9e-4, which chaos-amplifies to 0.5-1.3e-3 over 100 steps)
# at ~87% of the "high" tier's throughput. "highest" is full f32;
# "default" trades gradient fidelity (up to 10%) for top speed. See
# ops/precision.py and BASELINE.md for the error-attribution numbers.
DEFAULT_PRECISION: PrecisionName = "mixed"
# "auto" resolves each kernel family to the measured-fastest backend
# (see BASELINE.md for the e2e numbers behind the resolution).
DEFAULT_GRAM_BACKEND: GramBackendName = "auto"
DEFAULT_CONV_BACKEND: ConvBackendName = "auto"

# --- Optimization -----------------------------------------------------
DEFAULT_STEPS = 1500
DEFAULT_LEARNING_RATE = 1.0
DEFAULT_STYLE_WEIGHT = 1e5
DEFAULT_CONTENT_WEIGHT = 1.0
# Total-variation weight (TPU-framework addition; 0 = reference loss).
DEFAULT_TV_WEIGHT = 0.0
# Laplacian detail-preservation weight and its pooling size (Lapstyle,
# Li et al. 2017 arXiv:1707.01253; TPU-framework addition; 0 =
# reference loss).
DEFAULT_LAP_WEIGHT = 0.0
DEFAULT_LAP_POOL = 4
# Color preservation (TPU-framework addition; "off" = reference
# behavior, the output inherits the style's palette).
DEFAULT_PRESERVE_COLOR = "off"
DEFAULT_SEED = 0
DEFAULT_INIT_METHOD: InitMethod = "random"
DEFAULT_NORMALIZE = True
# One function evaluation per accepted step (the reference's LBFGS
# configuration).
DEFAULT_LBFGS_MAX_ITER = 1
DEFAULT_LBFGS_MAX_EVAL = 1
# Indices into the VGG19 feature stack (torchvision layer numbering):
# conv1_1, conv2_1, conv3_1, conv4_1, conv5_1 for style; conv4_2 for
# content.
DEFAULT_STYLE_LAYERS: tuple[int, ...] = (0, 5, 10, 19, 28)
DEFAULT_CONTENT_LAYERS: tuple[int, ...] = (21,)

# TPU-framework addition: selectable VGG-family backbone. "vgg19" is
# the reference's (only) model; "vgg16" is the perceptual-loss standard
# (Johnson et al.). When the model changes and the layer lists are left
# at the VGG19 defaults above, config validation remaps them to the
# model's own literature-standard taps (models/arch.py).
DEFAULT_MODEL: str = "vgg19"
# TPU-framework additions:
DEFAULT_OPTIMIZER: OptimizerName = "lbfgs"
DEFAULT_LBFGS_HISTORY_SIZE = 100   # matches torch.optim.LBFGS default
# Storage dtype of the curvature ring. "bfloat16" halves the ring's
# HBM traffic (+11% steps/s at m=100/512px, BASELINE.md ring table);
# "float32" bit-matches torch.optim.LBFGS. bf16 is the default because
# BASELINE.md's chaos-control measurement shows NO two L-BFGS
# implementations hold trajectory parity anyway (one-ulp perturbations
# diverge), so torch bit-layout buys nothing the "float32" opt-in
# doesn't still provide (round-4 re-decision, BASELINE.md).
DEFAULT_LBFGS_HISTORY_DTYPE = "bfloat16"
# Direction computation: "compact" (Byrd-Nocedal-Schnabel) computes the
# two-loop's direction in exact arithmetic via batched ring
# contractions — +11% steps/s at m=100 by replacing 2m sequential
# q-vector read-modify-writes with three ring passes; "two-loop"
# bit-matches torch.optim.LBFGS (same re-decision as the ring dtype).
DEFAULT_LBFGS_DIRECTION = "compact"

# --- Video ------------------------------------------------------------
DEFAULT_CREATE_VIDEO = True
DEFAULT_VIDEO_MODE = "realtime"
DEFAULT_SAVE_EVERY = 20
DEFAULT_FPS = 10
DEFAULT_VIDEO_QUALITY = 10
DEFAULT_FINAL_ONLY = False
DEFAULT_VIDEO_INTRO_ENABLED = True
DEFAULT_VIDEO_INTRO_DURATION = 10.0
DEFAULT_VIDEO_OUTRO_DURATION = 10.0
DEFAULT_VIDEO_FINAL_FRAME_COMPARE = True
DEFAULT_CREATE_GIF = False
DEFAULT_GIF_INCLUDE_INTRO = False
DEFAULT_GIF_INCLUDE_OUTRO = False
