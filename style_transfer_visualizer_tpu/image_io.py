"""Image loading, device-side preprocessing, and output preparation.

Host side: PIL decodes to RGB and validates dimensions (contract mirrors
reference image_io.py:24-61). Device side: everything after decode —
scaling to [0,1], ImageNet normalization, denormalization, NaN scrubbing,
and uint8 frame packing — runs as jitted NHWC ops so a loaded image is
touched exactly once by the host.

Layout note: arrays are (1, H, W, 3) NHWC, the native TPU layout, rather
than the reference's NCHW.
"""
from __future__ import annotations

from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from style_transfer_visualizer_tpu.constants import (
    COLOR_MODE_RGB,
    IMAGENET_MEAN,
    IMAGENET_STD,
    MAX_DIMENSION,
    MIN_DIMENSION,
)
from style_transfer_visualizer_tpu.utils.logging import logger

if TYPE_CHECKING:
    from pathlib import Path

_MEAN = np.asarray(IMAGENET_MEAN, dtype=np.float32)
_STD = np.asarray(IMAGENET_STD, dtype=np.float32)


def load_image(path: str | Path) -> Image.Image:
    """Decode an image file to RGB, wrapping errors with clear messages."""
    try:
        return Image.open(path).convert(COLOR_MODE_RGB)
    except FileNotFoundError as e:
        msg = f"Image file not found: '{path}'"
        raise FileNotFoundError(msg) from e
    except OSError as e:
        msg = f"Error loading image '{path}': {e!s}"
        raise OSError(msg) from e


def validate_image_dimensions(img: Image.Image) -> None:
    """Hard-fail below MIN_DIMENSION; warn above MAX_DIMENSION."""
    if img.width < MIN_DIMENSION or img.height < MIN_DIMENSION:
        msg = (
            f"Image too small: {img.width}x{img.height}. "
            f"Minimum dimension is {MIN_DIMENSION}px."
        )
        raise ValueError(msg)
    if img.width > MAX_DIMENSION or img.height > MAX_DIMENSION:
        logger.warning(
            "Image is large: %dx%d. This may slow processing.",
            img.width,
            img.height,
        )


@jax.jit
def normalize_image(x: jax.Array) -> jax.Array:
    """Apply ImageNet channel normalization to an NHWC array in [0,1]."""
    return (x - _MEAN) / _STD


@jax.jit
def denormalize(x: jax.Array) -> jax.Array:
    """Invert ImageNet normalization on an NHWC array."""
    return x * _STD + _MEAN


def pil_to_array(img: Image.Image) -> np.ndarray:
    """PIL RGB image -> float32 HWC array scaled to [0,1]."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:  # pragma: no cover - RGB conversion precedes this
        arr = np.stack([arr] * 3, axis=-1)
    return arr


def load_image_to_host_array(path: str | Path) -> np.ndarray:
    """Decode and validate an image to a (1, H, W, 3) [0,1] host array.

    The host stage of :func:`load_image_to_array`, exposed separately so
    callers can apply host-side pre-transforms (e.g. the style-image
    color matching of ``--preserve-color match``) before device
    placement.
    """
    img = load_image(path)
    validate_image_dimensions(img)
    return pil_to_array(img)[None, ...]


def host_array_to_device(
    host: np.ndarray,
    device: jax.Device | None = None,
    *,
    normalize: bool = False,
) -> jax.Array:
    """Place a (1, H, W, 3) [0,1] host array on ``device``.

    Normalization (when requested) runs on the device.
    """
    arr = jax.device_put(jnp.asarray(host), device)
    if normalize:
        arr = normalize_image(arr)
    return arr


def load_image_to_array(
    path: str | Path,
    device: jax.Device | None = None,
    *,
    normalize: bool = False,
) -> jax.Array:
    """Load and preprocess an image for style transfer.

    Decodes on the host, validates dimensions, then places a (1, H, W, 3)
    float32 array on ``device`` and (optionally) normalizes it there.
    No resizing or padding is performed.
    """
    return host_array_to_device(
        load_image_to_host_array(path), device, normalize=normalize,
    )


def load_style_image_to_array(
    path: str | Path,
    device: jax.Device | None = None,
    *,
    normalize: bool = False,
    match_to: np.ndarray | None = None,
) -> jax.Array:
    """Load a style image, optionally color-matched to ``match_to``.

    ``match_to`` — a (1, H, W, 3) [0,1] host array, typically the
    content image — remaps the style's pixel statistics (mean + 3x3
    covariance) onto it before device placement: the
    ``--preserve-color match`` path, applied on the host so the
    optimization's Gram targets already carry the content's palette.
    """
    host = load_image_to_host_array(path)
    if match_to is not None:
        from style_transfer_visualizer_tpu.ops.color import (  # noqa: PLC0415
            match_color_distribution,
        )

        host = match_color_distribution(host, match_to)
    return host_array_to_device(host, device, normalize=normalize)


@jax.jit
def prepare_image_for_output_normalized(x: jax.Array) -> jax.Array:
    """Denormalize, scrub non-finite values, and clip to [0,1]."""
    img = denormalize(x)
    img = jnp.nan_to_num(img, nan=0.0, posinf=1.0, neginf=0.0)
    return jnp.clip(img, 0.0, 1.0)


@jax.jit
def prepare_image_for_output_raw(x: jax.Array) -> jax.Array:
    """Scrub non-finite values and clip to [0,1] (no denormalization)."""
    img = jnp.nan_to_num(x, nan=0.0, posinf=1.0, neginf=0.0)
    return jnp.clip(img, 0.0, 1.0)


def prepare_image_for_output(
    x: jax.Array,
    *,
    normalize: bool,
) -> jax.Array:
    """Make an image array save-ready: denorm (optional), scrub, clip."""
    if normalize:
        return prepare_image_for_output_normalized(x)
    return prepare_image_for_output_raw(x)


@jax.jit
def pack_uint8_frame(x: jax.Array) -> jax.Array:
    """(1, H, W, 3) float in [0,1] -> (H, W, 3) uint8, on device.

    The rounding and cast happen on the TPU so only H*W*3 bytes cross the
    host boundary (the reference converts on the host after a full f32
    transfer, optimization.py:438-452).
    """
    frame = jnp.round(x[0] * 255.0)
    return jnp.clip(frame, 0, 255).astype(jnp.uint8)


@jax.jit
def pack_uint8_frames_batch(x: jax.Array) -> jax.Array:
    """(S, 1, H, W, 3) float in [0,1] -> (S, H, W, 3) uint8, on device.

    Batch-mode analog of :func:`pack_uint8_frame`: one dispatch packs
    every style's timelapse frame, so S*H*W*3 bytes cross the host
    boundary instead of S full f32 images.
    """
    frames = jnp.round(x[:, 0] * 255.0)
    return jnp.clip(frames, 0, 255).astype(jnp.uint8)


def array_to_uint8_frame(
    x: jax.Array,
    *,
    normalize: bool,
    chroma_source: jax.Array | None = None,
) -> np.ndarray:
    """Produce a host-side HWC uint8 frame from a working image array.

    ``chroma_source`` (a (1, H, W, 3) [0,1] RGB array, typically the
    content image) recolors the frame via luminance-only transfer
    before packing — the ``--preserve-color luminance`` path.
    """
    prepared = prepare_image_for_output(x, normalize=normalize)
    if chroma_source is not None:
        from style_transfer_visualizer_tpu.ops.color import (  # noqa: PLC0415
            luminance_transfer,
        )

        prepared = luminance_transfer(prepared, chroma_source)
    return np.asarray(pack_uint8_frame(prepared))


def save_array_as_image(x: jax.Array | np.ndarray, path: str | Path) -> None:
    """Save a prepared (1,H,W,3) or (H,W,3) [0,1] float array as PNG.

    The float-to-uint8 packing runs through the native single-pass
    kernel when available (the numpy expression allocates two full-frame
    temporaries); falls back to numpy otherwise.
    """
    arr = np.asarray(x)
    if arr.ndim == 4:
        arr = arr[0]
    try:
        from style_transfer_visualizer_tpu.native import (  # noqa: PLC0415
            frameops,
        )

        frame = frameops.pack_f32_to_u8(arr)
    except ImportError:
        frame = np.clip(np.rint(arr * 255.0), 0, 255).astype(np.uint8)
    Image.fromarray(frame, mode="RGB").save(path)
