"""Color-preservation transforms (Gatys et al. 2016, arXiv:1606.05897).

The reference has no color controls: the stylized output inherits the
style image's palette wholesale. This module adds the two standard
color-preservation schemes from "Preserving Color in Neural Artistic
Style Transfer":

- **Luminance-only transfer** (:func:`luminance_transfer`): keep the
  optimization unchanged, then recombine the *stylized luminance* with
  the *content chrominance* in YIQ space. A per-pixel linear transform,
  jitted so timelapse frames recolor on device before uint8 packing —
  the hot loop never sees it (frames recolor on the async worker's
  dispatch, the final image once).
- **Color matching** (:func:`match_color_distribution`): remap the style
  image's pixel distribution onto the content's palette (mean + 3x3
  covariance, the paper's "linear color transfer" in its symmetric
  matrix-square-root form) *before* Gram targets are computed, so the
  optimization itself paints with the content's colors. A one-time
  host-side 3x3 eigendecomposition — numerically robust in float64 and
  off the device entirely.

Both are exposed as ``--preserve-color {luminance,match}``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# NTSC RGB -> YIQ. Row 0 is the luma (Rec. 601 weights); rows 1-2 carry
# chrominance. The inverse is derived numerically so the round trip is
# exact to float rounding rather than to the textbooks' 4-digit tables.
_RGB_TO_YIQ = np.array(
    [
        [0.299, 0.587, 0.114],
        [0.595716, -0.274453, -0.321263],
        [0.211456, -0.522591, 0.311135],
    ],
    dtype=np.float64,
)
_YIQ_TO_RGB = np.linalg.inv(_RGB_TO_YIQ)

RGB_TO_YIQ = jnp.asarray(_RGB_TO_YIQ, dtype=jnp.float32)
YIQ_TO_RGB = jnp.asarray(_YIQ_TO_RGB, dtype=jnp.float32)


def rgb_to_yiq(rgb: jax.Array) -> jax.Array:
    """(..., 3) RGB in [0,1] -> YIQ (luma in [0,1], chroma signed)."""
    return rgb @ RGB_TO_YIQ.T


def yiq_to_rgb(yiq: jax.Array) -> jax.Array:
    """(..., 3) YIQ -> RGB (unclipped; callers clip to [0,1])."""
    return yiq @ YIQ_TO_RGB.T


@jax.jit
def luminance_transfer(
    stylized: jax.Array,
    content: jax.Array,
) -> jax.Array:
    """Stylized luminance over content chrominance, in [0,1] RGB.

    Both inputs are (..., H, W, 3) RGB in [0,1]; shapes must broadcast
    (e.g. a (S, 1, H, W, 3) batch of stylized frames against one
    (1, H, W, 3) content). Returns RGB clipped to [0,1].
    """
    y = rgb_to_yiq(stylized)[..., :1]
    iq = rgb_to_yiq(content)[..., 1:]
    lead = jnp.broadcast_shapes(y.shape[:-1], iq.shape[:-1])
    yiq = jnp.concatenate(
        [
            jnp.broadcast_to(y, (*lead, 1)),
            jnp.broadcast_to(iq, (*lead, 2)),
        ],
        axis=-1,
    )
    return jnp.clip(yiq_to_rgb(yiq), 0.0, 1.0)


def maybe_restore_color(
    img: jax.Array,
    chroma_source: jax.Array | None,
) -> jax.Array:
    """Apply :func:`luminance_transfer` when a chroma source is set."""
    if chroma_source is None:
        return img
    return luminance_transfer(img, chroma_source)


def _pixel_stats(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Mean (3,) and covariance (3, 3) over all pixels of (..., 3)."""
    flat = arr.reshape(-1, 3).astype(np.float64)
    mu = flat.mean(axis=0)
    centered = flat - mu
    cov = centered.T @ centered / flat.shape[0]
    return mu, cov


def _sqrt_psd(cov: np.ndarray, *, inverse: bool = False) -> np.ndarray:
    """Symmetric (inverse) square root of a 3x3 PSD matrix.

    Eigenvalues are floored at a small epsilon so degenerate palettes
    (solid-color or grayscale images have rank-deficient covariance)
    produce a finite transform instead of NaNs.
    """
    eigval, eigvec = np.linalg.eigh(cov)
    eigval = np.maximum(eigval, 1e-8)
    root = np.sqrt(eigval)
    if inverse:
        root = 1.0 / root
    return (eigvec * root) @ eigvec.T


def match_color_distribution(
    style: np.ndarray,
    content: np.ndarray,
) -> np.ndarray:
    """Remap ``style``'s colors onto ``content``'s palette statistics.

    Host-side, float64: the linear transform
    ``A = cov_c^{1/2} cov_s^{-1/2}`` (symmetric square roots) maps the
    style pixels so their mean and covariance equal the content's —
    the "color histogram matching" variant of Gatys et al. 2016 §2.
    Inputs are (..., 3) RGB in [0,1]; output matches ``style``'s shape
    and dtype, clipped to [0,1].
    """
    mu_s, cov_s = _pixel_stats(style)
    mu_c, cov_c = _pixel_stats(content)
    transform = _sqrt_psd(cov_c) @ _sqrt_psd(cov_s, inverse=True)
    flat = style.reshape(-1, 3).astype(np.float64)
    matched = (flat - mu_s) @ transform.T + mu_c
    matched = np.clip(matched, 0.0, 1.0)
    return matched.reshape(style.shape).astype(style.dtype)
