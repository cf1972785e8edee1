"""TPU-native neural style transfer visualizer.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``bjg-gh/style_transfer_visualizer`` (Gatys-style neural style transfer
with rich timelapse/gallery visualization artifacts), designed TPU-first:

- the VGG19 feature extractor is a pure-JAX pytree model running in NHWC
  layout so convolutions tile directly onto the MXU,
- the per-step optimization loop (L-BFGS or Adam on the image pixels) is a
  single jitted update with donated buffers so the image never leaves HBM,
- Gram matrices are single MXU contractions (a fused Pallas kernel with
  custom VJP is provided in ``ops.pallas_gram`` and validated at parity;
  the XLA formulation is the default since the compiler already hits the
  dispatch floor for this contraction), with psum-reduced partial Grams
  for inputs spatially sharded over a device mesh,
- timelapse frames are packed to uint8 on-device and streamed to the host
  encoder asynchronously so TPU steps never block on video encoding.

Reference behavior contract: /root/reference/src/style_transfer_visualizer
(see SURVEY.md for the component-by-component map).
"""

__version__ = "0.5.0"

from style_transfer_visualizer_tpu.gallery import (  # noqa: E402
    ComparisonRenderOptions,
    render_comparison,
)

__all__ = ["ComparisonRenderOptions", "render_comparison"]
