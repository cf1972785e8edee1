"""Runtime services: device, validation, output, comparison, checkpoint."""

from style_transfer_visualizer_tpu.runtime.comparison import (
    ComparisonRequest,
    comparison_output_path,
    render_comparison_image,
    render_requested_comparisons,
)
from style_transfer_visualizer_tpu.runtime.device import (
    setup_device,
    setup_random_seed,
)
from style_transfer_visualizer_tpu.runtime.output import (
    save_outputs,
    setup_output_directory,
    stylized_image_path_from_names,
    stylized_image_path_from_paths,
)
from style_transfer_visualizer_tpu.runtime.validation import (
    validate_input_paths,
    validate_parameters,
)

__all__ = [
    "ComparisonRequest",
    "comparison_output_path",
    "render_comparison_image",
    "render_requested_comparisons",
    "save_outputs",
    "setup_device",
    "setup_output_directory",
    "setup_random_seed",
    "stylized_image_path_from_names",
    "stylized_image_path_from_paths",
    "validate_input_paths",
    "validate_parameters",
]
