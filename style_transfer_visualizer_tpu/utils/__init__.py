"""Shared utilities: logging and version resolution."""

from style_transfer_visualizer_tpu.utils.logging import logger, setup_logger
from style_transfer_visualizer_tpu.utils.version import (
    resolve_project_version,
)

__all__ = ["logger", "resolve_project_version", "setup_logger"]
