"""Logger setup behavior."""
from __future__ import annotations

import logging

from style_transfer_visualizer_tpu.utils.logging import logger, setup_logger


def test_shared_logger_name() -> None:
    assert logger.name == "style_transfer_tpu"


def test_handler_attach_is_idempotent() -> None:
    first = setup_logger("stv_tpu_test_idem")
    n = len(first.handlers)
    second = setup_logger("stv_tpu_test_idem")
    assert second is first
    assert len(second.handlers) == n


def test_custom_handler_and_formatter() -> None:
    handler = logging.NullHandler()
    fmt = logging.Formatter("%(message)s")
    log = setup_logger("stv_tpu_test_custom", handler=handler, formatter=fmt)
    assert handler in log.handlers
    assert log.propagate is False


def test_level_applied() -> None:
    log = setup_logger("stv_tpu_test_level", level=logging.DEBUG)
    assert log.level == logging.DEBUG
