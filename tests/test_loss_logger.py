"""CSV loss logger file behavior."""
from __future__ import annotations

from pathlib import Path

from style_transfer_visualizer_tpu.engine.loss_logger import LossCSVLogger


def test_header_written_immediately(tmp_path: Path) -> None:
    path = tmp_path / "loss.csv"
    logger = LossCSVLogger(path, log_every=5)
    assert path.read_text().strip() == "step,style_loss,content_loss,total_loss"
    logger.close()


def test_rows_on_cadence_only(tmp_path: Path) -> None:
    path = tmp_path / "loss.csv"
    with LossCSVLogger(path, log_every=2) as logger:
        logger.log(1, 1.0, 2.0, 3.0)
        logger.log(2, 4.0, 5.0, 6.0)
        logger.log(3, 7.0, 8.0, 9.0)
        logger.log(4, 10.0, 11.0, 12.0)
    lines = path.read_text().strip().splitlines()
    assert len(lines) == 3  # header + steps 2, 4
    assert lines[1] == "2,4.0,5.0,6.0"
    assert lines[2] == "4,10.0,11.0,12.0"


def test_creates_parent_dirs(tmp_path: Path) -> None:
    path = tmp_path / "deep" / "nested" / "loss.csv"
    LossCSVLogger(path, log_every=1).close()
    assert path.exists()


def test_close_idempotent(tmp_path: Path) -> None:
    logger = LossCSVLogger(tmp_path / "l.csv", log_every=1)
    logger.close()
    logger.close()  # must not raise
    assert logger.file.closed


def test_context_manager_closes_on_error(tmp_path: Path) -> None:
    path = tmp_path / "l.csv"
    try:
        with LossCSVLogger(path, log_every=1) as logger:
            logger.log(1, 1.0, 1.0, 1.0)
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert logger.file.closed
    assert "1,1.0,1.0,1.0" in path.read_text()


def test_resume_appends_instead_of_truncating(tmp_path: Path) -> None:
    path = tmp_path / "loss.csv"
    with LossCSVLogger(path, log_every=1) as logger:
        logger.log(1, 1.0, 2.0, 3.0)
    with LossCSVLogger(path, log_every=1, resume=True) as logger:
        logger.log(2, 4.0, 5.0, 6.0)
    lines = path.read_text().strip().splitlines()
    assert lines[0].startswith("step,")
    assert lines[1] == "1,1.0,2.0,3.0"
    assert lines[2] == "2,4.0,5.0,6.0"
    assert len(lines) == 3  # single header, both runs' rows


def test_resume_without_existing_file_writes_header(tmp_path: Path) -> None:
    path = tmp_path / "fresh.csv"
    with LossCSVLogger(path, log_every=1, resume=True) as logger:
        logger.log(1, 1.0, 1.0, 1.0)
    lines = path.read_text().strip().splitlines()
    assert lines[0].startswith("step,")
