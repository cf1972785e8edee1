"""Checkpoint save/restore roundtrips."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_visualizer_tpu.engine.optimizers import (
    adam_init,
    lbfgs_init,
)
from style_transfer_visualizer_tpu.runtime.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)


def test_roundtrip_adam(tmp_path) -> None:
    img = jnp.full((1, 8, 8, 3), 0.25)
    state = adam_init(8 * 8 * 3)
    state = state._replace(mu=state.mu + 1.5)
    path = save_checkpoint(tmp_path / "ck.npz", 42, img, state)
    ckpt = load_checkpoint(path, adam_init(8 * 8 * 3))
    assert ckpt.step == 42
    np.testing.assert_array_equal(np.asarray(ckpt.image), np.asarray(img))
    np.testing.assert_array_equal(
        np.asarray(ckpt.opt_state.mu), np.asarray(state.mu),
    )
    assert int(ckpt.opt_state.count) == 0


def test_roundtrip_lbfgs(tmp_path) -> None:
    img = jnp.zeros((1, 4, 4, 3))
    state = lbfgs_init(48, history_size=5)
    state = state._replace(hist_len=jnp.asarray(3, jnp.int32))
    path = save_checkpoint(tmp_path / "ck.npz", 7, img, state)
    ckpt = load_checkpoint(path, lbfgs_init(48, history_size=5))
    assert int(ckpt.opt_state.hist_len) == 3
    assert ckpt.opt_state.s_hist.shape == (5, 48)


def test_missing_file(tmp_path) -> None:
    with pytest.raises(FileNotFoundError, match="Checkpoint not found"):
        load_checkpoint(tmp_path / "none.npz", adam_init(4))


def test_optimizer_mismatch(tmp_path) -> None:
    img = jnp.zeros((1, 2, 2, 3))
    path = save_checkpoint(tmp_path / "ck.npz", 1, img, adam_init(12))
    with pytest.raises(ValueError, match="different optimizer"):
        load_checkpoint(path, lbfgs_init(12, history_size=3))


def test_flat_to_shaped_migration(tmp_path) -> None:
    """Flat Adam moments from an older build reshape to the image shape."""
    img = jnp.zeros((1, 4, 4, 3))
    path = save_checkpoint(tmp_path / "ck.npz", 3, img, adam_init(48))
    ckpt = load_checkpoint(path, adam_init((1, 4, 4, 3)))
    assert ckpt.opt_state.mu.shape == (1, 4, 4, 3)


def test_batched_flat_to_shaped_migration(tmp_path) -> None:
    """Multi-style (S, N) moments from 0.1.0 migrate to (S, 1, H, W, C)."""
    img = jnp.zeros((2, 1, 4, 4, 3))
    path = save_checkpoint(tmp_path / "ck.npz", 3, img, adam_init((2, 48)))
    ckpt = load_checkpoint(path, adam_init((2, 1, 4, 4, 3)))
    assert ckpt.opt_state.mu.shape == (2, 1, 4, 4, 3)


def test_batched_migration_needs_matching_style_count(tmp_path) -> None:
    """Equal sizes with different leading (style) dims still reject."""
    img = jnp.zeros((2, 1, 4, 4, 3))
    path = save_checkpoint(tmp_path / "ck.npz", 3, img, adam_init((2, 48)))
    with pytest.raises(ValueError, match="incompatible configuration"):
        load_checkpoint(path, adam_init((3, 32)))


def test_same_size_different_shape_rejected(tmp_path) -> None:
    """Non-flat shape mismatches raise instead of silently reshaping."""
    img = jnp.zeros((1, 4, 4, 3))
    path = save_checkpoint(
        tmp_path / "ck.npz", 3, img, adam_init((1, 4, 4, 3)),
    )
    with pytest.raises(ValueError, match="incompatible configuration"):
        load_checkpoint(path, adam_init((1, 3, 4, 4)))


def test_runner_saves_checkpoints(
    tmp_path, make_style_transfer_config,
) -> None:
    from tests.test_runner import NullBar, fake_update

    from style_transfer_visualizer_tpu.engine.runner import (
        OptimizationRunner,
    )

    cfg = make_style_transfer_config(
        optimization={"steps": 4},
        output={"checkpoint_every": 2},
    )
    ck_path = tmp_path / "runner_ck.npz"
    runner = OptimizationRunner(
        fake_update(), adam_init(4), jnp.zeros((1, 2, 2, 1)), cfg,
        progress_bar=NullBar(), checkpoint_path=ck_path,
    )
    runner.run()
    assert ck_path.exists()
    ckpt = load_checkpoint(ck_path, adam_init(4))
    assert ckpt.step == 4


def test_runner_resumes_from_start_step(
    make_style_transfer_config,
) -> None:
    from tests.test_runner import NullBar, fake_update

    from style_transfer_visualizer_tpu.engine.runner import (
        OptimizationRunner,
    )

    cfg = make_style_transfer_config(optimization={"steps": 5})
    bar = NullBar()
    runner = OptimizationRunner(
        fake_update(), None, jnp.zeros((1, 2, 2, 1)), cfg,
        progress_bar=bar, start_step=3,
    )
    img, _, _ = runner.run()
    assert bar.updates == 2  # only steps 4 and 5 run


def test_roundtrip_bf16_history_ring(tmp_path) -> None:
    """bfloat16 ring leaves survive .npz (stored as uint16 bits)."""
    img = jnp.zeros((1, 4, 4, 3))
    state = lbfgs_init(48, history_size=4, history_dtype=jnp.bfloat16)
    state = state._replace(
        s_hist=(jnp.arange(4 * 48, dtype=jnp.float32)
                .reshape(4, 48) / 7.0).astype(jnp.bfloat16),
        hist_len=jnp.asarray(2, jnp.int32),
    )
    path = save_checkpoint(tmp_path / "ck.npz", 5, img, state)
    ckpt = load_checkpoint(
        path, lbfgs_init(48, history_size=4, history_dtype=jnp.bfloat16),
    )
    assert ckpt.opt_state.s_hist.dtype == jnp.bfloat16
    # Bit-exact: the uint16 view round-trips the stored pattern.
    np.testing.assert_array_equal(
        np.asarray(ckpt.opt_state.s_hist).view(np.uint16),
        np.asarray(state.s_hist).view(np.uint16),
    )
    assert int(ckpt.opt_state.hist_len) == 2


def test_resume_casts_ring_dtype_to_current_config(tmp_path, caplog) -> None:
    """An f32-ring checkpoint resumes under a bf16-ring configuration."""
    img = jnp.zeros((1, 4, 4, 3))
    state = lbfgs_init(48, history_size=4)
    state = state._replace(s_hist=state.s_hist + 1.25)
    path = save_checkpoint(tmp_path / "ck.npz", 9, img, state)
    ckpt = load_checkpoint(
        path, lbfgs_init(48, history_size=4, history_dtype=jnp.bfloat16),
    )
    assert ckpt.opt_state.s_hist.dtype == jnp.bfloat16
    assert "Casting checkpoint state leaf" in caplog.text
    np.testing.assert_array_equal(
        np.asarray(ckpt.opt_state.s_hist, dtype=np.float32), 1.25,
    )


def test_different_size_leaf_rejected(tmp_path) -> None:
    """Size (not just shape) mismatches are incompatible outright."""
    img = jnp.zeros((1, 4, 4, 3))
    path = save_checkpoint(tmp_path / "ck.npz", 2, img, adam_init(48))
    with pytest.raises(ValueError, match="incompatible configuration"):
        load_checkpoint(path, adam_init(96))
