"""Optional smoke test against real pretrained VGG19 weights.

Runs only when a converted ``.npz`` cache or a torchvision checkpoint is
present on the machine (see the verify skill for the acquisition path:
download ``vgg19-dcbb9e9d.pth`` on a connected host into
``~/.cache/torch/hub/checkpoints/`` — ``load_vgg19_params`` converts
and caches it automatically). Asserts a short optimization against the
real feature space produces a finite, decreasing loss trajectory.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_visualizer_tpu.models import vgg19


def _real_params():
    try:
        return vgg19.load_vgg19_params(allow_random=False)
    except (FileNotFoundError, RuntimeError) as exc:
        pytest.skip(f"No pretrained VGG19 weights available: {exc}")


@pytest.mark.slow
def test_real_weights_loss_trajectory() -> None:
    from style_transfer_visualizer_tpu.engine.step import build_update_step
    from style_transfer_visualizer_tpu.models.features import (
        compute_targets,
        initialize_input,
    )

    params = _real_params()
    style_layers = (0, 5, 10, 19, 28)
    content_layers = (21,)
    key = jax.random.key(0)
    content = jax.random.uniform(key, (1, 128, 128, 3), jnp.float32)
    style = jax.random.uniform(
        jax.random.fold_in(key, 1), (1, 128, 128, 3), jnp.float32,
    )
    targets = compute_targets(
        params, style, content, style_layers, content_layers,
    )
    bundle = build_update_step(
        params, targets, tuple(content.shape),
        optimizer="adam", lr=0.02, style_w=1e5, content_w=1.0,
        style_layers=style_layers, content_layers=content_layers,
        precision="high",
    )
    x = initialize_input(content, "content", key)
    state = bundle.opt_state
    losses = []
    for _ in range(20):
        x, state, aux = bundle.update_fn(x, state)
        losses.append(float(aux.loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert bool(jnp.all(jnp.isfinite(x)))
