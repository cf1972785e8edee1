"""Fused Pallas conv+bias+ReLU kernel vs the XLA conv (interpreter mode)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_visualizer_tpu.ops.pallas_conv import (
    conv3x3_bias_relu,
    hwio_to_stencil,
    mosaic_precision,
    resolve_conv_backend,
)

HIGH = jax.lax.Precision.HIGHEST


def _xla_conv(x, w, b, relu=True):
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=HIGH,
    ) + b
    return jnp.maximum(out, 0.0) if relu else out


@pytest.mark.parametrize(
    ("h", "w", "ci", "co"),
    [
        (16, 24, 5, 7),      # odd channels -> lane padding
        (8, 8, 64, 64),      # single row block
        (32, 30, 3, 64),     # RGB input, unaligned width
    ],
)
def test_forward_matches_xla(h, w, ci, co) -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, h, w, ci)).astype(np.float32))
    wt = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    ours = conv3x3_bias_relu(x, hwio_to_stencil(wt), b, True, True)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(_xla_conv(x, wt, b)),
        rtol=1e-5, atol=1e-5,
    )


def test_no_relu_variant() -> None:
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    wt = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    ours = conv3x3_bias_relu(x, hwio_to_stencil(wt), b, False, True)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(_xla_conv(x, wt, b, relu=False)),
        rtol=1e-5, atol=1e-5,
    )


def test_image_gradient_matches_xla() -> None:
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)).astype(np.float32))
    wt = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

    def loss_p(x):
        y = conv3x3_bias_relu(x, hwio_to_stencil(wt), b, True, True)
        return jnp.sum(jnp.sin(y))

    def loss_x(x):
        return jnp.sum(jnp.sin(_xla_conv(x, wt, b)))

    g_p = jax.grad(loss_p)(x)
    g_x = jax.grad(loss_x)(x)
    np.testing.assert_allclose(
        np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-6,
    )


def test_total_loss_conv_backend_parity() -> None:
    """The production loss path must agree across conv backends."""
    from style_transfer_visualizer_tpu.models import vgg19
    from style_transfer_visualizer_tpu.models.features import (
        compute_targets,
        total_loss,
    )

    params = vgg19.init_random_params(jax.random.key(0))
    style_layers = (0, 5)
    content_layers = (2,)
    key = jax.random.key(11)
    content = jax.random.uniform(key, (1, 24, 24, 3), jnp.float32)
    style = jax.random.uniform(
        jax.random.fold_in(key, 1), (1, 24, 24, 3), jnp.float32,
    )

    results = {}
    for backend in ("xla", "pallas"):
        targets = compute_targets(
            params, style, content, style_layers, content_layers,
            precision=HIGH, conv_backend=backend,
        )

        def loss_of(img, targets=targets, backend=backend):
            return total_loss(
                params, img, targets, 100.0, 1.0,
                style_layers, content_layers, HIGH,
                conv_backend=backend,
            )

        (loss, _), grad = jax.value_and_grad(
            loss_of, has_aux=True,
        )(content)
        results[backend] = (np.asarray(loss), np.asarray(grad))

    np.testing.assert_allclose(
        results["pallas"][0], results["xla"][0], rtol=1e-4,
    )
    np.testing.assert_allclose(
        results["pallas"][1], results["xla"][1], rtol=1e-3, atol=1e-6,
    )


def test_tap_at_conv_samples_pre_relu() -> None:
    """Style taps at conv indices must see the PRE-ReLU activation."""
    from style_transfer_visualizer_tpu.models import vgg19
    from style_transfer_visualizer_tpu.models.features import (
        extract_features,
    )

    params = vgg19.init_random_params(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(3), (1, 16, 16, 3), jnp.float32)
    ref = extract_features(params, x, (0, 1), precision=HIGH)
    got = extract_features(
        params, x, (0, 1), precision=HIGH, conv_backend="pallas",
    )
    for idx in (0, 1):
        np.testing.assert_allclose(
            np.asarray(got[idx]), np.asarray(ref[idx]),
            rtol=1e-5, atol=1e-5,
        )
    # Index 0 is the conv output: it must contain negatives (pre-ReLU).
    assert float(np.asarray(got[0]).min()) < 0


def test_remat_segments_with_pallas_convs() -> None:
    from style_transfer_visualizer_tpu.models import vgg19
    from style_transfer_visualizer_tpu.models.features import (
        extract_features,
    )

    params = vgg19.init_random_params(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(5), (1, 16, 16, 3), jnp.float32)
    ref = extract_features(params, x, (0, 5), precision=HIGH)
    got = extract_features(
        params, x, (0, 5), precision=HIGH,
        remat=True, conv_backend="pallas",
    )
    for idx in (0, 5):
        np.testing.assert_allclose(
            np.asarray(got[idx]), np.asarray(ref[idx]),
            rtol=1e-5, atol=1e-5,
        )


def test_resolve_conv_backend() -> None:
    assert resolve_conv_backend("auto") == "xla"
    assert resolve_conv_backend("pallas") == "pallas"
    with pytest.raises(ValueError, match="Unknown conv backend"):
        resolve_conv_backend("cudnn")


def test_mosaic_precision_mapping() -> None:
    assert (
        mosaic_precision(jax.lax.Precision.HIGH)
        is jax.lax.Precision.HIGHEST
    )
    assert (
        mosaic_precision(jax.lax.Precision.HIGHEST)
        is jax.lax.Precision.HIGHEST
    )
    assert mosaic_precision(None) is None


def test_rejects_batched_input() -> None:
    x = jnp.zeros((2, 8, 8, 4), jnp.float32)
    w9 = jnp.zeros((9, 4, 4), jnp.float32)
    b = jnp.zeros((4,), jnp.float32)
    with pytest.raises(ValueError, match="batch 1"):
        conv3x3_bias_relu(x, w9, b, True, True)


def test_hwio_to_stencil_shape_check() -> None:
    with pytest.raises(ValueError, match="3x3"):
        hwio_to_stencil(jnp.zeros((5, 5, 4, 4), jnp.float32))


def test_pick_tile_h_floors_at_one() -> None:
    from style_transfer_visualizer_tpu.ops.pallas_conv import _pick_tile_h

    # A working set too large for any block height falls back to 1.
    assert _pick_tile_h(64, 100_000, 512, 512) == 1


def test_fused_relu_tap_sees_post_relu_activation() -> None:
    """A tap at a ReLU index must survive conv+ReLU fusion."""
    from style_transfer_visualizer_tpu.models import vgg19
    from style_transfer_visualizer_tpu.models.features import (
        extract_features,
    )

    params = vgg19.init_random_params(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(7), (1, 16, 16, 3), jnp.float32)
    ref = extract_features(params, x, (1,), precision=HIGH)
    got = extract_features(
        params, x, (1,), precision=HIGH, conv_backend="pallas",
    )
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(ref[1]), rtol=1e-5, atol=1e-5,
    )
    # Index 1 is the ReLU output: nothing negative may leak through.
    assert float(np.asarray(got[1]).min()) >= 0


def test_conv_tap_blocks_fusion_and_matches_xla() -> None:
    """A tap at a conv index must see pre-ReLU activations (no fusion)."""
    from style_transfer_visualizer_tpu.models import vgg19
    from style_transfer_visualizer_tpu.models.features import (
        extract_features,
    )

    params = vgg19.init_random_params(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(9), (1, 16, 16, 3), jnp.float32)
    ref = extract_features(params, x, (0,), precision=HIGH)
    got = extract_features(
        params, x, (0,), precision=HIGH, conv_backend="pallas",
    )
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-5, atol=1e-5,
    )
    # Pre-ReLU conv output: negatives must survive.
    assert float(np.asarray(got[0]).min()) < 0


def test_build_update_step_with_pallas_conv_backend() -> None:
    """conv_backend='pallas' skips shipping the pre-flipped kernels
    (the Pallas path runs its own conv and custom VJP); the step still
    builds and executes."""
    from style_transfer_visualizer_tpu.engine.step import (
        build_update_step,
    )
    from style_transfer_visualizer_tpu.models import vgg19
    from style_transfer_visualizer_tpu.models.features import (
        compute_targets,
    )

    params = vgg19.init_random_params(jax.random.key(0))
    content = jax.random.uniform(jax.random.key(1), (1, 16, 16, 3))
    style = jax.random.uniform(jax.random.key(2), (1, 16, 16, 3))
    targets = compute_targets(params, style, content, (0,), (2,))
    bundle = build_update_step(
        params, targets, (1, 16, 16, 3),
        optimizer="adam", lr=0.1, style_w=1.0, content_w=1.0,
        style_layers=(0,), content_layers=(2,),
        conv_backend="pallas",
    )
    x, _state, aux = bundle.update_fn(content, bundle.opt_state)
    assert x.shape == (1, 16, 16, 3)
    assert np.isfinite(float(aux.loss))
