"""Pallas fused Gram kernel vs the XLA formulation (interpreter mode)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_visualizer_tpu.ops.gram import gram_matrix
from style_transfer_visualizer_tpu.ops.pallas_gram import (
    gram_matrix_pallas,
)

HIGH = jax.lax.Precision.HIGHEST


@pytest.mark.parametrize(
    ("shape"),
    [
        (1, 16, 16, 64),     # C below lane width -> channel padding
        (1, 20, 30, 128),    # pixel count not a tile multiple
        (1, 48, 48, 256),    # multi-tile accumulation
    ],
)
def test_forward_matches_xla(shape) -> None:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ours = gram_matrix_pallas(x, interpret=True)
    ref = gram_matrix(x, precision=HIGH)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-6,
    )


def test_clamp_applied() -> None:
    x = jnp.full((1, 32, 32, 64), 50.0)
    ours = gram_matrix_pallas(x, interpret=True)
    ref = gram_matrix(x)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=1e-6,
    )
    # raw = 50*50*1024 = 2.56e6 > 5e5 -> clamp engaged
    np.testing.assert_allclose(
        np.asarray(ours), 5e5 / (64 * 1024), rtol=1e-6,
    )


def test_gradient_matches_xla() -> None:
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.normal(size=(1, 12, 12, 64)).astype(np.float32) * 3,
    )
    target = jnp.asarray(
        rng.normal(size=(64, 64)).astype(np.float32),
    )

    def loss_pallas(x):
        return jnp.mean(
            jnp.square(gram_matrix_pallas(x, interpret=True) - target),
        )

    def loss_xla(x):
        return jnp.mean(
            jnp.square(gram_matrix(x, precision=HIGH) - target),
        )

    g_pallas = jax.grad(loss_pallas)(x)
    g_xla = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-4, atol=1e-7,
    )


def test_gradient_with_clamp_engaged() -> None:
    """Clamped entries must receive zero gradient through the clamp."""
    rng = np.random.default_rng(2)
    base = rng.normal(size=(1, 32, 32, 64)).astype(np.float32)
    base[..., 0] = 40.0  # channel 0 autocorrelation will exceed 5e5

    x = jnp.asarray(base)

    def loss_pallas(x):
        return jnp.sum(gram_matrix_pallas(x, interpret=True))

    def loss_xla(x):
        return jnp.sum(gram_matrix(x, precision=HIGH))

    g_pallas = jax.grad(loss_pallas)(x)
    g_xla = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-4, atol=1e-6,
    )


def test_custom_norm() -> None:
    x = jnp.ones((1, 8, 8, 64), jnp.float32)
    out = gram_matrix_pallas(x, 5e5, 1000, True)
    np.testing.assert_allclose(np.asarray(out)[0, 0], 64 / 1000, rtol=1e-6)


# --- Backend dispatch (the production wiring) ---------------------------


def test_resolve_gram_backend() -> None:
    from style_transfer_visualizer_tpu.ops.gram import resolve_gram_backend

    # "auto" is XLA everywhere (measured e2e verdict, see BASELINE.md).
    assert resolve_gram_backend("auto") == "xla"
    assert resolve_gram_backend("xla") == "xla"
    assert resolve_gram_backend("pallas") == "pallas"
    with pytest.raises(ValueError, match="Unknown gram backend"):
        resolve_gram_backend("cuda")


def test_gram_apply_dispatch_parity() -> None:
    from style_transfer_visualizer_tpu.ops.gram import gram_apply

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 12, 12, 64)).astype(np.float32))
    via_pallas = gram_apply(x, backend="pallas")
    via_xla = gram_apply(x, backend="xla", precision=HIGH)
    np.testing.assert_allclose(
        np.asarray(via_pallas), np.asarray(via_xla), rtol=1e-5, atol=1e-6,
    )


def test_total_loss_pallas_backend_parity() -> None:
    """The production loss path must agree across gram backends."""
    from style_transfer_visualizer_tpu.models import vgg19
    from style_transfer_visualizer_tpu.models.features import (
        compute_targets,
        total_loss,
    )

    params = vgg19.init_random_params(jax.random.key(0))
    style_layers = (0, 5)
    content_layers = (2,)
    key = jax.random.key(7)
    content = jax.random.uniform(key, (1, 32, 32, 3), jnp.float32)
    style = jax.random.uniform(
        jax.random.fold_in(key, 1), (1, 32, 32, 3), jnp.float32,
    )

    results = {}
    for backend in ("xla", "pallas"):
        targets = compute_targets(
            params, style, content, style_layers, content_layers,
            precision=HIGH, gram_backend=backend,
        )

        def loss_of(img, targets=targets, backend=backend):
            return total_loss(
                params, img, targets, 100.0, 1.0,
                style_layers, content_layers, HIGH,
                gram_backend=backend,
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


def test_pallas_gram_under_vmap() -> None:
    """The multi-style path vmaps the loss; the kernel must batch."""
    from style_transfer_visualizer_tpu.ops.gram import gram_apply

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(3, 1, 8, 8, 64)).astype(np.float32))
    batched = jax.vmap(lambda f: gram_apply(f, backend="pallas"))(x)
    ref = jnp.stack(
        [gram_apply(x[i], backend="xla", precision=HIGH) for i in range(3)],
    )
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(ref), rtol=1e-5, atol=1e-6,
    )


def test_explicit_n_norm_forward_and_backward() -> None:
    """A caller-supplied normalization divisor is honored in fwd and bwd."""
    import numpy as np

    feats = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 8, 8, 4)),
        jnp.float32,
    )
    n_norm = 123.0

    def loss_with(n):
        return lambda f: jnp.sum(
            gram_matrix_pallas(f, 5e5, n, True, HIGH, HIGH),
        )

    out = gram_matrix_pallas(feats, 5e5, n_norm, True, HIGH, HIGH)
    default = gram_matrix_pallas(feats, 5e5, None, True, HIGH, HIGH)
    default_norm = 1 * 8 * 8 * 4
    np.testing.assert_allclose(
        np.asarray(out) * n_norm,
        np.asarray(default) * default_norm,
        rtol=1e-6,
    )
    g = jax.grad(loss_with(n_norm))(feats)
    g_default = jax.grad(loss_with(None))(feats)
    np.testing.assert_allclose(
        np.asarray(g) * n_norm,
        np.asarray(g_default) * default_norm,
        rtol=1e-6,
    )


def test_running_on_tpu_honors_pinned_default_device() -> None:
    """A pinned jax.default_device outranks the process backend."""
    import jax

    from style_transfer_visualizer_tpu.ops.gram import _running_on_tpu

    old = jax.config.jax_default_device
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    try:
        assert _running_on_tpu() is False
    finally:
        jax.config.update("jax_default_device", old)


def test_exact_tile_shape_skips_padding() -> None:
    """P and C already tile-aligned: the pad branch is bypassed."""
    x = jax.random.uniform(
        jax.random.key(3), (1, 16, 32, 128), jnp.float32,
    )
    ours = gram_matrix_pallas(x, interpret=True)
    ref = gram_matrix(x)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-7,
    )
