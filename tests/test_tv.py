"""Total-variation regularizer: op math and objective integration.

The reference has no TV term (its loss is style + content only,
reference optimization.py:309-313); ``--tv-w`` is a TPU-framework
addition, so these tests pin the op against a numpy reference and then
prove every execution path folds it into the objective identically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_visualizer_tpu.engine.step import build_update_step
from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.features import compute_targets
from style_transfer_visualizer_tpu.ops.tv import tv_loss

HIGH = jax.lax.Precision.HIGHEST
STYLE_LAYERS = (0, 5)
CONTENT_LAYERS = (2,)


@pytest.fixture(scope="module")
def tiny_params():
    return vgg19.init_random_params(jax.random.key(0))


@pytest.fixture(scope="module")
def problem(tiny_params):
    rng = np.random.default_rng(7)
    content = jnp.asarray(
        rng.uniform(size=(1, 32, 32, 3)).astype(np.float32),
    )
    style = jnp.asarray(
        rng.uniform(size=(1, 32, 32, 3)).astype(np.float32),
    )
    targets = compute_targets(
        tiny_params, style, content, STYLE_LAYERS, CONTENT_LAYERS,
        precision=HIGH,
    )
    return content, targets


class TestTvLoss:
    def test_matches_numpy_reference(self) -> None:
        x = jax.random.normal(jax.random.key(0), (2, 8, 12, 3))
        arr = np.asarray(x)
        want = np.mean(np.square(np.diff(arr, axis=1))) + np.mean(
            np.square(np.diff(arr, axis=2)),
        )
        np.testing.assert_allclose(float(tv_loss(x)), want, rtol=1e-6)

    def test_constant_image_has_zero_tv(self) -> None:
        assert float(tv_loss(jnp.full((1, 6, 6, 3), 0.37))) == 0.0

    def test_gradient_smooths(self) -> None:
        """A gradient step on TV alone must reduce TV (it's convex)."""
        x = jax.random.normal(jax.random.key(1), (1, 10, 10, 3))
        g = jax.grad(tv_loss)(x)
        assert float(tv_loss(x - 0.5 * g)) < float(tv_loss(x))

    def test_accumulates_in_f32_for_low_precision_inputs(self) -> None:
        x = jax.random.normal(jax.random.key(2), (1, 8, 8, 3))
        bf = tv_loss(x.astype(jnp.bfloat16))
        assert bf.dtype == jnp.float32
        np.testing.assert_allclose(
            float(bf), float(tv_loss(x)), rtol=2e-2,
        )


class TestStepBuilderTv:
    def test_total_includes_tv_term_exactly(
        self, tiny_params, problem,
    ) -> None:
        """First-eval loss with tv_w differs by exactly tv_w * tv(x0)."""
        content, targets = problem
        common = dict(
            optimizer="adam", lr=0.05, style_w=10.0, content_w=1.0,
            style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
            precision="highest",
        )
        base = build_update_step(
            tiny_params, targets, tuple(content.shape), tv_w=0.0, **common,
        )
        reg = build_update_step(
            tiny_params, targets, tuple(content.shape), tv_w=3.0, **common,
        )
        _, _, aux0 = base.update_fn(content, base.opt_state)
        _, _, aux1 = reg.update_fn(content, reg.opt_state)
        np.testing.assert_allclose(
            float(aux1.loss) - float(aux0.loss),
            3.0 * float(tv_loss(content)),
            rtol=1e-5,
        )
        # The style/content telemetry split stays TV-free.
        np.testing.assert_allclose(
            float(aux1.style_score), float(aux0.style_score), rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(aux1.content_score),
            float(aux0.content_score),
            rtol=1e-6,
        )

    def test_banded_path_matches_whole_image(
        self, tiny_params, problem,
    ) -> None:
        """tile_rows > 0 with TV is eval-exact vs the whole image.

        Eval-level parity is asserted tight (loss + telemetry at a
        non-stationary point); the multi-step Adam trajectory uses the
        chaos-certified 1e-3 tolerance — see the banded-lap
        adjudication in BASELINE.md for why elementwise trajectory
        comparisons cannot carry an rtol at the rounding scale.
        """
        content, targets = problem
        common = dict(
            optimizer="adam", lr=0.05, style_w=10.0, content_w=1.0,
            tv_w=2.0, style_layers=STYLE_LAYERS,
            content_layers=CONTENT_LAYERS, precision="highest",
        )
        whole = build_update_step(
            tiny_params, targets, tuple(content.shape), **common,
        )
        banded = build_update_step(
            tiny_params, targets, tuple(content.shape), tile_rows=16,
            **common,
        )
        x0 = content * 0.25 + 0.1
        _, _, aw0 = whole.update_fn(x0, whole.opt_state)
        _, _, ab0 = banded.update_fn(x0, banded.opt_state)
        np.testing.assert_allclose(
            float(ab0.loss), float(aw0.loss), rtol=1e-5,
        )
        np.testing.assert_allclose(
            float(ab0.style_score), float(aw0.style_score), rtol=1e-5,
        )
        np.testing.assert_allclose(
            float(ab0.content_score), float(aw0.content_score), rtol=1e-5,
        )
        xw, sw = content, whole.opt_state
        xb, sb = content, banded.opt_state
        for _ in range(2):
            xw, sw, aw = whole.update_fn(xw, sw)
            xb, sb, ab = banded.update_fn(xb, sb)
        np.testing.assert_allclose(
            np.asarray(xb), np.asarray(xw), rtol=0, atol=1e-3,
        )
        np.testing.assert_allclose(
            float(ab.loss), float(aw.loss), rtol=1e-5,
        )

    def test_tv_pulls_optimization_toward_smoother_images(
        self, tiny_params, problem,
    ) -> None:
        """After a few steps the regularized image has lower TV."""
        content, targets = problem
        common = dict(
            optimizer="adam", lr=0.1, style_w=10.0, content_w=1.0,
            style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
            precision="highest",
        )
        runs = {}
        for tv_w in (0.0, 50.0):
            bundle = build_update_step(
                tiny_params, targets, tuple(content.shape), tv_w=tv_w,
                **common,
            )
            x, st = content, bundle.opt_state
            for _ in range(5):
                x, st, _ = bundle.update_fn(x, st)
            runs[tv_w] = float(tv_loss(x))
        assert runs[50.0] < runs[0.0]


class TestMultiStyleTv:
    def test_batched_totals_include_tv(self, tiny_params, problem) -> None:
        from style_transfer_visualizer_tpu.parallel.mesh import (
            single_device_mesh,
        )
        from style_transfer_visualizer_tpu.parallel.multistyle import (
            build_multi_style_update,
        )

        content, targets = problem
        stacked = jax.tree.map(
            lambda t: jnp.stack([t, t]), targets,
        )
        mesh = single_device_mesh()
        common = dict(
            optimizer="adam", lr=0.05, style_w=10.0, content_w=1.0,
            style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
            precision="highest",
        )
        base = build_multi_style_update(
            mesh, tiny_params, stacked, tuple(content.shape), 2,
            tv_w=0.0, **common,
        )
        reg = build_multi_style_update(
            mesh, tiny_params, stacked, tuple(content.shape), 2,
            tv_w=3.0, **common,
        )
        def fresh_images() -> jax.Array:
            # update_fn donates its image argument; each call gets its
            # own copy and the TV check below recomputes a third.
            return jnp.stack([content, content * 0.5])

        _, _, aux0 = base.update_fn(fresh_images(), base.opt_state)
        _, _, aux1 = reg.update_fn(fresh_images(), reg.opt_state)
        images = fresh_images()
        for s in range(2):
            np.testing.assert_allclose(
                float(aux1.loss[s]) - float(aux0.loss[s]),
                3.0 * float(tv_loss(images[s])),
                rtol=1e-5,
            )
