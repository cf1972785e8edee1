"""Mesh, multi-style DP, and spatially-sharded loss on 8 virtual devices.

The CPU backend is forced with xla_force_host_platform_device_count=8
(conftest), so shardings and collectives execute exactly as they would
across 8 TPU chips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_visualizer_tpu.constants import (
    MESH_AXIS_SPACE,
    MESH_AXIS_STYLE,
)
from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.features import (
    compute_targets,
    total_loss,
)
from style_transfer_visualizer_tpu.parallel.mesh import (
    create_mesh,
    single_device_mesh,
)
from style_transfer_visualizer_tpu.parallel.multistyle import (
    build_multi_style_update,
    initialize_multi_inputs,
    multi_style_targets,
)
from style_transfer_visualizer_tpu.parallel.spatial import (
    build_sharded_loss,
    compute_sharded_targets,
)

HIGH = jax.lax.Precision.HIGHEST
STYLE_LAYERS = (0, 5)
CONTENT_LAYERS = (2,)


@pytest.fixture(scope="module")
def tiny_params():
    return vgg19.init_random_params(jax.random.key(0))


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    content = jnp.asarray(
        rng.uniform(size=(1, 32, 32, 3)).astype(np.float32),
    )
    styles = [
        jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
        for _ in range(4)
    ]
    return content, styles


class TestMesh:
    def test_full_style_mesh(self) -> None:
        mesh = create_mesh()
        assert mesh.shape[MESH_AXIS_STYLE] == 8
        assert mesh.shape[MESH_AXIS_SPACE] == 1

    def test_2d_mesh(self) -> None:
        mesh = create_mesh(n_style=4, n_space=2)
        assert mesh.shape == {
            MESH_AXIS_STYLE: 4, MESH_AXIS_SPACE: 2,
        }

    def test_indivisible_raises(self) -> None:
        with pytest.raises(ValueError, match="not divisible"):
            create_mesh(n_space=3)

    def test_oversubscribed_raises(self) -> None:
        with pytest.raises(ValueError, match="needs"):
            create_mesh(n_style=8, n_space=2)

    def test_single_device_mesh(self) -> None:
        mesh = single_device_mesh()
        assert mesh.shape == {
            MESH_AXIS_STYLE: 1, MESH_AXIS_SPACE: 1,
        }


class TestMultiStyle:
    def test_stacked_targets_shapes(self, tiny_params, images) -> None:
        content, styles = images
        targets = multi_style_targets(
            tiny_params, content, styles, STYLE_LAYERS, CONTENT_LAYERS,
            precision=HIGH,
        )
        assert targets.style_grams[0].shape == (4, 64, 64)
        assert targets.content_feats[2].shape == (4, 1, 32, 32, 64)

    @pytest.mark.parametrize("optimizer", ["adam", "lbfgs"])
    def test_stacked_update_matches_single(
        self, tiny_params, images, optimizer,
    ) -> None:
        """One sharded multi-style step == S independent single steps."""
        content, styles = images
        mesh = create_mesh(n_style=4, n_space=1)
        targets = multi_style_targets(
            tiny_params, content, styles, STYLE_LAYERS, CONTENT_LAYERS,
            precision=HIGH,
        )
        kwargs = dict(
            optimizer=optimizer, lr=0.1, style_w=10.0, content_w=1.0,
            style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
            precision="highest", lbfgs_history_size=4,
        )
        bundle = build_multi_style_update(
            mesh, tiny_params, targets, tuple(content.shape), 4, **kwargs,
        )
        images0 = initialize_multi_inputs(
            content, "content", jax.random.key(1), 4,
        )
        stacked1, _, aux = bundle.update_fn(images0, bundle.opt_state)

        # Reference: each style independently through the single-problem
        # builder.
        from style_transfer_visualizer_tpu.engine.step import (
            build_update_step,
        )

        for s in range(4):
            single_targets = compute_targets(
                tiny_params, styles[s], content,
                STYLE_LAYERS, CONTENT_LAYERS, precision=HIGH,
            )
            single = build_update_step(
                tiny_params, single_targets, tuple(content.shape),
                lbfgs_max_iter=1, lbfgs_max_eval=1, **kwargs,
            )
            x1, _, aux_s = single.update_fn(
                jnp.array(content), single.opt_state,
            )
            np.testing.assert_allclose(
                np.asarray(stacked1[s]), np.asarray(x1),
                rtol=2e-4, atol=1e-6,
            )
            np.testing.assert_allclose(
                float(aux.loss[s]), float(aux_s.loss), rtol=1e-4,
            )

    def test_chunked_matches_stepwise(self, tiny_params, images) -> None:
        """k scanned stacked steps in one dispatch == k eager steps."""
        content, styles = images
        mesh = create_mesh(n_style=4, n_space=1)
        targets = multi_style_targets(
            tiny_params, content, styles, STYLE_LAYERS, CONTENT_LAYERS,
            precision=HIGH,
        )
        kwargs = dict(
            optimizer="adam", lr=0.1, style_w=10.0, content_w=1.0,
            style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
            precision="highest",
        )
        bundle = build_multi_style_update(
            mesh, tiny_params, targets, tuple(content.shape), 4, **kwargs,
        )
        images0 = initialize_multi_inputs(
            content, "content", jax.random.key(1), 4,
        )
        x1, s1 = images0, bundle.opt_state
        for _ in range(3):
            x1, s1, _ = bundle.update_fn(x1, s1)

        bundle2 = build_multi_style_update(
            mesh, tiny_params, targets, tuple(content.shape), 4, **kwargs,
        )
        images0 = initialize_multi_inputs(
            content, "content", jax.random.key(1), 4,
        )
        x2, _, auxes = bundle2.chunked_update_fn(
            images0, bundle2.opt_state, 3,
        )
        assert auxes.loss.shape == (3, 4)
        np.testing.assert_allclose(
            np.asarray(x2), np.asarray(x1), rtol=1e-4, atol=1e-6,
        )

    def test_sharding_layout(self, tiny_params, images) -> None:
        content, styles = images
        mesh = create_mesh(n_style=4, n_space=1)
        targets = multi_style_targets(
            tiny_params, content, styles, STYLE_LAYERS, CONTENT_LAYERS,
        )
        bundle = build_multi_style_update(
            mesh, tiny_params, targets, tuple(content.shape), 4,
            optimizer="adam", lr=0.1,
            style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
        )
        images0 = initialize_multi_inputs(
            content, "random", jax.random.key(0), 4,
        )
        out, _, _ = bundle.update_fn(images0, bundle.opt_state)
        # Each of the 4 styles lives on a distinct pair of devices.
        assert len(out.sharding.device_set) == 4

    def test_init_methods(self, images) -> None:
        content, _ = images
        white = initialize_multi_inputs(
            content, "white", jax.random.key(0), 3,
        )
        assert float(white.min()) == 1.0
        cloned = initialize_multi_inputs(
            content, "content", jax.random.key(0), 3,
        )
        np.testing.assert_array_equal(
            np.asarray(cloned[1]), np.asarray(content),
        )
        with pytest.raises(ValueError, match="Unsupported"):
            initialize_multi_inputs(content, "zeros", jax.random.key(0), 2)


class TestSpatialSharding:
    def test_sharded_loss_matches_single_device(
        self, tiny_params, images,
    ) -> None:
        """Row-sharded loss over 4 shards == unsharded loss."""
        content, styles = images
        style = styles[0]
        mesh = create_mesh(n_style=1, n_space=4)

        ref_targets = compute_targets(
            tiny_params, style, content, STYLE_LAYERS, CONTENT_LAYERS,
            precision=HIGH,
        )
        ref_loss, _ = total_loss(
            tiny_params, content * 0.5, ref_targets, 10.0, 1.0,
            STYLE_LAYERS, CONTENT_LAYERS, HIGH,
        )

        sharded_targets = compute_sharded_targets(
            mesh, tiny_params, style, content,
            STYLE_LAYERS, CONTENT_LAYERS, precision=HIGH,
        )
        # Replicated gram targets must equal the single-device ones.
        np.testing.assert_allclose(
            np.asarray(sharded_targets.style_grams[0]),
            np.asarray(ref_targets.style_grams[0]),
            rtol=1e-5, atol=1e-6,
        )

        loss_fn = build_sharded_loss(
            mesh, tiny_params, sharded_targets, tuple(content.shape),
            style_w=10.0, content_w=1.0,
            style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
            precision=HIGH,
        )
        sharded_loss = jax.jit(loss_fn)(content * 0.5)
        np.testing.assert_allclose(
            float(sharded_loss), float(ref_loss), rtol=1e-5,
        )

    def test_sharded_loss_honors_style_weights(
        self, tiny_params, images,
    ) -> None:
        """Per-layer style weights agree shard-sharded vs single-device."""
        content, styles = images
        mesh = create_mesh(n_style=1, n_space=4)
        weights = (2.0, 0.25)
        assert len(weights) == len(STYLE_LAYERS)

        ref_targets = compute_targets(
            tiny_params, styles[0], content, STYLE_LAYERS, CONTENT_LAYERS,
            precision=HIGH,
        )
        ref_loss, _ = total_loss(
            tiny_params, content * 0.5, ref_targets, 10.0, 1.0,
            STYLE_LAYERS, CONTENT_LAYERS, HIGH,
            style_weights=weights,
        )
        sharded_targets = compute_sharded_targets(
            mesh, tiny_params, styles[0], content,
            STYLE_LAYERS, CONTENT_LAYERS, precision=HIGH,
        )
        loss_fn = build_sharded_loss(
            mesh, tiny_params, sharded_targets, tuple(content.shape),
            style_w=10.0, content_w=1.0,
            style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
            precision=HIGH, style_weights=weights,
        )
        sharded_loss = jax.jit(loss_fn)(content * 0.5)
        np.testing.assert_allclose(
            float(sharded_loss), float(ref_loss), rtol=1e-5,
        )

    def test_sharded_gradient_matches(self, tiny_params, images) -> None:
        content, styles = images
        mesh = create_mesh(n_style=1, n_space=2)
        sharded_targets = compute_sharded_targets(
            mesh, tiny_params, styles[0], content,
            STYLE_LAYERS, CONTENT_LAYERS, precision=HIGH,
        )
        loss_fn = build_sharded_loss(
            mesh, tiny_params, sharded_targets, tuple(content.shape),
            style_w=10.0, content_w=1.0,
            style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
            precision=HIGH,
        )
        g_sharded = jax.jit(jax.grad(loss_fn))(content * 0.5)

        ref_targets = compute_targets(
            tiny_params, styles[0], content, STYLE_LAYERS, CONTENT_LAYERS,
            precision=HIGH,
        )

        def ref_loss_fn(x):
            loss, _ = total_loss(
                tiny_params, x, ref_targets, 10.0, 1.0,
                STYLE_LAYERS, CONTENT_LAYERS, HIGH,
            )
            return loss

        g_ref = jax.grad(ref_loss_fn)(content * 0.5)
        np.testing.assert_allclose(
            np.asarray(g_sharded), np.asarray(g_ref),
            rtol=1e-4, atol=1e-7,
        )

    def test_sharded_tv_matches_whole_image(self) -> None:
        """sharded_tv over 4 row shards == ops.tv.tv_loss, value + grad."""
        from jax.sharding import PartitionSpec as P

        from style_transfer_visualizer_tpu.ops.tv import tv_loss
        from style_transfer_visualizer_tpu.parallel.spatial import (
            sharded_tv,
        )

        mesh = create_mesh(n_style=1, n_space=4)
        img = jax.random.normal(jax.random.key(3), (1, 16, 12, 3))
        shape = tuple(img.shape)

        def global_tv(x):
            return jax.shard_map(
                lambda xb: sharded_tv(xb, shape),
                mesh=mesh,
                in_specs=P(None, MESH_AXIS_SPACE, None, None),
                out_specs=P(),
            )(x)

        np.testing.assert_allclose(
            float(jax.jit(global_tv)(img)), float(tv_loss(img)),
            rtol=1e-5,
        )
        # The seam terms are where the sharded form can silently go
        # wrong; the gradient check catches a mis-routed boundary row.
        g_sharded = jax.jit(jax.grad(global_tv))(img)
        g_whole = jax.grad(tv_loss)(img)
        np.testing.assert_allclose(
            np.asarray(g_sharded), np.asarray(g_whole),
            rtol=1e-5, atol=1e-7,
        )

    def test_batch_lap_without_target_rejected(
        self, tiny_params, images,
    ) -> None:
        """lap_w > 0 without a precomputed response is a build error."""
        content, styles = images
        mesh = create_mesh(n_style=4, n_space=1)
        targets = multi_style_targets(
            tiny_params, content, styles, STYLE_LAYERS, CONTENT_LAYERS,
            precision=HIGH,
        )
        with pytest.raises(ValueError, match="lap_target"):
            build_multi_style_update(
                mesh, tiny_params, targets, tuple(content.shape), 4,
                optimizer="adam", lr=0.1, style_w=10.0, content_w=1.0,
                style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
                lap_w=1.0,
            )

    def test_sharded_tv_single_shard_is_whole_image(self) -> None:
        """Axis size 1: no halo exchange, still the exact whole-image TV."""
        from jax.sharding import PartitionSpec as P

        from style_transfer_visualizer_tpu.ops.tv import tv_loss
        from style_transfer_visualizer_tpu.parallel.spatial import (
            sharded_tv,
        )

        mesh = create_mesh(n_style=1, n_space=1)
        img = jax.random.normal(jax.random.key(5), (1, 8, 12, 3))
        shape = tuple(img.shape)

        def global_tv(x):
            return jax.shard_map(
                lambda xb: sharded_tv(xb, shape),
                mesh=mesh,
                in_specs=P(None, MESH_AXIS_SPACE, None, None),
                out_specs=P(),
            )(x)

        np.testing.assert_allclose(
            float(jax.jit(global_tv)(img)), float(tv_loss(img)),
            rtol=1e-5,
        )

    def test_sharded_loss_with_tv_matches_single_device(
        self, tiny_params, images,
    ) -> None:
        from style_transfer_visualizer_tpu.ops.tv import tv_loss

        content, styles = images
        mesh = create_mesh(n_style=1, n_space=2)
        sharded_targets = compute_sharded_targets(
            mesh, tiny_params, styles[0], content,
            STYLE_LAYERS, CONTENT_LAYERS, precision=HIGH,
        )
        loss_fn = build_sharded_loss(
            mesh, tiny_params, sharded_targets, tuple(content.shape),
            style_w=10.0, content_w=1.0,
            style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
            precision=HIGH, tv_w=2.5,
        )
        ref_targets = compute_targets(
            tiny_params, styles[0], content, STYLE_LAYERS, CONTENT_LAYERS,
            precision=HIGH,
        )
        x = content * 0.5
        ref, _ = total_loss(
            tiny_params, x, ref_targets, 10.0, 1.0,
            STYLE_LAYERS, CONTENT_LAYERS, HIGH,
        )
        want = float(ref) + 2.5 * float(tv_loss(x))
        np.testing.assert_allclose(
            float(jax.jit(loss_fn)(x)), want, rtol=1e-5,
        )

    @pytest.mark.parametrize(
        ("n_space", "pool"), [(4, 2), (2, 4)],
        ids=["4shards-pool2", "2shards-pool4"],
    )
    def test_sharded_lap_matches_whole_image(self, n_space, pool) -> None:
        """sharded_lap over row shards == ops.lap.lap_loss, value + grad.

        The halo'd stencil rows and the edge-row masking are where the
        sharded form can silently diverge; the gradient check catches a
        mis-centered halo or an unmasked border response.
        """
        from jax.sharding import PartitionSpec as P

        from style_transfer_visualizer_tpu.ops.lap import (
            lap_loss,
            lap_response,
        )
        from style_transfer_visualizer_tpu.parallel.spatial import (
            padded_lap_target,
            sharded_lap,
        )

        mesh = create_mesh(n_style=1, n_space=n_space)
        img = jax.random.normal(jax.random.key(4), (1, 16, 12, 3))
        content = jax.random.normal(jax.random.key(5), (1, 16, 12, 3))
        shape = tuple(img.shape)
        target_pad = padded_lap_target(content, pool)
        row_spec = P(None, MESH_AXIS_SPACE, None, None)

        def global_lap(x):
            return jax.shard_map(
                lambda xb, tb: sharded_lap(xb, tb, shape, pool=pool),
                mesh=mesh,
                in_specs=(row_spec, row_spec),
                out_specs=P(),
            )(x, target_pad)

        def whole_lap(x):
            return lap_loss(x, lap_response(content, pool), pool)

        np.testing.assert_allclose(
            float(jax.jit(global_lap)(img)), float(whole_lap(img)),
            rtol=1e-5,
        )
        g_sharded = jax.jit(jax.grad(global_lap))(img)
        g_whole = jax.grad(whole_lap)(img)
        np.testing.assert_allclose(
            np.asarray(g_sharded), np.asarray(g_whole),
            rtol=1e-5, atol=1e-7,
        )

    def test_sharded_loss_with_lap_matches_single_device(
        self, tiny_params, images,
    ) -> None:
        """Lap composed into the sharded loss == whole-image objective."""
        from style_transfer_visualizer_tpu.models.features import Targets
        from style_transfer_visualizer_tpu.ops.lap import (
            lap_loss,
            lap_response,
        )
        from style_transfer_visualizer_tpu.parallel.spatial import (
            LAP_RESPONSE_KEY,
            padded_lap_target,
        )

        content, styles = images
        mesh = create_mesh(n_style=1, n_space=2)
        pool = 4
        sharded_targets = compute_sharded_targets(
            mesh, tiny_params, styles[0], content,
            STYLE_LAYERS, CONTENT_LAYERS, precision=HIGH,
        )
        feats = dict(sharded_targets.content_feats)
        feats[LAP_RESPONSE_KEY] = padded_lap_target(content, pool)
        loss_fn = build_sharded_loss(
            mesh, tiny_params,
            Targets(
                style_grams=sharded_targets.style_grams,
                content_feats=feats,
            ),
            tuple(content.shape),
            style_w=10.0, content_w=1.0,
            style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
            precision=HIGH, lap_w=3.0, lap_pool=pool,
        )
        ref_targets = compute_targets(
            tiny_params, styles[0], content, STYLE_LAYERS, CONTENT_LAYERS,
            precision=HIGH,
        )
        x = content * 0.5
        ref, _ = total_loss(
            tiny_params, x, ref_targets, 10.0, 1.0,
            STYLE_LAYERS, CONTENT_LAYERS, HIGH,
        )
        want = float(ref) + 3.0 * float(
            lap_loss(x, lap_response(content, pool), pool),
        )
        np.testing.assert_allclose(
            float(jax.jit(loss_fn)(x)), want, rtol=1e-5,
        )

    def test_lap_pool_misaligned_with_shards_rejected(self) -> None:
        """Compose-or-reject: a pool that splits shard rows must raise."""
        from style_transfer_visualizer_tpu.parallel.spatial import (
            validate_lap_shard_divisibility,
        )

        # 32 rows over 4 shards -> 8/shard; pool 3 straddles the seam.
        with pytest.raises(ValueError, match="lap_pool=3"):
            validate_lap_shard_divisibility(32, 4, 3)
        # Pool so coarse the stencil loses its 3 global rows.
        with pytest.raises(ValueError, match="at least 3 global rows"):
            validate_lap_shard_divisibility(8, 2, 4)
        # Aligned case passes.
        validate_lap_shard_divisibility(32, 4, 4)

    def test_deep_taps_through_pools(self, tiny_params) -> None:
        """Sharding survives all five pools (default layer set, 64px)."""
        rng = np.random.default_rng(3)
        content = jnp.asarray(
            rng.uniform(size=(1, 64, 64, 3)).astype(np.float32),
        )
        style = jnp.asarray(
            rng.uniform(size=(1, 64, 64, 3)).astype(np.float32),
        )
        mesh = create_mesh(n_style=1, n_space=2)
        style_layers = (0, 5, 10, 19, 28)
        content_layers = (21,)
        sharded_targets = compute_sharded_targets(
            mesh, tiny_params, style, content,
            style_layers, content_layers, precision=HIGH,
        )
        loss_fn = build_sharded_loss(
            mesh, tiny_params, sharded_targets, tuple(content.shape),
            style_w=1e5, content_w=1.0,
            style_layers=style_layers, content_layers=content_layers,
            precision=HIGH,
        )
        ref_targets = compute_targets(
            tiny_params, style, content, style_layers, content_layers,
            precision=HIGH,
        )
        ref, _ = total_loss(
            tiny_params, content, ref_targets, 1e5, 1.0,
            style_layers, content_layers, HIGH,
        )
        got = jax.jit(loss_fn)(content)
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)


def _dp_sp_setup(tiny_params, n_styles=2, size=32, seed=5, **kwargs):
    """2x2 mesh dp x sp bundle over fresh random content/styles.

    A ``lap_w`` in kwargs also stacks the padded Laplacian target into
    the content-feature dict (broadcast across styles), matching how
    ``main._dp_sp_multi_style`` wires the term.
    """
    from style_transfer_visualizer_tpu.models.features import Targets
    from style_transfer_visualizer_tpu.parallel.spatial import (
        LAP_RESPONSE_KEY,
        build_dp_sp_update,
        compute_sharded_targets,
        padded_lap_target,
    )

    rng = np.random.default_rng(seed)
    content = jnp.asarray(
        rng.uniform(size=(1, size, size, 3)).astype(np.float32),
    )
    styles = [
        jnp.asarray(
            rng.uniform(size=(1, size, size, 3)).astype(np.float32),
        )
        for _ in range(n_styles)
    ]
    mesh = create_mesh(n_style=2, n_space=2)
    per_style_targets = [
        compute_sharded_targets(
            mesh, tiny_params, s, content, STYLE_LAYERS, CONTENT_LAYERS,
            precision=HIGH,
        )
        for s in styles
    ]
    content_feats = {
        k: jnp.stack([t.content_feats[k] for t in per_style_targets])
        for k in CONTENT_LAYERS
    }
    if kwargs.get("lap_w"):
        pad = padded_lap_target(content, kwargs.get("lap_pool", 4))
        content_feats[LAP_RESPONSE_KEY] = jnp.stack([pad] * n_styles)
    stacked = Targets(
        style_grams={
            k: jnp.stack([t.style_grams[k] for t in per_style_targets])
            for k in STYLE_LAYERS
        },
        content_feats=content_feats,
    )
    built = build_dp_sp_update(
        mesh, tiny_params, stacked, tuple(content.shape), n_styles,
        style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
        precision=HIGH, **kwargs,
    )
    return built, content, styles


class TestDpSpCombined:
    def test_full_step_runs_and_decreases_loss(self, tiny_params) -> None:
        """2x2 mesh: styles x row-shards, one full Adam training step."""
        (update_fn, state, _), content, _ = _dp_sp_setup(
            tiny_params, lr=0.05, style_w=100.0, content_w=1.0,
        )
        images = jnp.stack([content * 0.5, content * 0.2])
        losses = []
        for _ in range(3):
            images, state, aux = update_fn(images, state)
            losses.append(np.asarray(aux.loss))
        assert losses[0].shape == (2,)
        assert np.all(losses[-1] < losses[0])
        assert images.shape == (2, 1, 32, 32, 3)
        assert aux.style_score.shape == (2,)
        assert aux.content_score.shape == (2,)

    @pytest.mark.parametrize(
        ("optimizer", "direction"),
        [("adam", "two-loop"), ("lbfgs", "two-loop"), ("lbfgs", "compact")],
        ids=["adam", "lbfgs-two-loop", "lbfgs-compact"],
    )
    def test_dp_sp_trajectory_matches_single_device(
        self, tiny_params, optimizer, direction,
    ) -> None:
        """3 dp x sp steps == 3 single-device steps, per style.

        Three steps take the sharded L-BFGS through history insertion
        and the direction computation — the two-loop's psum'd dot
        products or the compact representation's psum'd ring
        contractions — so every collective is exercised against the
        whole-vector math.
        """
        kwargs = dict(
            optimizer=optimizer, lr=0.1, style_w=10.0, content_w=1.0,
            lbfgs_history_size=4, lbfgs_max_iter=1, lbfgs_max_eval=1,
            lbfgs_direction=direction,
        )
        (update_fn, state, _), content, styles = _dp_sp_setup(
            tiny_params, **kwargs,
        )
        images = jnp.stack([content, content])
        traj = []
        for _ in range(3):
            images, state, aux = update_fn(images, state)
            traj.append((np.asarray(images), np.asarray(aux.loss)))

        from style_transfer_visualizer_tpu.engine.step import (
            build_update_step,
        )

        single_kwargs = dict(kwargs)
        single_kwargs["style_layers"] = STYLE_LAYERS
        single_kwargs["content_layers"] = CONTENT_LAYERS
        single_kwargs["precision"] = "highest"
        for s in range(2):
            targets = compute_targets(
                tiny_params, styles[s], content,
                STYLE_LAYERS, CONTENT_LAYERS, precision=HIGH,
            )
            single = build_update_step(
                tiny_params, targets, tuple(content.shape),
                **single_kwargs,
            )
            x, st = jnp.array(content), single.opt_state
            for step in range(3):
                x, st, aux_s = single.update_fn(x, st)
                np.testing.assert_allclose(
                    traj[step][0][s], np.asarray(x),
                    rtol=2e-3, atol=1e-5,
                )
                np.testing.assert_allclose(
                    traj[step][1][s], float(aux_s.loss), rtol=1e-3,
                )

    def test_dp_sp_tv_trajectory_matches_single_device(
        self, tiny_params,
    ) -> None:
        """TV shards seam-exactly: dp x sp trajectory == single device.

        The single-device step computes TV on the whole image; each
        dp x sp shard computes its block's terms plus one ppermuted
        seam row — three Adam steps agreeing per pixel proves the
        decomposition is exact through the gradient.
        """
        kwargs = dict(
            optimizer="adam", lr=0.1, style_w=10.0, content_w=1.0,
            tv_w=5.0,
        )
        (update_fn, state, _), content, styles = _dp_sp_setup(
            tiny_params, **kwargs,
        )
        images = jnp.stack([content, content])
        traj = []
        for _ in range(3):
            images, state, aux = update_fn(images, state)
            traj.append((np.asarray(images), np.asarray(aux.loss)))

        from style_transfer_visualizer_tpu.engine.step import (
            build_update_step,
        )

        single_kwargs = dict(kwargs)
        single_kwargs["style_layers"] = STYLE_LAYERS
        single_kwargs["content_layers"] = CONTENT_LAYERS
        single_kwargs["precision"] = "highest"
        for s in range(2):
            targets = compute_targets(
                tiny_params, styles[s], content,
                STYLE_LAYERS, CONTENT_LAYERS, precision=HIGH,
            )
            single = build_update_step(
                tiny_params, targets, tuple(content.shape),
                **single_kwargs,
            )
            x, st = jnp.array(content), single.opt_state
            for step in range(3):
                x, st, aux_s = single.update_fn(x, st)
                np.testing.assert_allclose(
                    traj[step][0][s], np.asarray(x),
                    rtol=2e-3, atol=1e-5,
                )
                np.testing.assert_allclose(
                    traj[step][1][s], float(aux_s.loss), rtol=1e-3,
                )

    def test_dp_sp_lap_trajectory_matches_single_device(
        self, tiny_params,
    ) -> None:
        """Lap shards halo-exactly: dp x sp trajectory == single device.

        The single-device step pools and stencils the whole image; each
        dp x sp shard pools its own rows and fetches one pooled halo row
        per neighbor — three Adam steps agreeing per pixel proves the
        decomposition is exact through the gradient (round-3 verdict #3:
        compose the term, don't drop it).
        """
        from style_transfer_visualizer_tpu.ops.lap import lap_response

        kwargs = dict(
            optimizer="adam", lr=0.1, style_w=10.0, content_w=1.0,
            lap_w=3.0, lap_pool=4,
        )
        (update_fn, state, _), content, styles = _dp_sp_setup(
            tiny_params, **kwargs,
        )
        images = jnp.stack([content, content])
        traj = []
        for _ in range(3):
            images, state, aux = update_fn(images, state)
            traj.append((np.asarray(images), np.asarray(aux.loss)))

        from style_transfer_visualizer_tpu.engine.step import (
            build_update_step,
        )

        single_kwargs = dict(kwargs)
        single_kwargs["style_layers"] = STYLE_LAYERS
        single_kwargs["content_layers"] = CONTENT_LAYERS
        single_kwargs["precision"] = "highest"
        single_kwargs["lap_target"] = lap_response(content, 4)
        for s in range(2):
            targets = compute_targets(
                tiny_params, styles[s], content,
                STYLE_LAYERS, CONTENT_LAYERS, precision=HIGH,
            )
            single = build_update_step(
                tiny_params, targets, tuple(content.shape),
                **single_kwargs,
            )
            x, st = jnp.array(content), single.opt_state
            for step in range(3):
                x, st, aux_s = single.update_fn(x, st)
                np.testing.assert_allclose(
                    traj[step][0][s], np.asarray(x),
                    rtol=2e-3, atol=1e-5,
                )
                np.testing.assert_allclose(
                    traj[step][1][s], float(aux_s.loss), rtol=1e-3,
                )

    def test_dp_sp_chunked_matches_stepwise(self, tiny_params) -> None:
        """k scanned dp x sp steps in one dispatch == k eager steps."""
        kwargs = dict(
            optimizer="adam", lr=0.05, style_w=100.0, content_w=1.0,
        )
        (update_fn, state, _), content, _ = _dp_sp_setup(
            tiny_params, **kwargs,
        )
        images = jnp.stack([content * 0.5, content * 0.2])
        x1, s1 = images, state
        for _ in range(3):
            x1, s1, _ = update_fn(x1, s1)

        (_, state2, chunked), content, _ = _dp_sp_setup(
            tiny_params, **kwargs,
        )
        images2 = jnp.stack([content * 0.5, content * 0.2])
        x2, _, auxes = chunked(images2, state2, 3)
        assert auxes.loss.shape == (3, 2)
        # scan vs eager re-associates fusions; tolerance covers the
        # few-ulp drift that amplifies over 3 steps.
        np.testing.assert_allclose(
            np.asarray(x2), np.asarray(x1), rtol=1e-3, atol=1e-5,
        )


class TestSpatialStepBundle:
    """The spatial loss injected into the shared step builder."""

    def _bundles(self, tiny_params, content, style, optimizer, n_space):
        from style_transfer_visualizer_tpu.engine.step import (
            build_update_step,
        )
        from style_transfer_visualizer_tpu.models.features import Targets
        from style_transfer_visualizer_tpu.parallel.spatial import (
            make_spatial_loss,
            spatial_shardings,
        )

        kwargs = dict(
            optimizer=optimizer, lr=0.1, style_w=10.0, content_w=1.0,
            style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
            precision="highest", lbfgs_history_size=4,
        )
        ref_targets = compute_targets(
            tiny_params, style, content, STYLE_LAYERS, CONTENT_LAYERS,
            precision=HIGH,
        )
        single = build_update_step(
            tiny_params, ref_targets, tuple(content.shape), **kwargs,
        )

        mesh = create_mesh(n_style=1, n_space=n_space)
        sharded_targets = compute_sharded_targets(
            mesh, tiny_params, style, content,
            STYLE_LAYERS, CONTENT_LAYERS, precision=HIGH,
        )
        row, tshard = spatial_shardings(mesh, sharded_targets)
        sharded_targets = jax.device_put(sharded_targets, tshard)
        loss_fn = make_spatial_loss(
            mesh, tuple(content.shape),
            style_w=10.0, content_w=1.0,
            style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
            precision=HIGH,
        )
        spatial = build_update_step(
            tiny_params, sharded_targets, tuple(content.shape),
            loss_fn=loss_fn, **kwargs,
        )
        return single, spatial, row

    @pytest.mark.parametrize("optimizer", ["adam", "lbfgs"])
    def test_spatial_step_matches_single_device(
        self, tiny_params, images, optimizer,
    ) -> None:
        content, styles = images
        single, spatial, row = self._bundles(
            tiny_params, content, styles[0], optimizer, n_space=4,
        )
        x_single, _, aux_single = single.update_fn(
            jnp.array(content), single.opt_state,
        )
        x_spatial, _, aux_spatial = spatial.update_fn(
            jax.device_put(jnp.array(content), row), spatial.opt_state,
        )
        np.testing.assert_allclose(
            np.asarray(x_spatial), np.asarray(x_single),
            rtol=2e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            float(aux_spatial.loss), float(aux_single.loss), rtol=1e-4,
        )
        np.testing.assert_allclose(
            float(aux_spatial.style_score),
            float(aux_single.style_score), rtol=1e-4,
        )

    def test_spatial_chunked_dispatch(self, tiny_params, images) -> None:
        """lax.scan over the shard_map'd update: k steps, one dispatch."""
        content, styles = images
        _, spatial, row = self._bundles(
            tiny_params, content, styles[0], "adam", n_space=2,
        )
        x1 = jax.device_put(content * 0.5, row)
        s1 = spatial.opt_state
        for _ in range(3):
            x1, s1, _ = spatial.update_fn(x1, s1)

        _, spatial2, _ = self._bundles(
            tiny_params, content, styles[0], "adam", n_space=2,
        )
        x2, s2, auxes = spatial2.chunked_update_fn(
            jax.device_put(content * 0.5, row), spatial2.opt_state, 3,
        )
        assert auxes.loss.shape == (3,)
        np.testing.assert_allclose(
            np.asarray(x2), np.asarray(x1), rtol=1e-4, atol=1e-6,
        )

    def test_spatial_steps_decrease_loss(self, tiny_params, images) -> None:
        content, styles = images
        _, spatial, row = self._bundles(
            tiny_params, content, styles[0], "adam", n_space=2,
        )
        x = jax.device_put(content * 0.5, row)
        state = spatial.opt_state
        losses = []
        for _ in range(3):
            x, state, aux = spatial.update_fn(x, state)
            losses.append(float(aux.loss))
        assert losses[-1] < losses[0]

    def test_style_transfer_spatial_end_to_end(
        self, make_style_transfer_config, make_input_paths,
    ) -> None:
        """Full pipeline with --spatial-shards on the default tap set."""
        from style_transfer_visualizer_tpu.main import style_transfer

        cfg = make_style_transfer_config(
            optimization={
                "allow_random_weights": True,
                "optimizer": "adam",
                "steps": 2,
            },
            video={"final_only": True},
            hardware={"spatial_shards": 2},
        )
        result = style_transfer(make_input_paths(), cfg)
        assert result.shape == (1, 64, 64, 3)
        assert bool(jnp.all(jnp.isfinite(result)))

    def test_style_transfer_spatial_lap_end_to_end(
        self, make_style_transfer_config, make_input_paths,
    ) -> None:
        """--lap-w composes with --spatial-shards (no silent drop)."""
        from style_transfer_visualizer_tpu.main import style_transfer

        cfg = make_style_transfer_config(
            optimization={
                "allow_random_weights": True,
                "optimizer": "adam",
                "steps": 2,
                "lap_w": 5.0,
                "lap_pool": 2,
            },
            video={"final_only": True},
            hardware={"spatial_shards": 2},
        )
        result = style_transfer(make_input_paths(), cfg)
        assert result.shape == (1, 64, 64, 3)
        assert bool(jnp.all(jnp.isfinite(result)))

    def test_lap_with_custom_loss_fn_rejected(self, tiny_params) -> None:
        """build_update_step refuses lap_w alongside a custom loss_fn.

        A custom objective owns its regularizers; silently dropping the
        requested term (the old behavior) changed the objective without
        telling the user.
        """
        from style_transfer_visualizer_tpu.engine.step import (
            build_update_step,
        )

        content = jnp.zeros((1, 32, 32, 3), jnp.float32)
        targets = compute_targets(
            tiny_params, content, content, STYLE_LAYERS, CONTENT_LAYERS,
            precision=HIGH,
        )
        with pytest.raises(ValueError, match="custom loss_fn"):
            build_update_step(
                tiny_params, targets, tuple(content.shape),
                optimizer="adam", lr=0.1, style_w=1.0, content_w=1.0,
                style_layers=STYLE_LAYERS, content_layers=CONTENT_LAYERS,
                lap_w=1.0,
                loss_fn=lambda p, x, t: (jnp.zeros(()), (0.0, 0.0)),
            )

    def test_spatial_shards_exceeding_devices_raises(
        self, make_style_transfer_config, make_input_paths,
    ) -> None:
        from style_transfer_visualizer_tpu.main import style_transfer

        cfg = make_style_transfer_config(
            optimization={"allow_random_weights": True},
            video={"final_only": True},
            hardware={"spatial_shards": 9},
        )
        with pytest.raises(ValueError, match="spatial-shards"):
            style_transfer(make_input_paths(), cfg)

    def test_spatial_and_tiling_mutually_exclusive(
        self, make_style_transfer_config, make_input_paths,
    ) -> None:
        from style_transfer_visualizer_tpu.main import style_transfer

        cfg = make_style_transfer_config(
            optimization={"allow_random_weights": True, "tile_rows": 16},
            video={"final_only": True},
            hardware={"spatial_shards": 2},
        )
        with pytest.raises(ValueError, match="mutually exclusive"):
            style_transfer(make_input_paths(), cfg)


class TestDpSpDefaultTaps:
    @pytest.mark.slow
    def test_full_step_default_layer_set(self, tiny_params) -> None:
        """dp x sp update with the production taps (through index 28)."""
        from style_transfer_visualizer_tpu.models.features import Targets
        from style_transfer_visualizer_tpu.parallel.spatial import (
            build_dp_sp_update,
            compute_sharded_targets,
        )

        style_layers = (0, 5, 10, 19, 28)
        content_layers = (21,)
        rng = np.random.default_rng(7)
        content = jnp.asarray(
            rng.uniform(size=(1, 64, 64, 3)).astype(np.float32),
        )
        styles = [
            jnp.asarray(
                rng.uniform(size=(1, 64, 64, 3)).astype(np.float32),
            )
            for _ in range(2)
        ]
        mesh = create_mesh(n_style=2, n_space=2)
        per_style = [
            compute_sharded_targets(
                mesh, tiny_params, s, content,
                style_layers, content_layers, precision=HIGH,
            )
            for s in styles
        ]
        stacked = Targets(
            style_grams={
                k: jnp.stack([t.style_grams[k] for t in per_style])
                for k in style_layers
            },
            content_feats={
                k: jnp.stack([t.content_feats[k] for t in per_style])
                for k in content_layers
            },
        )
        update_fn, state, _ = build_dp_sp_update(
            mesh, tiny_params, stacked, tuple(content.shape), 2,
            lr=0.05, style_w=1e5, content_w=1.0,
            style_layers=style_layers, content_layers=content_layers,
            precision=HIGH,
        )
        images = jnp.stack([content * 0.5, content * 0.2])
        first = None
        for _ in range(2):
            images, state, aux = update_fn(images, state)
            if first is None:
                first = np.asarray(aux.loss)
        last = np.asarray(aux.loss)
        assert np.all(np.isfinite(last))
        assert np.all(last < first)

        # Cross-check the sharded per-style losses against the
        # unsharded loss at the same point.
        ref_targets = compute_targets(
            tiny_params, styles[0], content, style_layers,
            content_layers, precision=HIGH,
        )
        ref0, _ = total_loss(
            tiny_params, content * 0.5, ref_targets, 1e5, 1.0,
            style_layers, content_layers, HIGH,
        )
        np.testing.assert_allclose(float(first[0]), float(ref0), rtol=1e-4)


class TestShardDivisibility:
    def test_indivisible_height_rejected(self, tiny_params) -> None:
        """Odd per-shard heights at a pool must fail at build, not drift."""
        from style_transfer_visualizer_tpu.parallel.spatial import (
            compute_sharded_targets,
        )

        mesh = create_mesh(n_style=1, n_space=2)
        # H=20, n_space=2 -> per-shard 10 -> after one pool 5 (odd): the
        # next pool would silently drop a row per shard.
        content = jnp.zeros((1, 20, 32, 3), jnp.float32)
        style = jnp.zeros((1, 20, 32, 3), jnp.float32)
        with pytest.raises(ValueError, match="divisible"):
            compute_sharded_targets(
                mesh, tiny_params, style, content, (0, 10), (2,),
            )

    def test_divisible_height_accepted(self, tiny_params) -> None:
        from style_transfer_visualizer_tpu.parallel.spatial import (
            validate_shard_divisibility,
        )

        validate_shard_divisibility(64, 2, (0, 10))  # 64 % (2*4) == 0


class TestUnknownOptimizerRejected:
    def test_multi_style_builder(self, tiny_params, images) -> None:
        content, styles = images
        targets = multi_style_targets(
            tiny_params, content, styles, STYLE_LAYERS, CONTENT_LAYERS,
            precision=HIGH,
        )
        mesh = create_mesh(n_style=4)
        with pytest.raises(ValueError, match="Unknown optimizer: 'sgd'"):
            build_multi_style_update(
                mesh, tiny_params, targets, (1, 32, 32, 3), 4,
                optimizer="sgd",
                style_layers=STYLE_LAYERS,
                content_layers=CONTENT_LAYERS,
            )

    def test_dp_sp_builder(self, tiny_params, images) -> None:
        from style_transfer_visualizer_tpu.parallel.spatial import (
            build_dp_sp_update,
        )

        content, styles = images
        targets = multi_style_targets(
            tiny_params, content, styles, STYLE_LAYERS, CONTENT_LAYERS,
            precision=HIGH,
        )
        mesh = create_mesh(n_style=4, n_space=2)
        with pytest.raises(ValueError, match="Unknown optimizer: 'sgd'"):
            build_dp_sp_update(
                mesh, tiny_params, targets, (1, 32, 32, 3), 4,
                optimizer="sgd",
                style_layers=STYLE_LAYERS,
                content_layers=CONTENT_LAYERS,
            )


def test_shard_divisibility_no_taps_is_vacuous() -> None:
    """With no taps there is nothing to pool across; any height passes."""
    from style_transfer_visualizer_tpu.parallel.spatial import (
        validate_shard_divisibility,
    )

    assert validate_shard_divisibility(63, 2, ()) is None


def test_dp_sp_lbfgs_bf16_history_ring(tiny_params) -> None:
    """The sharded two-loop recursion runs on a bfloat16 curvature ring."""
    (update_fn, state, _), _content, _styles = _dp_sp_setup(
        tiny_params,
        optimizer="lbfgs", lr=0.5, style_w=10.0, content_w=1.0,
        lbfgs_history_size=4, lbfgs_max_iter=1, lbfgs_max_eval=1,
        lbfgs_history_dtype="bfloat16",
    )
    assert state.s_hist.dtype == jnp.bfloat16
    rng = np.random.default_rng(11)
    noisy = jnp.asarray(
        rng.uniform(size=_content.shape).astype(np.float32),
    )
    images = jnp.stack([noisy, noisy])
    first = None
    for _ in range(3):
        images, state, aux = update_fn(images, state)
        if first is None:
            first = np.asarray(aux.loss)
    assert np.all(np.isfinite(np.asarray(aux.loss)))
    assert np.all(np.asarray(aux.loss) < first)


class TestMultiStyleLoopWithoutIntroAssets:
    def test_loop_runs_with_no_content_or_style_paths(
        self, tmp_path, make_style_transfer_config,
    ) -> None:
        """_run_multi_style_loop's intro block is gated on the caller
        providing intro assets; the None-default path (no gallery
        intro possible) must run the loop cleanly."""
        import jax

        import style_transfer_visualizer_tpu.main as stv_main
        from style_transfer_visualizer_tpu.models import vgg19
        from style_transfer_visualizer_tpu.parallel.mesh import create_mesh
        from style_transfer_visualizer_tpu.parallel.multistyle import (
            build_multi_style_update,
            initialize_multi_inputs,
            multi_style_targets,
        )

        params = vgg19.init_random_params(jax.random.key(0))
        mesh = create_mesh(
            n_style=2, n_space=1, devices=jax.devices()[:2],
        )
        content = jax.random.uniform(
            jax.random.key(1), (1, 32, 32, 3),
        )
        targets = multi_style_targets(
            params, content, [content, content * 0.5], (0,), (2,),
        )
        bundle = build_multi_style_update(
            mesh, params, targets, (1, 32, 32, 3), 2,
            optimizer="adam", lr=0.1,
            style_layers=(0,), content_layers=(2,),
        )
        cfg = make_style_transfer_config(
            optimization={"steps": 1},
            video={"create_video": False, "create_gif": False},
        )
        images = initialize_multi_inputs(
            content, "content", jax.random.key(2), 2,
        )
        out, _state, errors = stv_main._run_multi_style_loop(
            bundle, images, bundle.opt_state, cfg, tmp_path, ["a", "b"],
        )
        assert errors == []
        assert out.shape == (2, 1, 32, 32, 3)


class TestFrozenHaloConvForward:
    def test_flipped_params_do_not_change_the_forward(self) -> None:
        """sharded_extract_features with pre-flipped kernels routes
        through the frozen-backward halo conv; outside differentiation
        its primal must equal the plain halo-conv sweep exactly."""
        import jax
        import jax.numpy as jnp

        from style_transfer_visualizer_tpu.models import vgg19
        from style_transfer_visualizer_tpu.models.vgg19 import (
            add_flipped_kernels,
        )
        from style_transfer_visualizer_tpu.parallel.mesh import create_mesh
        from style_transfer_visualizer_tpu.parallel.spatial import (
            sharded_extract_features,
        )

        params = vgg19.init_random_params(jax.random.key(0))
        mesh = create_mesh(
            n_style=1, n_space=2, devices=jax.devices()[:2],
        )
        x = jax.random.uniform(jax.random.key(1), (1, 32, 32, 3))

        def extract(p):
            mapped = jax.shard_map(
                lambda p_, x_: sharded_extract_features(p_, x_, (0, 5)),
                mesh=mesh,
                in_specs=(
                    jax.sharding.PartitionSpec(),
                    jax.sharding.PartitionSpec(None, "space", None, None),
                ),
                out_specs={
                    0: jax.sharding.PartitionSpec(None, "space", None, None),
                    5: jax.sharding.PartitionSpec(None, "space", None, None),
                },
            )
            return mapped(p, x)

        plain = extract(params)
        frozen = extract(add_flipped_kernels(params))
        for idx in (0, 5):
            assert jnp.array_equal(plain[idx], frozen[idx])
