"""Tests for the mixed matmul-precision policy (ops/precision.py).

The policy is the pipeline-default parity tier: bf16x3 convs with the
first two VGG19 blocks and the Gram contractions in f32 (the measured
error-dominant sites — see BASELINE.md). On the CPU backend every tier
executes in f32, so these tests verify resolution, threading, and
numerical agreement rather than tier-specific rounding.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest

from style_transfer_visualizer_tpu.engine.step import (
    build_update_step,
    resolve_precision,
)
from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.features import (
    compute_targets,
    initialize_input,
    total_loss,
)
from style_transfer_visualizer_tpu.ops.precision import (
    MIXED,
    PrecisionPolicy,
    conv_precision,
    gram_precision,
)

HIGH = jax.lax.Precision.HIGH
HIGHEST = jax.lax.Precision.HIGHEST


class TestPolicyResolution:
    def test_mixed_resolves_to_policy(self) -> None:
        assert resolve_precision("mixed") is MIXED

    def test_plain_tiers_unchanged(self) -> None:
        assert resolve_precision("highest") is HIGHEST
        assert resolve_precision("high") is HIGH
        assert (
            resolve_precision("default") is jax.lax.Precision.DEFAULT
        )

    def test_unknown_tier_raises(self) -> None:
        with pytest.raises(ValueError, match="Unknown precision"):
            resolve_precision("bf16ish")

    def test_mixed_overrides_first_two_blocks(self) -> None:
        # torchvision vgg19.features conv indices for blocks 1-2.
        for idx in (0, 2, 5, 7):
            assert MIXED.conv(idx) == HIGHEST
        # Deeper convs stay at the bf16x3 base.
        for idx in (10, 12, 19, 21, 28):
            assert MIXED.conv(idx) == HIGH

    def test_mixed_gram_is_f32(self) -> None:
        assert MIXED.gram == HIGHEST


class TestHelpers:
    def test_conv_precision_passthrough(self) -> None:
        assert conv_precision(HIGH, 0) == HIGH
        assert conv_precision(None, 28) is None

    def test_conv_precision_policy(self) -> None:
        assert conv_precision(MIXED, 0) == HIGHEST
        assert conv_precision(MIXED, 10) == HIGH

    def test_gram_precision_passthrough(self) -> None:
        assert gram_precision(HIGH) == HIGH
        assert gram_precision(None) is None

    def test_gram_precision_policy_falls_back_to_base(self) -> None:
        policy = PrecisionPolicy(conv_base=HIGH)
        assert gram_precision(policy) == HIGH
        assert gram_precision(MIXED) == HIGHEST

    def test_policy_hashable_for_jit_statics(self) -> None:
        import dataclasses

        clone = PrecisionPolicy(**{
            f.name: getattr(MIXED, f.name)
            for f in dataclasses.fields(PrecisionPolicy)
        })
        assert hash(MIXED) == hash(clone)

    def test_mixed_backward_demoted_to_base(self) -> None:
        # Forward f32 for blocks 1-2, backward bf16x3 everywhere: the
        # measured sweet spot (BASELINE.md).
        for idx in (0, 2, 5, 7, 10, 28):
            assert MIXED.conv_bwd(idx) == HIGH

    def test_bwd_mirrors_forward_when_unset(self) -> None:
        policy = PrecisionPolicy(
            conv_base=HIGH, conv_overrides=((0, HIGHEST),),
        )
        assert policy.conv_bwd(0) == HIGHEST
        assert policy.conv_bwd(10) == HIGH

    def test_conv_bwd_precision_helper(self) -> None:
        from style_transfer_visualizer_tpu.ops.precision import (
            conv_bwd_precision,
        )

        assert conv_bwd_precision(MIXED, 0) == HIGH
        assert conv_bwd_precision(HIGHEST, 0) == HIGHEST


class TestEndToEnd:
    """The policy threads through targets, loss, and the update step."""

    @pytest.fixture(scope="class")
    def problem(self):
        params = vgg19.init_random_params(jax.random.key(0))
        sl, cl = (0, 5), (2,)
        key = jax.random.key(1)
        shape = (1, 32, 32, 3)
        content = jax.random.uniform(key, shape, jnp.float32)
        style = jax.random.uniform(
            jax.random.fold_in(key, 1), shape, jnp.float32,
        )
        return params, content, style, sl, cl

    def test_loss_matches_f32_on_cpu(self, problem) -> None:
        # CPU executes every precision tier in f32, so the policy must
        # produce bit-identical losses to the plain HIGHEST path there.
        params, content, style, sl, cl = problem
        t_mixed = compute_targets(params, style, content, sl, cl, MIXED)
        t_f32 = compute_targets(params, style, content, sl, cl, HIGHEST)
        x = initialize_input(content, "random", jax.random.key(2))
        loss_mixed, _ = total_loss(
            params, x, t_mixed, 1e5, 1.0, sl, cl, MIXED,
        )
        loss_f32, _ = total_loss(
            params, x, t_f32, 1e5, 1.0, sl, cl, HIGHEST,
        )
        assert float(loss_mixed) == pytest.approx(
            float(loss_f32), rel=1e-6,
        )

    def test_update_step_runs_with_mixed(self, problem) -> None:
        params, content, style, sl, cl = problem
        targets = compute_targets(
            params, style, content, sl, cl, MIXED,
        )
        bundle = build_update_step(
            params, targets, tuple(content.shape),
            optimizer="adam", lr=0.05, style_w=1e5, content_w=1.0,
            style_layers=sl, content_layers=cl, precision="mixed",
        )
        x = initialize_input(content, "random", jax.random.key(2))
        x, state, aux = bundle.update_fn(x, bundle.opt_state)
        x, state, aux = bundle.chunked_update_fn(x, state, 2)
        assert jnp.isfinite(aux.loss).all()


class TestPolicyThroughAlternatePaths:
    """MIXED flows through the tiled and sharded losses unchanged.

    CPU executes every tier in f32, so agreement with the HIGHEST path
    proves the policy threads (a leaked policy object would crash the
    leaf lax ops; a dropped one would be caught by the TPU parity
    benches).
    """

    def test_tiled_loss_accepts_policy(self) -> None:
        from style_transfer_visualizer_tpu.ops.tiled import (
            tiled_total_loss,
        )

        params = vgg19.init_random_params(jax.random.key(0))
        sl, cl = (0, 5), (2,)
        key = jax.random.key(1)
        shape = (1, 64, 48, 3)
        content = jax.random.uniform(key, shape, jnp.float32)
        style = jax.random.uniform(
            jax.random.fold_in(key, 1), shape, jnp.float32,
        )
        targets = compute_targets(params, style, content, sl, cl, MIXED)
        x = initialize_input(content, "random", jax.random.key(2))
        got, _ = tiled_total_loss(
            params, x, targets, 1e5, 1.0, sl, cl, 16, MIXED,
        )
        want, _ = total_loss(
            params, x, targets, 1e5, 1.0, sl, cl, HIGHEST,
        )
        assert float(got) == pytest.approx(float(want), rel=1e-6)

    def test_sharded_loss_accepts_policy(self) -> None:
        from style_transfer_visualizer_tpu.parallel.mesh import (
            create_mesh,
        )
        from style_transfer_visualizer_tpu.parallel.spatial import (
            compute_sharded_targets,
            make_spatial_loss,
        )

        mesh = create_mesh(n_style=1, n_space=2)
        params = vgg19.init_random_params(jax.random.key(0))
        sl, cl = (0, 5), (2,)
        key = jax.random.key(1)
        shape = (1, 32, 32, 3)
        content = jax.random.uniform(key, shape, jnp.float32)
        style = jax.random.uniform(
            jax.random.fold_in(key, 1), shape, jnp.float32,
        )
        targets = compute_sharded_targets(
            mesh, params, style, content, sl, cl, precision=MIXED,
        )
        loss_fn = make_spatial_loss(
            mesh, shape, style_w=1e5, content_w=1.0,
            style_layers=sl, content_layers=cl, precision=MIXED,
        )
        x = initialize_input(content, "random", jax.random.key(2))
        total, (s_score, c_score) = loss_fn(params, x, targets)
        ref_targets = compute_targets(
            params, style, content, sl, cl, HIGHEST,
        )
        want, _ = total_loss(
            params, x, ref_targets, 1e5, 1.0, sl, cl, HIGHEST,
        )
        assert float(total) == pytest.approx(float(want), rel=1e-5)


class TestBackwardPrecisionFallbacks:
    def test_gram_bwd_mirrors_gram_when_unset(self) -> None:
        import jax

        policy = PrecisionPolicy(
            conv_base=jax.lax.Precision.DEFAULT,
            gram=jax.lax.Precision.HIGHEST,
        )
        assert policy.gram_bwd_or_mirror() == jax.lax.Precision.HIGHEST

    def test_gram_bwd_falls_back_to_conv_base(self) -> None:
        import jax

        policy = PrecisionPolicy(conv_base=jax.lax.Precision.HIGH)
        assert policy.gram_bwd_or_mirror() == jax.lax.Precision.HIGH

    def test_conv_bwd_override_hit_and_miss(self) -> None:
        import jax

        policy = PrecisionPolicy(
            conv_base=jax.lax.Precision.DEFAULT,
            conv_bwd_overrides=((5, jax.lax.Precision.HIGHEST),),
        )
        assert policy.conv_bwd(5) == jax.lax.Precision.HIGHEST
        assert policy.conv_bwd(7) == jax.lax.Precision.DEFAULT
