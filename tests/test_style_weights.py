"""Per-layer style weights (--style-layer-weights) across the engines.

The reference sums per-layer style MSEs unweighted
(core_model.py:234-264); the TPU framework adds Gatys-style per-layer
weights. These tests pin the contract: ones-weights are bit-identical
to the unweighted loss, weights scale exactly one layer's term, and
every loss path (whole-image, banded, config/CLI plumbing) agrees.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from pydantic import ValidationError

from style_transfer_visualizer_tpu.config import (
    OptimizationConfig,
    build_config_from_cli,
    parse_float_list,
)
from style_transfer_visualizer_tpu.models import vgg19
from style_transfer_visualizer_tpu.models.features import (
    _resolve_style_weights,
    compute_targets,
    total_loss,
)
from style_transfer_visualizer_tpu.ops.tiled import tiled_total_loss

STYLE_LAYERS = (0, 2)
CONTENT_LAYERS = (5,)


@pytest.fixture(scope="module")
def tiny_problem():
    """Tiny grammar-consistent params plus targets and a probe image."""
    key = jax.random.key(7)
    params = {
        idx: {
            "w": jax.random.normal(
                jax.random.fold_in(key, 10 + idx),
                (3, 3, cin, cout), jnp.float32,
            ) * 0.2,
            "b": jnp.zeros((cout,), jnp.float32),
        }
        for idx, (cin, cout) in {0: (3, 8), 2: (8, 8), 5: (8, 16)}.items()
    }
    shape = (1, 32, 32, 3)
    content = jax.random.uniform(jax.random.fold_in(key, 1), shape)
    style = jax.random.uniform(jax.random.fold_in(key, 2), shape)
    targets = compute_targets(
        params, style, content, STYLE_LAYERS, CONTENT_LAYERS, None,
    )
    x = jax.random.uniform(jax.random.fold_in(key, 3), shape)
    return params, targets, x


class TestLossSemantics:
    def test_ones_weights_bit_identical(self, tiny_problem) -> None:
        params, targets, x = tiny_problem
        base = total_loss(
            params, x, targets, 1e4, 1.0, STYLE_LAYERS, CONTENT_LAYERS,
        )
        ones = total_loss(
            params, x, targets, 1e4, 1.0, STYLE_LAYERS, CONTENT_LAYERS,
            style_weights=(1.0, 1.0),
        )
        assert float(base[0]) == float(ones[0])
        assert float(base[1][0]) == float(ones[1][0])

    def test_weight_scales_single_layer(self, tiny_problem) -> None:
        params, targets, x = tiny_problem
        _, (s_only0, _) = total_loss(
            params, x, targets, 1e4, 1.0, (0,), CONTENT_LAYERS,
        )
        _, (s_w, c_w) = total_loss(
            params, x, targets, 1e4, 1.0, STYLE_LAYERS, CONTENT_LAYERS,
            style_weights=(3.0, 0.0),
        )
        np.testing.assert_allclose(
            float(s_w), 3.0 * float(s_only0), rtol=1e-6,
        )
        _, (_, c_base) = total_loss(
            params, x, targets, 1e4, 1.0, STYLE_LAYERS, CONTENT_LAYERS,
        )
        assert float(c_w) == float(c_base)

    def test_gradient_drops_zero_weight_layer(self, tiny_problem) -> None:
        """A zero weight removes that layer's pull on the pixels."""
        params, targets, x = tiny_problem

        def style_grad(weights):
            def loss_of(img):
                total, _ = total_loss(
                    params, img, targets, 1.0, 0.0,
                    STYLE_LAYERS, CONTENT_LAYERS,
                    style_weights=weights,
                )
                return total

            return jax.grad(loss_of)(x)

        g_drop = style_grad((1.0, 0.0))
        g_only = style_grad(None)
        # Gradients must differ (layer 2's term vanished)...
        assert not np.allclose(np.asarray(g_drop), np.asarray(g_only))
        # ...and match the single-layer problem exactly.
        def loss_single(img):
            total, _ = total_loss(
                params, img, targets, 1.0, 0.0, (0,), CONTENT_LAYERS,
            )
            return total

        np.testing.assert_allclose(
            np.asarray(g_drop), np.asarray(jax.grad(loss_single)(x)),
            rtol=1e-6, atol=1e-9,
        )

    def test_tiled_matches_whole_image(self, tiny_problem) -> None:
        params, targets, x = tiny_problem
        weights = (0.5, 2.0)
        whole = total_loss(
            params, x, targets, 1e4, 1.0, STYLE_LAYERS, CONTENT_LAYERS,
            style_weights=weights,
        )
        banded = tiled_total_loss(
            params, x, targets, 1e4, 1.0, STYLE_LAYERS, CONTENT_LAYERS,
            16, None, "xla", style_weights=weights,
        )
        np.testing.assert_allclose(
            float(whole[0]), float(banded[0]), rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(whole[1][0]), float(banded[1][0]), rtol=1e-6,
        )

    def test_resolver_rejects_length_mismatch(self) -> None:
        with pytest.raises(ValueError, match="entries for"):
            _resolve_style_weights((1.0,), STYLE_LAYERS)

    def test_resolver_defaults_to_ones(self) -> None:
        assert _resolve_style_weights(None, STYLE_LAYERS) == (1.0, 1.0)


class TestConfigPlumbing:
    def test_valid_weights_accepted(self) -> None:
        cfg = OptimizationConfig(
            style_layers=[0, 5, 10],
            style_layer_weights=[1.0, 0.5, 0.0],
        )
        assert cfg.style_weights_tuple() == (1.0, 0.5, 0.0)

    def test_unset_weights_are_none(self) -> None:
        assert OptimizationConfig().style_weights_tuple() is None

    def test_length_mismatch_rejected(self) -> None:
        with pytest.raises(ValidationError, match="entries for"):
            OptimizationConfig(
                style_layers=[0, 5], style_layer_weights=[1.0],
            )

    def test_negative_weight_rejected(self) -> None:
        with pytest.raises(ValidationError, match=">= 0"):
            OptimizationConfig(
                style_layers=[0, 5], style_layer_weights=[1.0, -0.5],
            )

    def test_all_zero_rejected(self) -> None:
        with pytest.raises(ValidationError, match="positive"):
            OptimizationConfig(
                style_layers=[0, 5], style_layer_weights=[0.0, 0.0],
            )

    def test_parse_float_list(self) -> None:
        assert parse_float_list("1,0.5,0.25") == [1.0, 0.5, 0.25]
        assert parse_float_list([1, 2]) == [1.0, 2.0]

    def test_cli_merge(self) -> None:
        cfg = build_config_from_cli({
            "style_layers": "0,5",
            "style_layer_weights": "2,0.5",
        })
        assert cfg.optimization.style_layer_weights == [2.0, 0.5]
        assert cfg.optimization.style_weights_tuple() == (2.0, 0.5)

    def test_cli_flag_parses(self) -> None:
        from style_transfer_visualizer_tpu.cli import build_arg_parser

        args = build_arg_parser().parse_args([
            "--content", "c.png", "--style", "s.png",
            "--style-layer-weights", "1,1,0.5,0.25,0.25",
        ])
        assert args.style_layer_weights == "1,1,0.5,0.25,0.25"
