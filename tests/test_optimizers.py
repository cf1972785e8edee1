"""Optimizer numerics: L-BFGS and Adam parity with their torch originals."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from style_transfer_visualizer_tpu.engine.optimizers import (
    adam_init,
    adam_step,
    lbfgs_init,
    lbfgs_step,
)

N = 12
rng = np.random.default_rng(42)
_A_half = rng.normal(size=(N, N)).astype(np.float64)
A_np = (_A_half @ _A_half.T / N + np.eye(N)).astype(np.float32)
B_np = rng.normal(size=N).astype(np.float32)
X0_np = rng.normal(size=N).astype(np.float32)

A_j = jnp.asarray(A_np)
B_j = jnp.asarray(B_np)


def _jax_vag(x: jax.Array):
    def loss_of(x):
        quad = 0.5 * x @ A_j @ x - B_j @ x
        # Mildly nonlinear term so curvature information matters.
        bump = jnp.sum(jnp.square(jnp.square(x))) * 0.01
        total = quad + bump
        return total, (total * 0.25, total * 0.75)

    return jax.value_and_grad(loss_of, has_aux=True)(x)


def _torch_loss(x: torch.Tensor) -> torch.Tensor:
    a = torch.from_numpy(A_np)
    b = torch.from_numpy(B_np)
    quad = 0.5 * x @ a @ x - b @ x
    return quad + (x**4).sum() * 0.01


def _run_torch_lbfgs(
    steps: int, lr: float, max_iter: int, max_eval: int,
) -> tuple[np.ndarray, list[float], int]:
    x = torch.from_numpy(X0_np.copy()).requires_grad_(True)
    opt = torch.optim.LBFGS(
        [x], lr=lr, max_iter=max_iter, max_eval=max_eval, history_size=100,
    )
    closure_calls = 0
    losses = []

    def closure():
        nonlocal closure_calls
        closure_calls += 1
        opt.zero_grad()
        loss = _torch_loss(x)
        loss.backward()
        return loss

    for _ in range(steps):
        loss = opt.step(closure)
        losses.append(float(loss.detach()))
    return x.detach().numpy(), losses, closure_calls


def _run_jax_lbfgs(
    steps: int, lr: float, max_iter: int, max_eval: int,
) -> tuple[np.ndarray, list[float], int]:
    x = jnp.asarray(X0_np.copy())
    state = lbfgs_init(N, history_size=100)
    losses = []
    evals = 0
    for _ in range(steps):
        x, state, aux = lbfgs_step(
            _jax_vag, x, state, lr,
            max_iter=max_iter, max_eval=max_eval, history_size=100,
        )
        losses.append(float(aux.loss))
        evals += int(aux.n_evals)
    return np.asarray(x), losses, evals


class TestLbfgsTorchParity:
    def test_single_iter_trajectory(self) -> None:
        """Default reference config: max_iter=1, max_eval=1."""
        tx, _, tcalls = _run_torch_lbfgs(20, 0.4, 1, 1)
        jx, _, jevals = _run_jax_lbfgs(20, 0.4, 1, 1)
        np.testing.assert_allclose(jx, tx, rtol=1e-3, atol=1e-5)
        assert jevals == tcalls == 20

    def test_multi_iter_trajectory(self) -> None:
        tx, _, tcalls = _run_torch_lbfgs(6, 0.3, 4, 6)
        jx, _, jevals = _run_jax_lbfgs(6, 0.3, 4, 6)
        np.testing.assert_allclose(jx, tx, rtol=1e-3, atol=1e-4)
        assert jevals == tcalls

    def test_max_eval_caps_evaluations(self) -> None:
        tx, _, tcalls = _run_torch_lbfgs(5, 0.3, 10, 2)
        jx, _, jevals = _run_jax_lbfgs(5, 0.3, 10, 2)
        assert jevals == tcalls
        np.testing.assert_allclose(jx, tx, rtol=1e-3, atol=1e-4)

    def test_loss_decreases(self) -> None:
        _, losses, _ = _run_jax_lbfgs(25, 0.5, 1, 1)
        assert losses[-1] < losses[0]

    def test_history_ring_wraps(self) -> None:
        """Small history forces ring wraparound; still converges sanely."""
        x = jnp.asarray(X0_np.copy())
        state = lbfgs_init(N, history_size=3)
        for _ in range(12):
            x, state, aux = lbfgs_step(
                _jax_vag, x, state, 0.4,
                max_iter=1, max_eval=1, history_size=3,
            )
        assert int(state.hist_len) == 3
        assert float(aux.loss) < float(_jax_vag(jnp.asarray(X0_np))[0][0])

    def test_converged_start_consumes_one_eval(self) -> None:
        """At a stationary point the step returns immediately (1 eval)."""
        def flat_vag(x):
            def loss_of(x):
                total = jnp.zeros(())
                return total, (total, total)
            return jax.value_and_grad(loss_of, has_aux=True)(x)

        x = jnp.zeros(4)
        state = lbfgs_init(4, history_size=5)
        x2, state, aux = lbfgs_step(
            flat_vag, x, state, 1.0, max_iter=3, max_eval=3, history_size=5,
        )
        assert int(aux.n_evals) == 1
        np.testing.assert_array_equal(np.asarray(x2), np.asarray(x))


class TestAdamTorchParity:
    def test_trajectory_matches_torch(self) -> None:
        xt = torch.from_numpy(X0_np.copy()).requires_grad_(True)
        opt = torch.optim.Adam([xt], lr=0.05)
        for _ in range(30):
            opt.zero_grad()
            loss = _torch_loss(xt)
            loss.backward()
            opt.step()

        xj = jnp.asarray(X0_np.copy())
        state = adam_init(N)
        for _ in range(30):
            xj, state, aux = adam_step(_jax_vag, xj, state, 0.05)

        np.testing.assert_allclose(
            np.asarray(xj), xt.detach().numpy(), rtol=1e-4, atol=1e-6,
        )

    def test_aux_fields(self) -> None:
        x = jnp.asarray(X0_np.copy())
        state = adam_init(N)
        x, state, aux = adam_step(_jax_vag, x, state, 0.01)
        assert int(aux.n_evals) == 1
        np.testing.assert_allclose(
            float(aux.style_score) + float(aux.content_score),
            float(aux.loss),
            rtol=1e-6,
        )
        assert int(state.count) == 1


class TestStepBuilder:
    def test_build_and_run_both_optimizers(self) -> None:
        from style_transfer_visualizer_tpu.engine.step import (
            build_update_step,
        )
        from style_transfer_visualizer_tpu.models import vgg19
        from style_transfer_visualizer_tpu.models.features import (
            compute_targets,
        )

        params = {
            0: {
                "w": jnp.asarray(
                    np.random.default_rng(0).normal(
                        size=(3, 3, 3, 4),
                    ).astype(np.float32) * 0.1,
                ),
                "b": jnp.zeros(4),
            },
        }
        content = jnp.asarray(
            np.random.default_rng(1).uniform(size=(1, 16, 16, 3)),
            dtype=jnp.float32,
        )
        style = jnp.asarray(
            np.random.default_rng(2).uniform(size=(1, 16, 16, 3)),
            dtype=jnp.float32,
        )
        targets = compute_targets(params, style, content, (0,), (0,))

        for name in ("lbfgs", "adam"):
            bundle = build_update_step(
                params, targets, (1, 16, 16, 3),
                optimizer=name, lr=0.05, style_w=1.0, content_w=1.0,
                style_layers=(0,), content_layers=(0,),
                lbfgs_history_size=4,
            )
            # Start away from the optimum so loss has room to fall.
            x = jnp.asarray(
                np.random.default_rng(7).normal(
                    size=(1, 16, 16, 3),
                ).astype(np.float32),
            )
            first_loss = None
            st = bundle.opt_state
            for _ in range(5):
                x, st, aux = bundle.update_fn(x, st)
                if first_loss is None:
                    first_loss = float(aux.loss)
            assert float(aux.loss) <= first_loss

    def test_unknown_optimizer(self) -> None:
        from style_transfer_visualizer_tpu.engine.step import (
            build_update_step,
        )
        from style_transfer_visualizer_tpu.models.features import Targets

        with pytest.raises(ValueError, match="Unknown optimizer"):
            build_update_step(
                {}, Targets({}, {}), (1, 4, 4, 3),
                optimizer="sgd", lr=0.1, style_w=1.0, content_w=1.0,
                style_layers=(), content_layers=(),
            )

    def test_unknown_precision(self) -> None:
        from style_transfer_visualizer_tpu.engine.step import (
            resolve_precision,
        )

        with pytest.raises(ValueError, match="Unknown precision"):
            resolve_precision("quantum")


class TestBf16HistoryRing:
    """Opt-in bfloat16 storage for the L-BFGS curvature ring."""

    def _run(self, history_dtype, steps: int = 20):
        x = jnp.asarray(X0_np.copy())
        state = lbfgs_init(N, history_size=8, history_dtype=history_dtype)
        losses = []
        for _ in range(steps):
            x, state, aux = lbfgs_step(
                _jax_vag, x, state, 0.4,
                max_iter=1, max_eval=1, history_size=8,
            )
            losses.append(float(aux.loss))
        return np.asarray(x), losses, state

    def test_ring_carries_requested_dtype(self) -> None:
        _, _, state = self._run(jnp.bfloat16, steps=3)
        assert state.s_hist.dtype == jnp.bfloat16
        assert state.y_hist.dtype == jnp.bfloat16
        # Scalars of the recursion stay f32 (rho/h_diag are computed
        # from the unrounded pair before storage).
        assert state.rho.dtype == jnp.float32
        assert state.h_diag.dtype == jnp.float32

    @pytest.mark.filterwarnings("error::FutureWarning")
    def test_insert_casts_explicitly(self) -> None:
        """No implicit f32->bf16 scatter cast (a future jax error)."""
        self._run(jnp.bfloat16, steps=3)

    def test_trajectory_tracks_f32_ring(self) -> None:
        """Ring rounding must not derail the optimization."""
        x32, losses32, _ = self._run(jnp.float32)
        x16, losses16, _ = self._run(jnp.bfloat16)
        assert losses16[-1] < losses16[0]
        # The stored pairs carry ~3 significant digits; directions (and
        # hence iterates) drift at that order, not catastrophically.
        np.testing.assert_allclose(
            losses16[-1], losses32[-1], rtol=0.02,
        )
        np.testing.assert_allclose(x16, x32, rtol=0.1, atol=0.05)


class TestCompactDirection:
    """Compact-representation direction vs the two-loop recursion.

    Both express the same inverse-Hessian product in exact arithmetic
    (Byrd-Nocedal-Schnabel 1994); these tests pin the equivalence across
    every ring configuration and through full optimization trajectories.
    """

    @staticmethod
    def _ring_state(num: int, pos: int, m: int = 8, n: int = 64):
        """A hand-built L-BFGS state with curvature-positive pairs."""
        r = np.random.default_rng(num * 17 + pos)
        s = r.normal(size=(m, n)).astype(np.float32) * 0.1
        y = r.normal(size=(m, n)).astype(np.float32) * 0.1
        for i in range(m):
            ys = s[i] @ y[i]
            if ys <= 1e-3:  # enforce y.s > 0 like the insert condition
                y[i] += s[i] * (0.1 + abs(ys)) / (s[i] @ s[i])
        rho = np.array([1.0 / (s[i] @ y[i]) for i in range(m)], np.float32)
        state = lbfgs_init(n, m)
        return state._replace(
            s_hist=jnp.asarray(s),
            y_hist=jnp.asarray(y),
            rho=jnp.asarray(rho),
            hist_len=jnp.asarray(num, jnp.int32),
            hist_pos=jnp.asarray(pos, jnp.int32),
            h_diag=jnp.asarray(0.7, jnp.float32),
        ), r.normal(size=n).astype(np.float32)

    @pytest.mark.parametrize(
        ("num", "pos"),
        [(8, 3), (8, 0), (3, 3), (5, 1), (0, 0), (1, 1)],
        ids=["full-wrapped", "full-aligned", "partial", "partial-wrapped",
             "empty", "single"],
    )
    def test_direction_matches_two_loop(self, num: int, pos: int) -> None:
        from style_transfer_visualizer_tpu.engine.optimizers import (
            _compact_direction,
            _two_loop,
        )

        state, g = self._ring_state(num, pos)
        grad = jnp.asarray(g)
        d_loop = np.asarray(_two_loop(grad, state, 8))
        d_compact = np.asarray(_compact_direction(grad, state, 8))
        np.testing.assert_allclose(
            d_compact, d_loop,
            rtol=1e-4, atol=1e-5 * float(np.abs(d_loop).max() + 1e-30),
        )

    def test_bf16_ring_direction(self) -> None:
        """Compact direction honors a bfloat16 ring.

        Compared against the two-loop over the SAME rounded ring, so the
        tolerance reflects the algorithms' rounding alone, not the
        bf16 storage error both share.
        """
        from style_transfer_visualizer_tpu.engine.optimizers import (
            _compact_direction,
            _two_loop,
        )

        state, g = self._ring_state(5, 2)
        state16 = state._replace(
            s_hist=state.s_hist.astype(jnp.bfloat16),
            y_hist=state.y_hist.astype(jnp.bfloat16),
        )
        grad = jnp.asarray(g)
        d_compact = np.asarray(_compact_direction(grad, state16, 8))
        d_loop = np.asarray(_two_loop(grad, state16, 8))
        assert d_compact.dtype == np.float32
        scale = float(np.abs(d_loop).max())
        np.testing.assert_allclose(
            d_compact, d_loop, rtol=2e-2, atol=2e-2 * scale,
        )

    def _run(self, direction: str, steps: int = 20):
        x = jnp.asarray(X0_np.copy())
        state = lbfgs_init(N, history_size=8)
        losses = []
        for _ in range(steps):
            x, state, aux = lbfgs_step(
                _jax_vag, x, state, 0.4,
                max_iter=1, max_eval=1, history_size=8,
                direction_method=direction,
            )
            losses.append(float(aux.loss))
        return np.asarray(x), losses

    def test_trajectory_matches_two_loop(self) -> None:
        """20 steps with ring wraps: iterates stay together."""
        x_loop, losses_loop = self._run("two-loop")
        x_compact, losses_compact = self._run("compact")
        assert losses_compact[-1] < losses_compact[0]
        np.testing.assert_allclose(x_compact, x_loop, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            losses_compact[-1], losses_loop[-1], rtol=1e-3,
        )

    def test_trajectory_matches_torch(self) -> None:
        """The compact path holds the same torch-parity bar."""
        tx, _, _ = _run_torch_lbfgs(20, 0.4, 1, 1)
        x_compact, _ = self._run("compact")
        np.testing.assert_allclose(x_compact, tx, rtol=1e-3, atol=1e-4)

    def test_step_builder_threads_direction(self) -> None:
        """build_update_step(lbfgs_direction=...) reaches the jitted step
        and the compact trajectory tracks the two-loop one."""
        from style_transfer_visualizer_tpu.engine.step import (
            build_update_step,
        )
        from style_transfer_visualizer_tpu.models.features import (
            compute_targets,
        )

        params = {
            0: {
                "w": jnp.asarray(
                    np.random.default_rng(0).normal(
                        size=(3, 3, 3, 4),
                    ).astype(np.float32) * 0.1,
                ),
                "b": jnp.zeros(4),
            },
        }
        content = jnp.asarray(
            np.random.default_rng(1).uniform(size=(1, 16, 16, 3)),
            dtype=jnp.float32,
        )
        style = jnp.asarray(
            np.random.default_rng(2).uniform(size=(1, 16, 16, 3)),
            dtype=jnp.float32,
        )
        targets = compute_targets(params, style, content, (0,), (0,))
        x0 = jnp.asarray(
            np.random.default_rng(7).normal(
                size=(1, 16, 16, 3),
            ).astype(np.float32),
        )

        finals = {}
        for direction in ("two-loop", "compact"):
            bundle = build_update_step(
                params, targets, (1, 16, 16, 3),
                optimizer="lbfgs", lr=0.05, style_w=1.0, content_w=1.0,
                style_layers=(0,), content_layers=(0,),
                lbfgs_history_size=4, lbfgs_direction=direction,
            )
            x, st = x0, bundle.opt_state
            for _ in range(6):
                x, st, aux = bundle.update_fn(x, st)
            finals[direction] = (np.asarray(x), float(aux.loss))
        np.testing.assert_allclose(
            finals["compact"][0], finals["two-loop"][0],
            rtol=1e-3, atol=1e-4,
        )
        np.testing.assert_allclose(
            finals["compact"][1], finals["two-loop"][1], rtol=1e-3,
        )

    def test_unknown_direction_raises(self) -> None:
        x = jnp.asarray(X0_np.copy())
        state = lbfgs_init(N, history_size=4)
        with pytest.raises(ValueError, match="Unknown L-BFGS direction"):
            lbfgs_step(
                _jax_vag, x, state, 0.4,
                max_iter=1, max_eval=1, history_size=4,
                direction_method="cholesky",
            )


class TestStepBuilderDonation:
    """Explicit donate overrides skip the state-size heuristic."""

    def _setup(self):
        from style_transfer_visualizer_tpu.models.features import (
            compute_targets,
        )

        params = {
            0: {
                "w": jnp.asarray(
                    np.random.default_rng(0).normal(
                        size=(3, 3, 3, 4),
                    ).astype(np.float32) * 0.1,
                ),
                "b": jnp.zeros(4),
            },
        }
        content = jnp.asarray(
            np.random.default_rng(1).uniform(size=(1, 16, 16, 3)),
            dtype=jnp.float32,
        )
        style = jnp.asarray(
            np.random.default_rng(2).uniform(size=(1, 16, 16, 3)),
            dtype=jnp.float32,
        )
        targets = compute_targets(params, style, content, (0,), (0,))
        return params, targets, content

    @pytest.mark.parametrize("donate", [True, False])
    def test_explicit_donation_runs(self, donate: bool) -> None:
        from style_transfer_visualizer_tpu.engine.step import (
            build_update_step,
        )

        params, targets, content = self._setup()
        bundle = build_update_step(
            params, targets, (1, 16, 16, 3),
            optimizer="adam", lr=0.05, style_w=1.0, content_w=1.0,
            style_layers=(0,), content_layers=(0,),
            donate=donate,
        )
        x, st, aux = bundle.update_fn(jnp.asarray(content), bundle.opt_state)
        assert np.isfinite(float(aux.loss))
