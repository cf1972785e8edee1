"""Jittable optimizers for pixel-space optimization: L-BFGS and Adam.

The L-BFGS here reproduces ``torch.optim.LBFGS`` semantics (no line
search) so loss curves match the reference: one ``step()`` runs up to
``max_iter`` inner iterations bounded by ``max_eval`` function
evaluations, the first-ever iteration uses steepest descent with step
``min(1, 1/|g|_1) * lr``, curvature pairs are kept in a ring of
``history_size`` entries with the standard two-loop recursion, and the
direction/step/history persist across ``step()`` calls (reference uses
torch.optim.LBFGS at core_model.py:344-349 with lr/max_iter/max_eval
from config). ``direction_method="compact"`` swaps the two-loop for
the Byrd-Nocedal-Schnabel compact representation — the identical
direction in exact arithmetic, computed as batched MXU contractions
over the ring instead of 2m sequential vector dots.

Everything is a ``lax.while_loop`` / ``fori_loop`` over fixed-shape
arrays, so a whole optimizer step — including any inner re-evaluations —
compiles to a single XLA computation with donated buffers. No Python-level
closure churn, no host syncs.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

TOLERANCE_GRAD = 1e-7
TOLERANCE_CHANGE = 1e-9
_CURVATURE_EPS = 1e-10

# value_and_grad over flattened pixels:
# x (N,) -> ((loss, (style_score, content_score)), grad (N,))
ValueAndGrad = Callable[
    [jax.Array], tuple[tuple[jax.Array, tuple[jax.Array, jax.Array]],
                       jax.Array],
]


class LbfgsState(NamedTuple):
    """Persistent L-BFGS state (survives across outer steps)."""

    s_hist: jax.Array        # (m, N) parameter deltas
    y_hist: jax.Array        # (m, N) gradient deltas
    rho: jax.Array           # (m,) 1/(y.s)
    hist_len: jax.Array      # int32, number of valid pairs
    hist_pos: jax.Array      # int32, ring insertion slot
    h_diag: jax.Array        # f32, initial Hessian scaling
    prev_grad: jax.Array     # (N,)
    direction: jax.Array     # (N,) last search direction
    step_size: jax.Array     # f32, last step length t
    prev_loss: jax.Array     # f32
    n_total_iters: jax.Array  # int32, across the whole run
    func_evals: jax.Array    # int32, across the whole run


class StepAux(NamedTuple):
    """Device-side metrics produced by one optimizer step."""

    loss: jax.Array           # total loss at the last evaluation
    style_score: jax.Array
    content_score: jax.Array
    n_evals: jax.Array        # evaluations consumed by this step (int32)


def lbfgs_init(
    n: int,
    history_size: int,
    history_dtype: jnp.dtype = jnp.float32,
) -> LbfgsState:
    """Zero-initialized state for an ``n``-parameter problem.

    ``history_dtype`` sets the storage dtype of the curvature ring
    (``s_hist``/``y_hist``) only. The two-loop recursion reads the ring
    at 4*m rows per step — at the torch-default m=100 that HBM traffic
    costs ~10% of a 512px step (BASELINE.md) — and ``bfloat16`` halves
    it. All dot products, ``rho``, and ``h_diag`` stay f32 (``rho`` and
    ``h_diag`` are computed from the unrounded pair before storage), so
    the only deviation from torch semantics is the ~3 decimal digits of
    mantissa kept per stored history element. Opt-in: the default ring
    is f32, bit-matching torch.
    """
    m = history_size
    f32, i32 = jnp.float32, jnp.int32
    return LbfgsState(
        s_hist=jnp.zeros((m, n), history_dtype),
        y_hist=jnp.zeros((m, n), history_dtype),
        rho=jnp.zeros((m,), f32),
        hist_len=jnp.zeros((), i32),
        hist_pos=jnp.zeros((), i32),
        h_diag=jnp.ones((), f32),
        prev_grad=jnp.zeros((n,), f32),
        direction=jnp.zeros((n,), f32),
        step_size=jnp.zeros((), f32),
        prev_loss=jnp.zeros((), f32),
        n_total_iters=jnp.zeros((), i32),
        func_evals=jnp.zeros((), i32),
    )


def _f32_dot(
    a: jax.Array,
    b: jax.Array,
    axis_name: str | None = None,
) -> jax.Array:
    """Inner product pinned to full f32 (torch L-BFGS semantics).

    Measured on TPU v5e: XLA already lowers rank-1 dots to an f32
    reduction (identical result at DEFAULT and HIGHEST over 786k
    elements), so this pin changes nothing today — it exists to make
    the two-loop recursion's f32 guarantee explicit instead of
    depending on how a backend happens to lower vector dots. O(N),
    negligible next to the VGG convs.

    ``axis_name`` makes the dot global over a mesh axis: each shard
    contributes its local partial and the psum rides ICI — this one
    hook is all the two-loop recursion needs to run sharded (the rest
    of L-BFGS is elementwise on the local block).
    """
    d = jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)
    if axis_name is not None:
        d = jax.lax.psum(d, axis_name)
    return d


def _sum_abs(
    v: jax.Array, axis_name: str | None = None,
) -> jax.Array:
    """Global L1 norm (first-step scaling uses it, torch semantics)."""
    s = jnp.sum(jnp.abs(v))
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    return s


def _max_abs(
    v: jax.Array, axis_name: str | None = None,
) -> jax.Array:
    """Global infinity norm for the convergence/step-size breaks."""
    m = jnp.max(jnp.abs(v))
    if axis_name is not None:
        m = jax.lax.pmax(m, axis_name)
    return m


def _two_loop(
    grad: jax.Array,
    state: LbfgsState,
    history_size: int,
    axis_name: str | None = None,
) -> jax.Array:
    """Two-loop recursion: approximate -H^{-1} g from curvature pairs."""
    m = history_size
    num = state.hist_len

    def slot(i: jax.Array) -> jax.Array:
        # i-th oldest valid pair lives at ring slot (pos - len + i) mod m.
        return (state.hist_pos - num + i) % m

    q = -grad
    # zeros_like(rho) rather than zeros((m,)): inside shard_map the
    # alphas written below inherit rho's varying mesh axes, and the
    # fori_loop carry must start with the same vma type.
    alphas = jnp.zeros_like(state.rho)

    def backward(i: jax.Array, carry):
        q, alphas = carry
        j = slot(num - 1 - i)  # newest to oldest
        alpha = state.rho[j] * _f32_dot(state.s_hist[j], q, axis_name)
        q = q - alpha * state.y_hist[j]
        return q, alphas.at[j].set(alpha)

    q, alphas = jax.lax.fori_loop(0, num, backward, (q, alphas))
    r = q * state.h_diag

    def forward(i: jax.Array, r):
        j = slot(i)  # oldest to newest
        beta = state.rho[j] * _f32_dot(state.y_hist[j], r, axis_name)
        return r + state.s_hist[j] * (alphas[j] - beta)

    return jax.lax.fori_loop(0, num, forward, r)


def _compact_direction(
    grad: jax.Array,
    state: LbfgsState,
    history_size: int,
    axis_name: str | None = None,
) -> jax.Array:
    """Compact-representation direction (Byrd-Nocedal-Schnabel 1994).

    Computes the same -H^{-1} g as :func:`_two_loop` — both express the
    L-BFGS inverse Hessian built from the identical curvature pairs and
    ``h_diag`` scaling — but as three *linear passes* over the history
    ring (two batched ring-ring/ring-gradient contractions plus one
    final combination, all MXU matmuls) and two m-by-m triangular
    solves, instead of 2m sequential vector dots with a read-modify-
    write of the working vector between each. At the torch-default
    m=100 on a 512px image the two-loop's sequential structure moves
    ~3 GB of HBM per step (~10% of the step, BASELINE.md); the compact
    form cuts that to ~2.2 GB f32 / ~1.1 GB with the bfloat16 ring.
    Opt-in (``--lbfgs-direction compact``): in exact arithmetic the
    direction is identical, but rounding differs from torch's two-loop,
    so the default stays ``two-loop``.

    With ``axis_name`` the ring and gradient are row shards of the
    global vectors: the contractions psum their m-vector/m-by-m
    partials over the mesh and the small solves run replicated.
    """
    m = history_size
    num = state.hist_len
    s_hist, y_hist = state.s_hist, state.y_hist
    g = grad.astype(s_hist.dtype)
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    contract_rows = (((1,), (1,)), ((), ()))
    gemv = (((1,), (0,)), ((), ()))

    # Ring-ring and ring-gradient products in slot order, f32-accumulated
    # on the MXU. sy[a, b] = s_a . y_b.
    sy = jax.lax.dot_general(
        s_hist, y_hist, contract_rows,
        precision=hi, preferred_element_type=f32,
    )
    yy = jax.lax.dot_general(
        y_hist, y_hist, contract_rows,
        precision=hi, preferred_element_type=f32,
    )
    p = jax.lax.dot_general(
        s_hist, g, gemv, precision=hi, preferred_element_type=f32,
    )
    q = jax.lax.dot_general(
        y_hist, g, gemv, precision=hi, preferred_element_type=f32,
    )
    if axis_name is not None:
        sy, yy, p, q = (
            jax.lax.psum(t, axis_name) for t in (sy, yy, p, q)
        )

    # Reorder the m-sized axes to time order (oldest pair first); slots
    # past hist_len are masked out. Only O(m^2) elements move.
    idx = (state.hist_pos - num + jnp.arange(m)) % m
    valid = jnp.arange(m) < num
    vv = jnp.outer(valid, valid)
    sy_t = sy[idx][:, idx]
    yy_t = jnp.where(vv, yy[idx][:, idx], 0.0)
    p_t = jnp.where(valid, p[idx], 0.0)
    q_t = jnp.where(valid, q[idx], 0.0)
    # R_ij = s_i . y_j for i <= j (time order); invalid slots become
    # identity rows so the triangular solves pass through zeros.
    r_mat = jnp.where(vv, jnp.triu(sy_t), 0.0)
    r_mat = r_mat + jnp.diag(jnp.where(valid, 0.0, 1.0))
    d_diag = jnp.where(valid, jnp.diagonal(sy_t), 0.0)
    gamma = state.h_diag

    # H g = gamma g + S w - gamma Y u with u = R^{-1} p and
    # w = R^{-T} ((D + gamma Y^T Y) u - gamma q).
    u = jax.scipy.linalg.solve_triangular(r_mat, p_t, lower=False)
    w = jax.scipy.linalg.solve_triangular(
        r_mat.T, d_diag * u + gamma * (yy_t @ u) - gamma * q_t,
        lower=True,
    )

    # Back to slot order for the final ring combination (one pass).
    coeff_s = jnp.zeros((m,), f32).at[idx].set(w).astype(s_hist.dtype)
    coeff_y = jnp.zeros((m,), f32).at[idx].set(u).astype(s_hist.dtype)
    vecmat = (((0,), (0,)), ((), ()))
    s_part = jax.lax.dot_general(
        coeff_s, s_hist, vecmat, precision=hi, preferred_element_type=f32,
    )
    y_part = jax.lax.dot_general(
        coeff_y, y_hist, vecmat, precision=hi, preferred_element_type=f32,
    )
    return -(gamma * grad + s_part - gamma * y_part)


_DIRECTION_METHODS = {
    "two-loop": _two_loop,
    "compact": _compact_direction,
}


def _vary_like(x: jax.Array, like: jax.Array) -> jax.Array:
    """Give ``x`` the varying mesh axes of ``like``.

    Inside ``shard_map`` the loop carries must enter ``while_loop``
    with the same varying-manual-axes type they leave the body with;
    fresh counters start unvarying while their updates depend on the
    (mesh-varying) loss. No-op outside shard_map (empty vma sets).
    """
    missing = tuple(jax.typeof(like).vma - jax.typeof(x).vma)
    if missing:
        x = jax.lax.pcast(x, missing, to="varying")
    return x


class _Carry(NamedTuple):
    x: jax.Array
    loss: jax.Array
    style: jax.Array
    content: jax.Array
    grad: jax.Array
    state: LbfgsState
    n_iter: jax.Array
    evals: jax.Array
    done: jax.Array


def lbfgs_step(
    vag: ValueAndGrad,
    x: jax.Array,
    state: LbfgsState,
    lr: float | jax.Array,
    *,
    max_iter: int,
    max_eval: int,
    history_size: int,
    axis_name: str | None = None,
    direction_method: str = "two-loop",
) -> tuple[jax.Array, LbfgsState, StepAux]:
    """One outer L-BFGS step (torch semantics, fixed-step strategy).

    ``x`` is the flattened parameter vector. Returns the updated vector,
    persistent state, and device-side metrics from the *last* function
    evaluation of the step (which is what the reference's re-entrant
    closure records, optimization.py:274-284).

    With ``axis_name``, ``x`` (and the history in ``state``) is one
    mesh shard of the global vector and every reduction — two-loop
    dots, curvature products, and the L1/Linf norms in the first-step
    scaling and break conditions — goes global via psum/pmax over that
    axis. Elementwise math stays shard-local, so the sharded trajectory
    is bit-comparable to the whole-vector one (tests prove it on the
    CPU mesh).
    """
    try:
        direction_fn = _DIRECTION_METHODS[direction_method]
    except KeyError:
        msg = f"Unknown L-BFGS direction method: {direction_method!r}"
        raise ValueError(msg) from None
    (loss0, (style0, content0)), grad0 = vag(x)
    opt_cond0 = _max_abs(grad0, axis_name) <= TOLERANCE_GRAD

    init = _Carry(
        x=x, loss=loss0, style=style0, content=content0, grad=grad0,
        state=state,
        n_iter=jnp.zeros((), jnp.int32),
        evals=_vary_like(jnp.ones((), jnp.int32), loss0),
        done=opt_cond0,
    )

    def cond(c: _Carry) -> jax.Array:
        return jnp.logical_and(~c.done, c.n_iter < max_iter)

    def body(c: _Carry) -> _Carry:
        st = c.state
        n_iter = c.n_iter + 1
        n_total = st.n_total_iters + 1
        first = n_total == 1

        # --- curvature-pair insertion (skipped on the first-ever iter
        # or when the curvature condition y.s > eps fails) ---
        y = c.grad - st.prev_grad
        s = st.direction * st.step_size
        # Both curvature products are computed OUTSIDE the cond branch:
        # when sharded they are collectives, and keeping them out of the
        # conditional keeps every shard's collective schedule identical.
        ys = _f32_dot(y, s, axis_name)
        yy = _f32_dot(y, y, axis_name)
        do_insert = jnp.logical_and(~first, ys > _CURVATURE_EPS)

        def insert(st: LbfgsState) -> LbfgsState:
            pos = st.hist_pos
            # Explicit cast: the ring may store bf16 (history_dtype) and
            # implicit f32->bf16 scatter casts are a future jax error.
            return st._replace(
                s_hist=st.s_hist.at[pos].set(s.astype(st.s_hist.dtype)),
                y_hist=st.y_hist.at[pos].set(y.astype(st.y_hist.dtype)),
                rho=st.rho.at[pos].set(1.0 / ys),
                hist_pos=(pos + 1) % history_size,
                hist_len=jnp.minimum(st.hist_len + 1, history_size),
                h_diag=ys / yy,
            )

        st = jax.lax.cond(do_insert, insert, lambda s: s, st)

        direction = jnp.where(
            first,
            -c.grad,
            direction_fn(c.grad, st, history_size, axis_name),
        )
        t = jnp.where(
            first,
            jnp.minimum(1.0, 1.0 / _sum_abs(c.grad, axis_name)) * lr,
            jnp.asarray(lr, jnp.float32),
        )

        gtd = _f32_dot(c.grad, direction, axis_name)
        break_gtd = gtd > -TOLERANCE_CHANGE

        x_new = jnp.where(break_gtd, c.x, c.x + t * direction)

        # Re-evaluate unless this inner iteration is the last or we broke.
        reeval = jnp.logical_and(~break_gtd, n_iter < max_iter)

        def do_eval(x_in):
            (loss, (sty, con)), g = vag(x_in)
            return loss, sty, con, g

        loss, style, content, grad = jax.lax.cond(
            reeval,
            do_eval,
            lambda _: (c.loss, c.style, c.content, c.grad),
            x_new,
        )
        evals = c.evals + reeval.astype(jnp.int32)

        opt_cond = _max_abs(grad, axis_name) <= TOLERANCE_GRAD
        small_step = _max_abs(t * direction, axis_name) <= TOLERANCE_CHANGE
        flat_loss = jnp.abs(loss - c.loss) < TOLERANCE_CHANGE
        done = (
            break_gtd
            | (evals >= max_eval)
            | opt_cond
            | small_step
            | flat_loss
        )

        st = st._replace(
            prev_grad=c.grad,
            direction=direction,
            step_size=t,
            prev_loss=c.loss,
            n_total_iters=n_total,
            func_evals=st.func_evals + reeval.astype(jnp.int32),
        )
        return _Carry(
            x=x_new, loss=loss, style=style, content=content, grad=grad,
            state=st, n_iter=n_iter, evals=evals, done=done,
        )

    final = jax.lax.while_loop(cond, body, init)
    st = final.state._replace(func_evals=final.state.func_evals + 1)
    aux = StepAux(
        loss=final.loss,
        style_score=final.style,
        content_score=final.content,
        n_evals=final.evals,
    )
    return final.x, st, aux


class AdamState(NamedTuple):
    """Adam moment estimates (torch-default hyperparameters)."""

    mu: jax.Array
    nu: jax.Array
    count: jax.Array


def adam_init(shape: int | tuple[int, ...]) -> AdamState:
    """Zero moments for a parameter array of the given shape.

    Adam is purely elementwise, so moments can carry the parameter's
    natural shape — the jitted step keeps the image in its NHWC device
    layout instead of paying a relayout to a flat vector every step
    (a profiled ~0.5 ms/step at 512px).
    """
    if isinstance(shape, int):
        shape = (shape,)
    return AdamState(
        mu=jnp.zeros(shape, jnp.float32),
        nu=jnp.zeros(shape, jnp.float32),
        count=jnp.zeros((), jnp.int32),
    )


def _adam_update_math(
    grad: jax.Array,
    state: AdamState,
    lr: jax.Array,
) -> tuple[jax.Array, AdamState]:
    b1, b2, eps = 0.9, 0.999, 1e-8
    count = state.count + 1
    mu = b1 * state.mu + (1 - b1) * grad
    nu = b2 * state.nu + (1 - b2) * jnp.square(grad)
    mu_hat = mu / (1 - b1 ** count.astype(jnp.float32))
    nu_hat = nu / (1 - b2 ** count.astype(jnp.float32))
    delta = -lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
    return delta, AdamState(mu=mu, nu=nu, count=count)


def adam_step(
    vag: ValueAndGrad,
    x: jax.Array,
    state: AdamState,
    lr: float | jax.Array,
) -> tuple[jax.Array, AdamState, StepAux]:
    """One Adam step (matches torch.optim.Adam defaults: eps outside sqrt)."""
    (loss, (style, content)), grad = vag(x)
    delta, state = _adam_update_math(
        grad, state, jnp.asarray(lr, jnp.float32),
    )
    aux = StepAux(
        loss=loss,
        style_score=style,
        content_score=content,
        n_evals=jnp.ones((), jnp.int32),
    )
    return x + delta, state, aux
