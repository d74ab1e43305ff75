"""Jit-compatible L-BFGS with torch.optim.LBFGS step semantics.

The reference's default optimiser is torch's closure-based C++ L-BFGS with no
line search (optim.py:180-190, config.py:47).  That algorithm, per iteration:

1. first iteration: d = -g,  t = min(1, 1 / ||g||_1) * lr
2. otherwise: y = g - g_prev, s = t_prev * d_prev; if y.s > 1e-10 push
   (s, y, 1/y.s) into a bounded history and set H0 = y.s / y.y
3. two-loop recursion over the history gives d; t = lr
4. p <- p + t * d

Here it is a fixed-shape ``optax.GradientTransformation``: the history is a
circular buffer of static size so the whole optimiser lives inside ``jit`` /
``lax.scan`` (the riskiest numerical-parity item per SURVEY.md §7; parity vs
torch is covered by tests/test_lbfgs.py).  Tolerance-based early stopping
(tolerance_grad/tolerance_change) is intentionally not replicated: the
reference runs with both set to -1 (never triggers) by default.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax


class LBFGSState(NamedTuple):
    s_hist: jax.Array  # (m, N)
    y_hist: jax.Array  # (m, N)
    rho: jax.Array  # (m,)
    w_sy: jax.Array  # (m, m) S^T Y gram, absolute slots (compact method)
    w_yy: jax.Array  # (m, m) Y^T Y gram, absolute slots (compact method)
    count: jax.Array  # () int32 — number of valid history entries
    ptr: jax.Array  # () int32 — next write slot (circular)
    prev_grad: jax.Array  # (N,)
    prev_d: jax.Array  # (N,)
    prev_t: jax.Array  # () f32
    h_diag: jax.Array  # () f32
    step: jax.Array  # () int32


def lbfgs(
    learning_rate: float = 1.0, history_size: int = 100, method: str = "compact"
) -> optax.GradientTransformation:
    """torch-semantics L-BFGS.

    method="two_loop" is the literal sequential recursion (matches torch's
    accumulation order most closely).  method="compact" (default) is the
    algebraically identical Byrd–Nocedal–Schnabel compact representation:
    H g = γ g + S w − γ Y u with u = R⁻¹ Sᵀg and
    w = R⁻ᵀ((D + γYᵀY)u − γYᵀg), where R = triu(SᵀY), D = diag(SᵀY).
    The 2m sequential vector ops become five (m, N) MXU matvecs plus m×m
    triangular solves — ~7x faster at N = 3M, m = 100 (PERF.md); the m×m
    grams are maintained incrementally on history insert.
    """
    m = int(history_size)
    lr = float(learning_rate)
    if method not in ("compact", "two_loop"):
        raise ValueError(method)

    def init(params):
        flat, _ = jax.flatten_util.ravel_pytree(params)
        n = flat.shape[0]
        z = jnp.zeros
        return LBFGSState(
            s_hist=z((m, n), flat.dtype),
            y_hist=z((m, n), flat.dtype),
            rho=z((m,), flat.dtype),
            w_sy=z((m, m), flat.dtype),
            w_yy=z((m, m), flat.dtype),
            count=jnp.zeros((), jnp.int32),
            ptr=jnp.zeros((), jnp.int32),
            prev_grad=z((n,), flat.dtype),
            prev_d=z((n,), flat.dtype),
            prev_t=jnp.zeros((), flat.dtype),
            h_diag=jnp.ones((), flat.dtype),
            step=jnp.zeros((), jnp.int32),
        )

    HI = jax.lax.Precision.HIGHEST

    def update(grads, state: LBFGSState, params=None):
        g, unravel = jax.flatten_util.ravel_pytree(grads)

        def with_history(state: LBFGSState) -> LBFGSState:
            y = g - state.prev_grad
            s = state.prev_d * state.prev_t
            ys = jnp.dot(y, s, precision=HI)

            def insert(st: LBFGSState) -> LBFGSState:
                s_hist = st.s_hist.at[st.ptr].set(s)
                y_hist = st.y_hist.at[st.ptr].set(y)
                new = st._replace(
                    s_hist=s_hist,
                    y_hist=y_hist,
                    rho=st.rho.at[st.ptr].set(1.0 / ys),
                    ptr=(st.ptr + 1) % m,
                    count=jnp.minimum(st.count + 1, m),
                    h_diag=ys / jnp.dot(y, y, precision=HI),
                )
                if method == "compact":
                    # maintain the m x m grams: row/col for the new pair
                    sy_row = jnp.einsum("n,mn->m", s, y_hist, precision=HI)  # s · all y
                    sy_col = jnp.einsum("n,mn->m", y, s_hist, precision=HI)  # all s · y
                    yy_col = jnp.einsum("n,mn->m", y, y_hist, precision=HI)
                    w_sy = st.w_sy.at[st.ptr, :].set(sy_row).at[:, st.ptr].set(sy_col)
                    w_sy = w_sy.at[st.ptr, st.ptr].set(ys)
                    w_yy = st.w_yy.at[st.ptr, :].set(yy_col).at[:, st.ptr].set(yy_col)
                    new = new._replace(w_sy=w_sy, w_yy=w_yy)
                return new

            return jax.lax.cond(ys > 1e-10, insert, lambda st: st, state)

        state = jax.lax.cond(state.step > 0, with_history, lambda st: st, state)

        if method == "compact":
            d = -_compact_hg(state, g, m)
        else:
            d = -_two_loop_hg(state, g, m)

        t = jnp.where(
            state.step == 0,
            jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(g))) * lr,
            jnp.asarray(lr, g.dtype),
        )

        state = state._replace(prev_grad=g, prev_d=d, prev_t=t, step=state.step + 1)
        return unravel(t * d), state

    return optax.GradientTransformation(init, update)


def _two_loop_hg(state: LBFGSState, g: jax.Array, m: int) -> jax.Array:
    """Classic sequential two-loop recursion; returns H g (so d = -Hg... note
    we fold the sign by starting from -g and returning its negation)."""

    def loop1(j, carry):
        q, al = carry
        slot = (state.ptr - 1 - j) % m  # newest -> oldest
        valid = j < state.count
        s_j = state.s_hist[slot]
        y_j = state.y_hist[slot]
        a_j = state.rho[slot] * jnp.dot(s_j, q)
        q = jnp.where(valid, q - a_j * y_j, q)
        al = al.at[slot].set(jnp.where(valid, a_j, 0.0))
        return q, al

    q, al = jax.lax.fori_loop(0, m, loop1, (-g, jnp.zeros((m,), g.dtype)), unroll=min(m, 8))
    d = q * state.h_diag

    def loop2(j, d):
        slot = (state.ptr - state.count + j) % m  # oldest -> newest
        valid = j < state.count
        s_j = state.s_hist[slot]
        y_j = state.y_hist[slot]
        be = state.rho[slot] * jnp.dot(y_j, d)
        return jnp.where(valid, d + s_j * (al[slot] - be), d)

    d = jax.lax.fori_loop(0, m, loop2, d, unroll=min(m, 8))
    return -d  # loops computed -H g


def _compact_hg(state: LBFGSState, g: jax.Array, m: int) -> jax.Array:
    """H g via the compact representation (algebraically == two-loop)."""
    HI = jax.lax.Precision.HIGHEST
    gamma = state.h_diag
    # chronological ordering of circular slots, oldest first; the first
    # m - count entries are stale and masked out
    j = jnp.arange(m)
    ord_ = (state.ptr - m + j) % m
    valid = j >= (m - state.count)

    sy = state.w_sy[ord_][:, ord_]
    yy = state.w_yy[ord_][:, ord_]
    vmask = valid[:, None] & valid[None, :]
    sy = jnp.where(vmask, sy, 0.0)
    yy = jnp.where(vmask, yy, 0.0)

    r = jnp.triu(sy)
    r = r + jnp.diag(jnp.where(valid, 0.0, 1.0))  # identity rows for stale slots
    dvec = jnp.diag(sy)

    p1 = jnp.where(valid, jnp.einsum("mn,n->m", state.s_hist, g, precision=HI)[ord_], 0.0)
    p2 = jnp.where(valid, jnp.einsum("mn,n->m", state.y_hist, g, precision=HI)[ord_], 0.0)

    u = jax.scipy.linalg.solve_triangular(r, p1, lower=False)
    w = jax.scipy.linalg.solve_triangular(
        r.T, dvec * u + gamma * (yy @ u) - gamma * p2, lower=True
    )
    u = jnp.where(valid, u, 0.0)
    w = jnp.where(valid, w, 0.0)

    # scatter chronological coefficients back to absolute slots
    coeff_s = jnp.zeros((m,), g.dtype).at[ord_].set(w)
    coeff_y = jnp.zeros((m,), g.dtype).at[ord_].set(-gamma * u)
    hg = gamma * g
    hg = hg + jnp.einsum("m,mn->n", coeff_s, state.s_hist, precision=HI)
    hg = hg + jnp.einsum("m,mn->n", coeff_y, state.y_hist, precision=HI)
    return hg


__all__ = ["lbfgs", "LBFGSState"]
