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

Performance: at N = 3.1M / m = 100 the (m, N) histories dominate HBM traffic,
so the update is organised to stream each exactly TWICE per iteration:

- one fused projection pass  [s; y; g] @ histᵀ  per history supplies the
  incremental m×m gram updates AND the Sᵀg / Yᵀg projections
- one recombination matvec  coeff @ hist  (1, N)  per history

The m×m compact-representation algebra (Byrd–Nocedal–Schnabel:
H g = γ g + S w − γ Y u, two triangular solves) runs on the tiny side.
The classic sequential two-loop recursion (2m dependent vector ops) is kept
as method="two_loop" — it needs no m×m gram state and no history transposes,
so it wins when HBM capacity is the binding constraint (see PERF.md).
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
    rho: jax.Array  # (m,)  (two_loop method)
    w_sy: jax.Array  # (m, m) S^T Y gram, absolute slots (compact method)
    w_yy: jax.Array  # (m, m) Y^T Y gram, absolute slots (compact method)
    proj: jax.Array  # (2, m) — (Sᵀg, Yᵀg) for the current g (compact method)
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
    """torch-semantics L-BFGS (see module docstring for the two methods)."""
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
            proj=z((2, m), flat.dtype),
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

        # No lax.cond anywhere: conditional branches around the (m, N)
        # history writes break XLA's in-place buffer analysis inside the
        # larger scan program (measured ~26 ms/iter of 1.26 GB copies at
        # 1024²/m=100).  The torch guard "insert only when y·s > 1e-10" is
        # expressed as masked writes instead; on the first step prev_d = 0
        # gives ys = 0, which also covers torch's no-history first iteration.
        y = g - state.prev_grad
        s = state.prev_d * state.prev_t

        # ---- the single streaming pass over the history ----
        # P[k, c, :] = <A_k, hist_c> for A = [s, y, g]; plus the 3x3 gram
        # of A itself for the new pair's own products (ys, yy, s·g, y·g).
        a = jnp.stack([s, y, g])  # (3, N)
        dims = (((1,), (1,)), ((), ()))
        p_s = jax.lax.dot_general(a, state.s_hist, dims, precision=HI)  # (3, m)
        p_y = jax.lax.dot_general(a, state.y_hist, dims, precision=HI)  # (3, m)
        gram3 = jax.lax.dot_general(a, a, dims, precision=HI)
        ys, yy = gram3[0, 1], gram3[1, 1]
        sg, yg = gram3[0, 2], gram3[1, 2]

        ok = ys > 1e-10
        k = state.ptr
        okf = ok.astype(g.dtype)
        # masked row write: keep the old row when not inserting (row-sized
        # blend, so the (m, N) buffers update in place)
        old_s = jax.lax.dynamic_slice_in_dim(state.s_hist, k, 1, 0)[0]
        old_y = jax.lax.dynamic_slice_in_dim(state.y_hist, k, 1, 0)[0]
        s_hist = state.s_hist.at[k].set(okf * s + (1 - okf) * old_s)
        y_hist = state.y_hist.at[k].set(okf * y + (1 - okf) * old_y)

        # patch slot k of the projections: the stale row was replaced
        sy_row = p_y[0].at[k].set(ys)  # s · Y
        sy_col = p_s[1].at[k].set(ys)  # Sᵀ y
        yy_col = p_y[1].at[k].set(yy)  # Yᵀ y
        w_sy = state.w_sy.at[k, :].set(sy_row).at[:, k].set(sy_col)
        w_yy = state.w_yy.at[k, :].set(yy_col).at[:, k].set(yy_col)
        proj_ins = jnp.stack([p_s[2].at[k].set(sg), p_y[2].at[k].set(yg)])
        proj_keep = jnp.stack([p_s[2], p_y[2]])

        state = state._replace(
            s_hist=s_hist,
            y_hist=y_hist,
            rho=jnp.where(ok, state.rho.at[k].set(1.0 / ys), state.rho),
            w_sy=jnp.where(ok, w_sy, state.w_sy),
            w_yy=jnp.where(ok, w_yy, state.w_yy),
            proj=jnp.where(ok, proj_ins, proj_keep),
            ptr=jnp.where(ok, (k + 1) % m, k),
            count=jnp.where(ok, jnp.minimum(state.count + 1, m), state.count),
            h_diag=jnp.where(ok, ys / yy, state.h_diag),
        )

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
    """H g via the compact representation (algebraically == two-loop).

    All inputs that touch the (2m, N) history were precomputed in the update's
    single projection pass (``state.proj``); this function only does m×m-sized
    algebra plus ONE recombination matvec over the history.
    """
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

    p1 = jnp.where(valid, state.proj[0][ord_], 0.0)
    p2 = jnp.where(valid, state.proj[1][ord_], 0.0)

    u = jax.scipy.linalg.solve_triangular(r, p1, lower=False)
    w = jax.scipy.linalg.solve_triangular(
        r.T, dvec * u + gamma * (yy @ u) - gamma * p2, lower=True
    )
    u = jnp.where(valid, u, 0.0)
    w = jnp.where(valid, w, 0.0)

    # scatter chronological coefficients back to absolute slots; one matvec
    # per history buffer: hg = γg + w_abs @ S − γ u_abs @ Y
    coeff_s = jnp.zeros((m,), g.dtype).at[ord_].set(w)
    coeff_y = jnp.zeros((m,), g.dtype).at[ord_].set(-gamma * u)
    dims = (((1,), (0,)), ((), ()))
    recomb_s = jax.lax.dot_general(coeff_s[None], state.s_hist, dims, precision=HI)[0]
    recomb_y = jax.lax.dot_general(coeff_y[None], state.y_hist, dims, precision=HI)[0]
    return gamma * g + recomb_s + recomb_y


__all__ = ["lbfgs", "LBFGSState"]
