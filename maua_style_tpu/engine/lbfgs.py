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
    count: jax.Array  # () int32 — number of valid history entries
    ptr: jax.Array  # () int32 — next write slot (circular)
    prev_grad: jax.Array  # (N,)
    prev_d: jax.Array  # (N,)
    prev_t: jax.Array  # () f32
    h_diag: jax.Array  # () f32
    step: jax.Array  # () int32


def lbfgs(learning_rate: float = 1.0, history_size: int = 100) -> optax.GradientTransformation:
    m = int(history_size)
    lr = float(learning_rate)

    def init(params):
        flat, _ = jax.flatten_util.ravel_pytree(params)
        n = flat.shape[0]
        z = jnp.zeros
        return LBFGSState(
            s_hist=z((m, n), flat.dtype),
            y_hist=z((m, n), flat.dtype),
            rho=z((m,), flat.dtype),
            count=jnp.zeros((), jnp.int32),
            ptr=jnp.zeros((), jnp.int32),
            prev_grad=z((n,), flat.dtype),
            prev_d=z((n,), flat.dtype),
            prev_t=jnp.zeros((), flat.dtype),
            h_diag=jnp.ones((), flat.dtype),
            step=jnp.zeros((), jnp.int32),
        )

    def update(grads, state: LBFGSState, params=None):
        g, unravel = jax.flatten_util.ravel_pytree(grads)

        def with_history(state: LBFGSState) -> LBFGSState:
            y = g - state.prev_grad
            s = state.prev_d * state.prev_t
            ys = jnp.dot(y, s)

            def insert(st: LBFGSState) -> LBFGSState:
                return st._replace(
                    s_hist=st.s_hist.at[st.ptr].set(s),
                    y_hist=st.y_hist.at[st.ptr].set(y),
                    rho=st.rho.at[st.ptr].set(1.0 / ys),
                    ptr=(st.ptr + 1) % m,
                    count=jnp.minimum(st.count + 1, m),
                    h_diag=ys / jnp.dot(y, y),
                )

            return jax.lax.cond(ys > 1e-10, insert, lambda st: st, state)

        state = jax.lax.cond(state.step > 0, with_history, lambda st: st, state)

        # two-loop recursion
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

        q0 = -g
        q, al = jax.lax.fori_loop(0, m, loop1, (q0, jnp.zeros((m,), g.dtype)))
        d = q * state.h_diag

        def loop2(j, d):
            slot = (state.ptr - state.count + j) % m  # oldest -> newest
            valid = j < state.count
            s_j = state.s_hist[slot]
            y_j = state.y_hist[slot]
            be = state.rho[slot] * jnp.dot(y_j, d)
            return jnp.where(valid, d + s_j * (al[slot] - be), d)

        d = jax.lax.fori_loop(0, m, loop2, d)

        t = jnp.where(
            state.step == 0,
            jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(g))) * lr,
            jnp.asarray(lr, g.dtype),
        )

        state = state._replace(prev_grad=g, prev_d=d, prev_t=t, step=state.step + 1)
        return unravel(t * d), state

    return optax.GradientTransformation(init, update)


__all__ = ["lbfgs", "LBFGSState"]
