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

TPU layout: every per-iteration vector quantity (g, y, s, prev_grad,
prev_d, the parameter update) keeps the PARAMETER'S NATIVE SHAPE.  Flattening
the whole optimiser via ravel_pytree handed XLA 1-D / (1, N) operands that
it laid out as T(1,128)/T(1024) tiles in scoped memory (1/8 vector-lane
utilisation plus relayout copies on every elementwise op, confirmed by HLO
dump).  The history buffers keep the leaf's native
shape too — (m, H, W, C) for a (1, H, W, C) pastiche, with the projection /
recombination dots contracting the three trailing dims — so NO flatten of a
pastiche-sized buffer exists anywhere in the program (a flattened (m, N)
history plants 1-D layout preferences that XLA propagates backwards through
the conv backward pass; measured +20 ms/iter at 1024²).  Leaves whose
native history would be rank 5 (multi-frame windows; rank-5 dynamic row
updates abort with INVALID_ARGUMENT on this TPU backend) fall back to
(m, N) flattened storage.

There is also no lax.cond anywhere: conditional branches around the (m, N)
history writes broke XLA's in-place buffer analysis inside the larger scan
program (measured ~26 ms/iter of 1.26 GB copies at 1024²/m=100).  The torch
guard "insert only when y·s > 1e-10" is expressed as masked writes; on the
first step prev_d = 0 gives ys = 0, which also covers torch's no-history
first iteration.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class LBFGSState(NamedTuple):
    s_hist: Any  # pytree of (m, *row_shape) — see _native_hist
    y_hist: Any  # pytree of (m, *row_shape)
    rho: jax.Array  # (m,)  (two_loop method)
    w_sy: jax.Array  # (m, m) S^T Y gram, absolute slots (compact method)
    w_yy: jax.Array  # (m, m) Y^T Y gram, absolute slots (compact method)
    proj: jax.Array  # (2, m) — (Sᵀg, Yᵀg) for the current g (compact method)
    count: jax.Array  # () int32 — number of valid history entries
    ptr: jax.Array  # () int32 — next write slot (circular)
    prev_grad: Any  # pytree of leaf.shape
    prev_d: Any  # pytree of leaf.shape
    prev_t: jax.Array  # () f32
    h_diag: jax.Array  # () f32
    step: jax.Array  # () int32


def _tmap(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


def _tsum(tree) -> jax.Array:
    return sum(jax.tree_util.tree_leaves(tree))


def _tree_vdot(a, b) -> jax.Array:
    """Global <a, b> over matching pytrees, f32 accumulation, native layout."""
    return _tsum(_tmap(lambda x, y: jnp.sum(x * y, dtype=jnp.float32), a, b))



def _native_hist(leaf_shape: tuple[int, ...]) -> bool:
    """True when the history for this leaf keeps the leaf's spatial shape.

    A (1, H, W, C) pastiche gets a (m, H, W, C) history: every history op
    (row insert, projection dot, recombination dot) then runs directly on
    the leaf's native layout, and NO flatten/transpose of pastiche-sized
    buffers exists anywhere in the program.  Flattening instead (rows as
    (m, N)) plants 1-D/T(1,128) layout preferences that XLA propagates
    backwards through the conv backward pass (measured +20 ms/iter at
    1024²: the packed-stem backward convs fall off their fast emitter).
    Leaves of other ranks — e.g. multi-frame (T, H, W, C) windows, whose
    (m, T, H, W, C) history would be rank 5 (dynamic row updates on rank-5
    operands abort on this TPU backend) — flatten as before.
    """
    return len(leaf_shape) == 4 and leaf_shape[0] == 1


def _row_shape(leaf) -> tuple[int, ...]:
    if _native_hist(leaf.shape):
        _, h, w, c = leaf.shape
        return (c, h, w)
    return (leaf.size,)


def _to_row(v: jax.Array) -> jax.Array:
    """Leaf -> history row ((C, H, W) for NHWC pastiches, else flat).

    XLA stores pastiche-sized NHWC f32 buffers physically (B, C, H, W)-major
    ({2,1,3,0:T(8,128)}), so the NHWC->CHW transpose is a relabeling of the
    native bytes and the (m, C, H, W) history tiles densely over (H, W)."""
    if _native_hist(v.shape):
        return jnp.transpose(v[0], (2, 0, 1))
    return v.reshape(-1)


def _stack_rows(vs: jax.Array) -> jax.Array:
    """(K, *leaf.shape) stacked leaves -> (K, *row_shape)."""
    if _native_hist(vs.shape[1:]):
        return jnp.transpose(vs.reshape((vs.shape[0],) + vs.shape[2:]), (0, 3, 1, 2))
    return vs.reshape(vs.shape[0], -1)


def _from_row(row: jax.Array, like: jax.Array) -> jax.Array:
    """History row -> leaf shape (inverse of _to_row)."""
    if _native_hist(like.shape):
        return jnp.transpose(row, (1, 2, 0))[None]
    return row.reshape(like.shape)


def _row_dims(h: jax.Array) -> tuple[int, ...]:
    # contracting dims of a history/row-stack operand: everything but dim 0
    return tuple(range(1, h.ndim))


def _dot_precision(dtype):
    # On TPU, DEFAULT-precision dot_general truncates f32 operands to bf16 on
    # the MXU; preferred_element_type only widens the ACCUMULATOR.  f32
    # histories (the parity/fidelity config) must therefore dot at HIGHEST to
    # actually keep input precision.  bf16 operands are exact on the MXU
    # either way, so the serving config keeps DEFAULT (no extra passes).
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def _hist_project(vecs, hist) -> jax.Array:
    """<v_k, hist_row_m> for a pytree of stacked vectors (K, *shape) against
    a pytree history (m, *shape) -> (K, m).

    Leaves flatten to 2-D only at the dot boundary (the TPU backend rejects
    the >3-contracting-dim dot_generals at runtime; a reshape on the operand
    costs one cheap relayout, unlike keeping the whole optimiser flat)."""

    def one(v, h):
        v2 = _stack_rows(v).astype(h.dtype)
        return jax.lax.dot_general(
            v2, h, ((_row_dims(h), _row_dims(h)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(h.dtype),
        )

    return _tsum(_tmap(one, vecs, hist))


def _hist_recombine(coeff: jax.Array, hist, like):
    """sum_m coeff[m] * hist[m] -> pytree shaped like ``like`` (one pass)."""

    def one(h, like):
        out = jax.lax.dot_general(
            coeff[None].astype(h.dtype), h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(h.dtype),
        )[0]  # row-shaped
        return _from_row(out, like).astype(like.dtype)

    return _tmap(one, hist, like)


def lbfgs(
    learning_rate: float = 1.0,
    history_size: int = 100,
    method: str = "compact",
    history_dtype=None,
) -> optax.GradientTransformation:
    """torch-semantics L-BFGS (see module docstring for the two methods).

    ``history_dtype``: storage dtype for the (m, N) s/y histories (default:
    the parameter dtype).  bf16 halves both the dominant per-iteration HBM
    traffic (the projection + recombination passes stream every live row)
    and the history footprint (~2.5 GB -> 1.25 GB at 1024²/m=100); all dot
    products accumulate in f32 (``preferred_element_type``), and the m×m
    curvature algebra stays f32 throughout.
    """
    m = int(history_size)
    lr = float(learning_rate)
    if method not in ("compact", "two_loop"):
        raise ValueError(method)

    def init(params):
        z = jnp.zeros
        # prev_grad and prev_d must be DISTINCT buffers: sharing one zeros
        # tree makes the same device buffer appear twice in the jitted step's
        # donated arguments ("Attempt to donate the same buffer twice")
        hdt = history_dtype
        return LBFGSState(
            s_hist=_tmap(lambda p: z((m,) + _row_shape(p), hdt or p.dtype), params),
            y_hist=_tmap(lambda p: z((m,) + _row_shape(p), hdt or p.dtype), params),
            rho=z((m,), jnp.float32),
            w_sy=z((m, m), jnp.float32),
            w_yy=z((m, m), jnp.float32),
            proj=z((2, m), jnp.float32),
            count=jnp.zeros((), jnp.int32),
            ptr=jnp.zeros((), jnp.int32),
            prev_grad=_tmap(lambda p: z(p.shape, p.dtype), params),
            prev_d=_tmap(lambda p: z(p.shape, p.dtype), params),
            prev_t=jnp.zeros((), jnp.float32),
            h_diag=jnp.ones((), jnp.float32),
            step=jnp.zeros((), jnp.int32),
        )

    def update(g, state: LBFGSState, params=None):
        y = _tmap(lambda gg, pg: gg - pg, g, state.prev_grad)
        # prev_t is an f32 scalar; cast back so non-f32 leaves keep their dtype
        s = _tmap(lambda d: (d * state.prev_t).astype(d.dtype), state.prev_d)

        # ---- one streaming pass per history buffer ----
        # stack [s, y, g] leaf-wise -> (3, *shape); project against both
        # histories and against itself (ys, yy, s·g, y·g all from one pass)
        a = _tmap(lambda sl, yl, gl: jnp.stack([sl, yl, gl]), s, y, g)
        p_s = _hist_project(a, state.s_hist)  # (3, m)
        p_y = _hist_project(a, state.y_hist)  # (3, m)
        def _gram3_one(al):
            r = _stack_rows(al)
            return jax.lax.dot_general(
                r, r, ((_row_dims(r), _row_dims(r)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(al.dtype),
            )

        gram3 = _tsum(_tmap(_gram3_one, a))
        ys, yy = gram3[0, 1], gram3[1, 1]
        sg, yg = gram3[0, 2], gram3[1, 2]

        ok = ys > 1e-10
        k = state.ptr
        okf = ok.astype(jnp.float32)
        # masked row write: keep the old row when not inserting (row-sized
        # blend, so the (m, *shape) buffers update in place)
        def put_row(hist, row):
            def one(h, r):
                r2 = _to_row(r)
                old = jax.lax.dynamic_index_in_dim(h, k, 0, keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    h, (okf * r2 + (1 - okf) * old).astype(h.dtype), k, 0
                )

            return _tmap(one, hist, row)

        s_hist = put_row(state.s_hist, s)
        y_hist = put_row(state.y_hist, y)

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
            d = _tmap(lambda hg: -hg, _compact_hg(state, g, m))
        else:
            d = _tmap(lambda hg: -hg, _two_loop_hg(state, g, m))
        # f32 scalar coefficients (h_diag, rho, t) promote non-f32 leaves;
        # cast back so prev_d and the update keep the parameter dtype (the
        # transform stays a generic optax member for bf16 leaves)
        d = _tmap(lambda dd, gg: dd.astype(gg.dtype), d, g)

        g_l1 = _tsum(_tmap(lambda gg: jnp.sum(jnp.abs(gg), dtype=jnp.float32), g))
        t = jnp.where(
            state.step == 0,
            jnp.minimum(1.0, 1.0 / g_l1) * lr,
            jnp.asarray(lr, jnp.float32),
        )

        state = state._replace(prev_grad=g, prev_d=d, prev_t=t, step=state.step + 1)
        return _tmap(lambda dd: (t * dd).astype(dd.dtype), d), state

    return optax.GradientTransformation(init, update)


def _two_loop_hg(state: LBFGSState, g, m: int):
    """Classic sequential two-loop recursion; returns H g (so d = -Hg... note
    we fold the sign by starting from -g and returning its negation)."""

    def row(hist, slot, like):
        return _tmap(
            lambda h, l: _from_row(jax.lax.dynamic_index_in_dim(h, slot, 0, keepdims=False), l),
            hist, like,
        )

    def loop1(j, carry):
        q, al = carry
        slot = (state.ptr - 1 - j) % m  # newest -> oldest
        valid = j < state.count
        s_j = row(state.s_hist, slot, q)
        y_j = row(state.y_hist, slot, q)
        a_j = state.rho[slot] * _tree_vdot(s_j, q)
        # cast the f32-coefficient product back so the fori_loop carry keeps
        # the parameter dtype with non-f32 leaves
        q = _tmap(lambda qq, yj: jnp.where(valid, qq - (a_j * yj).astype(qq.dtype), qq), q, y_j)
        al = al.at[slot].set(jnp.where(valid, a_j, 0.0))
        return q, al

    neg_g = _tmap(lambda gg: -gg, g)
    q, al = jax.lax.fori_loop(0, m, loop1, (neg_g, jnp.zeros((m,), jnp.float32)), unroll=min(m, 8))
    d = _tmap(lambda qq: (qq * state.h_diag).astype(qq.dtype), q)

    def loop2(j, d):
        slot = (state.ptr - state.count + j) % m  # oldest -> newest
        valid = j < state.count
        s_j = row(state.s_hist, slot, d)
        y_j = row(state.y_hist, slot, d)
        be = state.rho[slot] * _tree_vdot(y_j, d)
        return _tmap(lambda dd, sj: jnp.where(valid, dd + (sj * (al[slot] - be)).astype(dd.dtype), dd), d, s_j)

    d = jax.lax.fori_loop(0, m, loop2, d, unroll=min(m, 8))
    return _tmap(lambda dd: -dd, d)  # loops computed -H g


def _compact_hg(state: LBFGSState, g, m: int):
    """H g via the compact representation (algebraically == two-loop:
    H g = γ g + S w − γ Y u with u = R⁻¹ Sᵀg and
    w = R⁻ᵀ((D + γYᵀY)u − γYᵀg), where R = triu(SᵀY), D = diag(SᵀY)).

    Everything that touches the (m, *shape) histories was precomputed in the
    update's single projection pass (``state.proj``); this function does
    m×m-sized algebra plus ONE recombination matvec per history buffer.
    """
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
    coeff_s = jnp.zeros((m,), jnp.float32).at[ord_].set(w)
    coeff_y = jnp.zeros((m,), jnp.float32).at[ord_].set(-gamma * u)
    rs = _hist_recombine(coeff_s, state.s_hist, g)
    ry = _hist_recombine(coeff_y, state.y_hist, g)
    return _tmap(lambda gg, a, b: gamma * gg + a + b, g, rs, ry)


__all__ = ["lbfgs", "LBFGSState"]
