"""Fast max-pool backward for TPU.

XLA lowers the gradient of a max reduce_window to ``select_and_scatter``,
which profiles at ~6 ms/iter of the 45 ms style step at 1024² (4 pools,
~13% of the step).  For the non-overlapping stride==kernel case the backward
is just a compare-and-mask: broadcast the pooled max back to input positions
and route the cotangent where the input equals it.  Exact wherever the max is
unique; exact ties route to every tied candidate (torch routes to the first
argmax — a measure-zero difference for continuous activations, and post-ReLU
zero plateaus receive zero cotangent through the ReLU backward anyway).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _pool_max(x: jax.Array, k: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // k, k, w // k, k, c)
    return x.max(axis=(2, 4))


def _where_max(a: jax.Array, b: jax.Array) -> jax.Array:
    # where-form max: the backward is ONE select routing ties to the first
    # operand (torch argmax semantics); jnp.maximum's JVP tie-splits g/2 at
    # equality which lowers to divide+pred-buffer fusions (profiled, see
    # ops/packed_stem.pool_packed)
    return jnp.where(a >= b, a, b)


def max_pool_fast(x: jax.Array, k: int) -> jax.Array:
    """Non-overlapping k x k max pool (NHWC); input H, W divisible by k."""
    if k == 2:
        # pairwise where-chain under plain autodiff (all VGG pools take this)
        b, h, w, c = x.shape
        x6 = x.reshape(b, h // 2, 2, w // 2, 2, c)
        rows = _where_max(x6[:, :, 0], x6[:, :, 1])  # (b, h/2, w/2, 2, c)
        return _where_max(rows[:, :, :, 0, :], rows[:, :, :, 1, :])
    return _max_pool_blocked(x, k)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool_blocked(x: jax.Array, k: int) -> jax.Array:
    """General-k non-overlapping max pool with a compare-and-mask backward."""
    return _pool_max(x, k)


def _mp_fwd(x, k):
    out = _pool_max(x, k)
    return out, (x, out)


def _mp_bwd(k, res, g):
    x, out = res
    b, oh, ow, c = out.shape
    xb = x.reshape(b, oh, k, ow, k, c)
    # broadcast-compare in blocked form: ONE fused pass, no repeat copies and
    # no tie-count reduction (the even-split divide cost an extra full-buffer
    # reduction per pool; exact ties now route to every tied candidate — the
    # same measure-zero stance as the docstring, and torch's first-argmax
    # routing doesn't conserve the cotangent across ties either)
    grad = jnp.where(
        xb == out[:, :, None, :, None, :],
        g[:, :, None, :, None, :],
        jnp.zeros((), g.dtype),
    )
    return (grad.reshape(b, oh * k, ow * k, c),)


_max_pool_blocked.defvjp(_mp_fwd, _mp_bwd)


__all__ = ["max_pool_fast"]
