"""Pallas TPU kernel for Gram/covariance accumulation — the north-star
kernel (BASELINE.json): XLA lowers the (HW, C)^T (HW, C) contraction with
materialised transposes and a tiny MXU output, costing ~16 ms of the ~47 ms
style step at 1024² (measured).  This kernel streams activation tiles
through VMEM once, accumulating the (C, C) Gram in a float32 VMEM scratch —
no transposed copies, one HBM read of the activations.

Backward (dL/dF = F @ (G' + G'^T)) is a plain (HW, C) @ (C, C) matmul that
XLA handles efficiently, wired via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gram_kernel(f_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    f = f_ref[...]  # (TILE, C)
    acc_ref[...] += jax.lax.dot_general(
        f, f, dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _gram_pallas_fwd(f: jax.Array, tile: int = 1024, interpret: bool = False) -> jax.Array:
    """f: (N, C) -> (C, C) f32 Gram = f^T f."""
    n, c = f.shape
    cp = -(-c // 128) * 128
    np_ = -(-n // tile) * tile
    fp = jnp.pad(f, ((0, np_ - n), (0, cp - c)))
    out = pl.pallas_call(
        _gram_kernel,
        grid=(np_ // tile,),
        in_specs=[pl.BlockSpec((tile, cp), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((cp, cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, cp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((cp, cp), jnp.float32)],
        interpret=interpret,
    )(fp)
    return out[:c, :c]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gram_pallas(f: jax.Array, interpret: bool = False) -> jax.Array:
    """(N, C) -> (C, C) f32 Gram with an efficient TPU forward and an XLA
    matmul backward."""
    return _gram_pallas_fwd(f, interpret=interpret)


def _g_fwd(f, interpret):
    return _gram_pallas_fwd(f, interpret=interpret), f


def _g_bwd(interpret, f, g):
    m = (g + g.T).astype(jnp.float32)
    return (jnp.dot(f.astype(jnp.float32), m, preferred_element_type=jnp.float32).astype(f.dtype),)


gram_pallas.defvjp(_g_fwd, _g_bwd)


def gram_nhwc(a: jax.Array, use_covariance: bool = False, interpret: bool = False) -> jax.Array:
    """Per-frame Grams on NHWC activations via the Pallas kernel:
    (B, H, W, C) -> (B, C, C) f32 (drop-in for ops.gram.batch_gram on TPU)."""
    b, h, w, c = a.shape
    f = a.reshape(b, h * w, c)
    if use_covariance:
        f = f - f.mean(axis=1, keepdims=True)
    if b == 1:
        return gram_pallas(f[0], interpret)[None]
    return jax.vmap(lambda x: gram_pallas(x, interpret))(f)


__all__ = ["gram_pallas", "gram_nhwc"]
