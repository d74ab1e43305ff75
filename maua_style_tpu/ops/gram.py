"""Gram / covariance matrices for style statistics.

The reference computes per-frame Grams ``(C, HW) @ (HW, C)`` and a "dynamic"
whole-window Gram ``(B*C, HW) @ (HW, B*C)`` (reference: loss.py:67-91,
141-186).  On TPU these are single MXU matmuls; we keep the contraction in
float32 via ``preferred_element_type`` so bfloat16 activations still give
accurate statistics.

Both Grams carry a custom VJP.  XLA's autodiff of the contraction emits two
backward matmuls (one per operand) against a ``(C, HW)``-transposed copy of
the activation — at 1024² that materialises 128 MB layout copies per style
layer per iteration (profiled: ~2 ms/iter of pure ``copy`` ops).  The Gram is
symmetric in its operands, so the true gradient is ONE NHWC-native
contraction with the symmetrised cotangent:

    G = fᵀ f          ⇒   dL/df = f (ḡ + ḡᵀ)

which XLA lowers as a ``(HW, C) x (C, C)`` matmul on the channel-minor layout
the activations already have — no transposes, half the backward FLOPs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def gram_matrix(x: jax.Array, use_covariance: bool = False) -> jax.Array:
    """Gram of a single frame.

    x: (H, W, C) or (1, H, W, C). Returns (C, C) = F @ F.T with F = (C, H*W),
    matching reference loss.py:84-91 (without the /nelement normalisation —
    callers divide, as the reference does at loss.py:144).
    """
    if x.ndim == 3:
        x = x[None]
    return batch_gram(x, use_covariance)[0]


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def batch_gram(x: jax.Array, use_covariance: bool = False) -> jax.Array:
    """Per-frame Grams, batched: (B, H, W, C) -> (B, C, C) float32."""
    return _batch_gram_fwd(x, use_covariance)[0]


def _centered(x: jax.Array, use_covariance: bool) -> jax.Array:
    # accepts any (B, ..., C): rows are all non-batch, non-channel positions
    # (pixels, or pixel-phase pairs for packed-stem activations)
    f = x.reshape(x.shape[0], -1, x.shape[-1])
    if use_covariance:
        f = f - f.mean(axis=1, keepdims=True)
    return f


def _batch_gram_fwd(x, use_covariance):
    f = _centered(x, use_covariance)
    g = jax.lax.dot_general(
        f, f, dimension_numbers=(((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    return g, x


def _batch_gram_bwd(use_covariance, x, gbar):
    f = _centered(x, use_covariance)
    sym = (gbar + jnp.swapaxes(gbar, 1, 2)).astype(x.dtype)  # (B, C, C)
    # dL/df = f @ sym: channel-minor contraction, no (C, HW) transpose
    df = jax.lax.dot_general(f, sym, dimension_numbers=(((2,), (1,)), ((0,), (0,))))
    if use_covariance:
        df = df - df.mean(axis=1, keepdims=True)
    return (df.reshape(x.shape),)


batch_gram.defvjp(_batch_gram_fwd, _batch_gram_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def video_gram(x: jax.Array, use_covariance: bool = False) -> jax.Array:
    """Whole-window ("dynamic texture") Gram: (B, H, W, C) -> (B*C, B*C) f32.

    Equivalent to the reference's GramMatrix on a multi-frame batch
    (reference: loss.py:84-91 with B>1): rows are the B*C per-frame channels,
    contracted over the H*W spatial axis.  Computed NHWC-native as
    einsum('ahwc,bhwd->acbd') so no (B*C, HW) transpose is materialised.
    """
    return _video_gram_fwd(x, use_covariance)[0]


def _video_mean(x: jax.Array) -> jax.Array:
    # per-(frame, channel) spatial mean, the covariance centering of the
    # (B*C, HW) row view
    return x.mean(axis=tuple(range(1, x.ndim - 1)), keepdims=True)


def _video_gram_fwd(x, use_covariance):
    b, c = x.shape[0], x.shape[-1]
    xc = x - _video_mean(x) if use_covariance else x
    f = xc.reshape(b, -1, c)
    # contract HW with no batch dims: (a, c, b, d)
    g4 = jax.lax.dot_general(
        f, f, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (a, c, b, d)
    return g4.reshape(b * c, b * c), x


def _video_gram_bwd(use_covariance, x, gbar):
    b, c = x.shape[0], x.shape[-1]
    xc = x - _video_mean(x) if use_covariance else x
    f = xc.reshape(b, -1, c)
    g4 = gbar.reshape(b, c, b, c)
    sym = (g4 + jnp.transpose(g4, (2, 3, 0, 1))).astype(x.dtype)  # (a, c, b, d)
    # dL/df[a,p,c] = sum_{b,d} sym[a,c,b,d] * f[b,p,d]; contract so channels
    # stay minor ((p,a,c) then a major-axis permute, not a lane transpose)
    df = jax.lax.dot_general(
        f, sym, dimension_numbers=(((0, 2), (2, 3)), ((), ()))
    )  # (p, a, c)
    df = jnp.transpose(df, (1, 0, 2)).reshape(x.shape)
    if use_covariance:
        df = df - _video_mean(df)
    return (df,)


video_gram.defvjp(_video_gram_fwd, _video_gram_bwd)


__all__ = ["gram_matrix", "batch_gram", "video_gram"]
