"""Gram / covariance matrices for style statistics.

The reference computes per-frame Grams ``(C, HW) @ (HW, C)`` and a "dynamic"
whole-window Gram ``(B*C, HW) @ (HW, B*C)`` (reference: loss.py:67-91,
141-186).  On TPU these are single MXU matmuls; we keep the contraction in
float32 via ``preferred_element_type`` so bfloat16 activations still give
accurate statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gram_matrix(x: jax.Array, use_covariance: bool = False) -> jax.Array:
    """Gram of a single frame.

    x: (H, W, C) or (1, H, W, C). Returns (C, C) = F @ F.T with F = (C, H*W),
    matching reference loss.py:84-91 (without the /nelement normalisation —
    callers divide, as the reference does at loss.py:144).
    """
    if x.ndim == 4:
        x = x[0]
    h, w, c = x.shape
    f = x.reshape(h * w, c)
    if use_covariance:
        f = f - f.mean(axis=0, keepdims=True)
    return jnp.dot(f.T, f, preferred_element_type=jnp.float32)


def batch_gram(x: jax.Array, use_covariance: bool = False) -> jax.Array:
    """Per-frame Grams, batched: (B, H, W, C) -> (B, C, C)."""
    b, h, w, c = x.shape
    f = x.reshape(b, h * w, c)
    if use_covariance:
        f = f - f.mean(axis=1, keepdims=True)
    return jax.lax.dot_general(
        f, f, dimension_numbers=(((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


def video_gram(x: jax.Array, use_covariance: bool = False) -> jax.Array:
    """Whole-window ("dynamic texture") Gram: (B, H, W, C) -> (B*C, B*C).

    Equivalent to the reference's GramMatrix on a multi-frame batch
    (reference: loss.py:84-91 with B>1): rows are the B*C per-frame channels,
    contracted over the H*W spatial axis.
    """
    b, h, w, c = x.shape
    # (B, HW, C) -> (B*C, HW): frame-major rows, matching reshape(B*C, H*W) on NCHW.
    f = jnp.transpose(x.reshape(b, h * w, c), (0, 2, 1)).reshape(b * c, h * w)
    if use_covariance:
        f = f - f.mean(axis=1, keepdims=True)
    return jnp.dot(f, f.T, preferred_element_type=jnp.float32)


__all__ = ["gram_matrix", "batch_gram", "video_gram"]
