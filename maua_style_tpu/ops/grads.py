"""Custom-gradient ops for the CLIP+VQGAN path
(reference clip_vqgan.py:95-136): straight-through gradient replacement,
clamp-with-gradient, spherical distance."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def replace_grad(x_forward: jax.Array, x_backward: jax.Array) -> jax.Array:
    """Forward x_forward; all gradient flows to x_backward (summed to its
    shape) — the straight-through estimator (reference clip_vqgan.py:95-106)."""
    return x_forward


def _rg_fwd(x_forward, x_backward):
    return x_forward, x_backward.shape


def _sum_to_shape(g, shape):
    extra = g.ndim - len(shape)
    if extra > 0:
        g = g.sum(axis=tuple(range(extra)))
    axes = tuple(i for i, (gs, s) in enumerate(zip(g.shape, shape)) if s == 1 and gs != 1)
    if axes:
        g = g.sum(axis=axes, keepdims=True)
    return g.reshape(shape)


def _rg_bwd(shape, g):
    return (jnp.zeros_like(g), _sum_to_shape(g, shape))


replace_grad.defvjp(_rg_fwd, _rg_bwd)


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def clamp_with_grad(x: jax.Array, lo: float, hi: float) -> jax.Array:
    """Clamp whose backward passes gradients that point back into the valid
    range (reference clip_vqgan.py:109-123)."""
    return jnp.clip(x, lo, hi)


def _cg_fwd(x, lo, hi):
    return jnp.clip(x, lo, hi), x


def _cg_bwd(lo, hi, x, g):
    keep = (g * (x - jnp.clip(x, lo, hi)) >= 0).astype(g.dtype)
    return (g * keep,)


clamp_with_grad.defvjp(_cg_fwd, _cg_bwd)


def spherical_dist(x: jax.Array, y: jax.Array) -> jax.Array:
    """Squared great-circle distance between L2-normalised embeddings
    (reference clip_vqgan.py:133-136)."""
    xn = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    yn = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    return jnp.square(jnp.arcsin(jnp.linalg.norm(xn - yn, axis=-1) / 2)) * 2


__all__ = ["replace_grad", "clamp_with_grad", "spherical_dist"]
