"""CLIP cutout augmentation (reference clip_vqgan.py:139-157).

The reference crops ``cutn`` random squares with sizes ~ U(0,1)^cut_pow
scaled between cut_size and min(H, W), then lanczos+bicubic resamples each
to cut_size.  Dynamic crop sizes don't trace under jit, so here each cutout
is a single fused crop+resize gather: an affine sampling grid at static
(cut_size, cut_size) output shape whose scale/offset are traced scalars.
Sampling is bilinear (not lanczos) — a deliberate TPU-shapes trade-off; the
random size/offset distributions match the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .grads import clamp_with_grad
from .warp import grid_sample


@partial(jax.jit, static_argnames=("cut_size", "cutn", "cut_pow"))
def make_cutouts(key: jax.Array, x: jax.Array, cut_size: int, cutn: int, cut_pow: float = 1.0) -> jax.Array:
    """x: (1, H, W, C) in [0,1] -> (cutn, cut_size, cut_size, C)."""
    _, h, w, c = x.shape
    max_size = min(h, w)
    min_size = min(h, w, cut_size)

    k_size, k_ox, k_oy = jax.random.split(key, 3)
    sizes = jnp.floor(
        jax.random.uniform(k_size, (cutn,)) ** cut_pow * (max_size - min_size) + min_size
    )
    offx = jnp.floor(jax.random.uniform(k_ox, (cutn,)) * (w - sizes + 1))
    offy = jnp.floor(jax.random.uniform(k_oy, (cutn,)) * (h - sizes + 1))

    # normalised sampling grid per cutout: output pixel (i, j) samples input
    # pixel offy + (i + 0.5) * size/cut_size - 0.5 (half-pixel convention)
    ii = (jnp.arange(cut_size, dtype=jnp.float32) + 0.5) / cut_size  # (cs,)

    def one(size, ox, oy):
        px = ox + ii * size - 0.5  # (cs,)
        py = oy + ii * size - 0.5
        gx = (px + 0.5) * 2.0 / w - 1.0
        gy = (py + 0.5) * 2.0 / h - 1.0
        grid = jnp.stack(jnp.meshgrid(gx, gy), axis=-1)[None]  # (1, cs, cs, 2)
        return grid_sample(x, grid, padding_mode="border")[0]

    cutouts = jax.vmap(one)(sizes, offx, offy)
    return clamp_with_grad(cutouts, 0.0, 1.0)


__all__ = ["make_cutouts"]
