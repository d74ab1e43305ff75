"""CLIP cutout augmentation (reference clip_vqgan.py:53-92, 139-157).

The reference crops ``cutn`` random squares with sizes ~ U(0,1)^cut_pow
scaled between cut_size and min(H, W), then resamples each to cut_size with
a lanczos-2 anti-alias prefilter (reflect padding) followed by bicubic
interpolation (align_corners=True).

Dynamic crop sizes don't trace under jit, so sizes here are *stratified
static*: slot i takes the ((i + phase) / cutn)-quantile of the reference's
size distribution, with the phase picked at random per call from a small
static set (``lax.switch`` — every branch static-shaped).  Same marginal
distribution; sizes vary across iterations; variance is lower than iid
sampling but refines as ``phases`` grows.  Crop offsets stay random per
call.  With static sizes the reference's whole resample becomes EXACT: both
the lanczos prefilter and the bicubic interpolation are linear maps along
each axis, so each slot gets one precomputed (cut_size, s) matrix
A = bicubic(cut_size, s) @ lanczos_blur(s) and the fused crop+resample is
two MXU matmuls — no approximation (the previous bilinear fallback remains
as method="bilinear").
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

from .grads import clamp_with_grad
from .warp import grid_sample


def lanczos_prefilter_matrix(src: int, dst: int) -> np.ndarray:
    """(src, src) matrix of the reference's anti-alias prefilter
    (clip_vqgan.py:53-85): lanczos-2 kernel sampled at multiples of dst/src,
    normalised, applied under reflect padding.  Identity when not
    downscaling (the reference skips the filter then)."""
    if dst >= src:
        return np.eye(src)
    ratio = dst / src
    n = math.ceil(2.0 / ratio + 1)
    taps = np.arange(n, dtype=np.float64) * ratio
    x = np.concatenate([-taps[1:][::-1], taps])[1:-1]
    k = np.where((x > -2.0) & (x < 2.0), np.sinc(x) * np.sinc(x / 2.0), 0.0)
    k = k / k.sum()
    pad = (len(k) - 1) // 2
    # torch "reflect" padding: index -j -> j, src-1+j -> src-1-j
    jpos = np.arange(-pad, src + pad)
    jpos = np.abs(jpos)
    jpos = np.where(jpos >= src, 2 * (src - 1) - jpos, jpos)
    mat = np.zeros((src, src))
    for i in range(src):
        for t, kt in enumerate(k):
            mat[i, jpos[i + t]] += kt
    return mat


def bicubic_matrix(dst: int, src: int) -> np.ndarray:
    """(dst, src) matrix of torch bicubic interpolation with
    align_corners=True (cubic convolution a = -0.75, clamped borders)."""
    a = -0.75

    def cubic(x: float) -> float:
        x = abs(x)
        if x <= 1.0:
            return (a + 2.0) * x ** 3 - (a + 3.0) * x ** 2 + 1.0
        if x < 2.0:
            return a * (x ** 3 - 5.0 * x ** 2 + 8.0 * x - 4.0)
        return 0.0

    mat = np.zeros((dst, src))
    for i in range(dst):
        pos = i * (src - 1) / (dst - 1) if dst > 1 else 0.0
        base = math.floor(pos)
        for t in range(-1, 3):
            j = min(max(base + t, 0), src - 1)
            mat[i, j] += cubic(pos - (base + t))
    return mat


@lru_cache(maxsize=None)
def resample_matrix(src: int, dst: int) -> np.ndarray:
    """Fused (dst, src) linear map: reference resample == bicubic after the
    lanczos prefilter, per axis."""
    return (bicubic_matrix(dst, src) @ lanczos_prefilter_matrix(src, dst)).astype(np.float32)


def stratified_sizes(
    h: int, w: int, cut_size: int, cutn: int, cut_pow: float, phase: float = 0.5
) -> tuple[int, ...]:
    """Static per-slot crop sizes: the ((i+phase)/cutn)-quantiles of the
    reference's size law  int(u^cut_pow * (max - min) + min).

    ``phase`` in (0, 1) positions the sample within each stratum: a jitted
    caller traces one branch per phase and picks one at random per call
    (stratified sampling across iterations rather than fixed midpoints)."""
    max_size = min(h, w)
    min_size = min(h, w, cut_size)
    return tuple(
        int(((i + phase) / cutn) ** cut_pow * (max_size - min_size) + min_size) for i in range(cutn)
    )


@partial(jax.jit, static_argnames=("cut_size", "cutn", "cut_pow", "method", "phases"))
def make_cutouts(
    key: jax.Array,
    x: jax.Array,
    cut_size: int,
    cutn: int,
    cut_pow: float = 1.0,
    method: str = "lanczos",
    phases: int = 4,
) -> jax.Array:
    """x: (1, H, W, C) in [0,1] -> (cutn, cut_size, cut_size, C).

    Sizes are stratified per slot; each call picks one of ``phases``
    quantile phases at random (``lax.switch`` over per-phase branches, every
    branch static-shaped), so sizes vary across iterations and the marginal
    size law refines toward the reference's iid sampling as phases grows."""
    if method == "bilinear":
        return _make_cutouts_bilinear(key, x, cut_size, cutn, cut_pow)
    _, h, w, c = x.shape
    k_phase, k_offs = jax.random.split(key)
    offs = jax.random.uniform(k_offs, (cutn, 2))
    img = x[0]

    def branch_fn(p: int):
        sizes = stratified_sizes(h, w, cut_size, cutn, cut_pow, phase=(p + 0.5) / phases)

        def branch(operands):
            img, offs = operands
            outs = []
            for i, s in enumerate(sizes):
                oy = jnp.floor(offs[i, 0] * (h - s + 1)).astype(jnp.int32)
                ox = jnp.floor(offs[i, 1] * (w - s + 1)).astype(jnp.int32)
                crop = jax.lax.dynamic_slice(img, (oy, ox, jnp.int32(0)), (s, s, c))
                mat = jnp.asarray(resample_matrix(s, cut_size))
                rows = jnp.einsum("is,swc->iwc", mat, crop)
                outs.append(jnp.einsum("jw,iwc->ijc", mat, rows))
            return jnp.stack(outs)

        return branch

    if phases <= 1:
        out = branch_fn(0)((img, offs))
    else:
        phase = jax.random.randint(k_phase, (), 0, phases)
        out = jax.lax.switch(phase, [branch_fn(p) for p in range(phases)], (img, offs))
    return clamp_with_grad(out, 0.0, 1.0)


def _make_cutouts_bilinear(key, x, cut_size, cutn, cut_pow):
    """Previous fused crop+bilinear-resize gather (iid random sizes)."""
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


__all__ = [
    "make_cutouts",
    "resample_matrix",
    "lanczos_prefilter_matrix",
    "bicubic_matrix",
    "stratified_sizes",
]
