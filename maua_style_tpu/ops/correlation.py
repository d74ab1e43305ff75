"""Cost-volume correlation — the one true CUDA-kernel replacement.

PWC-Net and LiteFlowNet's correlation layer is an inline CuPy CUDA kernel in
the reference's submodules (SURVEY.md §2.2; the reason the reference needs
``pip install cupy-cudaXXX``, reference README.md:35-37).  Here it is a Pallas
TPU kernel with an XLA fallback:

    corr[b, h, w, k] = sum_c f1[b,h,w,c] * f2[b, h+dy_k, w+dx_k, c] / C

for all (2*max_disp+1)^2 displacements k.  Flow nets run inference-only in
this framework (the reference wraps them in no_grad, load.py:156), so no
custom VJP is needed.

The Pallas kernel tiles H across the grid; f1 tiles stream in via BlockSpec
while the overlapping (TILE+2d, W+2d) halo window of f2 is DMA'd from HBM
into a VMEM scratch buffer (overlapping windows can't be expressed as a
BlockSpec stride).  The 81 displacement products run unrolled on the VPU
with float32 channel sums — one HBM read of f2 per tile instead of 81.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def correlation_xla(f1: jax.Array, f2: jax.Array, max_disp: int = 4, stride: int = 1) -> jax.Array:
    """Reference XLA implementation: (B, H, W, C) x2 -> (B, H, W, (2d/s+1)^2).

    ``stride`` samples every s-th displacement (FlowNetC uses d=20, s=2 ->
    a 21x21=441-channel cost volume — the classic "stride_2" correlation)."""
    b, h, w, c = f1.shape
    d = max_disp
    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    outs = []
    for dy in range(0, 2 * d + 1, stride):
        for dx in range(0, 2 * d + 1, stride):
            f2s = jax.lax.dynamic_slice(f2p, (0, dy, dx, 0), (b, h, w, c))
            outs.append(jnp.sum(f1 * f2s, axis=-1, dtype=jnp.float32))
    return jnp.stack(outs, axis=-1) / c


def _corr_kernel(f1_ref, f2_hbm, out_ref, f2_vmem, sem, *, max_disp: int, stride: int, tile: int, true_c: int):
    d = max_disp
    n = 2 * d // stride + 1  # displacement samples per axis
    i = pl.program_id(0)
    # DMA the overlapping halo window of f2 (rows i*tile .. i*tile+tile+2d)
    dma = pltpu.make_async_copy(
        f2_hbm.at[pl.ds(i * tile, tile + 2 * d), :, :],
        f2_vmem,
        sem,
    )
    dma.start()
    f1 = f1_ref[...]  # (TILE, W, Cp)
    w, c = f1.shape[1], f1.shape[2]
    dma.wait()
    f2 = f2_vmem[...]  # (TILE + 2d, W + 2d, Cp)
    inv_c = 1.0 / true_c  # channel padding is zeros; normalise by the true C
    for iy in range(n):
        for ix in range(n):
            dy, dx = iy * stride, ix * stride
            f2s = jax.lax.slice(f2, (dy, dx, 0), (dy + tile, dx + w, c))
            out_ref[:, :, iy * n + ix] = (
                jnp.sum(f1 * f2s, axis=-1, dtype=jnp.float32) * inv_c
            )


@functools.partial(jax.jit, static_argnames=("max_disp", "stride", "tile", "interpret"))
def correlation_pallas(
    f1: jax.Array, f2: jax.Array, max_disp: int = 4, stride: int = 1, tile: int = 8, interpret: bool = False
) -> jax.Array:
    b, h, w, c = f1.shape
    d = max_disp
    k = (2 * d // stride + 1) ** 2
    hp = -(-h // tile) * tile  # pad H to a tile multiple
    cp = -(-c // 128) * 128  # pad channels to the 128-lane tiling (zero-padding preserves dot products)
    wp = -(-w // 8) * 8  # pad W to the 8-sublane tiling (Mosaic requires 8-aligned slice widths)
    f1p = jnp.pad(f1, ((0, 0), (0, hp - h), (0, wp - w), (0, cp - c))).astype(jnp.float32)
    f2p = jnp.pad(f2, ((0, 0), (d, d + hp - h), (d, d + wp - w), (0, cp - c))).astype(jnp.float32)
    w = wp

    def run_one(f1b, f2b):
        return pl.pallas_call(
            functools.partial(_corr_kernel, max_disp=d, stride=stride, tile=tile, true_c=c),
            grid=(hp // tile,),
            in_specs=[
                pl.BlockSpec((tile, w, cp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),  # stays in HBM; DMA'd per tile
            ],
            out_specs=pl.BlockSpec((tile, w, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hp, w, k), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((tile + 2 * d, w + 2 * d, cp), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(f1b, f2b)

    out = jax.vmap(run_one)(f1p, f2p)
    return out[:, :h, : f1.shape[2]]


def correlation(f1: jax.Array, f2: jax.Array, max_disp: int = 4, stride: int = 1) -> jax.Array:
    """Cost volume; Pallas on TPU for non-trivial sizes, XLA elsewhere.

    Tiny feature maps (coarse pyramid levels) go to XLA — kernel launch +
    padding overheads dominate there and Mosaic tiling constraints bite.
    """
    if jax.default_backend() == "tpu" and f1.shape[1] >= 8 and f1.shape[2] >= 32:
        try:
            return correlation_pallas(f1, f2, max_disp, stride)
        except Exception:  # pragma: no cover - fall back if Mosaic rejects shapes
            pass
    return correlation_xla(f1, f2, max_disp, stride)


__all__ = ["correlation", "correlation_xla", "correlation_pallas"]
