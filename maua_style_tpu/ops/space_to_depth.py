"""Space-to-depth transform for large-kernel strided stem convs.

XLA's backward for NIN's 11x11/stride-4 stem materialises ~2 GiB of
lane-padded buffers at 1024² (see PERF.md), capping NIN capacity 3x below
the reference.  The classic TPU fix: pack sxs pixel blocks into channels and
run an equivalent ceil(k/s)² stride-1 conv — same math, MXU/HBM-friendly
shapes.

For a conv with kernel k, stride s, no padding:
    out[oy, ox] = sum_{ky, kx} w[ky, kx] · in[s·oy + ky, s·ox + kx]
becomes, with packed[py, px, (dy, dx, c)] = in[s·py + dy, s·px + dx, c]:
    out = conv_valid(packed, w') with w'[py, px, (dy,dx,c), o] = w[s·py+dy, s·px+dx, c, o]
(zero where s·py+dy >= k).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array, block: int) -> jax.Array:
    """(B, H, W, C) -> (B, ceil(H/b), ceil(W/b), b*b*C), zero-padding ragged edges.

    Channel order: (dy, dx, c) fastest-last, matching pack_stem_kernel."""
    b, h, w, c = x.shape
    hp = -(-h // block) * block
    wp = -(-w // block) * block
    x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    x = x.reshape(b, hp // block, block, wp // block, block, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # (B, H', W', dy, dx, c)
    return x.reshape(b, hp // block, wp // block, block * block * c)


def pack_stem_kernel(w: jax.Array, stride: int) -> jax.Array:
    """HWIO kernel (k, k, C, O) -> packed (ceil(k/s), ceil(k/s), s*s*C, O).

    Pure jnp (w may be a tracer under jit): zero-pad k to a stride multiple,
    then reshape so w'[py, px, (dy, dx, c)] = w[s·py+dy, s·px+dx, c]."""
    k = w.shape[0]
    c, o = w.shape[2], w.shape[3]
    kp = -(-k // stride)
    wpad = jnp.pad(w, ((0, kp * stride - k), (0, kp * stride - k), (0, 0), (0, 0)))
    wpad = wpad.reshape(kp, stride, kp, stride, c, o)
    wpad = jnp.transpose(wpad, (0, 2, 1, 3, 4, 5))  # (kp, kp, dy, dx, c, o)
    return wpad.reshape(kp, kp, stride * stride * c, o)


def stem_conv_s2d(x: jax.Array, w: jax.Array, b: jax.Array, stride: int,
                  precision=jax.lax.Precision.DEFAULT) -> jax.Array:
    """Equivalent of conv(x, w, stride, VALID pad) via space-to-depth."""
    k = w.shape[0]
    h, wd = x.shape[1], x.shape[2]
    oh = (h - k) // stride + 1
    ow = (wd - k) // stride + 1
    packed = space_to_depth(x, stride)
    wp = pack_stem_kernel(w, stride).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        packed, wp, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision
    )
    return out[:, :oh, :ow] + b.astype(x.dtype)


__all__ = ["space_to_depth", "pack_stem_kernel", "stem_conv_s2d"]
