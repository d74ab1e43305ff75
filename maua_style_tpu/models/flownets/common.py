"""Shared flow-net building blocks."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.warp import grid_sample


def backward_warp(x: jax.Array, flow: jax.Array) -> jax.Array:
    """Warp x by flow given in pixels: out(p) = x(p + flow(p)), exactly.

    x: (B, H, W, C), flow: (B, H, W, 2) with (u, v) pixel displacements.
    Uses pixel-center normalised grids so zero flow is the identity under
    align_corners=False sampling.
    """
    b, h, w, _ = flow.shape
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * (2.0 / w) - 1.0
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (2.0 / h) - 1.0
    gx, gy = jnp.meshgrid(xs, ys)
    base = jnp.stack([gx, gy], axis=-1)[None]
    grid = base + flow * jnp.asarray([2.0 / w, 2.0 / h], jnp.float32)
    return grid_sample(x, grid, padding_mode="border")


def conv(params: dict, name: str, x: jax.Array, stride: int = 1, dilation: int = 1, pad: int | None = None) -> jax.Array:
    """Conv2d NHWC with explicit symmetric padding (default: SAME for odd kernels)."""
    p = params[name]
    w = p["w"]
    kh, kw = w.shape[0], w.shape[1]
    if pad is None:
        pad_h = ((kh - 1) * dilation) // 2
        pad_w = ((kw - 1) * dilation) // 2
    else:
        pad_h = pad_w = pad
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(pad_h, pad_h), (pad_w, pad_w)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"]


def deconv(params: dict, name: str, x: jax.Array, stride: int = 2, pad: int = 1) -> jax.Array:
    """ConvTranspose2d (kernel 4, stride 2, pad 1 — the flow-net upsampler).

    Implemented as an lhs-dilated conv with the kernel spatially flipped,
    which reproduces torch's ConvTranspose2d exactly (out = (in-1)*s - 2p + k)
    including on 1x1 inputs, where jax.lax.conv_transpose's padding convention
    collapses the output to zero size.  Weights are stored (k, k, out, in) —
    the layout a converted torch (in, out, kh, kw) weight lands in.
    """
    p = params[name]
    w = p["w"]  # (k, k, out, in)
    k = w.shape[0]
    w = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)  # -> (k, k, in, out), flipped
    edge = k - 1 - pad
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[(edge, edge), (edge, edge)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"]


def leaky_relu(x: jax.Array, slope: float = 0.1) -> jax.Array:
    return jnp.where(x >= 0, x, slope * x)


def upsample_flow2x(flow: jax.Array, size: tuple[int, int] | None = None, scale: float = 2.0) -> jax.Array:
    """Bilinearly upsample a flow field and rescale its magnitude."""
    from ...ops.resize import resize_bilinear

    b, h, w, _ = flow.shape
    target = size if size is not None else (h * 2, w * 2)
    up = resize_bilinear(flow, size=target)
    sx = target[1] / w if size is not None else scale
    sy = target[0] / h if size is not None else scale
    return up * jnp.asarray([sx, sy], jnp.float32)


def init_conv_params(layout: list[tuple[str, int, int, int]], key, in_ch_map=None) -> dict:
    """Deterministic init for a list of (name, in_ch, out_ch, kernel).

    Kernel-4 layers are the flow nets' deconvs (convs use 1/3/5/7);
    ``jax.lax.conv_transpose(transpose_kernel=True)`` wants those laid out
    I/O-swapped, (k, k, out, in) — the same layout a converted torch
    ConvTranspose2d (in, out, kh, kw) weight lands in.
    """
    params = {}
    for name, cin, cout, k in layout:
        key, sub = jax.random.split(key)
        fan_in = k * k * cin
        shape = (k, k, cout, cin) if k == 4 else (k, k, cin, cout)
        params[name] = {
            "w": jax.random.normal(sub, shape, jnp.float32) * np.sqrt(2.0 / fan_in),
            "b": jnp.zeros((cout,), jnp.float32),
        }
    return params


__all__ = ["backward_warp", "conv", "deconv", "leaky_relu", "upsample_flow2x", "init_conv_params"]
