"""Bilinear resizing matching torch ``F.interpolate(mode="bilinear",
align_corners=False)`` — the resize used throughout the reference
(reference: style.py:39, load.py:211).

Torch quirk reproduced exactly: when called with ``scale_factor=s``, torch
uses ``1/s`` directly as the coordinate scale instead of the in/out size
ratio, which differs from the ``size=`` path for non-integral scales.  Both
paths are implemented as separable (out, in) interpolation-weight matmuls —
static sparse-banded matrices built at trace time, contracted on the MXU —
rather than gathers.  Parity is enforced by tests/test_ops.py against the
torch oracle.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def scale_shape(hw: tuple[int, int], scale_factor: float) -> tuple[int, int]:
    """Output (H, W) for a scale factor, matching torch's floor semantics."""
    return (int(math.floor(hw[0] * scale_factor)), int(math.floor(hw[1] * scale_factor)))


@lru_cache(maxsize=256)
def _interp_weights(in_len: int, out_len: int, scale: float | None) -> np.ndarray:
    """(out_len, in_len) bilinear weight matrix, half-pixel centers.

    ``scale`` is the explicit torch scale_factor if one was given (torch uses
    it directly for coordinate computation), else None -> in/out ratio.
    """
    if out_len == in_len and scale is None:
        return np.eye(out_len, dtype=np.float32)
    inv = (1.0 / scale) if (scale is not None and scale > 0) else (in_len / out_len)
    out_idx = np.arange(out_len, dtype=np.float64)
    src = (out_idx + 0.5) * inv - 0.5
    src = np.clip(src, 0.0, in_len - 1)
    x0 = np.floor(src).astype(np.int64)
    t = (src - x0).astype(np.float64)
    x1 = np.minimum(x0 + 1, in_len - 1)
    w = np.zeros((out_len, in_len), dtype=np.float32)
    w[out_idx.astype(np.int64), x0] += (1.0 - t).astype(np.float32)
    w[out_idx.astype(np.int64), x1] += t.astype(np.float32)
    return w


def resize_bilinear(x: jax.Array, size: tuple[int, int] | None = None, scale_factor: float | None = None) -> jax.Array:
    """Resize NHWC images bilinearly (torch align_corners=False semantics).

    Exactly one of ``size`` (H, W) or ``scale_factor`` must be given.
    """
    if (size is None) == (scale_factor is None):
        raise ValueError("pass exactly one of size= or scale_factor=")
    h, w = int(x.shape[-3]), int(x.shape[-2])
    if size is None:
        size = scale_shape((h, w), scale_factor)
    oh, ow = int(size[0]), int(size[1])
    if (oh, ow) == (h, w) and scale_factor is None:
        return x
    wh = jnp.asarray(_interp_weights(h, oh, scale_factor))
    ww = jnp.asarray(_interp_weights(w, ow, scale_factor))
    dtype = x.dtype
    y = jnp.einsum("oh,...hwc->...owc", wh, x.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,...owc->...opc", ww, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(dtype)


def _gather_coords(in_len: int, out_len: int, scale: float | None):
    inv = (1.0 / scale) if (scale is not None and scale > 0) else (in_len / out_len)
    src = np.clip((np.arange(out_len, dtype=np.float64) + 0.5) * inv - 0.5, 0.0, in_len - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_len - 1)
    t = (src - lo).astype(np.float32)
    return lo, hi, t


def resize_bilinear_np(x: np.ndarray, size: tuple[int, int] | None = None, scale_factor: float | None = None) -> np.ndarray:
    """Host-side variant with identical semantics (for IO-adjacent per-frame
    code where an eager device op would cost more than the resize).

    Uses the threaded native C kernel when built (maua_style_tpu/native),
    else a 2-tap numpy gather — never the dense interpolation matrices the
    device path uses (those are MXU-friendly but O(out*in) on host).
    """
    if (size is None) == (scale_factor is None):
        raise ValueError("pass exactly one of size= or scale_factor=")
    h, w = int(x.shape[-3]), int(x.shape[-2])
    if size is None:
        size = scale_shape((h, w), scale_factor)
    oh, ow = int(size[0]), int(size[1])
    if (oh, ow) == (h, w) and scale_factor is None:
        return x

    from ..native import resize_bilinear_native

    native = resize_bilinear_native(np.asarray(x, np.float32), oh, ow, scale_factor)
    if native is not None:
        return native.astype(x.dtype)

    y0, y1, ty = _gather_coords(h, oh, scale_factor)
    x0, x1, tx = _gather_coords(w, ow, scale_factor)
    xf = np.asarray(x, np.float32)
    top = xf[..., y0, :, :]
    bot = xf[..., y1, :, :]
    rows = top + ty[:, None, None] * (bot - top)  # (..., oh, W, C)
    left = rows[..., :, x0, :]
    right = rows[..., :, x1, :]
    out = left + tx[None, :, None] * (right - left)
    return out.astype(x.dtype)


def resize_nearest(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    out_shape = (*x.shape[:-3], int(size[0]), int(size[1]), x.shape[-1])
    return jax.image.resize(x, out_shape, method="nearest")


__all__ = ["resize_bilinear", "resize_bilinear_np", "resize_nearest", "scale_shape"]
