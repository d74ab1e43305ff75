"""Bilinear grid sampling (torch ``F.grid_sample`` equivalent) for flow warping.

The reference warps previous pastiche frames through optical flow with
``F.grid_sample(..., padding_mode="border")`` (reference: style.py:228,276;
clip_video_style.py:107,156).  This is a gather + bilerp; XLA lowers the
``take`` into an efficient dynamic-gather on TPU.

Conventions match torch with ``align_corners=False``: grid is (B, H, W, 2)
with (x, y) in [-1, 1]; unnormalised coordinate = ((g + 1) * size - 1) / 2;
"border" clamps sample coordinates into the image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(x: jax.Array, grid: jax.Array, padding_mode: str = "border") -> jax.Array:
    """x: (B, H, W, C) NHWC, grid: (B, Hg, Wg, 2) xy in [-1,1] -> (B, Hg, Wg, C)."""
    if padding_mode not in ("border", "zeros"):
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")
    b, h, w, c = x.shape
    gx = (grid[..., 0] + 1.0) * w / 2.0 - 0.5
    gy = (grid[..., 1] + 1.0) * h / 2.0 - 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    tx = gx - x0
    ty = gy - y0

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = x.reshape(b, h * w, c)
        idx = yc * w + xc  # (B, Hg, Wg)
        out = jnp.take_along_axis(flat, idx.reshape(b, -1, 1), axis=1)
        return out.reshape(b, *idx.shape[1:], c)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)

    tx = tx[..., None]
    ty = ty[..., None]
    out = (
        v00 * (1 - tx) * (1 - ty)
        + v01 * tx * (1 - ty)
        + v10 * (1 - tx) * ty
        + v11 * tx * ty
    )

    if padding_mode == "zeros":
        inside = (
            (gx >= -1.0) & (gx <= w) & (gy >= -1.0) & (gy <= h)
        )  # torch zeros-mode zeroes per-corner; approximate with soft mask of valid area
        valid_x = jnp.clip(jnp.minimum(gx + 1.0, w - gx), 0.0, 1.0)
        valid_y = jnp.clip(jnp.minimum(gy + 1.0, h - gy), 0.0, 1.0)
        out = out * (valid_x * valid_y * inside)[..., None]
    return out.astype(x.dtype)


def flow_to_grid(flow_normalised: jax.Array, h: int, w: int) -> jax.Array:
    """Build a sampling grid from flow already normalised by (W, H).

    Mirrors reference load.py:191-214: grid = identity meshgrid in [-1,1]
    plus the (already /W, /H scaled) flow.
    """
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    gx, gy = jnp.meshgrid(xs, ys)
    neutral = jnp.stack([gx, gy], axis=-1)[None]
    return neutral + flow_normalised


__all__ = ["grid_sample", "flow_to_grid"]
