"""On-device separable Gaussian filtering.

The reference calls host ``scipy.ndimage.gaussian_filter`` for flow smoothing
(load.py:206), temporal init/blending (style.py:95-100,138) and consistency
blur (flow.py:135).  Here the same filter is a chain of 1-D depthwise
convolutions that stays on the TPU; kernels match scipy's (radius =
int(truncate*sigma + 0.5), normalised Gaussian taps), and boundary modes
"reflect" (scipy default) and "wrap" are supported.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    return k.astype(np.float32)


def _conv1d_along(x: jax.Array, kernel: np.ndarray, axis: int, mode: str) -> jax.Array:
    radius = (kernel.shape[0] - 1) // 2
    if radius == 0:
        return x
    pad_mode = {"reflect": "symmetric", "wrap": "wrap", "nearest": "edge"}[mode]
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (radius, radius)
    xp = jnp.pad(x, pad_width, mode=pad_mode)
    # Move target axis last, flatten the rest, correlate as (N, L) x kernel.
    xp = jnp.moveaxis(xp, axis, -1)
    lead = xp.shape[:-1]
    flat = xp.reshape(-1, xp.shape[-1])[:, None, :]  # (N, 1, L)
    k = jnp.asarray(kernel)[None, None, :]  # (1, 1, K) — correlation == convolution (symmetric kernel)
    out = jax.lax.conv_general_dilated(
        flat, k, window_strides=(1,), padding="VALID", dimension_numbers=("NCH", "OIH", "NCH")
    )
    out = out[:, 0, :].reshape(*lead, -1)
    return jnp.moveaxis(out, -1, axis).astype(x.dtype)


def gaussian_blur(x: jax.Array, sigma, mode: str = "reflect", truncate: float = 4.0) -> jax.Array:
    """scipy.ndimage.gaussian_filter equivalent.

    ``sigma`` is a scalar (all axes) or a per-axis sequence; axes with
    sigma <= 0 are untouched (scipy treats sigma=0 as identity).
    """
    if np.isscalar(sigma):
        sigmas = [float(sigma)] * x.ndim
    else:
        sigmas = [float(s) for s in sigma]
        if len(sigmas) != x.ndim:
            raise ValueError(f"sigma has {len(sigmas)} entries for {x.ndim}-d input")
    for axis, s in enumerate(sigmas):
        if s > 0:
            x = _conv1d_along(x, _gaussian_kernel1d(s, truncate), axis, mode)
    return x


__all__ = ["gaussian_blur"]
