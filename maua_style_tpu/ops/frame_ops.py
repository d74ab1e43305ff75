"""Device-side per-frame image ops for the fused video-frame program.

The vid_img frame loop (reference style.py:145-311) round-trips every frame
through the host for preprocessing, histogram matching and saving.  On a
TPU — especially a remotely-attached one — those transfers dominate the
per-frame cost, so the fused frame program does them in-graph:

- ``preprocess_u8``: uint8 RGB frame -> resized, Caffe-BGR mean-subtracted
  float (reference load.py:21-32 + the bilinear rescale of style.py:38-41).
- ``deprocess_to_u8``: pastiche -> displayable uint8 RGB (load.py:47-52);
  only this small uint8 image is transferred back per frame.
- ``match_histogram_device``: the PCA colour transfer of utils.py:96-151
  against per-scale precomputed style statistics (``style_hist_stats``).
  The per-frame covariance + 3x3 eigendecomposition run in-graph; unlike
  the host path there is no random numerical-guard jitter (the eps*I ridge
  alone regularises the 3x3 eigh — deterministic by design).

Host transfers per frame shrink from ~9 MB of float32 sync round trips to
~0.75 MB uint8 up + ~0.75 MB uint8 down (at 512²).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..io.image import CAFFE_MEAN
from .resize import resize_bilinear


def preprocess_u8(u8_hwc, size: tuple[int, int] | None = None, scale_factor: float | None = None):
    """(H, W, 3) uint8 RGB -> (1, h, w, 3) float32 BGR mean-subtracted.

    Mean subtraction commutes exactly with bilinear resampling (weights sum
    to 1), so resize-then-subtract equals the host's subtract-then-resize.
    """
    x = u8_hwc.astype(jnp.float32)[None]
    if size is not None or scale_factor is not None:
        x = resize_bilinear(x, size=size, scale_factor=scale_factor)
    return x[..., ::-1] - jnp.asarray(CAFFE_MEAN)


def deprocess_to_u8(x):
    """(1, H, W, 3) Caffe-BGR -> (H, W, 3) uint8 RGB (reference load.py:47-52:
    add mean, BGR->RGB, clamp to [0,1], byte-quantise)."""
    rgb = (x[0] + jnp.asarray(CAFFE_MEAN))[..., ::-1]
    rgb = jnp.clip(rgb / 255.0, 0.0, 1.0)
    return (rgb * 255.0 + 0.5).astype(jnp.uint8)


def style_hist_stats(
    source, eps: float = 1e-2, mode="avg", rng: np.random.Generator | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Per-scale style statistics for device histogram matching: (mu_s (3,),
    Qs (3, 3)) where Qs is the symmetric square root of the source channel
    covariance.  Host numpy — runs once per scale on one style image
    (semantics of ops.histogram.match_histogram's source side, including the
    reference's jitter guard, utils.py:123-124)."""
    src = np.asarray(source, np.float32)
    rng = rng or np.random.default_rng()
    frames = src.mean(axis=0, keepdims=True) if mode == "avg" else src[rng.integers(0, src.shape[0])][None]
    frames = frames + 1e-3 * rng.standard_normal(frames.shape).astype(np.float32)
    c = frames.shape[-1]
    mu = frames.reshape(-1, c).mean(axis=0)
    h = (frames.reshape(-1, c) - mu).T
    cov = h @ h.T / h.shape[1] + eps * np.eye(c, dtype=np.float32)
    eva, eve = np.linalg.eigh(cov)
    qs = (eve * np.sqrt(np.maximum(eva, 0.0))) @ eve.T
    return mu.astype(np.float32), qs.astype(np.float32)


def match_histogram_device(x, mu_s, qs, eps: float = 1e-2):
    """Recolour ``x`` (B, H, W, C) so its channel covariance matches the
    precomputed style stats: t' = Qs Qt^-1 (t - mu_t) + mu_s  (reference
    utils.py:127-137).  Qt^-1 comes from the in-graph 3x3 eigh of x's
    covariance; all heavy work is two (N, C) x (C, C) matmuls."""
    c = x.shape[-1]
    flat = x.reshape(-1, c).astype(jnp.float32)
    mu_t = flat.mean(axis=0)
    centred = flat - mu_t
    cov = centred.T @ centred / flat.shape[0] + eps * jnp.eye(c, dtype=jnp.float32)
    eva, eve = jnp.linalg.eigh(cov)
    # Qt = E sqrt(L) E^T  =>  Qt^-1 = E L^-1/2 E^T (eps ridge keeps L > 0)
    qt_inv = (eve / jnp.sqrt(jnp.maximum(eva, eps * 1e-3))) @ eve.T
    out = centred @ (qs @ qt_inv).T + jnp.asarray(mu_s)
    return out.reshape(x.shape).astype(x.dtype)


def warp_map_from_flow(flow, out_hw: tuple[int, int], smooth_sigma: float = 5.0):
    """(H, W, 2) raw pixel-unit flow -> (1, h, w, 2) grid_sample map in
    [-1, 1]; the in-graph equivalent of io.flo.flow_warp_map (reference
    load.py:191-214): normalise by (W, H), gaussian-smooth (sigma 5), add
    the identity meshgrid, bilinearly resize to the working resolution."""
    from .gaussian import gaussian_blur

    h, w = flow.shape[:2]
    f = flow.astype(jnp.float32) / jnp.asarray([w, h], jnp.float32)
    f = gaussian_blur(f, [smooth_sigma, smooth_sigma, 0])
    gx = jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32)
    gy = jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32)
    wm = (jnp.stack(jnp.meshgrid(gx, gy), axis=-1) + f)[None]
    if tuple(out_hw) != (h, w):
        wm = resize_bilinear(wm, size=tuple(out_hw))
    return wm


__all__ = [
    "preprocess_u8",
    "deprocess_to_u8",
    "style_hist_stats",
    "match_histogram_device",
    "warp_map_from_flow",
]
