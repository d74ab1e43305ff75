"""Middlebury .flo optical-flow file IO + warp-map construction
(reference: load.py:191-231)."""

from __future__ import annotations

import numpy as np

FLO_MAGIC = 202021.25


def read_flo(filename: str) -> np.ndarray:
    """Read a Middlebury .flo file -> (H, W, 2) float32 (u, v) in pixels."""
    with open(filename, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if len(magic) == 0 or magic[0] != np.float32(FLO_MAGIC):
            raise ValueError(f"Magic number incorrect. Invalid .flo file: {filename}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        flow = np.fromfile(f, np.float32, count=2 * w * h)
    return np.resize(flow, (h, w, 2))


def write_flo(flow: np.ndarray, filename: str) -> None:
    """Write (H, W, 2) float32 flow as Middlebury .flo (reference load.py:221-231)."""
    flow = np.asarray(flow, np.float32)
    h, w = flow.shape[:2]
    with open(filename, "wb") as f:
        np.array([FLO_MAGIC], np.float32).tofile(f)
        np.array([w], np.int32).tofile(f)
        np.array([h], np.int32).tofile(f)
        flow.tofile(f)


def flow_warp_map(filename_or_flow, current_size: tuple[int, int], smooth_sigma: float = 5.0) -> np.ndarray:
    """.flo (or raw flow array) -> (1, H, W, 2) grid_sample map in [-1, 1]
    (reference load.py:191-214): flow normalised by (W, H), gaussian-smoothed
    (sigma 5), added to the identity meshgrid, bilinearly resized.
    """
    import scipy.ndimage

    from ..ops.resize import resize_bilinear_np

    flow = read_flo(filename_or_flow) if isinstance(filename_or_flow, str) else np.asarray(filename_or_flow)
    h, w = flow.shape[:2]
    flow = flow.astype(np.float32).copy()
    flow[:, :, 0] /= w
    flow[:, :, 1] /= h
    # host-side like the reference (load.py:206); per-frame eager device ops
    # through the TPU tunnel cost far more than the filter itself
    flow = scipy.ndimage.gaussian_filter(flow, [smooth_sigma, smooth_sigma, 0])
    gx, gy = np.meshgrid(np.linspace(-1, 1, w), np.linspace(-1, 1, h))
    warp = (np.stack([gx, gy], axis=-1) + flow)[None].astype(np.float32)
    if tuple(current_size) != (h, w):
        warp = resize_bilinear_np(warp, size=tuple(current_size))
    return warp


def reliable_flow_weighting(filename: str) -> np.ndarray:
    """Load a reliability PNG -> (1, H, W, 1) float32 in [0, 1]
    (reference load.py:217-218)."""
    from PIL import Image

    arr = np.asarray(Image.open(filename).convert("L"), np.float32) / 255.0
    return arr[None, :, :, None]


__all__ = ["read_flo", "write_flo", "flow_warp_map", "reliable_flow_weighting"]
