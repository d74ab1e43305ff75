"""Optical-flow subsystem (reference: flow.py).

- ``get_flow_model(args)``: ensemble closure averaging the selected
  estimators' predictions (reference flow.py:33-74) — all JAX reimplementations
  (models/flownets), no submodule source patching needed.
- ``check_consistency``: Ruder-style forward/backward occlusion check
  (reference flow.py:77-137), vectorised in numpy.
- ``flow_to_image``: Middlebury colour-wheel visualisation
  (reference flow.py:140-265).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .ops.resize import resize_bilinear

_MODEL_CACHE: dict[str, object] = {}


def _get_net(name: str):
    if name in _MODEL_CACHE:
        return _MODEL_CACHE[name]
    if name == "spynet":
        from .models.flownets import SPyNet as Net
    elif name == "pwc":
        from .models.flownets import PWCNet as Net
    elif name == "unflow":
        from .models.flownets import UnFlow as Net
    elif name == "liteflownet":
        from .models.flownets import LiteFlowNet as Net
    else:
        raise ValueError(f"unknown flow model {name!r}")
    import os

    params = None
    for cand in (f"modelzoo/{name}.npz",):
        if os.path.exists(cand):
            data = np.load(cand)
            params = {}
            for key in data.files:
                layer, kind = key.rsplit("/", 1)
                params.setdefault(layer, {})[kind] = jnp.asarray(data[key])
            break
    if params is None:
        print(f"Warning: no checkpoint for flow model '{name}' (modelzoo/{name}.npz); using deterministic init.")
    net = Net(params)
    _MODEL_CACHE[name] = net
    return net


_PREDICT_CACHE: dict[tuple, object] = {}


def predict(net, im1: np.ndarray, im2: np.ndarray) -> np.ndarray:
    """Estimate flow between two HWC uint8/float RGB frames -> (H, W, 2).

    Handles the nets' stride requirements by resizing to multiples of 64 and
    rescaling flow magnitudes back (what the reference's submodule run.py
    scripts did internally; reference flow.py:24-30).  The whole path
    (resize -> net -> resize -> magnitude rescale) is ONE jitted program —
    eager ops through the axon tunnel are pathologically slow.
    """
    import jax

    h, w = im1.shape[:2]
    h64 = max(64, int(np.ceil(h / 64)) * 64)
    w64 = max(64, int(np.ceil(w / 64)) * 64)
    key = (id(net), h, w)
    if key not in _PREDICT_CACHE:

        def run(a, b):
            t1 = resize_bilinear(a.astype(jnp.float32)[None] / 255.0, size=(h64, w64))
            t2 = resize_bilinear(b.astype(jnp.float32)[None] / 255.0, size=(h64, w64))
            flow = net._forward(net.params, t1, t2)
            flow = resize_bilinear(flow, size=(h, w))
            return flow[0] * jnp.asarray([w / w64, h / h64], jnp.float32)

        _PREDICT_CACHE[key] = jax.jit(run)
    return np.asarray(_PREDICT_CACHE[key](jnp.asarray(im1), jnp.asarray(im2)))


def get_flow_model(args):
    """Averaging ensemble over the selected models (reference flow.py:74)."""
    names = [n.strip() for n in str(args.flow_models).split(",") if n.strip()]
    nets = [_get_net(n) for n in names]
    if not nets:
        raise ValueError("no flow models selected")

    def estimate(im1: np.ndarray, im2: np.ndarray) -> np.ndarray:
        return np.sum([predict(net, im1, im2) for net in nets], axis=0) / len(nets)

    return estimate


def check_consistency(flow1: np.ndarray, flow2: np.ndarray) -> np.ndarray:
    """Forward-backward consistency -> reliability map in [0, 1]
    (reference flow.py:77-137): round-trip coordinate error vs a
    motion-dependent threshold marks occlusions (-1, blurred outward),
    out-of-frame pixels are 0, and motion edges (large flow gradients) 0."""
    import scipy.ndimage

    flow1 = np.flip(flow1, axis=2)  # to (y, x) component order
    flow2 = np.flip(flow2, axis=2)
    h, w, _ = flow1.shape

    orig_coord = np.flip(np.mgrid[:w, :h], 0).T
    warp_coord = orig_coord + flow1

    warp_inb = np.zeros_like(warp_coord)
    warp_inb[:, :, 0] = np.clip(warp_coord[:, :, 0], 0, h - 2)
    warp_inb[:, :, 1] = np.clip(warp_coord[:, :, 1], 0, w - 2)
    floor = np.floor(warp_inb).astype(np.int64)

    alpha = warp_inb - floor
    f00 = flow2[floor[:, :, 0], floor[:, :, 1]]
    f01 = flow2[floor[:, :, 0], floor[:, :, 1] + 1]
    f10 = flow2[floor[:, :, 0] + 1, floor[:, :, 1]]
    f11 = flow2[floor[:, :, 0] + 1, floor[:, :, 1] + 1]
    blend0 = (1 - alpha[:, :, 1, None]) * f00 + alpha[:, :, 1, None] * f01
    blend1 = (1 - alpha[:, :, 1, None]) * f10 + alpha[:, :, 1, None] * f11
    flow2_at_warp = (1 - alpha[:, :, 0, None]) * blend0 + alpha[:, :, 0, None] * blend1

    rewarp = warp_coord + flow2_at_warp
    squared_diff = np.sum((rewarp - orig_coord) ** 2, axis=2)
    threshold = 0.01 * np.sum(flow2_at_warp ** 2 + flow1 ** 2, axis=2) + 0.5
    reliable = np.where(squared_diff >= threshold, -1.0, 1.0)

    out_of_frame = (
        (warp_coord[:, :, 0] < 0)
        | (warp_coord[:, :, 1] < 0)
        | (warp_coord[:, :, 0] >= h - 1)
        | (warp_coord[:, :, 1] >= w - 1)
    )
    reliable = np.where(out_of_frame, 0.0, reliable)

    dx = np.diff(flow1, axis=1, append=0)
    dy = np.diff(flow1, axis=0, append=0)
    motion_edge = np.sum(dx ** 2 + dy ** 2, axis=2)
    motion_threshold = 0.01 * np.sum(flow1 ** 2, axis=2) + 0.002
    reliable = np.where((motion_edge > motion_threshold) & (reliable != -1), 0.0, reliable)

    reliable = scipy.ndimage.gaussian_filter(reliable, [5, 5])
    return reliable.clip(0, 1)


# ---------------------------------------------------------------------------
# Middlebury flow visualisation (reference flow.py:140-265)


def make_color_wheel() -> np.ndarray:
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros([ncols, 3])
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(0, RY) / RY)
    col += RY
    wheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(0, YG) / YG)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = np.floor(255 * np.arange(0, GC) / GC)
    col += GC
    wheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(0, CB) / CB)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = np.floor(255 * np.arange(0, BM) / BM)
    col += BM
    wheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(0, MR) / MR)
    wheel[col : col + MR, 0] = 255
    return wheel


def compute_color(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    h, w = u.shape
    img = np.zeros([h, w, 3])
    nan_idx = np.isnan(u) | np.isnan(v)
    u = np.where(nan_idx, 0, u)
    v = np.where(nan_idx, 0, v)

    wheel = make_color_wheel()
    ncols = wheel.shape[0]
    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1) + 1
    k0 = np.floor(fk).astype(int)
    k1 = k0 + 1
    k1[k1 == ncols + 1] = 1
    f = fk - k0

    for i in range(wheel.shape[1]):
        tmp = wheel[:, i]
        col0 = tmp[k0 - 1] / 255
        col1 = tmp[k1 - 1] / 255
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] *= 0.75
        img[:, :, i] = np.uint8(np.floor(255 * col * (1 - nan_idx)))
    return img


def flow_to_image(flow: np.ndarray) -> np.ndarray:
    """Flow -> Middlebury colour image (uint8)."""
    UNKNOWN = 1e7
    u = flow[:, :, 0].copy()
    v = flow[:, :, 1].copy()
    unknown = (np.abs(u) > UNKNOWN) | (np.abs(v) > UNKNOWN)
    u[unknown] = 0
    v[unknown] = 0
    rad = np.sqrt(u ** 2 + v ** 2)
    maxrad = max(-1, np.max(rad))
    u = u / (maxrad + np.finfo(float).eps)
    v = v / (maxrad + np.finfo(float).eps)
    img = compute_color(u, v)
    img[np.repeat(unknown[:, :, None], 3, axis=2)] = 0
    return np.uint8(img)


__all__ = ["get_flow_model", "predict", "check_consistency", "flow_to_image", "compute_color", "make_color_wheel"]
