"""Optical-flow subsystem (reference: flow.py).

- ``get_flow_model(args)``: ensemble closure averaging the selected
  estimators' predictions (reference flow.py:33-74) — all JAX reimplementations
  (models/flownets), no submodule source patching needed.
- ``check_consistency``: forward/backward occlusion check with the same
  semantics as the reference (flow.py:77-137, the Ruder et al. consistency
  algorithm) but implemented as a single vectorised JAX program that runs on
  the TPU; ``get_flow_pair_model`` fuses it with the flow estimation itself so
  the whole per-frame-pair prepass is ONE device call.
- ``flow_to_image``: Middlebury colour-wheel visualisation (semantics of
  reference flow.py:140-265), vectorised over pixels and channels.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .ops.gaussian import gaussian_blur
from .ops.resize import resize_bilinear

_MODEL_CACHE: dict[str, object] = {}


def _get_net(name: str, allow_random: bool | None = None):
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
        from .models.registry import allow_random_weights

        if not allow_random_weights(allow_random):
            # random flow weights render a vid_img run with garbage temporal
            # targets; the reference hard-fails here too (ImportError on the
            # missing submodule, flow.py:33-74)
            raise FileNotFoundError(
                f"No checkpoint for flow model '{name}' (modelzoo/{name}.npz).\n"
                f"Convert the torch weights once with:\n"
                f"    python -m maua_style_tpu.models.flownets.convert {name} <torch-weights.pth(.tar)> modelzoo/{name}.npz\n"
                f"or pass --allow_random_weights to proceed with deterministic "
                f"random weights (flow output will be meaningless; tests only)."
            )
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
    allow = getattr(args, "allow_random_weights", False) or None  # False defers to the env-var policy
    nets = [_get_net(n, allow) for n in names]
    if not nets:
        raise ValueError("no flow models selected")

    def estimate(im1: np.ndarray, im2: np.ndarray) -> np.ndarray:
        return np.sum([predict(net, im1, im2) for net in nets], axis=0) / len(nets)

    return estimate


def _sample_border(field: jax.Array, px: jax.Array, py: jax.Array) -> jax.Array:
    """Bilinear sample of an (H, W, C) field at float pixel coords, clamping
    taps to the border.  px/py are (H, W)."""
    h, w = field.shape[:2]
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    tx = (px - x0)[..., None]
    ty = (py - y0)[..., None]

    def tap(yi, xi):
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        return field[yc, xc]

    top = tap(y0, x0) * (1 - tx) + tap(y0, x0 + 1) * tx
    bot = tap(y0 + 1, x0) * (1 - tx) + tap(y0 + 1, x0 + 1) * tx
    return top * (1 - ty) + bot * ty


def _forward_diff_energy(f: jax.Array) -> jax.Array:
    """Sum of squared forward differences of a flow field along both image
    axes (zero-padded past the last row/column, i.e. the final difference is
    taken against 0)."""
    dx = jnp.concatenate([f[:, 1:] - f[:, :-1], -f[:, -1:]], axis=1)
    dy = jnp.concatenate([f[1:] - f[:-1], -f[-1:]], axis=0)
    return jnp.sum(dx * dx + dy * dy, axis=-1)


def _reliability(fwd: jax.Array, bwd: jax.Array) -> jax.Array:
    """Occlusion/reliability map in [0, 1] for warping *along* ``fwd``.

    Same decision rule as the reference (flow.py:77-137, Ruder et al. 2016
    artistic-video consistency check), as one fused device program:
      * round-trip error ||fwd + bwd(p + fwd)||² over a motion-dependent
        threshold marks occlusions (-1, so the later blur bleeds them outward)
      * pixels displaced out of frame are unreliable (0)
      * motion boundaries — large local flow gradients — are unreliable (0)
      * gaussian blur (sigma 5) then clip to [0, 1].
    Flow components are (x, y); coordinates never leave the device.
    """
    fwd = fwd.astype(jnp.float32)
    bwd = bwd.astype(jnp.float32)
    h, w = fwd.shape[:2]
    px = jnp.arange(w, dtype=jnp.float32)[None, :] + fwd[..., 0]
    py = jnp.arange(h, dtype=jnp.float32)[:, None] + fwd[..., 1]

    bwd_at = _sample_border(bwd, jnp.clip(px, 0, w - 2), jnp.clip(py, 0, h - 2))
    roundtrip = fwd + bwd_at
    err = jnp.sum(roundtrip * roundtrip, axis=-1)
    occ_thresh = 0.01 * jnp.sum(bwd_at * bwd_at + fwd * fwd, axis=-1) + 0.5
    rel = jnp.where(err >= occ_thresh, -1.0, 1.0)

    in_frame = (px >= 0) & (py >= 0) & (px < w - 1) & (py < h - 1)
    rel = jnp.where(in_frame, rel, 0.0)

    edge_thresh = 0.01 * jnp.sum(fwd * fwd, axis=-1) + 0.002
    at_edge = _forward_diff_energy(fwd) > edge_thresh
    rel = jnp.where(at_edge & (rel != -1.0), 0.0, rel)

    return jnp.clip(gaussian_blur(rel, 5.0), 0.0, 1.0)


_CONSISTENCY_JIT = None


def check_consistency(flow1: np.ndarray, flow2: np.ndarray) -> np.ndarray:
    """Forward-backward consistency -> reliability map in [0, 1] (see
    ``_reliability``; numpy in/out convenience wrapper, device compute)."""
    global _CONSISTENCY_JIT
    if _CONSISTENCY_JIT is None:
        _CONSISTENCY_JIT = jax.jit(_reliability)
    return np.asarray(_CONSISTENCY_JIT(jnp.asarray(flow1), jnp.asarray(flow2)))


def get_flow_pair_model(args):
    """Fused per-frame-pair prepass: ONE jitted device program computing
    (forward flow, backward flow, forward reliability, backward reliability)
    for the selected ensemble — replaces four eager calls + host consistency
    math per pair (reference load.py:155-169 structure)."""
    names = [n.strip() for n in str(args.flow_models).split(",") if n.strip()]
    allow = getattr(args, "allow_random_weights", False) or None  # False defers to the env-var policy
    nets = [_get_net(n, allow) for n in names]
    if not nets:
        raise ValueError("no flow models selected")
    cache: dict[tuple, object] = {}

    def _runner_for(h: int, w: int):
        # one jitted program per (H, W); leading dim is the PAIR batch, so a
        # whole video's prepass is a handful of device calls, not one per pair
        if (h, w) in cache:
            return cache[(h, w)]
        h64 = max(64, int(np.ceil(h / 64)) * 64)
        w64 = max(64, int(np.ceil(w / 64)) * 64)

        def ensemble(a, b):  # (B, H, W, 3) uint8-ish
            t1 = resize_bilinear(a.astype(jnp.float32) / 255.0, size=(h64, w64))
            t2 = resize_bilinear(b.astype(jnp.float32) / 255.0, size=(h64, w64))
            acc = 0.0
            for net in nets:
                acc = acc + resize_bilinear(net._forward(net.params, t1, t2), size=(h, w))
            return acc * jnp.asarray([w / w64, h / h64], jnp.float32) / len(nets)

        def run(a, b):
            fwd = ensemble(a, b)
            bwd = ensemble(b, a)
            rel = jax.vmap(_reliability)
            return fwd, bwd, rel(fwd, bwd), rel(bwd, fwd)

        cache[(h, w)] = jax.jit(run)
        return cache[(h, w)]

    def pair(im1: np.ndarray, im2: np.ndarray):
        run = _runner_for(*im1.shape[:2])
        out = run(jnp.asarray(im1)[None], jnp.asarray(im2)[None])
        return tuple(np.asarray(o)[0] for o in out)

    def batched(ims1: np.ndarray, ims2: np.ndarray):
        """(B, H, W, 3) stacks -> (fwd, bwd, fwd_rel, bwd_rel) (B, ...) maps."""
        run = _runner_for(*ims1.shape[1:3])
        out = run(jnp.asarray(ims1), jnp.asarray(ims2))
        return tuple(np.asarray(o) for o in out)

    pair.batched = batched
    return pair


# ---------------------------------------------------------------------------
# Middlebury flow visualisation (semantics of reference flow.py:140-265)

_WHEEL_ANCHORS = np.array(
    # red -> yellow -> green -> cyan -> blue -> magenta -> red
    [[255, 0, 0], [255, 255, 0], [0, 255, 0], [0, 255, 255], [0, 0, 255], [255, 0, 255], [255, 0, 0]],
    dtype=np.float64,
)
_WHEEL_SEGMENT_LENGTHS = (15, 6, 4, 11, 13, 6)


def make_color_wheel() -> np.ndarray:
    """Middlebury colour wheel: six hue segments of uneven length stepping
    between the primary/secondary RGB anchors (integer ramps)."""
    rows = []
    for i, length in enumerate(_WHEEL_SEGMENT_LENGTHS):
        a, b = _WHEEL_ANCHORS[i], _WHEEL_ANCHORS[i + 1]
        t = np.arange(length, dtype=np.float64)[:, None]
        rows.append(a + np.sign(b - a) * np.floor(np.abs(b - a) * t / length))
    return np.concatenate(rows, axis=0)


def flow_to_image(flow: np.ndarray) -> np.ndarray:
    """Flow -> Middlebury colour image (uint8): hue from direction via the
    colour wheel, saturation from magnitude (normalised to the frame max)."""
    u = flow[..., 0].astype(np.float64)
    v = flow[..., 1].astype(np.float64)
    unknown = (~np.isfinite(u)) | (~np.isfinite(v)) | (np.abs(u) > 1e7) | (np.abs(v) > 1e7)
    u = np.where(unknown, 0.0, u)
    v = np.where(unknown, 0.0, v)

    scale = max(np.max(np.hypot(u, v)), -1.0) + np.finfo(float).eps
    u, v = u / scale, v / scale
    rad = np.hypot(u, v)[..., None]

    wheel = make_color_wheel() / 255.0
    ncols = wheel.shape[0]
    pos = (np.arctan2(-v, -u) / np.pi + 1.0) / 2.0 * (ncols - 1)  # [0, ncols-1]
    k0 = np.floor(pos).astype(np.int64)
    frac = (pos - k0)[..., None]
    col = (1.0 - frac) * wheel[k0] + frac * wheel[(k0 + 1) % ncols]
    col = np.where(rad <= 1.0, 1.0 - rad * (1.0 - col), 0.75 * col)
    col = np.where(unknown[..., None], 0.0, col)
    return np.floor(255.0 * col).astype(np.uint8)


def compute_color(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Colour-code pre-normalised flow components (compat shim over
    ``flow_to_image``'s vectorised core, without re-normalisation)."""
    rad = np.hypot(u, v)[..., None]
    wheel = make_color_wheel() / 255.0
    ncols = wheel.shape[0]
    nan_mask = np.isnan(u) | np.isnan(v)
    u = np.where(nan_mask, 0.0, u)
    v = np.where(nan_mask, 0.0, v)
    pos = (np.arctan2(-v, -u) / np.pi + 1.0) / 2.0 * (ncols - 1)
    k0 = np.floor(pos).astype(np.int64)
    frac = (pos - k0)[..., None]
    col = (1.0 - frac) * wheel[k0] + frac * wheel[(k0 + 1) % ncols]
    col = np.where(np.nan_to_num(rad) <= 1.0, 1.0 - np.nan_to_num(rad) * (1.0 - col), 0.75 * col)
    col = np.where(nan_mask[..., None], 0.0, col)
    return np.floor(255.0 * col)


__all__ = [
    "get_flow_model",
    "get_flow_pair_model",
    "predict",
    "check_consistency",
    "flow_to_image",
    "compute_color",
    "make_color_wheel",
]
