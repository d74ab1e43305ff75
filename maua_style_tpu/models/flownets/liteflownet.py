"""LiteFlowNet (Hui et al. 2018) — the reference's fourth flow estimator
(flow.py:59-65 via sniklaus/pytorch-liteflownet, whose correlation layer is a
CuPy CUDA kernel).

Structure follows the paper: a 6-level NetC feature encoder and a cascaded
NetE decoder where each level runs
- **M** (descriptor matching): cost volume between f1 and the flow-warped f2
  (Pallas correlation kernel) -> conv stack -> residual flow,
- **S** (sub-pixel refinement): convs over [f1, warped f2, flow] -> residual,
- **R** (regularisation): a conv stack producing per-pixel weights that
  locally average the flow (implemented as a softmax-weighted 3x3
  neighbourhood blend — the feature-driven local convolution of the paper).

Inference-only, NHWC, RGB in [0,1]; flow magnitudes follow the paper's
per-level scaling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.correlation import correlation
from ...ops.resize import resize_bilinear
from .common import backward_warp, conv, init_conv_params, leaky_relu

ENC_CH = [3, 32, 32, 64, 96, 128, 192]
LEVELS = [2, 3, 4, 5, 6]  # decode from coarse 6 to fine 2
FLOW_SCALE = {6: 0.625, 5: 1.25, 4: 2.5, 3: 5.0, 2: 10.0}


def _layout():
    layout = []
    for lvl in range(1, 7):
        cin, cout = ENC_CH[lvl - 1], ENC_CH[lvl]
        layout += [
            (f"enc{lvl}/conv1", cin, cout, 3),
            (f"enc{lvl}/conv2", cout, cout, 3),
        ]
    for lvl in LEVELS:
        c = ENC_CH[lvl]
        layout += [
            (f"m{lvl}/conv1", 49, 96, 3),
            (f"m{lvl}/conv2", 96, 64, 3),
            (f"m{lvl}/flow", 64, 2, 3),
            (f"s{lvl}/conv1", 2 * c + 2, 96, 3),
            (f"s{lvl}/conv2", 96, 64, 3),
            (f"s{lvl}/flow", 64, 2, 3),
            (f"r{lvl}/conv1", c + 2, 64, 3),
            (f"r{lvl}/conv2", 64, 32, 3),
            (f"r{lvl}/weights", 32, 9, 3),
        ]
    return layout


class LiteFlowNet:
    name = "liteflownet"

    def __init__(self, params: dict | None = None, seed: int = 0):
        if params is None:
            params = init_conv_params(_layout(), jax.random.PRNGKey(seed))
        self.params = params
        self._jit = jax.jit(self._forward)

    @staticmethod
    def _encode(params, x):
        feats = [x]
        for lvl in range(1, 7):
            x = leaky_relu(conv(params, f"enc{lvl}/conv1", x, stride=2))
            x = leaky_relu(conv(params, f"enc{lvl}/conv2", x))
            feats.append(x)
        return feats

    @staticmethod
    def _regularize(params, lvl, f1, flow):
        """Feature-driven local flow smoothing: predicted 3x3 weights
        softmax-blend the flow neighbourhood."""
        x = jnp.concatenate([f1, flow], axis=-1)
        x = leaky_relu(conv(params, f"r{lvl}/conv1", x))
        x = leaky_relu(conv(params, f"r{lvl}/conv2", x))
        w = jax.nn.softmax(conv(params, f"r{lvl}/weights", x), axis=-1)  # (B,H,W,9)
        fp = jnp.pad(flow, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        h, wd = flow.shape[1], flow.shape[2]
        out = 0.0
        k = 0
        for dy in range(3):
            for dx in range(3):
                out = out + w[..., k : k + 1] * jax.lax.slice(fp, (0, dy, dx, 0), (fp.shape[0], dy + h, dx + wd, 2))
                k += 1
        return out

    def _forward(self, params, im1, im2):
        f1s = self._encode(params, im1)
        f2s = self._encode(params, im2)

        b = im1.shape[0]
        h6, w6 = f1s[6].shape[1], f1s[6].shape[2]
        flow = jnp.zeros((b, h6, w6, 2), jnp.float32)
        for lvl in reversed(LEVELS):
            f1, f2 = f1s[lvl], f2s[lvl]
            if flow.shape[1] != f1.shape[1]:
                flow = resize_bilinear(flow, size=(f1.shape[1], f1.shape[2])) * 2.0
            # M: matching unit
            warped = backward_warp(f2, flow * FLOW_SCALE[lvl])
            corr = leaky_relu(correlation(f1, warped, 3))
            m = leaky_relu(conv(params, f"m{lvl}/conv1", corr))
            m = leaky_relu(conv(params, f"m{lvl}/conv2", m))
            flow = flow + conv(params, f"m{lvl}/flow", m)
            # S: subpixel unit
            warped = backward_warp(f2, flow * FLOW_SCALE[lvl])
            s = jnp.concatenate([f1, warped, flow], axis=-1)
            s = leaky_relu(conv(params, f"s{lvl}/conv1", s))
            s = leaky_relu(conv(params, f"s{lvl}/conv2", s))
            flow = flow + conv(params, f"s{lvl}/flow", s)
            # R: regularisation unit
            flow = self._regularize(params, lvl, f1, flow)

        h, w = im1.shape[1], im1.shape[2]
        return 20.0 * resize_bilinear(flow, size=(h, w)) / 4.0

    def __call__(self, im1, im2):
        return self._jit(self.params, im1, im2)


__all__ = ["LiteFlowNet"]
