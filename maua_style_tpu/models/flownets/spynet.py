"""SPyNet — Spatial Pyramid Network for optical flow (Ranjan & Black 2017),
the reference's simplest flow estimator (flow.py:52-57 via sniklaus/spynet).

Coarse-to-fine residual pyramid: at each of 6 levels a 5-layer 7x7 conv
module G_k refines the upsampled flow given [img1, warp(img2, flow_up),
flow_up] (8 input channels -> 32 -> 64 -> 32 -> 16 -> 2).  Images are
ImageNet-normalised RGB in [0, 1].  The whole pyramid is one jitted XLA
program; each level's warp is the shared grid_sample op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.resize import resize_bilinear
from .common import backward_warp, conv, init_conv_params, upsample_flow2x

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)

N_LEVELS = 6


def _level_layout(level: int):
    return [
        (f"level{level}/conv1", 8, 32, 7),
        (f"level{level}/conv2", 32, 64, 7),
        (f"level{level}/conv3", 64, 32, 7),
        (f"level{level}/conv4", 32, 16, 7),
        (f"level{level}/conv5", 16, 2, 7),
    ]


class SPyNet:
    name = "spynet"

    def __init__(self, params: dict | None = None, seed: int = 0):
        if params is None:
            key = jax.random.PRNGKey(seed)
            params = {}
            for level in range(N_LEVELS):
                key, sub = jax.random.split(key)
                params.update(init_conv_params(_level_layout(level), sub))
        self.params = params
        self._jit = jax.jit(self._forward)

    @staticmethod
    def _g_module(params, level: int, x: jax.Array) -> jax.Array:
        for i in range(1, 5):
            x = jax.nn.relu(conv(params, f"level{level}/conv{i}", x))
        return conv(params, f"level{level}/conv5", x)

    def _forward(self, params, im1: jax.Array, im2: jax.Array) -> jax.Array:
        """im1, im2: (B, H, W, 3) RGB in [0,1]; H, W multiples of 2**(N_LEVELS-1).
        Returns (B, H, W, 2) flow in pixels."""
        im1 = (im1 - _MEAN) / _STD
        im2 = (im2 - _MEAN) / _STD

        pyr1, pyr2 = [im1], [im2]
        for _ in range(N_LEVELS - 1):
            h, w = pyr1[-1].shape[1] // 2, pyr1[-1].shape[2] // 2
            pyr1.append(resize_bilinear(pyr1[-1], size=(h, w)))
            pyr2.append(resize_bilinear(pyr2[-1], size=(h, w)))

        b = im1.shape[0]
        h0, w0 = pyr1[-1].shape[1], pyr1[-1].shape[2]
        flow = jnp.zeros((b, h0, w0, 2), jnp.float32)
        for level in range(N_LEVELS):
            i1 = pyr1[N_LEVELS - 1 - level]
            i2 = pyr2[N_LEVELS - 1 - level]
            if level > 0:
                flow = upsample_flow2x(flow, size=(i1.shape[1], i1.shape[2]))
            warped = backward_warp(i2, flow)
            inp = jnp.concatenate([i1, warped, flow], axis=-1)
            flow = flow + self._g_module(params, level, inp)
        return flow

    def __call__(self, im1, im2):
        return self._jit(self.params, im1, im2)


def convert_spynet_torch(state_dict) -> dict:
    """Map a sniklaus pytorch-spynet state dict (netBasic modules, OIHW) onto
    our level{k}/conv{i} names."""
    import re

    params = {}
    convs = {}
    for key, val in state_dict.items():
        m = re.search(r"(?:module)?[Bb]asic\.?(\d+).*?(\d+)\.(weight|bias)", key)
        if m is None:
            continue
        level, idx, kind = int(m.group(1)), int(m.group(2)), m.group(3)
        convs.setdefault((level, idx), {})[kind] = np.asarray(val)
    # sequential conv indices 0,2,4,6,8 -> conv1..conv5
    for (level, idx), entry in convs.items():
        conv_n = idx // 2 + 1
        w = np.transpose(entry["weight"], (2, 3, 1, 0))
        params[f"level{level}/conv{conv_n}"] = {
            "w": jnp.asarray(w),
            "b": jnp.asarray(entry.get("bias", np.zeros(w.shape[-1], np.float32))),
        }
    return params


__all__ = ["SPyNet", "convert_spynet_torch", "N_LEVELS"]
