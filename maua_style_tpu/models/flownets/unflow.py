"""UnFlow (Meister et al. 2018) — the reference's default flow model for
video (config/args-vid.json "flow_models"; flow.py:36-42 via
sniklaus/pytorch-unflow).

UnFlow's network is FlowNetC: siamese 3-conv feature towers, the classic
441-channel cost volume (max displacement 20 sampled every 2 px at 1/8
resolution via the shared Pallas correlation kernel, plus a 1x1 redirect conv
on the first tower), a contracting conv stack, and an expanding decoder with
per-level flow predictions and deconv skip connections.  Channel counts match
the published FlowNetC checkpoints exactly (conv3_1 takes 441 + 32 = 473), so
the sniklaus network-css.pytorch state dict converts onto this net (the C part
of the CSS stack; the two refinement FlowNetS nets are unconsumed leftovers).
Inference-only, NHWC, RGB in [0, 1]; final flow is the level-2 prediction
upsampled to input size (x20 magnitude convention shared with FlowNet-family
checkpoints).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.correlation import correlation
from ...ops.resize import resize_bilinear
from .common import conv, deconv, init_conv_params, leaky_relu


def _layout():
    layout = [
        # shared feature tower (applied to both images)
        ("feat/conv1", 3, 64, 7),
        ("feat/conv2", 64, 128, 5),
        ("feat/conv3", 128, 256, 5),
        ("redir", 256, 32, 1),
        # contracting part after correlation: 441 + 32 channels
        ("conv3_1", 473, 256, 3),
        ("conv4", 256, 512, 3),
        ("conv4_1", 512, 512, 3),
        ("conv5", 512, 512, 3),
        ("conv5_1", 512, 512, 3),
        ("conv6", 512, 1024, 3),
        ("conv6_1", 1024, 1024, 3),
        # expanding part
        ("flow6", 1024, 2, 3),
        ("deconv5", 1024, 512, 4),
        ("upflow6", 2, 2, 4),
        ("flow5", 512 + 512 + 2, 2, 3),
        ("deconv4", 512 + 512 + 2, 256, 4),
        ("upflow5", 2, 2, 4),
        ("flow4", 512 + 256 + 2, 2, 3),
        ("deconv3", 512 + 256 + 2, 128, 4),
        ("upflow4", 2, 2, 4),
        ("flow3", 256 + 128 + 2, 2, 3),
        ("deconv2", 256 + 128 + 2, 64, 4),
        ("upflow3", 2, 2, 4),
        ("flow2", 128 + 64 + 2, 2, 3),
    ]
    return layout


class UnFlow:
    name = "unflow"

    def __init__(self, params: dict | None = None, seed: int = 0):
        if params is None:
            params = init_conv_params(_layout(), jax.random.PRNGKey(seed))
        self.params = params
        self._jit = jax.jit(self._forward)

    @staticmethod
    def _tower(params, x):
        c1 = leaky_relu(conv(params, "feat/conv1", x, stride=2))
        c2 = leaky_relu(conv(params, "feat/conv2", c1, stride=2))
        c3 = leaky_relu(conv(params, "feat/conv3", c2, stride=2))
        return c1, c2, c3

    def _forward(self, params, im1, im2):
        c1a, c2a, c3a = self._tower(params, im1)
        _, _, c3b = self._tower(params, im2)

        corr = leaky_relu(correlation(c3a, c3b, 20, stride=2))
        redir = leaky_relu(conv(params, "redir", c3a))
        x = jnp.concatenate([corr, redir], axis=-1)

        c3_1 = leaky_relu(conv(params, "conv3_1", x))
        c4 = leaky_relu(conv(params, "conv4_1", leaky_relu(conv(params, "conv4", c3_1, stride=2))))
        c5 = leaky_relu(conv(params, "conv5_1", leaky_relu(conv(params, "conv5", c4, stride=2))))
        c6 = leaky_relu(conv(params, "conv6_1", leaky_relu(conv(params, "conv6", c5, stride=2))))

        flow6 = conv(params, "flow6", c6)
        x5 = jnp.concatenate([c5, leaky_relu(deconv(params, "deconv5", c6)), deconv(params, "upflow6", flow6)], -1)
        flow5 = conv(params, "flow5", x5)
        x4 = jnp.concatenate([c4, leaky_relu(deconv(params, "deconv4", x5)), deconv(params, "upflow5", flow5)], -1)
        flow4 = conv(params, "flow4", x4)
        x3 = jnp.concatenate([c3_1, leaky_relu(deconv(params, "deconv3", x4)), deconv(params, "upflow4", flow4)], -1)
        flow3 = conv(params, "flow3", x3)
        x2 = jnp.concatenate([c2a, leaky_relu(deconv(params, "deconv2", x3)), deconv(params, "upflow3", flow3)], -1)
        flow2 = conv(params, "flow2", x2)

        h, w = im1.shape[1], im1.shape[2]
        return 20.0 * resize_bilinear(flow2, size=(h, w)) / 4.0

    def __call__(self, im1, im2):
        return self._jit(self.params, im1, im2)


__all__ = ["UnFlow"]
