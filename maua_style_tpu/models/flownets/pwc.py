"""PWC-Net (Sun et al. 2018) — pyramid, warping, cost volume.

The reference uses sniklaus/pytorch-pwc whose correlation layer is a CuPy
CUDA kernel (SURVEY.md §2.2); here the cost volume is the Pallas TPU kernel
in ops/correlation.py and everything else is XLA convs.

Structure mirrors the official net so torch checkpoints can be mapped:
- 6-level feature pyramid, 3 leaky-ReLU convs per level
  (channels 16, 32, 64, 96, 128, 196)
- top-down estimator at levels 6..2: correlate(f1, warp(f2, up_flow * s)),
  DenseNet-style estimator convs (128, 128, 96, 64, 32) + flow head,
  deconv up-flow/up-feat; warp scales (0.625, 1.25, 2.5, 5.0)
- dilated context network refines the finest flow
- final flow = 20 * resize(flow_2, input size)

Inputs are RGB in [0, 1]; H and W are padded to multiples of 64 by the
caller (flow.predict handles this).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.correlation import correlation
from ...ops.resize import resize_bilinear
from .common import backward_warp, conv, deconv, init_conv_params, leaky_relu

PYR_CHANNELS = [3, 16, 32, 64, 96, 128, 196]
DENSE = [128, 128, 96, 64, 32]
WARP_SCALE = {6: None, 5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}


def _decoder_in_channels(level: int) -> int:
    if level == 6:
        return 81
    return 81 + PYR_CHANNELS[level] + 2 + 2  # corr + features + up_flow + up_feat


def _layout():
    layout = []
    # feature extractor: 3 convs per level
    for lvl in range(1, 7):
        cin = PYR_CHANNELS[lvl - 1]
        cout = PYR_CHANNELS[lvl]
        layout += [
            (f"ext{lvl}/conv1", cin, cout, 3),
            (f"ext{lvl}/conv2", cout, cout, 3),
            (f"ext{lvl}/conv3", cout, cout, 3),
        ]
    # decoders
    for lvl in range(6, 1, -1):
        cin = _decoder_in_channels(lvl)
        c = cin
        for i, dc in enumerate(DENSE, 1):
            layout.append((f"dec{lvl}/conv{i}", c, dc, 3))
            c += dc
        layout.append((f"dec{lvl}/flow", c, 2, 3))
        if lvl > 2:
            layout.append((f"dec{lvl}/upflow", 2, 2, 4))
            layout.append((f"dec{lvl}/upfeat", c, 2, 4))
    # context network on the level-2 dense features
    cctx = _decoder_in_channels(2) + sum(DENSE)
    ctx_spec = [(128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1), (2, 1)]
    c = cctx
    for i, (co, _d) in enumerate(ctx_spec, 1):
        layout.append((f"ctx/conv{i}", c, co, 3))
        c = co
    return layout


CTX_DILATIONS = [1, 2, 4, 8, 16, 1, 1]


class PWCNet:
    name = "pwc"

    def __init__(self, params: dict | None = None, seed: int = 0):
        if params is None:
            params = init_conv_params(_layout(), jax.random.PRNGKey(seed))
        self.params = params
        self._jit = jax.jit(self._forward)

    @staticmethod
    def _pyramid(params, x):
        feats = []
        for lvl in range(1, 7):
            x = leaky_relu(conv(params, f"ext{lvl}/conv1", x, stride=2))
            x = leaky_relu(conv(params, f"ext{lvl}/conv2", x))
            x = leaky_relu(conv(params, f"ext{lvl}/conv3", x))
            feats.append(x)
        return feats  # levels 1..6

    def _forward(self, params, im1, im2):
        f1s = self._pyramid(params, im1)
        f2s = self._pyramid(params, im2)

        flow = None
        feat = None
        dense_feat = None
        for lvl in range(6, 1, -1):
            f1 = f1s[lvl - 1]
            f2 = f2s[lvl - 1]
            if lvl == 6:
                corr = leaky_relu(correlation(f1, f2, 4))
                x = corr
            else:
                up_flow = deconv(params, f"dec{lvl + 1}/upflow", flow)
                up_feat = deconv(params, f"dec{lvl + 1}/upfeat", dense_feat)
                warped = backward_warp(f2, up_flow * WARP_SCALE[lvl])
                corr = leaky_relu(correlation(f1, warped, 4))
                x = jnp.concatenate([corr, f1, up_flow, up_feat], axis=-1)
            for i in range(1, len(DENSE) + 1):
                out = leaky_relu(conv(params, f"dec{lvl}/conv{i}", x))
                x = jnp.concatenate([out, x], axis=-1)  # DenseNet-style feature growth
            dense_feat = x
            flow = conv(params, f"dec{lvl}/flow", x)

        # context refinement at level 2
        c = dense_feat
        for i, d in enumerate(CTX_DILATIONS, 1):
            c = conv(params, f"ctx/conv{i}", c, dilation=d)
            if i < len(CTX_DILATIONS):
                c = leaky_relu(c)
        flow = flow + c

        h, w = im1.shape[1], im1.shape[2]
        return 20.0 * resize_bilinear(flow, size=(h, w))

    def __call__(self, im1, im2):
        return self._jit(self.params, im1, im2)


def convert_pwc_torch(state_dict) -> dict:
    """Map a sniklaus pytorch-pwc state dict (netExtractor / netTwo..netSix
    decoders / netRefiner) onto our names.

    The published ``network-*.pytorch`` files carry the ORIGINAL ``module*``
    naming (sniklaus's run.py renames ``module``->``net`` at load time); both
    spellings are accepted.  His Decoder(L) owns the ``netUpflow``/``netUpfeat``
    transposed convs it applies to decoder L+1's outputs, so ``netFiv.netUpfeat``
    is our ``dec6/upfeat`` (the coarser level's upsampler) — level + 1, not
    level.  Every consumed weight's shape is checked against the layout so a
    drifted checkpoint fails loudly instead of mis-assigning.
    """
    import numpy as np
    import re

    state_dict = {k.replace("module", "net"): v for k, v in state_dict.items()}
    lvl_names = {"Six": 6, "Fiv": 5, "Fou": 4, "Thr": 3, "Two": 2, "One": 1}
    dense_names = {"netOne": 1, "netTwo": 2, "netThr": 3, "netFou": 4, "netFiv": 5}
    expect = {name: (cin, cout, k) for name, cin, cout, k in _layout()}
    params = {}

    def put(name, key, w, b):
        cin, cout, k = expect[name]
        want = (cin, cout, k, k) if k == 4 else (cout, cin, k, k)  # ConvTranspose stores (in, out, kh, kw)
        if tuple(w.shape) != want:
            raise ValueError(f"pwc checkpoint drift: {key} has shape {tuple(w.shape)}, {name} expects {want}")
        params[name] = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "b": jnp.asarray(b)}

    for key, val in state_dict.items():
        if not key.endswith(".weight"):
            continue
        w = np.asarray(val)
        b = np.asarray(state_dict.get(key[:-7] + ".bias", np.zeros(w.shape[0], np.float32)))
        m = re.match(r"netExtractor\.net(\w\w\w)\.(\d+)\.weight$", key)
        if m:
            lvl = lvl_names[m.group(1)]
            put(f"ext{lvl}/conv{int(m.group(2)) // 2 + 1}", key, w, b)
            continue
        m = re.match(r"net(\w\w\w)\.net(One|Two|Thr|Fou|Fiv|Six)\.(\d+)\.weight$", key)
        if m and m.group(1) in lvl_names:
            lvl = lvl_names[m.group(1)]
            part = "net" + m.group(2)
            if part in dense_names:
                put(f"dec{lvl}/conv{dense_names[part]}", key, w, b)
            else:  # netSix = the flow head
                put(f"dec{lvl}/flow", key, w, b)
            continue
        # bare ConvTranspose2d members (no sequential index): Decoder(L) owns the
        # upsamplers it applies to decoder L+1's flow/features -> our dec{L+1}/*
        m = re.match(r"net(\w\w\w)\.netUp(flow|feat)\.weight$", key)
        if m and m.group(1) in lvl_names:
            put(f"dec{lvl_names[m.group(1)] + 1}/up{m.group(2)}", key, w, b)
            continue
        m = re.match(r"netRefiner\.netMain\.(\d+)\.weight$", key)
        if m:
            put(f"ctx/conv{int(m.group(1)) // 2 + 1}", key, w, b)
    missing = [name for name, *_ in _layout() if name not in params]
    if missing:
        raise ValueError(f"pwc checkpoint did not cover layers: {missing}")
    return params


__all__ = ["PWCNet", "convert_pwc_torch"]
