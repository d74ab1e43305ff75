"""Checkpoint-converter parity for UnFlow and LiteFlowNet.

Torch replicas of the architectures (module definition order = our layout
order, but with scrambled names — the shape-ordered converter must not care)
run the same forward math; outputs must match the JAX nets run with the
converted weights.  This is the same oracle treatment spynet/pwc get via the
building-block tests (deconv/resize/correlation) plus it pins the full
decoder wiring.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from maua_style_tpu.models.flownets import UnFlow, LiteFlowNet
from maua_style_tpu.models.flownets.convert import (
    assign_by_shape,
    convert_liteflownet_torch,
    convert_unflow_torch,
)
from maua_style_tpu.models.flownets.unflow import _layout as unflow_layout
from maua_style_tpu.models.flownets.liteflownet import _layout as lfn_layout
from maua_style_tpu.models.flownets.liteflownet import FLOW_SCALE, LEVELS


def build_torch_stack(layout, seed=0):
    """nn.ModuleDict in layout order with deliberately unhelpful names."""
    torch.manual_seed(seed)
    mods = nn.ModuleDict()
    for i, (name, cin, cout, k) in enumerate(layout):
        if k == 4:
            mods[f"op{i}"] = nn.ConvTranspose2d(cin, cout, 4, stride=2, padding=1)
        else:
            mods[f"op{i}"] = nn.Conv2d(cin, cout, k, padding=k // 2)
    return mods, {name: mods[f"op{i}"] for i, (name, *_rest) in enumerate(layout)}


def torch_correlation(f1, f2, md, stride=1):
    b, c, h, w = f1.shape
    f2p = F.pad(f2, (md, md, md, md))
    outs = []
    for dy in range(0, 2 * md + 1, stride):
        for dx in range(0, 2 * md + 1, stride):
            outs.append((f1 * f2p[:, :, dy : dy + h, dx : dx + w]).sum(1) / c)
    return torch.stack(outs, dim=1)


def torch_backward_warp(x, flow):
    b, c, h, w = x.shape
    xs = (torch.arange(w, dtype=torch.float32) + 0.5) * (2.0 / w) - 1.0
    ys = (torch.arange(h, dtype=torch.float32) + 0.5) * (2.0 / h) - 1.0
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    base = torch.stack([gx, gy], dim=-1)[None]
    scale = torch.tensor([2.0 / w, 2.0 / h])
    grid = base + flow.permute(0, 2, 3, 1) * scale
    return F.grid_sample(x, grid, mode="bilinear", padding_mode="border", align_corners=False)


lrelu = lambda x: F.leaky_relu(x, 0.1)


def torch_unflow(by_name, im1, im2):
    def tower(x):
        c1 = lrelu(F.conv2d(x, by_name["feat/conv1"].weight, by_name["feat/conv1"].bias, 2, 3))
        c2 = lrelu(F.conv2d(c1, by_name["feat/conv2"].weight, by_name["feat/conv2"].bias, 2, 2))
        c3 = lrelu(F.conv2d(c2, by_name["feat/conv3"].weight, by_name["feat/conv3"].bias, 2, 2))
        return c1, c2, c3

    conv = lambda n, x, s=1: F.conv2d(x, by_name[n].weight, by_name[n].bias, s, by_name[n].kernel_size[0] // 2)
    deconv = lambda n, x: by_name[n](x)

    c1a, c2a, c3a = tower(im1)
    _, _, c3b = tower(im2)
    corr = lrelu(torch_correlation(c3a, c3b, 20, stride=2))  # FlowNetC 441-ch cost volume
    x = torch.cat([corr, lrelu(conv("redir", c3a))], 1)
    c3_1 = lrelu(conv("conv3_1", x))
    c4 = lrelu(conv("conv4_1", lrelu(conv("conv4", c3_1, 2))))
    c5 = lrelu(conv("conv5_1", lrelu(conv("conv5", c4, 2))))
    c6 = lrelu(conv("conv6_1", lrelu(conv("conv6", c5, 2))))
    flow6 = conv("flow6", c6)
    x5 = torch.cat([c5, lrelu(deconv("deconv5", c6)), deconv("upflow6", flow6)], 1)
    flow5 = conv("flow5", x5)
    x4 = torch.cat([c4, lrelu(deconv("deconv4", x5)), deconv("upflow5", flow5)], 1)
    flow4 = conv("flow4", x4)
    x3 = torch.cat([c3_1, lrelu(deconv("deconv3", x4)), deconv("upflow4", flow4)], 1)
    flow3 = conv("flow3", x3)
    x2 = torch.cat([c2a, lrelu(deconv("deconv2", x3)), deconv("upflow3", flow3)], 1)
    flow2 = conv("flow2", x2)
    h, w = im1.shape[2], im1.shape[3]
    return 20.0 * F.interpolate(flow2, (h, w), mode="bilinear", align_corners=False) / 4.0


def torch_liteflownet(by_name, im1, im2):
    conv = lambda n, x, s=1: F.conv2d(x, by_name[n].weight, by_name[n].bias, s, by_name[n].kernel_size[0] // 2)

    def encode(x):
        feats = [x]
        for lvl in range(1, 7):
            x = lrelu(conv(f"enc{lvl}/conv1", x, 2))
            x = lrelu(conv(f"enc{lvl}/conv2", x))
            feats.append(x)
        return feats

    f1s, f2s = encode(im1), encode(im2)
    b = im1.shape[0]
    h6, w6 = f1s[6].shape[2], f1s[6].shape[3]
    flow = torch.zeros(b, 2, h6, w6)
    for lvl in reversed(LEVELS):
        f1, f2 = f1s[lvl], f2s[lvl]
        if flow.shape[2] != f1.shape[2]:
            flow = F.interpolate(flow, (f1.shape[2], f1.shape[3]), mode="bilinear", align_corners=False) * 2.0
        warped = torch_backward_warp(f2, flow * FLOW_SCALE[lvl])
        corr = lrelu(torch_correlation(f1, warped, 3))
        m = lrelu(conv(f"m{lvl}/conv2", lrelu(conv(f"m{lvl}/conv1", corr))))
        flow = flow + conv(f"m{lvl}/flow", m)
        warped = torch_backward_warp(f2, flow * FLOW_SCALE[lvl])
        s = lrelu(conv(f"s{lvl}/conv2", lrelu(conv(f"s{lvl}/conv1", torch.cat([f1, warped, flow], 1)))))
        flow = flow + conv(f"s{lvl}/flow", s)
        r = lrelu(conv(f"r{lvl}/conv2", lrelu(conv(f"r{lvl}/conv1", torch.cat([f1, flow], 1)))))
        w9 = torch.softmax(conv(f"r{lvl}/weights", r), dim=1)
        fp = F.pad(flow, (1, 1, 1, 1), mode="replicate")
        h, wd = flow.shape[2], flow.shape[3]
        out = 0.0
        k = 0
        for dy in range(3):
            for dx in range(3):
                out = out + w9[:, k : k + 1] * fp[:, :, dy : dy + h, dx : dx + wd]
                k += 1
        flow = out
    h, w = im1.shape[2], im1.shape[3]
    return 20.0 * F.interpolate(flow, (h, w), mode="bilinear", align_corners=False) / 4.0


@pytest.mark.parametrize(
    "layout_fn,net_cls,convert_fn,oracle",
    [
        (unflow_layout, UnFlow, convert_unflow_torch, torch_unflow),
        (lfn_layout, LiteFlowNet, convert_liteflownet_torch, torch_liteflownet),
    ],
    ids=["unflow", "liteflownet"],
)
def test_converted_net_matches_torch(layout_fn, net_cls, convert_fn, oracle):
    layout = layout_fn()
    mods, by_name = build_torch_stack(layout)
    params = convert_fn(mods.state_dict())
    assert set(params) == {name for name, *_ in layout}

    np.random.seed(0)
    im1 = np.random.rand(1, 64, 64, 3).astype(np.float32)
    im2 = np.random.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = oracle(by_name, torch.tensor(im1.transpose(0, 3, 1, 2)), torch.tensor(im2.transpose(0, 3, 1, 2)))

    net = net_cls(params)
    got = np.asarray(net(jnp.asarray(im1), jnp.asarray(im2)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want.numpy(), atol=2e-3, rtol=1e-3)


def test_assign_by_shape_rejects_mismatched_checkpoint():
    layout = [("a", 3, 8, 3), ("b", 8, 8, 3)]
    sd = {"x.weight": torch.zeros(8, 3, 3, 3), "x.bias": torch.zeros(8)}
    with pytest.raises(ValueError, match="unmatched"):
        assign_by_shape(layout, sd)


def test_convert_flow_checkpoint_dispatch(tmp_path):
    from maua_style_tpu.models.flownets.convert import convert_flow_checkpoint

    layout = unflow_layout()
    mods, _ = build_torch_stack(layout)
    path = tmp_path / "ck.pth"
    torch.save(mods.state_dict(), str(path))
    params = convert_flow_checkpoint("unflow", str(path))
    assert len(params) == len(layout)
