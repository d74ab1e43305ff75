"""Loss-stack parity: total loss and d(loss)/d(pastiche) vs a torch replica of
the reference's loss semantics (ContentLoss/StyleLoss/TVLoss/ScaleGradients,
reference loss.py)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from maua_style_tpu.losses import (
    LossConfig,
    capture_content_targets,
    capture_style_targets,
    evaluate_losses,
    scale_gradients,
)
from maua_style_tpu.models import select_model, apply_extractor

from test_models import build_torch_vgg, params_from_torch


class TorchScaleGradients(torch.autograd.Function):
    @staticmethod
    def forward(ctx, input_tensor, strength):
        ctx.strength = strength
        return input_tensor

    @staticmethod
    def backward(ctx, grad_output):
        grad_input = grad_output / (torch.norm(grad_output, keepdim=True) + 1e-8)
        return grad_input * ctx.strength * ctx.strength, None


def torch_gram(x, use_covariance=False):
    b, c, h, w = x.shape
    f = x.reshape(b * c, h * w)
    if use_covariance:
        f = f - f.mean(1, keepdim=True)
    return f @ f.t()


def torch_total_loss(net, pastiche, content, styles, blend, cfg: LossConfig, name_to_idx):
    feats = {}
    h = pastiche
    for i, m in enumerate(net):
        h = m(h)
        feats[i] = h

    def feats_of(x):
        out = {}
        with torch.no_grad():
            h = x
            for i, m in enumerate(net):
                h = m(h)
                out[i] = h
        return out

    content_feats = feats_of(content)
    total = 0.0
    b = pastiche.shape[0]
    for l in cfg.content_layers:
        idx = name_to_idx[l]
        for fi in range(b):
            loss = torch.nn.functional.mse_loss(feats[idx][fi : fi + 1], content_feats[idx])
            if cfg.normalize_gradients:
                loss = TorchScaleGradients.apply(loss, cfg.content_weight)
            total = total + loss * cfg.content_weight / b
    for l in cfg.style_layers:
        idx = name_to_idx[l]
        target = 0.0
        for s, bw in zip(styles, blend):
            sf = feats_of(s)[idx]
            g = 0.0
            for fi in range(sf.shape[0]):
                g = g + torch_gram(sf[fi : fi + 1], cfg.use_covariance) / sf[fi].numel() / sf.shape[0]
            target = target + bw * g
        for fi in range(b):
            gram = torch_gram(feats[idx][fi : fi + 1], cfg.use_covariance) / feats[idx][fi].numel()
            loss = torch.nn.functional.mse_loss(gram, target)
            if cfg.normalize_gradients:
                loss = TorchScaleGradients.apply(loss, cfg.style_weight)
            total = total + loss * cfg.style_weight / b
    if cfg.tv_weight > 0:
        xd = pastiche[:, :, 1:, :] - pastiche[:, :, :-1, :]
        yd = pastiche[:, :, :, 1:] - pastiche[:, :, :, :-1]
        total = total + cfg.tv_weight * (xd.abs().sum() + yd.abs().sum())
    return total


@pytest.mark.parametrize("normalize,covariance", [
    pytest.param(False, False, marks=pytest.mark.slow),  # ~19 s: full-depth torch oracle
    (True, False),
    (False, True),
])
def test_loss_and_grad_match_torch(normalize, covariance):
    cfg = LossConfig(
        content_layers=("relu3_2",),
        style_layers=("relu1_1", "relu2_1", "relu3_1"),
        content_weight=5.0,
        style_weight=100.0,
        tv_weight=1e-3,
        temporal_weight=0.0,
        normalize_gradients=normalize,
        use_covariance=covariance,
    )
    from maua_style_tpu.models.registry import CHANNEL_LIST

    torch.manual_seed(0)
    net = build_torch_vgg(CHANNEL_LIST["vgg16"][:9], "max").eval()  # through conv3_2
    spec = select_model("vgg16", "max")
    params = params_from_torch(net, spec, strict=False)

    name_to_idx = {}
    for i, layer in enumerate(spec.layers):
        name_to_idx[layer.name] = i

    pastiche = np.random.rand(1, 3, 24, 28).astype(np.float32) * 200 - 100
    content = np.random.rand(1, 3, 24, 28).astype(np.float32) * 200 - 100
    styles = [np.random.rand(1, 3, 20, 22).astype(np.float32) * 200 - 100]
    blend = [1.0]

    # torch
    pt = torch.from_numpy(pastiche).requires_grad_(True)
    total_t = torch_total_loss(net, pt, torch.from_numpy(content), [torch.from_numpy(s) for s in styles], blend, cfg, name_to_idx)
    total_t.backward()
    want_loss = total_t.item()
    want_grad = pt.grad.numpy()

    # jax
    def to_nhwc(a):
        return jnp.asarray(np.transpose(a, (0, 2, 3, 1)))

    def extract(x, layers):
        return apply_extractor(params, x, spec, layers)

    targets = {
        "content": capture_content_targets(extract, to_nhwc(content), cfg),
        "style": capture_style_targets(extract, [to_nhwc(s) for s in styles], blend, cfg),
    }

    def loss_fn(p):
        acts = extract(p, cfg.all_layers)
        total, per = evaluate_losses(p, acts, targets, cfg)
        return total, per

    (got_loss, per), grad = jax.value_and_grad(loss_fn, has_aux=True)(to_nhwc(pastiche))
    got_grad = np.transpose(np.asarray(grad), (0, 3, 1, 2))

    np.testing.assert_allclose(float(got_loss), want_loss, rtol=2e-4)
    np.testing.assert_allclose(got_grad, want_grad, atol=5e-5 * max(1.0, np.abs(want_grad).max()), rtol=2e-3)
    # per-loss vector covers content + styles + tv
    assert per.shape[0] == 1 + 3 + 1


def test_scale_gradients_backward():
    g = jax.grad(lambda x: scale_gradients(x * x, 3.0))(2.0)
    # forward x^2, backward: d/dx = scale(1)*2x where scale(g)=g/|g| * 9 = 9 -> 9*4=36
    np.testing.assert_allclose(float(g), 9.0 * 4.0, rtol=1e-5)


def test_multi_style_blend_weights():
    cfg = LossConfig(content_layers=(), style_layers=("relu1_1",), tv_weight=0.0, temporal_weight=0.0,
                     normalize_gradients=False)
    spec = select_model("vgg16", "max")
    from maua_style_tpu.models import init_params

    params = init_params(spec, 0)

    def extract(x, layers):
        return apply_extractor(params, x, spec, layers)

    s1 = jnp.asarray(np.random.rand(1, 8, 8, 3).astype(np.float32))
    s2 = jnp.asarray(np.random.rand(1, 8, 8, 3).astype(np.float32))
    t_blend = capture_style_targets(extract, [s1, s2], [0.3, 0.7], cfg)
    t1 = capture_style_targets(extract, [s1], [1.0], cfg)
    t2 = capture_style_targets(extract, [s2], [1.0], cfg)
    np.testing.assert_allclose(
        np.asarray(t_blend["relu1_1"]),
        0.3 * np.asarray(t1["relu1_1"]) + 0.7 * np.asarray(t2["relu1_1"]),
        rtol=1e-5, atol=1e-6,
    )


def test_temporal_loss_weighted_input():
    """Temporal loss multiplies the input by the reliability mask before the
    MSE (reference loss.py:53-54) — gradient vanishes where weights are 0."""
    cfg = LossConfig(content_layers=(), style_layers=(), tv_weight=0.0, temporal_weight=50.0,
                     normalize_gradients=False)
    warp = np.random.rand(1, 6, 6, 3).astype(np.float32)
    weights = np.zeros((1, 6, 6, 1), np.float32)
    weights[:, :3] = 1.0
    targets = {"temporal": {"target": jnp.asarray(warp), "weights": jnp.asarray(weights)}}

    def loss_fn(p):
        total, _ = evaluate_losses(p, {}, targets, cfg)
        return total

    p0 = jnp.asarray(np.random.rand(1, 6, 6, 3).astype(np.float32))
    g = np.asarray(jax.grad(loss_fn)(p0))
    assert np.abs(g[0, 3:]).max() == 0.0
    assert np.abs(g[0, :3]).max() > 0.0


def test_video_targets_skip_image_styles_in_dynamic_gram():
    """Mixing a video style with an image style must not crash dynamic-Gram
    capture (reference loss.py:165-166 skips image styles)."""
    from maua_style_tpu.models import init_params

    cfg = LossConfig(content_layers=(), style_layers=("relu1_1",), tv_weight=0,
                     temporal_weight=0, video_style_factor=100.0, normalize_gradients=False)
    spec = select_model("vgg16", "max")
    params = init_params(spec, 0)

    def extract(x, layers):
        return apply_extractor(params, x, spec, layers)

    from maua_style_tpu.losses import capture_style_video_targets

    video = jnp.asarray(np.random.rand(4, 16, 16, 3).astype(np.float32))
    image = jnp.asarray(np.random.rand(1, 16, 16, 3).astype(np.float32))
    static, dynamic = capture_style_video_targets(extract, [video, image], [0.5, 0.5], cfg, 4)
    assert "relu1_1" in static
    # dynamic target comes from the video only, shape (gfw*C, gfw*C)
    assert dynamic["relu1_1"].shape == (4 * 64, 4 * 64)


from maua_style_tpu.models import select_model, apply_extractor  # noqa: E402  (used above)
