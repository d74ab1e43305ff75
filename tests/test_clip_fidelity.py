"""End-to-end CLIP+VQGAN loss-loop fidelity vs a torch oracle.

A functional torch replica of the reference's ascend_txt loop (reference
clip_vqgan.py:503-522: synth = straight-through vector-quantize + VQGAN
decode + clamp-with-grad -> cutouts -> CLIP image embed -> spherical
distances -> Adam on z, z clamped to the codebook range each step) running
on the SAME random weights as our ClipVQGANEngine (the param pytrees are
converted leaf-for-leaf to torch tensors).

Cutout randomness is neutralised on both sides (a deterministic full-image
lanczos+bicubic resample stands in for random crops — the crop/resample
math and size law have their own parity tests in test_cutouts.py) so the
trajectories are comparable step for step.  This pins the one loss loop the
per-op parity tests did not cover end to end.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp


def t(a) -> torch.Tensor:
    return torch.from_numpy(np.asarray(a, np.float32).copy())


# ---------------------------------------------------------------------------
# torch replicas of the VQGAN forward (models/vqgan.py) on the same params


def t_conv2d(p, x, stride=1, pad=1):
    w = t(p["w"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
    return F.conv2d(x, w, t(p["b"]), stride=stride, padding=pad)


def t_group_norm(p, x, groups=32, eps=1e-6):
    c = x.shape[1]
    g = math.gcd(groups, c)
    b, _, h, w = x.shape
    xg = x.reshape(b, g, c // g, h, w)
    mu = xg.mean(dim=(2, 3, 4), keepdim=True)
    var = ((xg - mu) ** 2).mean(dim=(2, 3, 4), keepdim=True)
    xg = (xg - mu) * torch.rsqrt(var + eps)
    return xg.reshape(b, c, h, w) * t(p["g"])[None, :, None, None] + t(p["b"])[None, :, None, None]


def t_swish(x):
    return x * torch.sigmoid(x)


def t_resnet_block(p, x):
    h = t_conv2d(p["conv1"], t_swish(t_group_norm(p["norm1"], x)))
    h = t_conv2d(p["conv2"], t_swish(t_group_norm(p["norm2"], h)))
    if "nin_shortcut" in p:
        x = t_conv2d(p["nin_shortcut"], x, pad=0)
    return x + h


def t_attn_block(p, x):
    b, c, h, w = x.shape
    hn = t_group_norm(p["norm"], x)
    q = t_conv2d(p["q"], hn, pad=0).reshape(b, c, h * w).permute(0, 2, 1)
    k = t_conv2d(p["k"], hn, pad=0).reshape(b, c, h * w).permute(0, 2, 1)
    v = t_conv2d(p["v"], hn, pad=0).reshape(b, c, h * w).permute(0, 2, 1)
    wts = torch.softmax(torch.einsum("bqc,bkc->bqk", q, k) * (c ** -0.5), dim=-1)
    out = torch.einsum("bqk,bkc->bqc", wts, v).permute(0, 2, 1).reshape(b, c, h, w)
    return x + t_conv2d(p["proj_out"], out, pad=0)


def t_downsample(p, x):
    x = F.pad(x, (0, 1, 0, 1))
    return t_conv2d(p["conv"], x, stride=2, pad=0)


def t_upsample(p, x):
    x = F.interpolate(x, scale_factor=2, mode="nearest")
    return t_conv2d(p["conv"], x)


def t_encode(params, x, cfg):
    e = params["encoder"]
    h = t_conv2d(e["conv_in"], x)
    res = cfg.resolution
    for lvl in range(cfg.num_resolutions):
        for blk in range(cfg.num_res_blocks):
            h = t_resnet_block(e["down"][lvl]["block"][blk], h)
            if res in cfg.attn_resolutions:
                h = t_attn_block(e["down"][lvl]["attn"][blk], h)
        if lvl != cfg.num_resolutions - 1:
            h = t_downsample(e["down"][lvl]["downsample"], h)
            res //= 2
    h = t_resnet_block(e["mid"]["block_1"], h)
    h = t_attn_block(e["mid"]["attn_1"], h)
    h = t_resnet_block(e["mid"]["block_2"], h)
    h = t_conv2d(e["conv_out"], t_swish(t_group_norm(e["norm_out"], h)))
    return t_conv2d(params["quant_conv"], h, pad=0)


def t_decode(params, z_q, cfg):
    d = params["decoder"]
    h = t_conv2d(params["post_quant_conv"], z_q, pad=0)
    h = t_conv2d(d["conv_in"], h)
    h = t_resnet_block(d["mid"]["block_1"], h)
    h = t_attn_block(d["mid"]["attn_1"], h)
    h = t_resnet_block(d["mid"]["block_2"], h)
    res = cfg.resolution // cfg.downsample_factor
    for lvl in reversed(range(cfg.num_resolutions)):
        for blk in range(cfg.num_res_blocks + 1):
            h = t_resnet_block(d["up"][lvl]["block"][blk], h)
            if res in cfg.attn_resolutions:
                h = t_attn_block(d["up"][lvl]["attn"][blk], h)
        if lvl != 0:
            h = t_upsample(d["up"][lvl]["upsample"], h)
            res *= 2
    return t_conv2d(d["conv_out"], t_swish(t_group_norm(d["norm_out"], h)))


class _TReplaceGrad(torch.autograd.Function):
    @staticmethod
    def forward(ctx, fwd, bwd):
        return fwd

    @staticmethod
    def backward(ctx, g):
        return None, g


class _TClampWithGrad(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x, lo, hi):
        ctx.save_for_backward(x)
        ctx.lo, ctx.hi = lo, hi
        return x.clamp(lo, hi)

    @staticmethod
    def backward(ctx, g):
        (x,) = ctx.saved_tensors
        # reference clip_vqgan.py:109-123: pass grad where it points back
        # into the feasible region
        return g * (1 - (x < ctx.lo).float() * (g > 0).float()) * (
            1 - (x > ctx.hi).float() * (g < 0).float()
        ), None, None


def t_quantize(z_nhwc, codebook):
    d = (
        (z_nhwc ** 2).sum(-1, keepdim=True)
        + (codebook ** 2).sum(1)
        - 2 * torch.einsum("bhwd,nd->bhwn", z_nhwc, codebook)
    )
    z_q = codebook[d.argmin(-1)]
    return _TReplaceGrad.apply(z_q, z_nhwc)


def t_spherical_dist(x, y):
    xn = x / x.norm(dim=-1, keepdim=True)
    yn = y / y.norm(dim=-1, keepdim=True)
    return torch.asin((xn - yn).norm(dim=-1) / 2).square() * 2


# ---------------------------------------------------------------------------
# torch replica of the CLIP visual tower (models/clip/model.py) on the params


def t_layer_norm(p, x, eps=1e-5):
    mu = x.mean(-1, keepdim=True)
    var = ((x - mu) ** 2).mean(-1, keepdim=True)
    return (x - mu) * torch.rsqrt(var + eps) * t(p["g"]) + t(p["b"])


def t_attention(p, x, n_heads):
    d = x.shape[-1]
    qkv = x @ t(p["in_w"]).T + t(p["in_b"])
    q, k, v = qkv.chunk(3, dim=-1)

    def heads(a):
        return a.reshape(*a.shape[:-1], n_heads, d // n_heads).transpose(-3, -2)

    q, k, v = heads(q), heads(k), heads(v)
    w = torch.softmax(torch.einsum("...hqd,...hkd->...hqk", q / math.sqrt(d // n_heads), k), dim=-1)
    out = torch.einsum("...hqk,...hkd->...hqd", w, v).transpose(-3, -2).reshape(*x.shape)
    return out @ t(p["out_w"]).T + t(p["out_b"])


def t_transformer_block(p, x, n_heads):
    x = x + t_attention(p["attn"], t_layer_norm(p["ln_1"], x), n_heads)
    h = t_layer_norm(p["ln_2"], x)
    h = h @ t(p["mlp_fc_w"]).T + t(p["mlp_fc_b"])
    h = h * torch.sigmoid(1.702 * h)  # quick gelu
    h = h @ t(p["mlp_proj_w"]).T + t(p["mlp_proj_b"])
    return x + h


def t_encode_image(params, x_nhwc, cfg):
    v = params["visual"]
    w = t(v["conv1_w"]).permute(3, 2, 0, 1)
    patches = F.conv2d(x_nhwc.permute(0, 3, 1, 2), w, stride=cfg.patch_size)
    b, wd, gh, gw = patches.shape
    tokens = patches.reshape(b, wd, gh * gw).permute(0, 2, 1)
    cls = t(v["class_embedding"]).expand(b, 1, wd)
    tokens = torch.cat([cls, tokens], dim=1) + t(v["positional_embedding"])
    tokens = t_layer_norm(v["ln_pre"], tokens)
    for blk in v["blocks"]:
        tokens = t_transformer_block(blk, tokens, cfg.vision_heads)
    pooled = t_layer_norm(v["ln_post"], tokens[:, 0])
    return pooled @ t(v["proj"])


# ---------------------------------------------------------------------------


def _det_cutouts_jax(key, x, cut_size, cutn, cut_pow=1.0, method="lanczos", phases=4):
    """Deterministic stand-in: the full image resampled with the exact fused
    lanczos+bicubic matrix, repeated cutn times (shape-compatible with
    make_cutouts; randomness removed so the oracle can mirror it)."""
    from maua_style_tpu.ops.cutouts import resample_matrix
    from maua_style_tpu.ops.grads import clamp_with_grad

    img = x[0]
    mat = jnp.asarray(resample_matrix(img.shape[0], cut_size))
    rows = jnp.einsum("is,swc->iwc", mat, img)
    out = jnp.einsum("jw,iwc->ijc", mat, rows)
    return clamp_with_grad(jnp.stack([out] * cutn), 0.0, 1.0)


def _det_cutouts_torch(x_nhwc, cut_size, cutn):
    from maua_style_tpu.ops.cutouts import resample_matrix

    img = x_nhwc[0]
    mat = t(resample_matrix(img.shape[0], cut_size))
    rows = torch.einsum("is,swc->iwc", mat, img)
    out = torch.einsum("jw,iwc->ijc", mat, rows)
    return _TClampWithGrad.apply(torch.stack([out] * cutn), 0.0, 1.0)


@pytest.mark.slow
def test_clip_vqgan_loss_loop_matches_torch_oracle(monkeypatch):
    import maua_style_tpu.pipelines.clip_vqgan as cv
    from maua_style_tpu.models import vqgan as vq
    from maua_style_tpu.models.clip import CLIP
    from maua_style_tpu.models.clip.model import CLIPConfig
    from maua_style_tpu.pipelines.clip_vqgan import CLIP_MEAN, CLIP_STD

    tiny_vq = vq.VQGANConfig(embed_dim=8, n_embed=32, ch=16, ch_mult=(1, 2), num_res_blocks=1,
                             attn_resolutions=(8,), resolution=16, z_channels=8)
    monkeypatch.setattr(vq, "load_vqgan", lambda d, s=0: (vq.init_vqgan_params(tiny_vq, 0), tiny_vq))
    tiny_clip = CLIPConfig(image_resolution=32, patch_size=16, vision_width=32, vision_layers=2, vision_heads=2,
                           embed_dim=16, text_width=32, text_heads=2, text_layers=2)
    monkeypatch.setattr(cv, "_load_clip", lambda b: CLIP(cfg=tiny_clip))
    monkeypatch.setattr(cv, "make_cutouts", _det_cutouts_jax)

    cutn, iters, lr = 2, 6, 0.05
    engine = cv.ClipVQGANEngine("tiny", "ViT-B/32", cutn=cutn, learning_rate=lr)

    rng = np.random.default_rng(0)
    init = rng.random((1, 32, 32, 3)).astype(np.float32)
    content = rng.random((1, 32, 32, 3)).astype(np.float32)
    style = rng.random((1, 32, 32, 3)).astype(np.float32)
    from_vec = rng.standard_normal((1, 16)).astype(np.float32)
    to_vec = rng.standard_normal((1, 16)).astype(np.float32)

    out = engine.optimize(
        init, content, [style], None, None, None,
        iterations=iters,
        target_embeds=[jnp.asarray(from_vec), jnp.asarray(to_vec), [engine.embed_image(style)]],
    )
    ours_log = engine.last_loss_log  # (iters, 4): content, style, from, to

    # ---- torch oracle on the same weights --------------------------------
    vqp = engine.vq_params
    cfg = tiny_vq
    codebook = t(vqp["codebook"])

    def embed(img01_nhwc):
        cuts = _det_cutouts_torch(img01_nhwc, engine.cut_size, cutn)
        cuts = (cuts - t(np.asarray(CLIP_MEAN))) / t(np.asarray(CLIP_STD))
        return t_encode_image(engine.clip.params, cuts, tiny_clip)

    with torch.no_grad():
        # encode_z: quantized stop-grad latents of init*2-1 (NHWC conv path)
        pre = t_encode(vqp, (t(init) * 2 - 1).permute(0, 3, 1, 2), cfg)
        z0 = t_quantize(pre.permute(0, 2, 3, 1), codebook)
        content_embed = embed(t(content))
        style_embed = embed(t(style))
    z = z0.clone().requires_grad_(True)
    z_min = codebook.min(0).values.reshape(1, 1, 1, -1)
    z_max = codebook.max(0).values.reshape(1, 1, 1, -1)
    opt = torch.optim.Adam([z], lr=lr)

    ref_log = []
    for _ in range(iters):
        opt.zero_grad()
        z_q = t_quantize(z, codebook)
        dec = t_decode(vqp, z_q.permute(0, 3, 1, 2), cfg)
        out01 = _TClampWithGrad.apply((dec.permute(0, 2, 3, 1) + 1) / 2, 0.0, 1.0)
        out_embeds = embed(out01)
        terms = [
            t_spherical_dist(out_embeds, content_embed).mean(),
            t_spherical_dist(out_embeds, style_embed).mean(),
            t_spherical_dist(out_embeds, t(from_vec)).mean() * -1.0,
            t_spherical_dist(out_embeds, t(to_vec)).mean(),
        ]
        sum(terms).backward()
        opt.step()
        with torch.no_grad():
            z.clamp_(z_min, z_max)
        ref_log.append([v.item() for v in terms])
    with torch.no_grad():
        final = _TClampWithGrad.apply(
            (t_decode(vqp, t_quantize(z, codebook).permute(0, 3, 1, 2), cfg).permute(0, 2, 3, 1) + 1) / 2,
            0.0, 1.0,
        ).numpy()

    ref_log = np.asarray(ref_log)
    np.testing.assert_allclose(ours_log, ref_log, atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(out, final, atol=5e-3)
