"""VQGAN (taming-transformers) first-stage model in JAX.

Replaces the reference's CompVis/taming-transformers submodule
(reference clip_vqgan.py:48, 204-219): encoder -> quant_conv -> codebook,
post_quant_conv -> decoder, with the exact taming architecture so torch
checkpoints (vqgan_imagenet_f16_*, wikiart, coco, faceshq, sflckr) convert
onto the parameter pytree:

- ResNet blocks: GroupNorm(32) + swish + 3x3 convs, nin_shortcut on channel
  change
- single-head self-attention blocks at the configured resolutions
- downsample: stride-2 conv with (0,1,0,1) asymmetric pad; upsample:
  2x nearest + conv
- mid: ResBlock, Attn, ResBlock

No 2-GPU decoder split (reference clip_vqgan.py:379-418): under GSPMD the
decoder shards by annotation when a mesh is active.

NHWC everywhere; inference-only (the reference deletes model.loss and runs
no-grad through everything except the latent z).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class VQGANConfig:
    embed_dim: int = 256
    n_embed: int = 1024
    ch: int = 128
    ch_mult: tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: tuple[int, ...] = (16,)
    resolution: int = 256
    in_channels: int = 3
    out_ch: int = 3
    z_channels: int = 256

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)

    @property
    def downsample_factor(self) -> int:
        return 2 ** (self.num_resolutions - 1)


IMAGENET_F16_1024 = VQGANConfig(n_embed=1024)
IMAGENET_F16_16384 = VQGANConfig(n_embed=16384)
PRESETS = {
    "imagenet_1024": IMAGENET_F16_1024,
    "imagenet_16384": IMAGENET_F16_16384,
    "coco": VQGANConfig(n_embed=8192),
    "faceshq": IMAGENET_F16_1024,
    "wikiart_1024": IMAGENET_F16_1024,
    "wikiart_16384": IMAGENET_F16_16384,
    "sflckr": IMAGENET_F16_1024,
}


def swish(x):
    return x * jax.nn.sigmoid(x)


def group_norm(p, x, groups=32, eps=1e-6):
    b, h, w, c = x.shape
    if c % groups:  # taming uses 32 groups; tiny test configs have fewer channels
        import math

        groups = math.gcd(groups, c)
    xg = x.reshape(b, h, w, groups, c // groups)
    mu = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xg - mu) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    return xg.reshape(b, h, w, c) * p["g"] + p["b"]


def conv2d(p, x, stride=1, pad=1):
    out = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)] if isinstance(pad, int) else pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"]


def resnet_block(p, x):
    h = conv2d(p["conv1"], swish(group_norm(p["norm1"], x)))
    h = conv2d(p["conv2"], swish(group_norm(p["norm2"], h)))
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x, pad=0)
    return x + h


def attn_block(p, x):
    b, h, w, c = x.shape
    hn = group_norm(p["norm"], x)
    q = conv2d(p["q"], hn, pad=0).reshape(b, h * w, c)
    k = conv2d(p["k"], hn, pad=0).reshape(b, h * w, c)
    v = conv2d(p["v"], hn, pad=0).reshape(b, h * w, c)
    wts = jax.nn.softmax(jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) * (c ** -0.5), -1)
    out = jnp.einsum("bqk,bkc->bqc", wts.astype(v.dtype), v).reshape(b, h, w, c)
    return x + conv2d(p["proj_out"], out, pad=0)


def downsample(p, x):
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(p["conv"], x, stride=2, pad=0)


def upsample(p, x):
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
    return conv2d(p["conv"], x)


def encode(params, x, cfg: VQGANConfig):
    """x: (B, H, W, 3) in [-1, 1] -> pre-quant latents (B, h, w, embed_dim)."""
    e = params["encoder"]
    h = conv2d(e["conv_in"], x)
    res = cfg.resolution
    for lvl in range(cfg.num_resolutions):
        for blk in range(cfg.num_res_blocks):
            h = resnet_block(e["down"][lvl]["block"][blk], h)
            if res in cfg.attn_resolutions:
                h = attn_block(e["down"][lvl]["attn"][blk], h)
        if lvl != cfg.num_resolutions - 1:
            h = downsample(e["down"][lvl]["downsample"], h)
            res //= 2
    h = resnet_block(e["mid"]["block_1"], h)
    h = attn_block(e["mid"]["attn_1"], h)
    h = resnet_block(e["mid"]["block_2"], h)
    h = conv2d(e["conv_out"], swish(group_norm(e["norm_out"], h)))
    return conv2d(params["quant_conv"], h, pad=0)


def decode(params, z_q, cfg: VQGANConfig):
    """Quantised latents (B, h, w, embed_dim) -> image (B, H, W, 3) in [-1, 1]."""
    d = params["decoder"]
    h = conv2d(params["post_quant_conv"], z_q, pad=0)
    h = conv2d(d["conv_in"], h)
    h = resnet_block(d["mid"]["block_1"], h)
    h = attn_block(d["mid"]["attn_1"], h)
    h = resnet_block(d["mid"]["block_2"], h)
    res = cfg.resolution // cfg.downsample_factor
    for lvl in reversed(range(cfg.num_resolutions)):
        for blk in range(cfg.num_res_blocks + 1):
            h = resnet_block(d["up"][lvl]["block"][blk], h)
            if res in cfg.attn_resolutions:
                h = attn_block(d["up"][lvl]["attn"][blk], h)
        if lvl != 0:
            h = upsample(d["up"][lvl]["upsample"], h)
            res *= 2
    return conv2d(d["conv_out"], swish(group_norm(d["norm_out"], h)))


def quantize(z, codebook):
    """Nearest-codebook lookup with straight-through gradients
    (reference clip_vqgan.py:126-130); z: (..., D), codebook: (N, D)."""
    from ..ops.grads import replace_grad

    d = (
        jnp.sum(z ** 2, axis=-1, keepdims=True)
        + jnp.sum(codebook ** 2, axis=1)
        - 2 * jnp.einsum("...d,nd->...n", z, codebook, preferred_element_type=jnp.float32)
    )
    indices = jnp.argmin(d, axis=-1)
    z_q = codebook[indices]
    return replace_grad(z_q, z)


# ---------------------------------------------------------------------------
# init + conversion


def _conv_init(key, kh, kw, cin, cout):
    fan = kh * kw * cin
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * np.sqrt(2.0 / fan),
        "b": jnp.zeros((cout,), jnp.float32),
    }


from ..utils import on_host


@on_host
def init_vqgan_params(cfg: VQGANConfig, seed: int = 0) -> dict:
    key = [jax.random.PRNGKey(seed)]

    def nk():
        key[0], sub = jax.random.split(key[0])
        return sub

    def norm(c):
        return {"g": jnp.ones(c), "b": jnp.zeros(c)}

    def resblock(cin, cout):
        p = {
            "norm1": norm(cin),
            "conv1": _conv_init(nk(), 3, 3, cin, cout),
            "norm2": norm(cout),
            "conv2": _conv_init(nk(), 3, 3, cout, cout),
        }
        if cin != cout:
            p["nin_shortcut"] = _conv_init(nk(), 1, 1, cin, cout)
        return p

    def attn(c):
        return {
            "norm": norm(c),
            "q": _conv_init(nk(), 1, 1, c, c),
            "k": _conv_init(nk(), 1, 1, c, c),
            "v": _conv_init(nk(), 1, 1, c, c),
            "proj_out": _conv_init(nk(), 1, 1, c, c),
        }

    ch = cfg.ch
    # encoder
    enc: dict = {"conv_in": _conv_init(nk(), 3, 3, cfg.in_channels, ch), "down": []}
    res = cfg.resolution
    cin = ch
    for lvl in range(cfg.num_resolutions):
        cout = ch * cfg.ch_mult[lvl]
        level = {"block": [], "attn": []}
        for _ in range(cfg.num_res_blocks):
            level["block"].append(resblock(cin, cout))
            if res in cfg.attn_resolutions:
                level["attn"].append(attn(cout))
            cin = cout
        if lvl != cfg.num_resolutions - 1:
            level["downsample"] = {"conv": _conv_init(nk(), 3, 3, cout, cout)}
            res //= 2
        enc["down"].append(level)
    enc["mid"] = {"block_1": resblock(cin, cin), "attn_1": attn(cin), "block_2": resblock(cin, cin)}
    enc["norm_out"] = norm(cin)
    enc["conv_out"] = _conv_init(nk(), 3, 3, cin, cfg.z_channels)

    # decoder (mirrors taming's Decoder)
    block_in = ch * cfg.ch_mult[-1]
    dec: dict = {"conv_in": _conv_init(nk(), 3, 3, cfg.z_channels, block_in)}
    dec["mid"] = {"block_1": resblock(block_in, block_in), "attn_1": attn(block_in), "block_2": resblock(block_in, block_in)}
    res = cfg.resolution // cfg.downsample_factor
    up = [None] * cfg.num_resolutions
    cin = block_in
    for lvl in reversed(range(cfg.num_resolutions)):
        cout = ch * cfg.ch_mult[lvl]
        level = {"block": [], "attn": []}
        for _ in range(cfg.num_res_blocks + 1):
            level["block"].append(resblock(cin, cout))
            if res in cfg.attn_resolutions:
                level["attn"].append(attn(cout))
            cin = cout
        if lvl != 0:
            level["upsample"] = {"conv": _conv_init(nk(), 3, 3, cout, cout)}
            res *= 2
        up[lvl] = level
    dec["up"] = up
    dec["norm_out"] = norm(cin)
    dec["conv_out"] = _conv_init(nk(), 3, 3, cin, cfg.out_ch)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv_init(nk(), 1, 1, cfg.z_channels, cfg.embed_dim),
        "post_quant_conv": _conv_init(nk(), 1, 1, cfg.embed_dim, cfg.z_channels),
        "codebook": jax.random.uniform(nk(), (cfg.n_embed, cfg.embed_dim), jnp.float32, -1.0 / cfg.n_embed, 1.0 / cfg.n_embed),
    }


def convert_vqgan_state_dict(sd, cfg: VQGANConfig) -> dict:
    """taming VQModel torch state dict -> our pytree (keys like
    encoder.down.0.block.0.conv1.weight; first_stage_model. prefix stripped)."""

    def a(key):
        for k in (key, "first_stage_model." + key):
            if k in sd:
                v = sd[k]
                return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32)
        raise KeyError(key)

    def conv(key):
        w = a(key + ".weight")
        return {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "b": jnp.asarray(a(key + ".bias"))}

    def norm(key):
        return {"g": jnp.asarray(a(key + ".weight")), "b": jnp.asarray(a(key + ".bias"))}

    def resblock(prefix, cin, cout):
        p = {
            "norm1": norm(prefix + ".norm1"),
            "conv1": conv(prefix + ".conv1"),
            "norm2": norm(prefix + ".norm2"),
            "conv2": conv(prefix + ".conv2"),
        }
        if cin != cout:
            p["nin_shortcut"] = conv(prefix + ".nin_shortcut")
        return p

    def attnblock(prefix):
        return {
            "norm": norm(prefix + ".norm"),
            "q": conv(prefix + ".q"),
            "k": conv(prefix + ".k"),
            "v": conv(prefix + ".v"),
            "proj_out": conv(prefix + ".proj_out"),
        }

    ch = cfg.ch
    enc: dict = {"conv_in": conv("encoder.conv_in"), "down": []}
    res = cfg.resolution
    cin = ch
    for lvl in range(cfg.num_resolutions):
        cout = ch * cfg.ch_mult[lvl]
        level = {"block": [], "attn": []}
        for blk in range(cfg.num_res_blocks):
            level["block"].append(resblock(f"encoder.down.{lvl}.block.{blk}", cin, cout))
            if res in cfg.attn_resolutions:
                level["attn"].append(attnblock(f"encoder.down.{lvl}.attn.{blk}"))
            cin = cout
        if lvl != cfg.num_resolutions - 1:
            level["downsample"] = {"conv": conv(f"encoder.down.{lvl}.downsample.conv")}
            res //= 2
        enc["down"].append(level)
    enc["mid"] = {
        "block_1": resblock("encoder.mid.block_1", cin, cin),
        "attn_1": attnblock("encoder.mid.attn_1"),
        "block_2": resblock("encoder.mid.block_2", cin, cin),
    }
    enc["norm_out"] = norm("encoder.norm_out")
    enc["conv_out"] = conv("encoder.conv_out")

    block_in = ch * cfg.ch_mult[-1]
    dec: dict = {"conv_in": conv("decoder.conv_in")}
    dec["mid"] = {
        "block_1": resblock("decoder.mid.block_1", block_in, block_in),
        "attn_1": attnblock("decoder.mid.attn_1"),
        "block_2": resblock("decoder.mid.block_2", block_in, block_in),
    }
    res = cfg.resolution // cfg.downsample_factor
    up = [None] * cfg.num_resolutions
    cin = block_in
    for lvl in reversed(range(cfg.num_resolutions)):
        cout = ch * cfg.ch_mult[lvl]
        level = {"block": [], "attn": []}
        for blk in range(cfg.num_res_blocks + 1):
            level["block"].append(resblock(f"decoder.up.{lvl}.block.{blk}", cin, cout))
            if res in cfg.attn_resolutions:
                level["attn"].append(attnblock(f"decoder.up.{lvl}.attn.{blk}"))
            cin = cout
        if lvl != 0:
            level["upsample"] = {"conv": conv(f"decoder.up.{lvl}.upsample.conv")}
            res *= 2
        up[lvl] = level
    dec["up"] = up
    dec["norm_out"] = norm("decoder.norm_out")
    dec["conv_out"] = conv("decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv("quant_conv"),
        "post_quant_conv": conv("post_quant_conv"),
        "codebook": jnp.asarray(a("quantize.embedding.weight")),
    }


def load_vqgan(
    model_dir: str, seed: int = 0, allow_random: bool | None = None
) -> tuple[dict, VQGANConfig]:
    """Resolve a preset name or checkpoint dir -> (params, config)
    (reference clip_vqgan.py:160-219 without the downloads: no egress here).

    A missing preset checkpoint is an ERROR (random codebook/decoder render
    noise; the reference downloads or fails, clip_vqgan.py:160-201) unless
    ``allow_random`` / the ``MAUA_ALLOW_RANDOM_WEIGHTS`` env var opts into
    deterministic random init."""
    import glob
    import os

    if model_dir in PRESETS:
        cfg = PRESETS[model_dir]
        candidates = (f"modelzoo/vqgan_{model_dir}.npz", f"modelzoo/{model_dir}.ckpt")
        for cand in candidates:
            if os.path.exists(cand):
                if cand.endswith(".npz"):
                    from .clip.convert import load_clip_npz

                    return load_clip_npz(cand), cfg
                import torch

                sd = torch.load(cand, map_location="cpu", weights_only=False)
                sd = sd.get("state_dict", sd)
                return convert_vqgan_state_dict(sd, cfg), cfg
        from .registry import allow_random_weights

        if not allow_random_weights(allow_random):
            raise FileNotFoundError(
                f"No VQGAN checkpoint for preset '{model_dir}' (searched {list(candidates)}).\n"
                f"Place the taming-transformers .ckpt at modelzoo/{model_dir}.ckpt (it is\n"
                f"converted on load), or pass --allow_random_weights to run with\n"
                f"deterministic random weights (outputs will be noise; for tests/smoke only)."
            )
        print(f"Warning: no VQGAN checkpoint for '{model_dir}'; using deterministic random init.")
        return init_vqgan_params(cfg, seed), cfg
    ckpts = sorted(glob.glob(model_dir + "/*.ckpt"), reverse=True)
    if not ckpts:
        raise FileNotFoundError(f"no .ckpt in {model_dir}")
    import torch

    sd = torch.load(ckpts[0], map_location="cpu", weights_only=False)
    sd = sd.get("state_dict", sd)
    cfg = IMAGENET_F16_16384 if any("16384" in c for c in ckpts) else IMAGENET_F16_1024
    return convert_vqgan_state_dict(sd, cfg), cfg


__all__ = [
    "VQGANConfig",
    "PRESETS",
    "encode",
    "decode",
    "quantize",
    "init_vqgan_params",
    "convert_vqgan_state_dict",
    "load_vqgan",
]
