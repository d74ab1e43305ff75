"""CLIP (Radford et al. 2021) — joint image/text embedding model.

The reference calls ``clip.load(backbone)`` + ``encode_image/encode_text``
(reference clip_vqgan.py:420, 443-449, 513).  This is a from-scratch JAX
implementation of the ViT-B/32 variant (visual ViT + masked text
transformer, QuickGELU activations, pre-norm blocks), structured so the
OpenAI torch checkpoints map onto the parameter pytree (convert.py).  Both
encoders are pure functions, jitted by the caller; attention runs as batched
MXU matmuls.

The ModifiedResNet backbones (RN50/RN101/RN50x4 — attention-pooled,
blur-pooled ResNets) live in resnet.py and are dispatched by backbone name
(pipelines/clip_vqgan.py), with the same checkpoint-convertible layout.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass(frozen=True)
class CLIPConfig:
    image_resolution: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    embed_dim: int = 512
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12


VIT_B32 = CLIPConfig()


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(p, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def attention(p, x, n_heads, mask=None):
    """Multi-head self-attention; p holds in_proj (3D fused qkv) + out_proj."""
    t, d = x.shape[-2], x.shape[-1]
    qkv = x @ p["in_w"].T + p["in_b"]  # (..., T, 3D)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(a):
        return a.reshape(*a.shape[:-1], n_heads, d // n_heads).swapaxes(-3, -2)  # (..., H, T, hd)

    q, k, v = heads(q), heads(k), heads(v)
    scale = 1.0 / np.sqrt(d // n_heads)
    logits = jnp.einsum("...hqd,...hkd->...hqk", q * scale, k, preferred_element_type=jnp.float32)
    if mask is not None:
        logits = logits + mask
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("...hqk,...hkd->...hqd", w, v)
    out = out.swapaxes(-3, -2).reshape(*x.shape[:-1], d)
    return out @ p["out_w"].T + p["out_b"]


def transformer_block(p, x, n_heads, mask=None):
    x = x + attention(p["attn"], layer_norm(p["ln_1"], x), n_heads, mask)
    h = layer_norm(p["ln_2"], x)
    h = quick_gelu(h @ p["mlp_fc_w"].T + p["mlp_fc_b"])
    h = h @ p["mlp_proj_w"].T + p["mlp_proj_b"]
    return x + h


class CLIP:
    def __init__(self, params: dict | None = None, cfg: CLIPConfig = VIT_B32, seed: int = 0):
        self.cfg = cfg
        self.params = params if params is not None else init_clip_params(cfg, seed)
        self._enc_img = jax.jit(lambda prm, x: self._encode_image(prm, x, cfg))
        self._enc_txt = jax.jit(lambda prm, t: self._encode_text(prm, t, cfg))

    # -- visual tower -------------------------------------------------------

    @staticmethod
    def _encode_image(params, x, cfg: CLIPConfig):
        """x: (B, R, R, 3) in [0,1] -> (B, embed_dim); caller normalises with
        CLIP_MEAN/STD before this."""
        v = params["visual"]
        patches = jax.lax.conv_general_dilated(
            x,
            v["conv1_w"],  # (P, P, 3, W)
            window_strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b, gh, gw, w = patches.shape
        tokens = patches.reshape(b, gh * gw, w)
        cls = jnp.broadcast_to(v["class_embedding"], (b, 1, w))
        tokens = jnp.concatenate([cls, tokens], axis=1) + v["positional_embedding"]
        tokens = layer_norm(v["ln_pre"], tokens)
        for blk in v["blocks"]:
            tokens = transformer_block(blk, tokens, cfg.vision_heads)
        pooled = layer_norm(v["ln_post"], tokens[:, 0])
        return pooled @ v["proj"]

    # -- text tower ---------------------------------------------------------

    @staticmethod
    def _encode_text(params, tokens, cfg: CLIPConfig):
        """tokens: (B, context_length) int32 -> (B, embed_dim)."""
        t = params["text"]
        x = t["token_embedding"][tokens] + t["positional_embedding"]
        n = cfg.context_length
        mask = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)
        for blk in t["blocks"]:
            x = transformer_block(blk, x, cfg.text_heads, mask)
        x = layer_norm(t["ln_final"], x)
        eot = jnp.argmax(tokens, axis=-1)  # EOT token has the highest id
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return pooled @ t["text_projection"]

    def encode_image(self, x):
        return self._enc_img(self.params, x)

    def encode_text(self, tokens):
        return self._enc_txt(self.params, jnp.asarray(tokens, jnp.int32))

    @property
    def input_resolution(self) -> int:
        return self.cfg.image_resolution


def _block_params(key, width: int) -> dict:
    ks = jax.random.split(key, 4)
    s = 1.0 / np.sqrt(width)
    return {
        "ln_1": {"g": jnp.ones(width), "b": jnp.zeros(width)},
        "ln_2": {"g": jnp.ones(width), "b": jnp.zeros(width)},
        "attn": {
            "in_w": jax.random.normal(ks[0], (3 * width, width)) * s,
            "in_b": jnp.zeros(3 * width),
            "out_w": jax.random.normal(ks[1], (width, width)) * s,
            "out_b": jnp.zeros(width),
        },
        "mlp_fc_w": jax.random.normal(ks[2], (4 * width, width)) * s,
        "mlp_fc_b": jnp.zeros(4 * width),
        "mlp_proj_w": jax.random.normal(ks[3], (width, 4 * width)) * s,
        "mlp_proj_b": jnp.zeros(width),
    }


from ...utils import on_host


@on_host
def init_clip_params(cfg: CLIPConfig, seed: int = 0) -> dict:
    key = jax.random.PRNGKey(seed)
    k = iter(jax.random.split(key, 8 + cfg.vision_layers + cfg.text_layers))
    w = cfg.vision_width
    grid = cfg.image_resolution // cfg.patch_size
    visual = {
        "conv1_w": jax.random.normal(next(k), (cfg.patch_size, cfg.patch_size, 3, w)) * 0.02,
        "class_embedding": jax.random.normal(next(k), (w,)) * 0.02,
        "positional_embedding": jax.random.normal(next(k), (grid * grid + 1, w)) * 0.01,
        "ln_pre": {"g": jnp.ones(w), "b": jnp.zeros(w)},
        "ln_post": {"g": jnp.ones(w), "b": jnp.zeros(w)},
        "proj": jax.random.normal(next(k), (w, cfg.embed_dim)) * (w ** -0.5),
        "blocks": [_block_params(next(k), w) for _ in range(cfg.vision_layers)],
    }
    tw = cfg.text_width
    text = {
        "token_embedding": jax.random.normal(next(k), (cfg.vocab_size, tw)) * 0.02,
        "positional_embedding": jax.random.normal(next(k), (cfg.context_length, tw)) * 0.01,
        "ln_final": {"g": jnp.ones(tw), "b": jnp.zeros(tw)},
        "text_projection": jax.random.normal(next(k), (tw, cfg.embed_dim)) * (tw ** -0.5),
        "blocks": [_block_params(next(k), tw) for _ in range(cfg.text_layers)],
    }
    return {"visual": visual, "text": text}


__all__ = ["CLIP", "CLIPConfig", "VIT_B32", "CLIP_MEAN", "CLIP_STD", "init_clip_params", "quick_gelu"]
