"""CLIP's ModifiedResNet visual backbones (RN50 / RN101 / RN50x4).

Completes the reference's --clip_backbone choices (reference config.py:79).
Architecture per openai/CLIP: a 3-conv anti-aliased stem (stride-2 first
conv + avgpool), Bottleneck stages whose downsampling is an avgpool before
conv3 (and in the shortcut), and an attention-pooling head (one multi-head
attention query from the mean token).  Inference-only; BatchNorm folds to
scale/shift from running stats.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .model import attention


@dataclass(frozen=True)
class ResNetConfig:
    layers: tuple[int, int, int, int]
    width: int = 64
    embed_dim: int = 1024
    image_resolution: int = 224
    heads: int = 32


RESNET_CONFIGS = {
    "RN50": ResNetConfig(layers=(3, 4, 6, 3), width=64, embed_dim=1024, image_resolution=224, heads=32),
    "RN101": ResNetConfig(layers=(3, 4, 23, 3), width=64, embed_dim=512, image_resolution=224, heads=32),
    "RN50x4": ResNetConfig(layers=(4, 6, 10, 6), width=80, embed_dim=640, image_resolution=288, heads=40),
}


def conv(p, x, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(pad, pad), (pad, pad)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def bn(p, x, eps=1e-5):
    scale = p["g"] / jnp.sqrt(p["var"] + eps)
    return x * scale + (p["b"] - p["mean"] * scale)


def avgpool2(x, k):
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID") / (k * k)


def bottleneck(p, x, stride: int):
    out = jax.nn.relu(bn(p["bn1"], conv(p["conv1"], x, pad=0)))
    out = jax.nn.relu(bn(p["bn2"], conv(p["conv2"], out, pad=1)))
    if stride > 1:
        out = avgpool2(out, stride)
    out = bn(p["bn3"], conv(p["conv3"], out, pad=0))
    if "downsample" in p:
        idn = x
        if stride > 1:
            idn = avgpool2(idn, stride)
        idn = bn(p["downsample"]["bn"], conv(p["downsample"]["conv"], idn, pad=0))
    else:
        idn = x
    return jax.nn.relu(out + idn)


def attention_pool(p, x, n_heads: int):
    """(B, H, W, C) -> (B, out_dim): MHA with the mean token as query
    (openai CLIP AttentionPool2d)."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    mean = tokens.mean(axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1) + p["positional_embedding"]

    q = tokens[:, :1] @ p["q_w"].T + p["q_b"]
    k = tokens @ p["k_w"].T + p["k_b"]
    v = tokens @ p["v_w"].T + p["v_b"]
    hd = c // n_heads

    def heads(a):
        return a.reshape(b, -1, n_heads, hd).swapaxes(1, 2)

    qh, kh, vh = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh / np.sqrt(hd), kh, preferred_element_type=jnp.float32)
    wts = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", wts, vh).swapaxes(1, 2).reshape(b, 1, c)
    return (out @ p["c_w"].T + p["c_b"])[:, 0]


def encode_image_resnet(params: dict, x: jax.Array, cfg: ResNetConfig) -> jax.Array:
    """x: (B, R, R, 3) normalised RGB -> (B, embed_dim)."""
    v = params["visual"]
    for i in (1, 2, 3):
        x = jax.nn.relu(bn(v[f"bn{i}"], conv(v[f"conv{i}"], x, stride=2 if i == 1 else 1)))
    x = avgpool2(x, 2)
    for stage in range(4):
        blocks = v[f"layer{stage + 1}"]
        for bi, blk in enumerate(blocks):
            stride = 2 if (stage > 0 and bi == 0) else 1
            x = bottleneck(blk, x, stride)
    return attention_pool(v["attnpool"], x, cfg.heads)


from ...utils import on_host


@on_host
def init_resnet_visual(cfg: ResNetConfig, seed: int = 0) -> dict:
    key = [jax.random.PRNGKey(seed)]

    def nk():
        key[0], sub = jax.random.split(key[0])
        return sub

    def cv(cin, cout, k):
        fan = k * k * cin
        return {"w": jax.random.normal(nk(), (k, k, cin, cout)) * np.sqrt(2.0 / fan)}

    def bn_p(c):
        return {"g": jnp.ones(c), "b": jnp.zeros(c), "mean": jnp.zeros(c), "var": jnp.ones(c)}

    w = cfg.width
    visual = {
        "conv1": cv(3, w // 2, 3), "bn1": bn_p(w // 2),
        "conv2": cv(w // 2, w // 2, 3), "bn2": bn_p(w // 2),
        "conv3": cv(w // 2, w, 3), "bn3": bn_p(w),
    }
    inplanes = w
    for stage in range(4):
        planes = w * (2 ** stage)
        blocks = []
        for bi in range(cfg.layers[stage]):
            stride = 2 if (stage > 0 and bi == 0) else 1
            blk = {
                "conv1": cv(inplanes, planes, 1), "bn1": bn_p(planes),
                "conv2": cv(planes, planes, 3), "bn2": bn_p(planes),
                "conv3": cv(planes, planes * 4, 1), "bn3": bn_p(planes * 4),
            }
            if stride > 1 or inplanes != planes * 4:
                blk["downsample"] = {"conv": cv(inplanes, planes * 4, 1), "bn": bn_p(planes * 4)}
            blocks.append(blk)
            inplanes = planes * 4
        visual[f"layer{stage + 1}"] = blocks

    c = inplanes  # width * 32
    spacial = cfg.image_resolution // 32
    s = 1.0 / np.sqrt(c)
    visual["attnpool"] = {
        "positional_embedding": jax.random.normal(nk(), (spacial * spacial + 1, c)) * s,
        "q_w": jax.random.normal(nk(), (c, c)) * s, "q_b": jnp.zeros(c),
        "k_w": jax.random.normal(nk(), (c, c)) * s, "k_b": jnp.zeros(c),
        "v_w": jax.random.normal(nk(), (c, c)) * s, "v_b": jnp.zeros(c),
        "c_w": jax.random.normal(nk(), (cfg.embed_dim, c)) * s, "c_b": jnp.zeros(cfg.embed_dim),
    }
    return {"visual": visual}


def convert_resnet_visual(sd, cfg: ResNetConfig) -> dict:
    """OpenAI CLIP RN state dict (visual.*) -> our pytree."""

    def a(key):
        v = sd[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32)

    def cv(prefix):
        return {"w": jnp.asarray(np.transpose(a(prefix + ".weight"), (2, 3, 1, 0)))}

    def bn_p(prefix):
        return {
            "g": jnp.asarray(a(prefix + ".weight")),
            "b": jnp.asarray(a(prefix + ".bias")),
            "mean": jnp.asarray(a(prefix + ".running_mean")),
            "var": jnp.asarray(a(prefix + ".running_var")),
        }

    visual = {}
    for i in (1, 2, 3):
        visual[f"conv{i}"] = cv(f"visual.conv{i}")
        visual[f"bn{i}"] = bn_p(f"visual.bn{i}")
    for stage in range(4):
        blocks = []
        bi = 0
        while f"visual.layer{stage + 1}.{bi}.conv1.weight" in sd:
            pre = f"visual.layer{stage + 1}.{bi}"
            blk = {
                "conv1": cv(pre + ".conv1"), "bn1": bn_p(pre + ".bn1"),
                "conv2": cv(pre + ".conv2"), "bn2": bn_p(pre + ".bn2"),
                "conv3": cv(pre + ".conv3"), "bn3": bn_p(pre + ".bn3"),
            }
            if pre + ".downsample.0.weight" in sd or pre + ".downsample.1.weight" in sd:
                # CLIP's downsample: [AvgPool, Conv(idx -1?), BN]; conv has no pool index in sd
                conv_key = pre + (".downsample.0" if pre + ".downsample.0.weight" in sd else ".downsample.1")
                bn_key = pre + (".downsample.1" if conv_key.endswith("0") else ".downsample.2")
                blk["downsample"] = {"conv": cv(conv_key), "bn": bn_p(bn_key)}
            blocks.append(blk)
            bi += 1
        visual[f"layer{stage + 1}"] = blocks
    visual["attnpool"] = {
        "positional_embedding": jnp.asarray(a("visual.attnpool.positional_embedding")),
        "q_w": jnp.asarray(a("visual.attnpool.q_proj.weight")), "q_b": jnp.asarray(a("visual.attnpool.q_proj.bias")),
        "k_w": jnp.asarray(a("visual.attnpool.k_proj.weight")), "k_b": jnp.asarray(a("visual.attnpool.k_proj.bias")),
        "v_w": jnp.asarray(a("visual.attnpool.v_proj.weight")), "v_b": jnp.asarray(a("visual.attnpool.v_proj.bias")),
        "c_w": jnp.asarray(a("visual.attnpool.c_proj.weight")), "c_b": jnp.asarray(a("visual.attnpool.c_proj.bias")),
    }
    return {"visual": visual}


class CLIPResNet:
    """CLIP with a ModifiedResNet visual tower; same API as clip.model.CLIP."""

    TEXT_CFGS = {  # (text_width, text_heads, text_layers)
        "RN50": (512, 8, 12),
        "RN101": (512, 8, 12),
        "RN50x4": (640, 10, 12),
    }

    def __init__(self, backbone: str, params: dict | None = None, seed: int = 0):
        from .model import CLIPConfig, init_clip_params

        self.backbone = backbone
        self.rn_cfg = RESNET_CONFIGS[backbone]
        tw, th, tl = self.TEXT_CFGS[backbone]
        self.cfg = CLIPConfig(
            image_resolution=self.rn_cfg.image_resolution,
            embed_dim=self.rn_cfg.embed_dim,
            text_width=tw,
            text_heads=th,
            text_layers=tl,
        )
        if params is None:
            params = {
                **init_resnet_visual(self.rn_cfg, seed),
                "text": init_clip_params(self.cfg, seed)["text"],
            }
        self.params = params
        self._enc_img = jax.jit(lambda prm, x: encode_image_resnet(prm, x, self.rn_cfg))
        from .model import CLIP as _VIT

        self._enc_txt = jax.jit(lambda prm, t: _VIT._encode_text(prm, t, self.cfg))

    def encode_image(self, x):
        return self._enc_img(self.params, x)

    def encode_text(self, tokens):
        return self._enc_txt(self.params, jnp.asarray(tokens, jnp.int32))

    # used by the engine to size cutouts (clip_vqgan.py:422)
    @property
    def input_resolution(self) -> int:
        return self.cfg.image_resolution

    # the engine calls CLIP._encode_image inside its jitted step; expose an
    # equivalent static entry
    def _encode_image(self, prm, x, _cfg=None):  # pragma: no cover - thin alias
        return encode_image_resnet(prm, x, self.rn_cfg)


__all__ = [
    "ResNetConfig",
    "RESNET_CONFIGS",
    "CLIPResNet",
    "encode_image_resnet",
    "init_resnet_visual",
    "convert_resnet_visual",
]
