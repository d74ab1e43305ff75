"""OpenAI CLIP torch checkpoint -> JAX pytree converter.

Handles both visual towers the reference's --clip_backbone offers
(reference config.py:79 / clip_vqgan.py:420): ViT variants (ViT-B/32 ...) and
ModifiedResNet variants (RN50/RN101/RN50x4, detected by
``visual.attnpool.*`` keys).

Usage: python -m maua_style_tpu.models.clip.convert ViT-B-32.pt modelzoo/clip_vitb32.npz
       python -m maua_style_tpu.models.clip.convert RN50.pt modelzoo/clip_rn50.npz
Loading: CLIP(load_clip_npz(...)) / CLIPResNet("RN50", load_clip_npz(...)).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .model import CLIPConfig


def convert_clip_state_dict(sd) -> tuple[dict, CLIPConfig]:
    def a(key):
        v = sd[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32)

    vision_width = a("visual.conv1.weight").shape[0]
    patch = a("visual.conv1.weight").shape[-1]
    grid = int(np.sqrt(a("visual.positional_embedding").shape[0] - 1))
    vision_layers = len({k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")})
    text_layers = len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")})
    cfg = CLIPConfig(
        image_resolution=grid * patch,
        patch_size=patch,
        vision_width=vision_width,
        vision_layers=vision_layers,
        vision_heads=vision_width // 64,
        embed_dim=a("text_projection").shape[1],
        text_width=a("ln_final.weight").shape[0],
        text_heads=a("ln_final.weight").shape[0] // 64,
        text_layers=text_layers,
        vocab_size=a("token_embedding.weight").shape[0],
        context_length=a("positional_embedding").shape[0],
    )

    def ln(prefix):
        return {"g": jnp.asarray(a(prefix + ".weight")), "b": jnp.asarray(a(prefix + ".bias"))}

    def block(prefix):
        return {
            "ln_1": ln(prefix + ".ln_1"),
            "ln_2": ln(prefix + ".ln_2"),
            "attn": {
                "in_w": jnp.asarray(a(prefix + ".attn.in_proj_weight")),
                "in_b": jnp.asarray(a(prefix + ".attn.in_proj_bias")),
                "out_w": jnp.asarray(a(prefix + ".attn.out_proj.weight")),
                "out_b": jnp.asarray(a(prefix + ".attn.out_proj.bias")),
            },
            "mlp_fc_w": jnp.asarray(a(prefix + ".mlp.c_fc.weight")),
            "mlp_fc_b": jnp.asarray(a(prefix + ".mlp.c_fc.bias")),
            "mlp_proj_w": jnp.asarray(a(prefix + ".mlp.c_proj.weight")),
            "mlp_proj_b": jnp.asarray(a(prefix + ".mlp.c_proj.bias")),
        }

    visual = {
        # torch conv (O, I, kh, kw) -> HWIO
        "conv1_w": jnp.asarray(np.transpose(a("visual.conv1.weight"), (2, 3, 1, 0))),
        "class_embedding": jnp.asarray(a("visual.class_embedding")),
        "positional_embedding": jnp.asarray(a("visual.positional_embedding")),
        "ln_pre": ln("visual.ln_pre"),
        "ln_post": ln("visual.ln_post"),
        "proj": jnp.asarray(a("visual.proj")),
        "blocks": [block(f"visual.transformer.resblocks.{i}") for i in range(vision_layers)],
    }
    text = {
        "token_embedding": jnp.asarray(a("token_embedding.weight")),
        "positional_embedding": jnp.asarray(a("positional_embedding")),
        "ln_final": ln("ln_final"),
        "text_projection": jnp.asarray(a("text_projection")),
        "blocks": [block(f"transformer.resblocks.{i}") for i in range(text_layers)],
    }
    return {"visual": visual, "text": text}, cfg


def convert_clip_resnet_state_dict(sd) -> tuple[dict, str]:
    """Full RN-backbone CLIP state dict -> ({"visual", "text"}, backbone name).

    The visual tower converts via resnet.convert_resnet_visual; the text tower
    shares the ViT checkpoints' layout, so the config sniffing above applies.
    The backbone name is recovered from the per-stage block counts + width.
    """
    from .resnet import RESNET_CONFIGS, ResNetConfig, convert_resnet_visual

    def a(key):
        v = sd[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32)

    layers = tuple(
        len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{s + 1}.")}) for s in range(4)
    )
    width = a("visual.conv1.weight").shape[0] * 2
    embed_dim = a("visual.attnpool.c_proj.weight").shape[0]
    spacial = int(np.sqrt(a("visual.attnpool.positional_embedding").shape[0] - 1))
    cfg = ResNetConfig(
        layers=layers, width=width, embed_dim=embed_dim,
        image_resolution=spacial * 32, heads=width // 2,
    )
    backbone = next((name for name, c in RESNET_CONFIGS.items() if c == cfg), f"RN{layers}")

    text_layers = len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")})

    def ln(prefix):
        return {"g": jnp.asarray(a(prefix + ".weight")), "b": jnp.asarray(a(prefix + ".bias"))}

    def block(prefix):
        return {
            "ln_1": ln(prefix + ".ln_1"),
            "ln_2": ln(prefix + ".ln_2"),
            "attn": {
                "in_w": jnp.asarray(a(prefix + ".attn.in_proj_weight")),
                "in_b": jnp.asarray(a(prefix + ".attn.in_proj_bias")),
                "out_w": jnp.asarray(a(prefix + ".attn.out_proj.weight")),
                "out_b": jnp.asarray(a(prefix + ".attn.out_proj.bias")),
            },
            "mlp_fc_w": jnp.asarray(a(prefix + ".mlp.c_fc.weight")),
            "mlp_fc_b": jnp.asarray(a(prefix + ".mlp.c_fc.bias")),
            "mlp_proj_w": jnp.asarray(a(prefix + ".mlp.c_proj.weight")),
            "mlp_proj_b": jnp.asarray(a(prefix + ".mlp.c_proj.bias")),
        }

    text = {
        "token_embedding": jnp.asarray(a("token_embedding.weight")),
        "positional_embedding": jnp.asarray(a("positional_embedding")),
        "ln_final": ln("ln_final"),
        "text_projection": jnp.asarray(a("text_projection")),
        "blocks": [block(f"transformer.resblocks.{i}") for i in range(text_layers)],
    }
    return {**convert_resnet_visual(sd, cfg), "text": text}, backbone


def save_clip_npz(params: dict, path: str) -> None:
    import jax

    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    np.savez(path, **flat)


def load_clip_npz(path: str) -> dict:
    data = np.load(path)
    root: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def main(argv=None):
    import argparse

    import torch

    ap = argparse.ArgumentParser(description="Convert an OpenAI CLIP .pt to .npz")
    ap.add_argument("src")
    ap.add_argument("dst")
    args = ap.parse_args(argv)
    obj = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    if any(k.startswith("visual.attnpool.") for k in sd):
        params, backbone = convert_clip_resnet_state_dict(sd)
        save_clip_npz(params, args.dst)
        print(f"wrote {args.dst} (ResNet backbone {backbone})")
    else:
        params, cfg = convert_clip_state_dict(sd)
        save_clip_npz(params, args.dst)
        print(f"wrote {args.dst} ({cfg})")


if __name__ == "__main__":
    main()
