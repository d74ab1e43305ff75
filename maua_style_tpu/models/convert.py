"""Checkpoint conversion: torch ``.pth`` state dicts -> JAX parameter pytrees.

The reference loads Caffe-trained VGG/NIN weights as torch state dicts
(models.py:246-347).  ``convert_torch_state_dict`` maps the sequential
``features.N.weight`` (OIHW) entries onto our named conv layers in order,
transposing to HWIO.  ``save_npz_params``/``load_npz_params`` give a fast
torch-free native format; convert once with::

    python -m maua_style_tpu.models.convert modelzoo/vgg19.pth modelzoo/vgg19.npz
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .extractor import ExtractorSpec


def convert_torch_state_dict(spec: ExtractorSpec, path_or_sd, strict: bool = True) -> dict:
    if isinstance(path_or_sd, (str, bytes)):
        import torch

        sd = torch.load(path_or_sd, map_location="cpu", weights_only=True)
    else:
        sd = path_or_sd
    # order conv entries by their sequential index in "features.N.weight"
    weights = {}
    for key, val in sd.items():
        if not key.startswith("features.") or not key.endswith((".weight", ".bias")):
            continue
        idx = int(key.split(".")[1])
        kind = key.split(".")[-1]
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val, dtype=np.float32)
        weights.setdefault(idx, {})[kind] = arr
    conv_arrays = [weights[i] for i in sorted(weights) if "weight" in weights[i] and weights[i]["weight"].ndim == 4]

    conv_layers = spec.conv_layers
    if strict and len(conv_arrays) < len(conv_layers):
        raise ValueError(
            f"checkpoint has {len(conv_arrays)} conv layers, spec {spec.arch} needs {len(conv_layers)}"
        )
    params = {}
    for layer, entry in zip(conv_layers, conv_arrays):
        w = entry["weight"]  # (O, I, Kh, Kw)
        b = entry.get("bias", np.zeros(w.shape[0], np.float32))
        expect = (layer.kernel[0], layer.kernel[1], w.shape[1], layer.out_ch)
        w = np.transpose(w, (2, 3, 1, 0))  # -> HWIO
        if strict and (w.shape[0], w.shape[1], w.shape[3]) != (expect[0], expect[1], expect[3]):
            raise ValueError(f"shape mismatch at {layer.name}: ckpt {w.shape} vs spec {expect}")
        params[layer.name] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    return params


def save_npz_params(params: dict, path: str) -> None:
    flat = {}
    for name, p in params.items():
        flat[f"{name}/w"] = np.asarray(p["w"])
        flat[f"{name}/b"] = np.asarray(p["b"])
    np.savez(path, **flat)


def load_npz_params(spec: ExtractorSpec, path: str, strict: bool = True) -> dict:
    data = np.load(path)
    params = {}
    for layer in spec.conv_layers:
        wk, bk = f"{layer.name}/w", f"{layer.name}/b"
        if wk not in data:
            if strict:
                raise ValueError(f"missing {wk} in {path}")
            continue
        params[layer.name] = {"w": jnp.asarray(data[wk]), "b": jnp.asarray(data[bk])}
    return params


def main(argv=None) -> None:
    import argparse

    from .registry import select_model

    ap = argparse.ArgumentParser(description="Convert a torch .pth feature-net checkpoint to .npz")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--arch", default=None, help="arch name; inferred from src filename if omitted")
    ap.add_argument("--pooling", default="max", choices=["max", "avg"])
    args = ap.parse_args(argv)
    spec = select_model(args.arch or args.src, args.pooling)
    params = convert_torch_state_dict(spec, args.src)
    save_npz_params(params, args.dst)
    print(f"wrote {args.dst} ({len(params)} conv layers, arch {spec.arch})")


if __name__ == "__main__":
    main()
