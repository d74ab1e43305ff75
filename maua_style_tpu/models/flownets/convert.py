"""Checkpoint converters for the four flow estimators (reference flow.py:33-74
imports the sniklaus pytorch-{spynet,pwc,unflow,liteflownet} submodules; their
pretrained .pytorch checkpoints are the weights any real video run needs).

``convert_flow_checkpoint(name, ckpt)`` maps a torch state dict onto the
corresponding JAX net's parameter pytree and is exposed as a CLI:

    python -m maua_style_tpu.models.flownets.convert unflow network-css.pytorch

which writes ``modelzoo/unflow.npz`` — the path ``flow._get_net`` probes.

SPyNet and PWC-Net have name-pattern converters (their sniklaus module naming
is stable and well-known).  UnFlow and LiteFlowNet use *shape-ordered*
assignment: torch preserves state-dict insertion order, and a conv stack's
(out, in, kh, kw) signature sequence identifies each layer regardless of the
wrapper's naming scheme — each layout entry consumes the first unused
state-dict tensor of the expected shape.  The mapping (and the nets' math) is
verified against torch replicas in tests/test_flownet_convert.py; if a real
checkpoint's architecture diverges from the published paper structure we
implement, conversion fails loudly with the unmatched layer list rather than
silently mis-assigning.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _ordered_convs(state_dict):
    """(key, weight, bias) triples for every 4-D weight, insertion-ordered."""
    out = []
    for key in state_dict:
        if not key.endswith("weight"):
            continue
        w = np.asarray(state_dict[key])
        if w.ndim != 4:
            continue
        bias_key = key[: -len("weight")] + "bias"
        b = np.asarray(state_dict[bias_key]) if bias_key in state_dict else None
        out.append((key, w, b))
    return out


def assign_by_shape(layout, state_dict) -> dict:
    """Map an insertion-ordered torch state dict onto a (name, cin, cout, k)
    layout by matching weight shapes in order (see module docstring).

    Kernel-4 entries are ConvTranspose2d upsamplers — torch stores those
    (in, out, kh, kw) while convs are (out, in, kh, kw); both land in our
    HWIO / (k, k, out, in) layouts via the same (2, 3, 1, 0) transpose.
    """
    entries = _ordered_convs(state_dict)
    used = [False] * len(entries)
    params = {}
    missing = []
    for name, cin, cout, k in layout:
        want = (cin, cout, k, k) if k == 4 else (cout, cin, k, k)
        n_out = cout
        for i, (key, w, b) in enumerate(entries):
            if used[i] or w.shape != want:
                continue
            used[i] = True
            params[name] = {
                "w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "b": jnp.asarray(b if b is not None else np.zeros(n_out, np.float32)),
            }
            break
        else:
            missing.append((name, want))
    if missing:
        leftover = [(entries[i][0], entries[i][1].shape) for i in range(len(entries)) if not used[i]]
        raise ValueError(
            f"checkpoint does not match the expected architecture; unmatched layers: "
            f"{missing}; unconsumed checkpoint tensors: {leftover[:10]}"
        )
    return params


def convert_unflow_torch(state_dict) -> dict:
    from .unflow import _layout

    return assign_by_shape(_layout(), state_dict)


def convert_liteflownet_torch(state_dict) -> dict:
    from .liteflownet import _layout

    return assign_by_shape(_layout(), state_dict)


def convert_flow_checkpoint(name: str, ckpt) -> dict:
    """Convert a torch checkpoint (path or loaded state dict) for net ``name``."""
    if isinstance(ckpt, (str, bytes)):
        import torch

        ckpt = torch.load(ckpt, map_location="cpu", weights_only=True)
    if hasattr(ckpt, "items") and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    ckpt = {k: np.asarray(v) for k, v in ckpt.items()}

    if name == "spynet":
        from .spynet import convert_spynet_torch

        return convert_spynet_torch(ckpt)
    if name == "pwc":
        from .pwc import convert_pwc_torch

        return convert_pwc_torch(ckpt)
    if name == "unflow":
        return convert_unflow_torch(ckpt)
    if name == "liteflownet":
        return convert_liteflownet_torch(ckpt)
    raise ValueError(f"unknown flow net {name!r}")


def main(argv=None):
    import argparse
    import os

    from ..convert import save_npz_params

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("name", choices=["spynet", "pwc", "unflow", "liteflownet"])
    ap.add_argument("checkpoint", help="torch .pth/.pytorch checkpoint path")
    ap.add_argument("output", nargs="?", default=None, help="output .npz (default modelzoo/{name}.npz)")
    args = ap.parse_args(argv)

    params = convert_flow_checkpoint(args.name, args.checkpoint)
    out = args.output or f"modelzoo/{args.name}.npz"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    save_npz_params(params, out)
    print(f"wrote {out} ({len(params)} layers)")


if __name__ == "__main__":
    main()


__all__ = [
    "assign_by_shape",
    "convert_unflow_torch",
    "convert_liteflownet_torch",
    "convert_flow_checkpoint",
]
