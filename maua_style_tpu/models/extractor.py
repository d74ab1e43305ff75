"""Spec-driven convolutional feature extraction.

A model is a flat tuple of layer specs (conv / relu / pool / drop / softmax)
with the reference's canonical layer names (models.py:140-243), plus a
parameter pytree ``{conv_name: {"w": HWIO, "b": (C,)}}``.  ``apply_extractor``
runs the net in NHWC on the MXU and returns the activations requested by
name, stopping at the deepest one — the functional equivalent of the
reference's loss-module-instrumented ``nn.Sequential`` (models.py:351-453).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Layer:
    kind: str  # "conv" | "relu" | "maxpool" | "avgpool" | "drop" | "softmax"
    name: str
    out_ch: int = 0
    kernel: tuple[int, int] = (0, 0)
    stride: tuple[int, int] = (1, 1)
    pad: tuple[int, int] = (0, 0)
    ceil_mode: bool = False


@dataclass(frozen=True)
class ExtractorSpec:
    arch: str
    layers: tuple[Layer, ...]
    in_ch: int = 3

    @property
    def conv_layers(self) -> tuple[Layer, ...]:
        return tuple(l for l in self.layers if l.kind == "conv")

    def layer_names(self) -> tuple[str, ...]:
        return tuple(l.name for l in self.layers)


def truncate_spec(spec: ExtractorSpec, wanted: Iterable[str]) -> ExtractorSpec:
    """Spec cut off after the deepest wanted layer (reference stops building
    the net once all loss layers are inserted, models.py:382)."""
    wanted = set(wanted)
    if not wanted:  # pixel-space losses only (e.g. TV/temporal): no feature net needed
        return ExtractorSpec(spec.arch, (), spec.in_ch)
    names = [l.name for l in spec.layers]
    missing = wanted - set(names)
    if missing:
        raise ValueError(f"unknown layers for {spec.arch}: {sorted(missing)}; available: {names}")
    last = max(i for i, n in enumerate(names) if n in wanted)
    return ExtractorSpec(spec.arch, spec.layers[: last + 1], spec.in_ch)


from ..utils import on_host


@on_host
def init_params(spec: ExtractorSpec, seed: int = 0, dtype=jnp.float32) -> dict:
    """Deterministic He-normal initialisation (fallback when no pretrained
    checkpoint is available; see models/convert.py for .pth conversion)."""
    key = jax.random.PRNGKey(seed)
    params = {}
    in_ch = spec.in_ch
    for layer in spec.layers:
        if layer.kind != "conv":
            continue
        key, wkey = jax.random.split(key)
        kh, kw = layer.kernel
        fan_in = kh * kw * in_ch
        w = jax.random.normal(wkey, (kh, kw, in_ch, layer.out_ch), dtype) * np.sqrt(2.0 / fan_in)
        params[layer.name] = {"w": w, "b": jnp.zeros((layer.out_ch,), dtype)}
        in_ch = layer.out_ch
    return params


def _pool_out_len(length: int, kernel: int, stride: int, ceil_mode: bool) -> int:
    if ceil_mode:
        out = -(-(length - kernel) // stride) + 1
        # torch drops a trailing window that would start beyond the input
        if (out - 1) * stride >= length:
            out -= 1
        return max(out, 1)
    return (length - kernel) // stride + 1


def _pool(x: jax.Array, layer: Layer) -> jax.Array:
    kh, kw = layer.kernel
    sh, sw = layer.stride
    h, w = x.shape[1], x.shape[2]
    oh = _pool_out_len(h, kh, sh, layer.ceil_mode)
    ow = _pool_out_len(w, kw, sw, layer.ceil_mode)
    pad_h = max((oh - 1) * sh + kh - h, 0)
    pad_w = max((ow - 1) * sw + kw - w, 0)
    dims = (1, kh, kw, 1)
    strides = (1, sh, sw, 1)
    padding = ((0, 0), (0, pad_h), (0, pad_w), (0, 0))
    if layer.kind == "maxpool":
        if (kh, kw) == (sh, sw) and kh == kw and not layer.ceil_mode:
            # non-overlapping pools (all VGG pools): compare-and-mask backward
            # instead of XLA's slow select_and_scatter (~13% of the style step,
            # see PERF.md); cropping to a multiple of k == VALID/floor semantics
            from ..ops.fast_pool import max_pool_fast

            return max_pool_fast(x[:, : h // kh * kh, : w // kw * kw], kh)
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strides, padding)
    # avg pool: divide by the number of in-bounds elements per window
    # (torch AvgPool2d with ceil_mode ignores out-of-bound positions)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, padding)
    ones = jnp.ones((1, h, w, 1), x.dtype)
    count = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, padding)
    return summed / count


def _packable_stem(spec: ExtractorSpec) -> bool:
    """True when the spec starts with the VGG block-1 pattern
    conv3x3/s1/p1 → relu → conv3x3/s1/p1 → relu → maxpool2x2/s2."""
    ls = spec.layers
    if len(ls) < 5:
        return False
    if tuple(l.kind for l in ls[:5]) != ("conv", "relu", "conv", "relu", "maxpool"):
        return False
    for conv in (ls[0], ls[2]):
        if conv.kernel != (3, 3) or conv.stride != (1, 1) or conv.pad != (1, 1):
            return False
    pool = ls[4]
    return pool.kernel == (2, 2) and pool.stride == (2, 2) and not pool.ceil_mode


def _run_packed_stem(params, x, spec, remaining, acts, precision):
    """Run block 1 row-packed (see ops/packed_stem.py); returns the un-packed
    pool-1 output.  Activations inside the block are recorded as
    (B, H/2, W, 2, C) phase views — MSE is permutation-invariant and the
    Gram contracts over (pixels, phases), so the losses are unchanged."""
    from ..ops.packed_stem import as_phased, pack_rows, packed_conv3x3, pool_packed

    y = pack_rows(x)
    for layer in spec.layers[:5]:
        if layer.kind == "conv":
            p = params[layer.name]
            # "wp"/"bp": kernels pre-packed once per program by prepare_params
            y = packed_conv3x3(y, p.get("wp", p["w"]), p.get("bp", p["b"]), precision)
        elif layer.kind == "relu":
            y = jnp.maximum(y, 0)
        else:  # the 2x2 max pool un-packs for free
            y = pool_packed(y)
        if layer.name in remaining:
            acts[layer.name] = y if layer.kind == "maxpool" else as_phased(y)
            remaining.discard(layer.name)
            if not remaining:
                return y
    return y


def prepare_params(params: dict, spec: ExtractorSpec, dtype, pack_stem: bool = False) -> dict:
    """Cast conv weights/biases to the compute dtype — and pre-pack the
    block-1 kernels when the packed stem will run — ONCE per program.

    apply_extractor casts at each use site; when the loss is differentiated
    inside an optimisation ``lax.scan``, those casts (and the packed-stem
    kernel construction) are traced into the loop BODY, and XLA does not
    hoist them out of the while loop (profiled: several ms/iter of
    weight-shaped fusions at 1024²).  Runners call this before the scan so
    the per-site casts become no-ops.  Idempotent: packed_conv3x3 detects
    already-packed kernels/biases by shape."""
    out = {
        n: {k: v.astype(dtype) if k in ("w", "b") else v for k, v in p.items()}
        for n, p in params.items()
    }
    if pack_stem and _packable_stem(spec):
        from ..ops.packed_stem import _packed_kernel

        for layer in spec.layers[:5]:
            if layer.kind == "conv" and layer.name in out:
                p = out[layer.name]
                if "wp" not in p:  # idempotent re-preparation
                    p["wp"] = _packed_kernel(p["w"])
                    p["bp"] = jnp.tile(p["b"], 2)
    return out


def apply_extractor(
    params: dict,
    x: jax.Array,
    spec: ExtractorSpec,
    wanted: Iterable[str] = (),
    precision=jax.lax.Precision.HIGHEST,
    pack_stem: bool = False,
) -> dict[str, jax.Array]:
    """Run the extractor, returning {name: activation} for ``wanted`` layers.

    x: (B, H, W, C) NHWC float. Evaluation stops after the deepest wanted
    layer so shallow losses never pay for deep layers.

    ``pack_stem``: run VGG block 1 space-to-depth-packed (exact same math,
    ~2x faster step at 1024² — see ops/packed_stem.py).  Block-1 activations
    are then returned as (B, H/2, W/2, 4, C) phase views.
    """
    wanted = tuple(wanted)
    remaining = set(wanted)
    acts: dict[str, jax.Array] = {}
    start = 0
    if pack_stem and _packable_stem(spec) and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        x = _run_packed_stem(params, x, spec, remaining, acts, precision)
        if wanted and not remaining:
            return acts
        start = 5
    for layer in spec.layers[start:]:
        if layer.kind == "conv":
            p = params[layer.name]
            if layer.kernel[0] >= 7 and layer.stride[0] > 1 and layer.pad == (0, 0):
                # large-kernel strided stems (NIN's 11x11/s4): space-to-depth
                # packing — XLA's direct lowering wastes GiBs in backward
                # (PERF.md); mathematically identical (tested)
                from ..ops.space_to_depth import stem_conv_s2d

                x = stem_conv_s2d(x, p["w"], p["b"], layer.stride[0], precision)
            else:
                x = jax.lax.conv_general_dilated(
                    x,
                    p["w"].astype(x.dtype),
                    window_strides=layer.stride,
                    padding=[(layer.pad[0], layer.pad[0]), (layer.pad[1], layer.pad[1])],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=precision,
                ) + p["b"].astype(x.dtype)
        elif layer.kind == "relu":
            x = jnp.maximum(x, 0)
        elif layer.kind in ("maxpool", "avgpool"):
            x = _pool(x, layer)
        elif layer.kind == "drop":
            pass  # inference-mode dropout is identity
        elif layer.kind == "softmax":
            x = jax.nn.softmax(x, axis=-1)
        else:  # pragma: no cover
            raise ValueError(f"unknown layer kind {layer.kind}")
        if layer.name in remaining:
            acts[layer.name] = x
            remaining.discard(layer.name)
            if not remaining:
                break
    if remaining:
        raise ValueError(f"layers not found in {spec.arch}: {sorted(remaining)}")
    return acts


__all__ = ["Layer", "ExtractorSpec", "apply_extractor", "init_params", "truncate_spec"]
