"""Pure-functional style-transfer losses.

The reference implements losses as stateful nn.Modules spliced into the
feature net, with a capture/loss/none mode FSM (reference: loss.py).  Here a
loss is a pure function ``(activations, targets) -> scalar``; targets are a
pytree captured up-front by running the extractor on content/style inputs.
The whole bundle compiles into the single jitted optimisation step.

Loss semantics are kept numerically identical to the reference:

- content / temporal: per-frame MSE to captured activations, averaged over
  frames, scaled by ``strength`` (loss.py:32-64).  The temporal variant
  multiplies the *input* by the flow-reliability mask before the MSE,
  exactly as the reference does (loss.py:53-54) — gradients vanish where the
  mask is 0.
- style (static): per-frame Gram / nelement, MSE to the blended target,
  averaged over frames (loss.py:141-157).
- style (dynamic / video): whole-window Gram / nelement vs the window target,
  scaled additionally by ``video_style_factor`` (loss.py:164-186).
- tv: anisotropic L1 total variation (loss.py:224-233).
- gradient normalisation (default on, ``--no_grad_norm`` disables): each loss
  term's backward gradient is L2-normalised then scaled by strength**2, via
  custom_vjp — the functional equivalent of ScaleGradients (loss.py:10-20).
"""

from __future__ import annotations

import math

from dataclasses import dataclass
from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from .ops.gram import batch_gram, video_gram


import os as _os

_USE_PALLAS_GRAM = _os.environ.get("MAUA_PALLAS_GRAM", "0") == "1"


def _style_gram(a: jax.Array, use_covariance: bool) -> jax.Array:
    """Per-frame Grams.

    An explicit Pallas kernel exists (ops/pallas_gram.py) and wins in
    isolation, but measured IN CONTEXT it loses end-to-end (round-4
    re-measurement: 31.3 vs 24.3 ms/iter at 1024² Adam): the custom-call
    boundary forces the activation to materialise instead of fusing into
    XLA's surrounding conv pipeline.  XLA's own contraction is therefore
    the default; set MAUA_PALLAS_GRAM=1 to compare.
    """
    if a.ndim == 5 and not use_covariance:
        # packed-stem phase view (B, H', W, P, C): contract with phases FOLDED
        # into channels (P*C = 128 — full vector lanes, vs the half-lane C=64
        # contraction), then sum the P diagonal C x C blocks:
        #   G[c,d] = sum_p sum_rows x[r,(p,c)] x[r,(p,d)]
        # The off-diagonal blocks are discarded; the MXU wins more than they
        # cost.  (Covariance mode centers per-channel across all rows, which
        # does not commute with the fold — it takes the un-folded path.)
        b, hp, w, p, c = a.shape
        g_pack = _gram4(a.reshape(b, hp, w, p * c), False)  # (B, PC, PC)
        blocks = g_pack.reshape(b, p, c, p, c)
        return sum(blocks[:, i, :, i, :] for i in range(p))
    return _gram4(a, use_covariance)


def _gram4(a: jax.Array, use_covariance: bool) -> jax.Array:
    if _USE_PALLAS_GRAM and a.ndim == 4 and jax.default_backend() == "tpu":
        from .ops.pallas_gram import gram_nhwc

        return gram_nhwc(a, use_covariance)
    return batch_gram(a, use_covariance)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def scale_gradients(x: jax.Array, strength: float) -> jax.Array:
    """Identity forward; backward L2-normalises the gradient and scales by
    strength**2 (the reference's ScaleGradients, loss.py:10-20)."""
    return x


def _sg_fwd(x, strength):
    return x, None


def _sg_bwd(strength, _res, g):
    g_scaled = g / (jnp.linalg.norm(jnp.ravel(g)) + 1e-8) * (strength * strength)
    return (g_scaled,)


scale_gradients.defvjp(_sg_fwd, _sg_bwd)


def _mse(a: jax.Array, b: jax.Array) -> jax.Array:
    # accumulate in f32 even for bf16 activations
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def _term(value: jax.Array, strength: float, frames: int, normalize: bool) -> jax.Array:
    if normalize:
        value = scale_gradients(value, strength)
    return value * strength / frames


@dataclass(frozen=True)
class LossConfig:
    """Static configuration of the loss bundle (mirrors the reference flags)."""

    content_layers: tuple[str, ...] = ("relu4_2",)
    style_layers: tuple[str, ...] = ("relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1")
    content_weight: float = 5.0
    style_weight: float = 100.0
    tv_weight: float = 1e-3
    temporal_weight: float = 50.0
    use_covariance: bool = False
    normalize_gradients: bool = True
    video_style_factor: float = 0.0

    @property
    def all_layers(self) -> tuple[str, ...]:
        seen: dict[str, None] = {}
        for l in (*self.content_layers, *self.style_layers):
            seen[l] = None
        return tuple(seen)

    def loss_names(self) -> tuple[str, ...]:
        """Ordering matches the reference's losses list: content, style, tv,
        temporal (models.py:453)."""
        names = [f"content:{l}" for l in self.content_layers]
        names += [f"style:{l}" for l in self.style_layers]
        if self.tv_weight > 0:
            names.append("tv")
        if self.temporal_weight > 0:
            names.append("temporal")
        return tuple(names)


# ---------------------------------------------------------------------------
# target capture


def capture_content_targets(extract_fn, content: jax.Array, cfg: LossConfig) -> dict[str, jax.Array]:
    """Content activations (reference optim.py:22-33)."""
    acts = extract_fn(content, cfg.content_layers)
    return {l: jax.lax.stop_gradient(acts[l].astype(jnp.float32)) for l in cfg.content_layers}


def capture_style_targets(
    extract_fn,
    styles: Sequence[jax.Array],
    blend_weights: Sequence[float],
    cfg: LossConfig,
) -> dict[str, jax.Array]:
    """Blended static Gram targets (reference optim.py:50-66, loss.py:141-151).

    Each style image (possibly multi-frame) contributes
    blend_weight * mean_frames(gram/nelement).
    """
    targets: dict[str, jax.Array] = {}
    for style, bw in zip(styles, blend_weights):
        acts = extract_fn(style, cfg.style_layers)
        for l in cfg.style_layers:
            a = acts[l]
            nelement = math.prod(a.shape[1:])
            gram = _style_gram(a, cfg.use_covariance) / nelement  # (B, C, C)
            contrib = bw * gram.mean(axis=0)
            targets[l] = targets.get(l, 0) + jax.lax.stop_gradient(contrib)
    return targets


def capture_style_video_targets(
    extract_fn,
    style_videos: Sequence[jax.Array],
    blend_weights: Sequence[float],
    cfg: LossConfig,
    gram_frame_window: int,
) -> tuple[dict[str, jax.Array], dict[str, jax.Array]]:
    """Static + dynamic targets averaged over all windows of each style video
    (reference optim.py:69-90)."""
    static: dict[str, jax.Array] = {}
    dynamic: dict[str, jax.Array] = {}
    for video, bw in zip(style_videos, blend_weights):
        n_windows = max(video.shape[0] - gram_frame_window + 1, 1)
        w_eff = bw / n_windows
        for start in range(n_windows):
            window = video[start : start + gram_frame_window]
            acts = extract_fn(window, cfg.style_layers)
            for l in cfg.style_layers:
                a = acts[l]
                per_frame_nel = math.prod(a.shape[1:])
                gram = _style_gram(a, cfg.use_covariance) / per_frame_nel
                static[l] = static.get(l, 0) + jax.lax.stop_gradient(w_eff * gram.mean(axis=0))
                # image styles (single frames) are excluded from the dynamic
                # Gram — their (C,C) doesn't match the (gfw*C,gfw*C) window
                # statistic (reference loss.py:165-166 skips them)
                if cfg.video_style_factor > 0 and a.shape[0] == gram_frame_window > 1:
                    vg = video_gram(a, cfg.use_covariance) / (a.size)
                    dynamic[l] = dynamic.get(l, 0) + jax.lax.stop_gradient(w_eff * vg)
    return static, dynamic


def capture_temporal_targets(warp_image: jax.Array, warp_weights: jax.Array | None) -> dict[str, Any]:
    """Pixel-space temporal target (reference optim.py:35-47; the temporal
    ContentLoss sits before the convs, models.py:375-379, so its 'features'
    are raw pixels)."""
    t = {"target": jax.lax.stop_gradient(warp_image)}
    if warp_weights is not None:
        t["weights"] = jax.lax.stop_gradient(warp_weights)
    return t


# ---------------------------------------------------------------------------
# loss evaluation


def tv_loss(x: jax.Array) -> jax.Array:
    """Anisotropic L1 TV on NHWC (reference loss.py:229-233)."""
    dh = x[:, 1:, :, :] - x[:, :-1, :, :]
    dw = x[:, :, 1:, :] - x[:, :, :-1, :]
    return jnp.sum(jnp.abs(dh)) + jnp.sum(jnp.abs(dw))


def evaluate_losses(
    pastiche: jax.Array,
    acts: dict[str, jax.Array],
    targets: dict[str, Any],
    cfg: LossConfig,
    strength_scale: dict[str, float] | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Total loss + per-loss values (ordering = cfg.loss_names()).

    ``strength_scale`` optionally rescales per-loss strengths (used by
    --normalize_weights, reference optim.py:176-178).
    """
    b = pastiche.shape[0]
    scale = strength_scale or {}
    values = []
    total = jnp.zeros((), jnp.float32)

    content_targets = targets.get("content", {})
    for l in cfg.content_layers:
        strength = cfg.content_weight * scale.get(f"content:{l}", 1.0)
        v = jnp.zeros((), jnp.float32)
        if l in content_targets:
            tgt = content_targets[l]
            a = acts[l]
            # per-frame MSE against the (broadcast) target, averaged over frames
            for i in range(b):
                v = v + _term(_mse(a[i : i + 1], tgt), strength, b, cfg.normalize_gradients)
        values.append(v)
        total = total + v

    style_targets = targets.get("style", {})
    video_targets = targets.get("style_video", {})
    for l in cfg.style_layers:
        strength = cfg.style_weight * scale.get(f"style:{l}", 1.0)
        v = jnp.zeros((), jnp.float32)
        a = acts[l]
        nelement = math.prod(a.shape[1:])
        if l in style_targets:
            grams = _style_gram(a, cfg.use_covariance) / nelement  # (B, C, C)
            tgt = style_targets[l]
            for i in range(b):
                v = v + _term(_mse(grams[i], tgt), strength, b, cfg.normalize_gradients)
        if cfg.video_style_factor > 0 and l in video_targets:
            vtgt = video_targets[l]
            if vtgt.shape[0] == b * a.shape[-1]:  # skip image styles in dynamic loss (loss.py:165-166)
                vg = video_gram(a, cfg.use_covariance) / a.size
                v = v + cfg.video_style_factor * _term(_mse(vg, vtgt), strength, b, cfg.normalize_gradients)
        values.append(v)
        total = total + v

    if cfg.tv_weight > 0:
        v = cfg.tv_weight * tv_loss(pastiche)
        values.append(v)
        total = total + v

    if cfg.temporal_weight > 0:
        strength = cfg.temporal_weight * scale.get("temporal", 1.0)
        v = jnp.zeros((), jnp.float32)
        temporal = targets.get("temporal")
        if temporal is not None:
            tgt = temporal["target"]
            w = temporal.get("weights")
            inp = pastiche * w if w is not None else pastiche
            for i in range(b):
                v = v + _term(_mse(inp[i : i + 1], tgt), strength, b, cfg.normalize_gradients)
        values.append(v)
        total = total + v

    return total, jnp.stack(values)


__all__ = [
    "LossConfig",
    "scale_gradients",
    "tv_loss",
    "capture_content_targets",
    "capture_style_targets",
    "capture_style_video_targets",
    "capture_temporal_targets",
    "evaluate_losses",
]
