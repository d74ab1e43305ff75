"""StyleEngine — the jitted optimisation core (reference: optim.py:111-255).

One engine instance holds the feature-net spec/params and jitted callables;
pipelines create an engine per scale and call :meth:`optimize` per image /
frame / window batch.  The entire iteration loop (feature forward, losses,
backward, optimiser update, per-loss logging) is a single ``lax.scan`` inside
``jit`` — per-iteration work never touches the host, unlike the reference's
per-iteration ``.item()`` sync (optim.py:210).

Sharding: pass ``shardings`` (a NamedSharding for the pastiche) and the scan
carries it through; GSPMD partitions the convolutions spatially and inserts
the Gram psum automatically (see maua_style_tpu/parallel).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses import (
    LossConfig,
    capture_content_targets,
    capture_style_targets,
    capture_style_video_targets,
    capture_temporal_targets,
    evaluate_losses,
)
from ..models.extractor import ExtractorSpec, apply_extractor, prepare_params, truncate_spec
from ..utils import wrapping_indices
from .lbfgs import lbfgs
from .windows import compute_windows, overlap_grad_mask, window_overlaps

# A/B kill-switch for the frozen-split window runner (see _runner)
_WINDOW_SPLIT = os.environ.get("MAUA_WINDOW_SPLIT", "1") == "1"

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


class StyleEngine:
    def __init__(
        self,
        spec: ExtractorSpec,
        params: dict,
        loss_cfg: LossConfig,
        *,
        optimizer: str = "lbfgs",
        learning_rate: float = 1.0,
        lbfgs_history: int = 100,
        lbfgs_method: str = "compact",
        precision: str = "highest",
        normalize_weights: bool = False,
        compute_dtype=jnp.float32,
        pastiche_sharding=None,
        pack_stem: bool | None = None,
        verbose: bool = False,
    ):
        self.loss_cfg = loss_cfg
        self.spec = truncate_spec(spec, loss_cfg.all_layers)
        self.params = params
        self.optimizer_name = optimizer
        self.learning_rate = learning_rate
        self.lbfgs_history = lbfgs_history
        self.lbfgs_method = lbfgs_method
        self.precision = _PRECISIONS[precision]
        self.normalize_weights = normalize_weights
        self.compute_dtype = compute_dtype
        self.pastiche_sharding = pastiche_sharding
        self.verbose = verbose
        self.last_loss_log: np.ndarray | None = None
        self._runners: dict[Any, Callable] = {}
        # per-frame pipelines call optimize() once per frame with the SAME
        # style images (reference re-captures every call, optim.py:50-67;
        # here capture is cached per engine — one capture per scale)
        self._style_target_cache: dict[Any, dict] = {}
        self._opt = None
        self._jit_opt_init = None

        if pack_stem is None:
            # packed block 1 is ~2x step speed single-chip, but its
            # reshape/halo-concat structure defeats GSPMD's sharding
            # propagation on a spatial mesh (block-1 buffers replicate per
            # chip — measured 23.5 GiB/chip (OOM) vs 8.7 sharded at 5792²/8 chips),
            # so multi-device engines default to the plain stem
            pack_stem = not self._is_multi_device(pastiche_sharding)
        self.pack_stem = pack_stem

        # per-frame programs see a (1, H, W, C) pastiche: the "frames" mesh
        # axis can't shard the size-1 dim, so they constrain to the
        # frames-stripped spec; optimize_frames() re-applies the frames axis
        # at the stacked-batch level (DP over frames)
        self.frame_sharding = None
        if pastiche_sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            spec = list(pastiche_sharding.spec) + [None] * (4 - len(pastiche_sharding.spec))
            self.frame_sharding = NamedSharding(
                pastiche_sharding.mesh, PartitionSpec(None, *spec[1:])
            )

        def extract(prm, x, layers):
            # pack_stem: block 1 runs space-to-depth-packed (exact same math,
            # ~2x step speedup at 1024²; see ops/packed_stem.py)
            return apply_extractor(
                prm, x.astype(compute_dtype), self.spec, layers, self.precision, pack_stem=self.pack_stem
            )

        self._extract = extract
        self._jit_content = jax.jit(lambda prm, c: capture_content_targets(partial(extract, prm), c, loss_cfg))
        # one jitted capture per style (shapes vary per style; jit caches per shape)
        self._jit_style = jax.jit(
            lambda prm, img, bw: capture_style_targets(partial(extract, prm), [img], [bw], loss_cfg)
        )
        # per-window capture (jitting whole-video capture would trace every
        # window into one giant graph); a full window has n_windows == 1
        # inside the helper, so the outer loop applies the 1/n_windows weight
        self._jit_video_window = jax.jit(
            lambda prm, win, bw, gfw: capture_style_video_targets(partial(extract, prm), [win], [bw], loss_cfg, gfw),
            static_argnames=("gfw",),
        )

    @staticmethod
    def _is_multi_device(sharding) -> bool:
        try:
            return sharding is not None and len(sharding.device_set) > 1
        except AttributeError:
            return sharding is not None

    # -- target capture ----------------------------------------------------

    def content_targets(self, content) -> dict:
        return self._jit_content(self.params, jnp.asarray(content))

    def style_targets(self, styles: Sequence, blend_weights: Sequence[float]) -> dict:
        # content-addressed cache: per-frame video loops pass the same style
        # images every call; re-capturing them is pure per-frame overhead
        key = tuple(
            (np.shape(s), float(bw), hash(np.asarray(s).tobytes()))
            for s, bw in zip(styles, blend_weights)
        )
        hit = self._style_target_cache.get(key)
        if hit is not None:
            return hit
        targets: dict[str, jax.Array] = {}
        for style, bw in zip(styles, blend_weights):
            grams = self._jit_style(self.params, jnp.asarray(style), bw)
            for l, g in grams.items():
                targets[l] = targets.get(l, 0) + g
        self._style_target_cache.clear()  # one entry: engines live per scale
        self._style_target_cache[key] = targets
        return targets

    def style_video_targets(
        self, style_videos: Sequence, blend_weights: Sequence[float], gram_frame_window: int
    ) -> tuple[dict, dict]:
        """Static+dynamic targets averaged over all windows (reference optim.py:69-90)."""
        static: dict[str, jax.Array] = {}
        dynamic: dict[str, jax.Array] = {}
        for video, bw in zip(style_videos, blend_weights):
            video = jnp.asarray(video)
            n_windows = max(video.shape[0] - gram_frame_window + 1, 1)
            w_eff = bw / n_windows
            for start in range(n_windows):
                window = video[start : start + gram_frame_window]
                s, d = self._jit_video_window(self.params, window, w_eff, gram_frame_window)
                for l, g in s.items():
                    static[l] = static.get(l, 0) + g
                for l, g in d.items():
                    dynamic[l] = dynamic.get(l, 0) + g
        return static, dynamic

    # -- strength normalisation (reference optim.py:176-178) ----------------

    def _strength_scale(self, targets: dict) -> tuple[tuple[str, float], ...]:
        if not self.normalize_weights:
            return ()
        content = targets.get("content", {})
        if not content and "content_img" in targets:
            # content targets are captured inside the jitted runner; probe
            # their shapes without any device execution
            content = jax.eval_shape(
                lambda c: capture_content_targets(
                    partial(self._extract, self.params), c, self.loss_cfg
                ),
                jax.ShapeDtypeStruct(np.shape(targets["content_img"]), jnp.float32),
            )
        scale = []
        for l, t in content.items():
            scale.append((f"content:{l}", 1.0 / max(t.shape)))
        for l, t in targets.get("style", {}).items():
            scale.append((f"style:{l}", 1.0 / max(t.shape)))
        temporal = targets.get("temporal")
        if temporal is not None:
            scale.append(("temporal", 1.0 / max(temporal["target"].shape)))
        elif "temporal_warp" in targets:
            scale.append(("temporal", 1.0 / max(targets["temporal_warp"]["src"].shape)))
        return tuple(scale)

    # -- the jitted optimisation loop ---------------------------------------

    def _make_optimizer(self):
        # one optimizer instance + one JITTED init per engine: eager
        # optax/lbfgs init issues one tiny device program per state leaf
        # (~13 for lbfgs) — pure round-trip overhead per frame on a
        # tunneled device, one fused program under jit
        if self._opt is None:
            self._opt = self._make_optimizer_uncached()
            self._jit_opt_init = jax.jit(self._opt.init)
        return self._opt

    def _make_optimizer_uncached(self):
        if self.optimizer_name == "lbfgs":
            # serving config (bf16 activations) also stores the L-BFGS
            # histories in bf16 — halves the dominant optimizer HBM traffic
            # and footprint; all curvature algebra accumulates in f32.
            # Parity/fidelity runs (compute_dtype=f32) keep f32 histories.
            hdt = jnp.bfloat16 if self.compute_dtype == jnp.bfloat16 else None
            return lbfgs(
                self.learning_rate, self.lbfgs_history,
                method=self.lbfgs_method, history_dtype=hdt,
            )
        if self.optimizer_name == "adam":
            return optax.adam(self.learning_rate)
        raise ValueError(f"unknown optimizer {self.optimizer_name}")

    def _runner(self, n_iters: int, scale_key: tuple, masked: bool, frozen: tuple[int, int] | None = None):
        """``frozen=(fo, eo)`` selects the frozen-split window runner: the
        first ``fo`` and last ``eo`` frames of the window are grad-masked by
        the schedule (reference optim.py:215-219), and a zero gradient means
        they NEVER move — Adam's moments stay zero, and every L-BFGS (s, y)
        pair is zero on their coordinates, so the two-loop direction is too.
        Their feature extraction is therefore hoisted out of the scan (done
        once per chunk); the per-iteration forward+backward runs only on the
        active middle slice, and the losses see the concatenated activations,
        so values and gradients are bit-for-bit the masked computation's
        (test_engine: test_window_frozen_split_matches_masked)."""
        key = (n_iters, scale_key, masked, frozen, self.optimizer_name)
        if key in self._runners:
            return self._runners[key]

        opt = self._make_optimizer()
        scale = dict(scale_key)
        cfg = self.loss_cfg
        extract = self._extract

        def run(prm, pastiche, opt_state, targets, grad_mask):
            # weight casts + packed-stem kernel construction happen ONCE here,
            # before the scan — traced inside the loop body XLA re-runs them
            # every iteration (models/extractor.prepare_params)
            prm = prepare_params(
                prm, self.spec, self.compute_dtype,
                self.pack_stem and pastiche.shape[1] % 2 == 0 and pastiche.shape[2] % 2 == 0,
            )
            # content targets are captured INSIDE this program (the raw frame
            # travels in ``targets["content_img"]``): per-frame video loops
            # then make ONE device call per frame instead of a separate
            # capture program + its round trip (compute cost: one extra
            # content forward per chunk, ~ms; round-trip saved: ~0.3-1 s on
            # a tunneled device, and XLA overlaps the capture with the scan)
            if "content_img" in targets:
                targets = dict(targets)
                cimg = targets.pop("content_img")
                targets["content"] = capture_content_targets(
                    partial(extract, prm), cimg, cfg
                )
            if "temporal_warp" in targets:
                # flow-warp the previous frame in-graph (vid_img temporal
                # target, reference style.py:273-284) — fusing it here saves
                # a separate warp program + two host transfers per frame
                from ..ops.warp import grid_sample

                targets = dict(targets)
                tw = targets.pop("temporal_warp")
                warped = grid_sample(tw["src"], tw["map"])
                targets["temporal"] = capture_temporal_targets(warped, tw.get("weights"))

            if frozen is not None:
                fo, eo = frozen
                t_w = pastiche.shape[0]
                front, end = pastiche[:fo], pastiche[t_w - eo :]
                # frozen frames are constant through the scan: extract their
                # loss-layer activations ONCE per chunk instead of every
                # iteration (at the default schedule this is 1/3 of all
                # window frame-extractions)
                fro_acts = extract(prm, jnp.concatenate([front, end], axis=0), cfg.all_layers)
                fro_acts = jax.lax.stop_gradient(fro_acts)

                def loss_fn(pa):
                    acts_a = extract(prm, pa, cfg.all_layers)
                    acts = {
                        l: jnp.concatenate([fro_acts[l][:fo], acts_a[l], fro_acts[l][fo:]], axis=0)
                        for l in acts_a
                    }
                    p_full = jnp.concatenate([front, pa, end], axis=0)
                    return evaluate_losses(p_full, acts, targets, cfg, scale)

                def step(carry, _):
                    pa, st = carry
                    (total, per), grad = jax.value_and_grad(loss_fn, has_aux=True)(pa)
                    updates, st2 = opt.update(grad.astype(jnp.float32), st, pa)
                    pa = optax.apply_updates(pa, updates)
                    if self.pastiche_sharding is not None:
                        pa = jax.lax.with_sharding_constraint(pa, self.pastiche_sharding)
                    return (pa, st2), per

                (pa, st), log = jax.lax.scan(
                    step, (pastiche[fo : t_w - eo], opt_state), length=n_iters
                )
                return jnp.concatenate([front, pa, end], axis=0), st, log

            def loss_fn(p):
                acts = extract(prm, p, cfg.all_layers)
                total, per = evaluate_losses(p, acts, targets, cfg, scale)
                return total, per

            def step(carry, _):
                p, st = carry
                (total, per), grad = jax.value_and_grad(loss_fn, has_aux=True)(p)
                grad = grad.astype(jnp.float32)
                if masked:
                    grad = grad * grad_mask
                updates, st2 = opt.update(grad, st, p)
                p = optax.apply_updates(p, updates)
                if self.pastiche_sharding is not None:
                    p = jax.lax.with_sharding_constraint(p, self.pastiche_sharding)
                return (p, st2), per

            (p, st), log = jax.lax.scan(step, (pastiche, opt_state), length=n_iters)
            return p, st, log

        self._runners[key] = jax.jit(run, donate_argnums=(1, 2))
        return self._runners[key]

    # -- fused multi-scale pyramid program -----------------------------------

    def optimize_pyramid(
        self,
        contents_per_scale: Sequence,
        styles_per_scale: Sequence[Sequence],
        init,
        schedule: Sequence[tuple[tuple[int, int], int]],
        *,
        blend_weights: Sequence[float] | None = None,
        hist_stats: tuple | None = None,
    ) -> list[np.ndarray]:
        """Optimise a whole multi-resolution pyramid as ONE device program.

        The reference's multi-scale loop (style.py:52-73) runs one
        optimisation per scale; each scale here costs a separate executable
        load, which through a tunneled chip can be 30-600 s of pure wall
        clock.  This runner chains every scale inside one jitted program —
        resize content, capture targets, (optionally) histogram-match the
        upsampled pastiche, run the scan — so a full pyramid pays exactly
        one load.  Trade-off: no per-iteration snapshots or run-state
        checkpoints inside the fused program (pipelines fall back to the
        per-scale loop when those are requested).

        ``schedule``: ((h, w), num_iters) per scale, static.
        ``contents_per_scale`` / ``styles_per_scale``: host-pre-scaled per
        scale (exact torch scale-factor-quirk parity with the per-scale
        loop's ``resize_bilinear_np`` / ``scale_styles``).  ``hist_stats``:
        optional (mu_s, qs) from ops.frame_ops.style_hist_stats for device
        recolouring of inter-scale upsamples (the fused frame programs'
        approximation of host match_histogram).  Returns per-scale outputs.
        """
        from ..ops.frame_ops import match_histogram_device
        from ..ops.resize import resize_bilinear

        schedule = tuple(((int(h), int(w)), int(n)) for (h, w), n in schedule)
        blend = tuple(
            blend_weights
            if blend_weights is not None
            else [1.0 / max(len(styles_per_scale[0]), 1)] * len(styles_per_scale[0])
        )
        opt = self._make_optimizer()
        cfg = self.loss_cfg
        extract = self._extract
        key = ("pyramid", schedule, blend, hist_stats is not None, self.optimizer_name)

        # per-scale strength scales need only target SHAPES: probe via
        # eval_shape, no device work (mirrors _strength_scale)
        scale_keys = []
        for s, ((hh, ww), _n) in enumerate(schedule):
            probe = {
                "content_img": jax.ShapeDtypeStruct((1, hh, ww, 3), jnp.float32),
                "style": jax.eval_shape(
                    lambda imgs, bw: capture_style_targets(
                        partial(extract, self.params), list(imgs), list(bw), cfg
                    ),
                    [jax.ShapeDtypeStruct(np.shape(im), jnp.float32) for im in styles_per_scale[s]],
                    blend,
                ),
            }
            scale_keys.append(self._strength_scale(probe))

        if key not in self._runners:

            def run(prm_raw, contents, styles_flat, pastiche, hstats):
                outs = []
                logs = []
                for s, ((hh, ww), n_iters) in enumerate(schedule):
                    pack = self.pack_stem and hh % 2 == 0 and ww % 2 == 0
                    prm = prepare_params(prm_raw, self.spec, self.compute_dtype, pack)
                    content_s = contents[s]
                    if s > 0:
                        pastiche = resize_bilinear(outs[-1], size=(hh, ww))
                        if hstats is not None:
                            pastiche = match_histogram_device(pastiche, *hstats)
                    targets = {
                        "content": capture_content_targets(partial(extract, prm), content_s, cfg),
                        "style": capture_style_targets(
                            partial(extract, prm), styles_flat[s], blend, cfg
                        ),
                    }
                    scale = dict(scale_keys[s])

                    def loss_fn(p, targets=targets, prm=prm, scale=scale):
                        acts = extract(prm, p, cfg.all_layers)
                        return evaluate_losses(p, acts, targets, cfg, scale)

                    def step(carry, _, loss_fn=loss_fn):
                        p, st = carry
                        (_total, per), grad = jax.value_and_grad(loss_fn, has_aux=True)(p)
                        updates, st2 = opt.update(grad.astype(jnp.float32), st, p)
                        p = optax.apply_updates(p, updates)
                        if self.pastiche_sharding is not None:
                            p = jax.lax.with_sharding_constraint(p, self.pastiche_sharding)
                        return (p, st2), per

                    (out, _st), log = jax.lax.scan(step, (pastiche, opt.init(pastiche)), length=n_iters)
                    if hstats is not None:
                        out = match_histogram_device(out, *hstats)
                    outs.append(out)
                    logs.append(log)
                return outs, logs

            self._runners[key] = jax.jit(run)

        styles_flat = [[jnp.asarray(im, jnp.float32) for im in sc] for sc in styles_per_scale]
        contents = [jnp.asarray(c, jnp.float32) for c in contents_per_scale]
        hs = None if hist_stats is None else tuple(jnp.asarray(a) for a in hist_stats)
        outs, logs = self._runners[key](
            self.params, contents, styles_flat, jnp.asarray(init, jnp.float32), hs,
        )
        self.last_loss_log = np.concatenate([np.asarray(l) for l in logs], axis=0)
        return [np.asarray(o) for o in outs]

    # -- fused per-video-frame program ---------------------------------------

    def _frame_program(self, n_iters: int, fkey: tuple, extract, sharding="frame", pack_stem=None):
        """Build the per-frame program body shared by the per-frame runner and
        the batched (vmapped) runner: u8 preprocess + resize, device histogram
        match, pastiche init (content / random / warp_prev / blend), in-graph
        flow-warp temporal target, the optimisation scan, output histogram
        match and u8 deprocess (reference style.py:192-297 does all of this
        via ~6 host round trips per frame)."""
        from ..ops.frame_ops import (
            deprocess_to_u8,
            match_histogram_device,
            preprocess_u8,
            warp_map_from_flow,
        )
        from ..ops.resize import resize_bilinear
        from ..ops.warp import grid_sample

        (out_hw, content_scale, init_mode, use_temporal, hist, temporal_blend, scale_key) = fkey
        opt = self._make_optimizer()
        scale = dict(scale_key)
        cfg = self.loss_cfg
        pack = self.pack_stem if pack_stem is None else pack_stem
        pack = pack and out_hw[0] % 2 == 0 and out_hw[1] % 2 == 0

        def run(prm, aux, style_targets, key):
            # hoist weight casts/packing out of the optimisation scan (see
            # models/extractor.prepare_params)
            prm = prepare_params(prm, self.spec, self.compute_dtype, pack)
            # scale_factor resampling keeps the host path's torch
            # scale-quirk semantics (ops/resize.py); size-mode otherwise
            if content_scale is not None:
                c = preprocess_u8(aux["content_u8"], scale_factor=content_scale)
            else:
                c = preprocess_u8(aux["content_u8"], size=out_hw)
            if hist:
                c = match_histogram_device(c, aux["mu_s"], aux["qs"])
            targets = dict(style_targets)
            targets["content"] = capture_content_targets(partial(extract, prm), c, cfg)

            prev = aux.get("prev")
            if prev is not None and prev.shape[1:3] != tuple(out_hw):
                prev = resize_bilinear(prev, size=out_hw)
            wmap = warp_map_from_flow(aux["flow"], out_hw) if "flow" in aux else None
            if use_temporal:
                warped = grid_sample(prev, wmap)
                wts = None
                if "weights_u8" in aux:
                    w8 = aux["weights_u8"].astype(jnp.float32)[None, :, :, None] / 255.0
                    wts = resize_bilinear(w8, size=out_hw)
                targets["temporal"] = capture_temporal_targets(warped, wts)

            if init_mode == "content":
                p0 = c
            elif init_mode == "random":
                p0 = 0.001 * jax.random.normal(key, (1, *out_hw, 3), jnp.float32)
            elif init_mode == "warp_prev":
                p0 = grid_sample(prev, wmap)
            elif init_mode == "blend":
                b = aux["blend"]
                b = preprocess_u8(b, size=out_hw) if b.dtype == jnp.uint8 else resize_bilinear(b, size=out_hw)
                p0 = (1.0 - temporal_blend) * b + temporal_blend * prev
            else:
                raise ValueError(init_mode)

            st = opt.init(p0)

            def loss_fn(p):
                acts = extract(prm, p, cfg.all_layers)
                total, per = evaluate_losses(p, acts, targets, cfg, scale)
                return total, per

            def step(carry, _):
                p, s = carry
                (_, per), grad = jax.value_and_grad(loss_fn, has_aux=True)(p)
                grad = grad.astype(jnp.float32)
                updates, s2 = opt.update(grad, s, p)
                p = optax.apply_updates(p, updates)
                if sharding == "frame" and self.frame_sharding is not None:
                    p = jax.lax.with_sharding_constraint(p, self.frame_sharding)
                return (p, s2), per

            (p, _), log = jax.lax.scan(step, (p0, st), length=n_iters)
            out = match_histogram_device(p, aux["mu_s"], aux["qs"]) if hist else p
            return out, deprocess_to_u8(out), log

        return run

    def _frame_runner(self, n_iters: int, fkey: tuple):
        """One jitted program for a whole vid_img frame; only a uint8 frame
        goes up and a uint8 image comes down per frame."""
        key = ("frame", n_iters, fkey)
        if key not in self._runners:
            self._runners[key] = jax.jit(self._frame_program(n_iters, fkey, self._extract))
        return self._runners[key]

    def _frames_batch_runner(self, n_iters: int, fkey: tuple, hist: bool, sharded: bool = False):
        """vmap of the per-frame program over a stacked frame batch.

        First-pass vid_img frames with ``init`` content/random have no
        temporal target and no chain dependence (reference style.py:219-231:
        each frame inits from its own content / fresh noise) — they are
        independent optimisations, so B of them run as ONE device program.
        vmap keeps the semantics of B separate runs exactly: per-frame
        histogram match, per-frame content targets, per-frame gradient
        normalisation and a per-frame L-BFGS state (histories never couple
        across frames).  Batch-B convolutions also use the MXU far better
        than the batch-1 step, and a whole chunk costs one dispatch
        round-trip instead of B (the big win through a tunneled chip)."""
        key = ("frames_batch", n_iters, fkey, sharded)
        if key not in self._runners:
            # plain stem: batch-B convs don't need the batch-1 space-to-batch
            # packing (and vmapping the packed reshapes just adds copies)
            compute_dtype, spec, precision = self.compute_dtype, self.spec, self.precision

            def extract_plain(prm, x, layers):
                return apply_extractor(
                    prm, x.astype(compute_dtype), spec, layers, precision, pack_stem=False
                )

            # the per-frame (frames-stripped) constraint applies INSIDE vmap:
            # vmap batches the spec with an unconstrained stack dim, so the
            # spatial axes stay pinned per iteration while the frames mesh
            # axis propagates onto the stack dim from the sharded inputs and
            # the outer constraint below (DP over frames)
            run = self._frame_program(n_iters, fkey, extract_plain, pack_stem=False)
            aux_axes = {"content_u8": 0, **({"mu_s": None, "qs": None} if hist else {})}
            batched = jax.vmap(run, in_axes=(None, aux_axes, None, 0))
            bsh = self._frames_sharding if sharded else None
            if bsh is not None:
                def constrained(prm, aux, style_targets, keys):
                    out, disp, log = batched(prm, aux, style_targets, keys)
                    out = jax.lax.with_sharding_constraint(out, bsh(5))
                    disp = jax.lax.with_sharding_constraint(disp, bsh(4))
                    return out, disp, log

                self._runners[key] = jax.jit(constrained)
            else:
                self._runners[key] = jax.jit(batched)
        return self._runners[key]

    @property
    def _frames_sharding(self):
        """NamedSharding factory for stacked frame batches — the pastiche
        sharding's "frames" axis moved to the stack dim (spatial axes keep
        their place on H) — or None without a frames mesh axis."""
        sh = self.pastiche_sharding
        if sh is None:
            return None
        mesh = sh.mesh
        if "frames" not in mesh.axis_names or mesh.shape["frames"] < 2:
            return None
        from jax.sharding import NamedSharding, PartitionSpec

        spec = list(sh.spec) + [None] * (4 - len(sh.spec))

        def make(rank: int):
            # rank 4: (B, h, w, c) stacks; rank 5: (B, 1, H, W, C) pastiches
            dims = ["frames", None, *spec[1:3]] if rank == 5 else ["frames", spec[1], None]
            dims += [None] * (rank - len(dims))
            return NamedSharding(mesh, PartitionSpec(*dims[:rank]))

        return make

    def _frames_chain_runner(self, n_iters: int, fkey: tuple, aux_keys: tuple, shared_keys: tuple):
        """lax.scan of the per-frame program over K sequentially-dependent
        frames: the pastiche chains through as the scan carry (each frame's
        temporal target / blend init reads the previous frame's result), while
        per-frame inputs (content, blend artifact, flow, reliability) arrive
        stacked.  One device program and one dispatch round-trip per chunk of
        K frames instead of K (reference style.py:192-297 runs one host-driven
        optimize per frame)."""
        key = ("frames_chain", n_iters, fkey, aux_keys, shared_keys)
        if key not in self._runners:
            from ..ops.resize import resize_bilinear

            run = self._frame_program(n_iters, fkey, self._extract)
            out_hw = fkey[0]

            def chain_run(prm, chain, stacked, shared, style_targets, keys):
                # prepare OUTSIDE the frame scan (the per-frame program's own
                # prepare_params is then an idempotent no-op)
                prm = prepare_params(
                    prm, self.spec, self.compute_dtype,
                    self.pack_stem and out_hw[0] % 2 == 0 and out_hw[1] % 2 == 0,
                )
                # the scan carry must be shape-invariant: a chain seeded from a
                # smaller scale's artifact is resized up front (the per-frame
                # program would otherwise resize it only on the first frame)
                if chain.shape[1:3] != tuple(out_hw):
                    chain = resize_bilinear(chain, size=tuple(out_hw))

                def body(carry, xs):
                    aux_i, key_i = xs
                    aux = dict(shared)
                    aux.update(aux_i)
                    aux["prev"] = carry
                    out, disp, log = run(prm, aux, style_targets, key_i)
                    return out, (disp, log)

                chain, (disps, logs) = jax.lax.scan(body, chain, (stacked, keys))
                return chain, disps, logs

            self._runners[key] = jax.jit(chain_run)
        return self._runners[key]

    def optimize_frame_chain(
        self,
        chain,
        stacked_aux: dict,
        styles: Sequence,
        num_iters: int,
        *,
        out_hw: tuple[int, int],
        content_scale: float | None = None,
        blend_weights: Sequence[float] | None = None,
        init_mode: str = "blend",
        use_temporal: bool = False,
        temporal_blend: float = 1.0,
        hist_stats=None,
        seeds: Sequence[int] | None = None,
    ):
        """Optimise K chained video frames in one device program (see
        _frames_chain_runner).  ``chain``: the (1, h, w, 3) pastiche feeding
        frame 0 (resized in-graph if from a smaller scale).  ``stacked_aux``:
        per-frame arrays with leading dim K ("content_u8" required; "blend",
        "flow", "weights_u8" per mode).  Returns (chain, displays (K, h, w, 3)
        u8), both device arrays."""
        assert init_mode in ("blend", "warp_prev"), init_mode
        k_frames = int(np.shape(stacked_aux["content_u8"])[0])
        blend_weights = (
            list(blend_weights) if blend_weights is not None else [1.0 / max(len(styles), 1)] * len(styles)
        )
        stacked = {k: jnp.asarray(v) for k, v in stacked_aux.items()}
        shared: dict[str, Any] = {}
        if hist_stats is not None:
            shared["mu_s"] = jnp.asarray(hist_stats[0])
            shared["qs"] = jnp.asarray(hist_stats[1])
        style_targets = {"style": self.style_targets(styles, blend_weights)}
        scale_key = (
            self._strength_scale({"content_img": np.zeros((1, *out_hw, 3), np.float32), **style_targets})
            if self.normalize_weights
            else ()
        )
        fkey = (
            tuple(out_hw),
            None if content_scale is None else float(content_scale),
            init_mode,
            bool(use_temporal),
            hist_stats is not None,
            float(temporal_blend),
            scale_key,
        )
        runner = self._frames_chain_runner(
            int(num_iters), fkey, tuple(sorted(stacked)), tuple(sorted(shared))
        )
        if seeds is None:
            seeds = range(k_frames)
        keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
        chain = chain if isinstance(chain, jax.Array) else jnp.asarray(chain, jnp.float32)
        chain, displays, log = runner(self.params, chain, stacked, shared, style_targets, keys)
        self.last_loss_log = log
        return chain, displays

    def optimize_frames(
        self,
        contents_u8,
        styles: Sequence,
        num_iters: int,
        *,
        out_hw: tuple[int, int],
        content_scale: float | None = None,
        blend_weights: Sequence[float] | None = None,
        init_mode: str = "content",
        hist_stats=None,
        seeds: Sequence[int] | None = None,
    ):
        """Optimise a batch of INDEPENDENT video frames in one device program
        (see _frames_batch_runner).  ``contents_u8``: (B, H, W, 3) uint8.
        Returns (pastiches (B, 1, h, w, 3) f32, displays (B, h, w, 3) u8),
        both device arrays.  Only valid for chain-free init modes."""
        assert init_mode in ("content", "random"), init_mode
        contents_u8 = jnp.asarray(contents_u8)
        assert contents_u8.ndim == 4, contents_u8.shape
        batch = contents_u8.shape[0]
        blend_weights = (
            list(blend_weights) if blend_weights is not None else [1.0 / max(len(styles), 1)] * len(styles)
        )
        aux: dict[str, Any] = {"content_u8": contents_u8}
        if hist_stats is not None:
            aux["mu_s"] = jnp.asarray(hist_stats[0])
            aux["qs"] = jnp.asarray(hist_stats[1])
        style_targets = {"style": self.style_targets(styles, blend_weights)}
        scale_key = (
            self._strength_scale({"content_img": np.zeros((1, *out_hw, 3), np.float32), **style_targets})
            if self.normalize_weights
            else ()
        )
        fkey = (
            tuple(out_hw),
            None if content_scale is None else float(content_scale),
            init_mode,
            False,
            hist_stats is not None,
            1.0,
            scale_key,
        )
        # DP over the "frames" mesh axis: shard the stacked batch when it
        # divides evenly (each chip optimizes its own frames; zero
        # collectives in steady state — the multi-chip mode for video)
        bsh = self._frames_sharding
        n_shards = bsh(4).mesh.shape["frames"] if bsh is not None else 1
        sharded = bsh is not None and batch % n_shards == 0
        if sharded:
            aux["content_u8"] = jax.device_put(
                aux["content_u8"],
                jax.sharding.NamedSharding(bsh(4).mesh, jax.sharding.PartitionSpec("frames")),
            )
        runner = self._frames_batch_runner(int(num_iters), fkey, hist_stats is not None, sharded)
        if seeds is None:
            seeds = range(batch)
        keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
        pastiches, displays, log = runner(self.params, aux, style_targets, keys)
        self.last_loss_log = log
        return pastiches, displays

    def prep_frame(self, content_u8, out_hw: tuple[int, int], hist_stats=None):
        """Preprocess (+histogram-match) one u8 frame on device — seeds the
        device-resident chain (frame 0 of a prev_warp pass, reference
        style.py:223-228)."""
        from ..ops.frame_ops import match_histogram_device, preprocess_u8

        key = ("prep", tuple(out_hw), hist_stats is not None)
        if key not in self._runners:
            if hist_stats is None:
                self._runners[key] = jax.jit(lambda u8: preprocess_u8(u8, size=tuple(out_hw)))
            else:
                self._runners[key] = jax.jit(
                    lambda u8, mu, qs: match_histogram_device(preprocess_u8(u8, size=tuple(out_hw)), mu, qs)
                )
        if hist_stats is None:
            return self._runners[key](jnp.asarray(content_u8))
        mu_s, qs = hist_stats
        return self._runners[key](jnp.asarray(content_u8), jnp.asarray(mu_s), jnp.asarray(qs))

    def optimize_frame(
        self,
        content_u8,
        styles: Sequence,
        num_iters: int,
        *,
        out_hw: tuple[int, int],
        content_scale: float | None = None,
        blend_weights: Sequence[float] | None = None,
        init_mode: str = "content",
        prev=None,
        blend=None,
        temporal_blend: float = 1.0,
        flow=None,
        weights_u8=None,
        use_temporal: bool = False,
        hist_stats=None,
        seed: int = 0,
    ):
        """Device-resident video-frame optimisation: returns (pastiche f32,
        display u8) BOTH as device arrays — the caller chains ``pastiche``
        into the next frame's ``prev`` and fetches ``display`` (asynchronously)
        for the PNG artifact.  See _frame_runner for what runs in-graph."""
        blend_weights = (
            list(blend_weights) if blend_weights is not None else [1.0 / max(len(styles), 1)] * len(styles)
        )
        aux: dict[str, Any] = {"content_u8": jnp.asarray(content_u8)}
        if hist_stats is not None:
            aux["mu_s"] = jnp.asarray(hist_stats[0])
            aux["qs"] = jnp.asarray(hist_stats[1])
        if prev is not None:
            aux["prev"] = prev if isinstance(prev, jax.Array) else jnp.asarray(prev, jnp.float32)
        if blend is not None:
            aux["blend"] = jnp.asarray(blend)
        if flow is not None:
            aux["flow"] = jnp.asarray(flow, jnp.float32)
        if weights_u8 is not None:
            aux["weights_u8"] = jnp.asarray(weights_u8)

        if content_scale is not None:
            from ..ops.resize import scale_shape

            probe = scale_shape(np.shape(content_u8)[:2], content_scale)
            assert tuple(probe) == tuple(out_hw), (probe, out_hw)
        style_targets = {"style": self.style_targets(styles, blend_weights)}
        scale_key = (
            self._strength_scale({"content_img": np.zeros((1, *out_hw, 3), np.float32), **style_targets})
            if self.normalize_weights
            else ()
        )
        runner = self._frame_runner(
            int(num_iters),
            (
                tuple(out_hw),
                None if content_scale is None else float(content_scale),
                init_mode,
                bool(use_temporal),
                hist_stats is not None,
                float(temporal_blend),
                scale_key,
            ),
        )
        pastiche, display, log = runner(self.params, aux, style_targets, jax.random.PRNGKey(seed))
        self.last_loss_log = log  # device array; fetch lazily if needed
        return pastiche, display

    # -- public API ----------------------------------------------------------

    def optimize(
        self,
        content,
        styles: Sequence,
        init,
        num_iters: int,
        *,
        transfer_type: str = "img_img",
        blend_weights: Sequence[float] | None = None,
        gram_frame_window: int | None = None,
        avg_frame_window: int = -1,
        temporal_target=None,
        temporal_weights=None,
        temporal_warp=None,
        save_iter: int = 0,
        save_callback: Callable[[np.ndarray, int], None] | None = None,
        run_checkpoint: str | None = None,
        checkpoint_every: int = 0,
        profile_dir: str | None = None,
        print_iter: int = 0,
    ) -> np.ndarray:
        """Optimise a pastiche (image or video batch) against content+style
        targets; the functional equivalent of reference optim.optimize
        (optim.py:111-255), including the circular temporal window schedule
        for video styles.

        ``run_checkpoint``: orbax directory for interruptible runs — saves
        (output, pastiche, optimizer state, window, iteration) every
        ``checkpoint_every`` iterations (default: every chunk) and resumes
        with optimizer state intact (the reference can only resume from
        pixels).  ``profile_dir``: capture a jax.profiler trace of one chunk.
        """
        content = jnp.asarray(content, jnp.float32)
        styles = [jnp.asarray(s, jnp.float32) for s in styles]
        init = jnp.asarray(init, jnp.float32)
        blend_weights = list(blend_weights) if blend_weights is not None else [1.0 / max(len(styles), 1)] * len(styles)

        video = "_vid" in transfer_type
        if video:
            assert gram_frame_window is not None
            windows = compute_windows(init.shape[0], [s.shape[0] for s in styles], gram_frame_window)
            gfw = gram_frame_window
        else:
            windows = [[0]] * max(len(styles), 1)
            gfw = init.shape[0]

        targets: dict[str, Any] = {"content_img": content}
        if temporal_warp is not None:
            # (prev_frame, warp_map): the flow warp runs inside the jitted
            # runner (see _runner) — one device call per frame instead of a
            # separate warp program + round-tripping the warped target
            src, wmap = temporal_warp
            tw = {"src": jnp.asarray(src, jnp.float32), "map": jnp.asarray(wmap, jnp.float32)}
            if temporal_weights is not None:
                tw["weights"] = jnp.asarray(temporal_weights, jnp.float32)
            targets["temporal_warp"] = tw
        elif temporal_target is not None:
            targets["temporal"] = capture_temporal_targets(
                jnp.asarray(temporal_target, jnp.float32),
                None if temporal_weights is None else jnp.asarray(temporal_weights, jnp.float32),
            )
        if video:
            if avg_frame_window == -1:
                static, dynamic = self.style_video_targets(styles, blend_weights, gfw)
                targets["style"] = static
                if dynamic:
                    targets["style_video"] = dynamic
        else:
            targets["style"] = self.style_targets(styles, blend_weights)

        # the full pastiche lives on host; windows move to device per scan
        # (per-window scatters through the device tunnel are needlessly slow)
        output = np.array(init)  # writable copy
        loss_logs = []

        resume = None
        if run_checkpoint is not None:
            from .checkpoint import load_state

            probe_pastiche = jnp.asarray(output[: min(gfw, output.shape[0])])
            probe_state = self._make_optimizer().init(probe_pastiche)
            restored = load_state(run_checkpoint, {"output": output, "pastiche": probe_pastiche}, probe_state)
            if restored is not None:
                blob, opt_restored, r_w, r_done = restored
                output = np.array(blob["output"])
                resume = (jnp.asarray(blob["pastiche"]), opt_restored, r_w, r_done)

        for w, window_start in enumerate(windows[0]):
            if resume is not None and w < resume[2]:
                continue  # window already completed per checkpoint
            if video:
                front_overlap, end_overlap = window_overlaps(windows[0], w, window_start, gfw, output.shape[0])
                idx = wrapping_indices(output.shape[0], window_start, gfw)
                pastiche = jnp.asarray(output[idx])
                if avg_frame_window != -1:
                    current = [
                        s[wrapping_indices(s.shape[0], windows[num + 1][w], avg_frame_window)]
                        if s.shape[0] != 1
                        else s
                        for num, s in enumerate(styles)
                    ]
                    static, dynamic = self.style_video_targets(current, blend_weights, gfw)
                    targets["style"] = static
                    if dynamic:
                        targets["style_video"] = dynamic
                # mask sized to the actual window (a 1-frame pastiche yields a
                # 1-frame window regardless of gram_frame_window)
                mask = jnp.asarray(overlap_grad_mask(len(idx), w, front_overlap, end_overlap))
                masked = w != 0
                # frozen-split eligibility (see _runner): grad-masked frames
                # never move, so hoist their extraction out of the scan.
                # Checkpointed runs keep the full-window path (the saved
                # optimizer-state shape must match the resume probe).
                frozen = None
                if masked and run_checkpoint is None and _WINDOW_SPLIT:
                    t_w = len(idx)
                    fo = max(0, min(front_overlap, t_w))
                    eo = min(end_overlap, t_w) if end_overlap > 0 else 0
                    if fo + eo > 0 and t_w - fo - eo > 0:
                        frozen = (fo, eo)
            else:
                pastiche = init
                idx = None
                mask = jnp.ones((1, 1, 1, 1), jnp.float32)
                masked = False
                frozen = None

            scale_key = self._strength_scale(targets)
            self._make_optimizer()
            opt_state = self._jit_opt_init(
                pastiche[frozen[0] : pastiche.shape[0] - frozen[1]] if frozen is not None else pastiche
            )
            done = 0
            if resume is not None and w == resume[2]:
                pastiche, opt_state, _, done = resume
                resume = None

            chunk = num_iters if save_iter <= 0 else save_iter
            if checkpoint_every > 0:
                chunk = min(chunk, checkpoint_every)
            if print_iter > 0:
                chunk = min(chunk, print_iter)
            profiled = False
            while done < num_iters:
                this = min(chunk, num_iters - done)
                runner = self._runner(this, scale_key, masked, frozen)
                if profile_dir is not None and not profiled:
                    # compile outside the trace (no execution: args are donated)
                    runner.lower(self.params, pastiche, opt_state, targets, mask).compile()
                    with jax.profiler.trace(profile_dir):
                        pastiche, opt_state, log = runner(self.params, pastiche, opt_state, targets, mask)
                        jax.block_until_ready(pastiche)
                    profiled = True
                else:
                    pastiche, opt_state, log = runner(self.params, pastiche, opt_state, targets, mask)
                done += this
                loss_logs.append(np.asarray(log))
                if print_iter > 0 and (
                    done // print_iter > (done - this) // print_iter or done == num_iters
                ):
                    # reference prints total loss at --print_iter (optim.py:228-229);
                    # fire on crossing each print_iter boundary, robust to chunk
                    # sizes capped by save_iter/checkpoint_every
                    print(f"Iteration {done} / {num_iters}, Loss: {float(loss_logs[-1][-1].sum()):g}")
                if save_callback is not None and done < num_iters:
                    save_callback(np.asarray(pastiche), w * num_iters + done)
                if run_checkpoint is not None and done < num_iters:
                    from .checkpoint import save_state

                    save_state(
                        run_checkpoint,
                        {"output": output, "pastiche": np.asarray(pastiche)},
                        opt_state,
                        w,
                        done,
                    )

            if video:
                output[idx] = np.asarray(pastiche)
            else:
                output = np.asarray(pastiche)

            if run_checkpoint is not None and w + 1 < len(windows[0]):
                from .checkpoint import save_state

                save_state(
                    run_checkpoint,
                    {"output": output, "pastiche": np.asarray(pastiche)},
                    opt_state,
                    w + 1,
                    0,
                )

        if run_checkpoint is not None:
            import shutil

            shutil.rmtree(run_checkpoint, ignore_errors=True)  # run completed

        self.last_loss_log = np.concatenate(loss_logs, axis=0) if loss_logs else None
        return output


__all__ = ["StyleEngine"]
