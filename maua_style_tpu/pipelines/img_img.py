"""Multi-resolution image->image style transfer (reference: style.py:22-73).

Per scale: resume from {output}_{size}.png if present, rescale content/style,
init the pastiche (random*0.001 / content / file), histogram-match, optimise
with the jitted engine, save.  Each scale may swap model/optimizer/mesh via
the scaling table.
"""

from __future__ import annotations

import os

import numpy as np

from .. import io as mio
from ..ops.histogram import match_histogram
from ..ops.resize import resize_bilinear_np
from .common import build_engine, scale_styles


def img_img(args) -> np.ndarray | None:
    style_images_big = mio.process_style_images(args)
    content_image_big = match_histogram(mio.preprocess(args.content), style_images_big, mode=args.match_histograms)
    content_size = content_image_big.shape[1:3]

    if args.init not in ("content", "random"):
        pastiche = mio.preprocess(args.init)
    else:
        pastiche = None

    if getattr(args, "fuse_scales", False):
        fused = _fused_pyramid(args, content_image_big, style_images_big, content_size, pastiche)
        if fused is not None:
            return fused

    for current_size, num_iters in zip(args.image_sizes, args.num_iters):
        print(f"\nCurrent size {current_size}px")
        if os.path.exists(f"{args.output}_{current_size}.png"):
            pastiche = mio.preprocess(f"{args.output}_{current_size}.png")
            continue

        content_scale = current_size / max(*content_size)
        content_image = resize_bilinear_np(content_image_big, scale_factor=content_scale)
        style_images = scale_styles(style_images_big, content_image.shape, args.style_scale)

        h, w = content_image.shape[1:3]
        if args.init == "random" and pastiche is None:
            pastiche = np.random.randn(1, h, w, 3).astype(np.float32) * 0.001
        elif args.init == "content" and pastiche is None:
            pastiche = resize_bilinear_np(content_image_big, size=(h, w))
        else:
            pastiche = resize_bilinear_np(np.asarray(pastiche), size=(h, w))
        pastiche = match_histogram(pastiche, style_images_big, mode=args.match_histograms)

        engine = build_engine(args, current_size)

        def save_snapshot(arr, iteration):
            mio.save_tensor_to_file(arr, args, iteration=iteration, size=current_size)

        output_image = engine.optimize(
            content_image,
            style_images,
            pastiche,
            num_iters,
            transfer_type="img_img",
            blend_weights=args.style_blend_weights,
            save_iter=args.save_iter,
            save_callback=save_snapshot if args.save_iter > 0 else None,
            run_checkpoint=f"{args.output}_{current_size}_runstate" if getattr(args, "checkpoint_every", 0) else None,
            checkpoint_every=getattr(args, "checkpoint_every", 0),
            profile_dir=getattr(args, "profile_dir", None),
            print_iter=args.print_iter if args.verbose else 0,
        )

        pastiche = match_histogram(output_image, style_images_big, mode=args.match_histograms)
        mio.save_tensor_to_file(pastiche, args, size=current_size)

    return pastiche


def _fused_pyramid(args, content_image_big, style_images_big, content_size, pastiche) -> np.ndarray | None:
    """--fuse_scales: the whole remaining pyramid as ONE device program
    (engine.optimize_pyramid) — one executable load per run instead of one
    per scale (30-600 s each through a tunneled chip).  Returns None when
    the request is incompatible (per-iteration snapshots, run-state
    checkpoints, per-scale model swaps, multi-style histogram matching) and
    the caller falls through to the reference-faithful per-scale loop."""
    import copy

    from ..config import set_model_args

    def fallback(reason: str):
        print(f"Warning: --fuse_scales unavailable ({reason}); using the per-scale loop.")
        return None

    if args.save_iter > 0:
        return fallback("--save_iter writes per-iteration snapshots")
    if getattr(args, "checkpoint_every", 0):
        return fallback("--checkpoint_every needs per-chunk run-state saves")
    if getattr(args, "profile_dir", None):
        return fallback("--profile_dir traces one chunk at a time")
    if args.match_histograms and len(style_images_big) != 1:
        return fallback("multi-style histogram matching is host-only")

    # resume: consume leading scales that already have artifacts, exactly
    # like the loop's per-scale `continue`
    todo = list(zip(args.image_sizes, args.num_iters))
    while todo and os.path.exists(f"{args.output}_{todo[0][0]}.png"):
        pastiche = mio.preprocess(f"{args.output}_{todo[0][0]}.png")
        todo.pop(0)
    if not todo:
        return pastiche

    # the scaling table may swap model/optimizer per scale — a single fused
    # program can't span that; compare the post-swap config across scales
    views = []
    for size, _ in todo:
        c = copy.copy(args)
        c.__dict__ = dict(args.__dict__)
        set_model_args(c, size)
        views.append({k: v for k, v in c.__dict__.items() if k != "devices"})
    if any(v != views[0] for v in views[1:]):
        return fallback("the scaling table swaps settings across these scales")

    schedule = []
    contents_per_scale = []
    styles_per_scale = []
    for size, num_iters in todo:
        ci = resize_bilinear_np(content_image_big, scale_factor=size / max(*content_size))
        contents_per_scale.append(ci)
        schedule.append((ci.shape[1:3], num_iters))
        styles_per_scale.append(scale_styles(style_images_big, ci.shape, args.style_scale))

    h0, w0 = schedule[0][0]
    if args.init == "random" and pastiche is None:
        pastiche = np.random.randn(1, h0, w0, 3).astype(np.float32) * 0.001
    elif args.init == "content" and pastiche is None:
        pastiche = resize_bilinear_np(content_image_big, size=(h0, w0))
    else:
        pastiche = resize_bilinear_np(np.asarray(pastiche), size=(h0, w0))
    pastiche = match_histogram(pastiche, style_images_big, mode=args.match_histograms)

    hist_stats = None
    if args.match_histograms:
        from ..ops.frame_ops import style_hist_stats

        hist_stats = style_hist_stats(style_images_big[0], mode="avg")

    engine = build_engine(args, todo[0][0])
    print(f"\nFused pyramid: {len(todo)} scale(s) {[s for s, _ in todo]} in one program")
    outs = engine.optimize_pyramid(
        contents_per_scale, styles_per_scale, pastiche, schedule,
        blend_weights=args.style_blend_weights, hist_stats=hist_stats,
    )
    for (size, _), out in zip(todo, outs):
        mio.save_tensor_to_file(out, args, size=size)
    return outs[-1]


__all__ = ["img_img"]
