"""Shared multi-pass video frame scheduler (reference: style.py:145-311 and
clip_video_style.py:35-197, which duplicate the same loop around different
inner optimisers).

Handles: per-scale skip when the next scale is complete, per-pass skip,
optional loop rotation, alternating frame direction, per-frame artifact
resume, pastiche initialisation (random / prev_warp / content / previous
pass/scale artifacts), flow-warped temporal targets + blending, saving, and
muxing.  The per-scale setup and the inner optimisation are injected.
"""

from __future__ import annotations

import glob
import os
import random

import numpy as np

from .. import io as mio
from ..io.flo import flow_warp_map, reliable_flow_weighting
from ..ops.histogram import match_histogram
from ..ops.resize import resize_bilinear_np
from ..utils import name
from .vid_img_mux import mux_video, warp


def run_video_style_passes(
    args,
    output_dir: str,
    frames: list[str],
    style_images_big: list[np.ndarray],
    *,
    on_scale,
    optimize_frame,
    use_temporal_targets: bool,
) -> None:
    """Drive the (scale, pass, frame) triple loop.

    on_scale(current_size, style_images) -> scale context for optimize_frame.
    optimize_frame(ctx, content_frame, pastiche, temporal_target,
    temporal_weights, num_iters) -> stylised frame (Caffe-BGR NHWC).
    ``use_temporal_targets``: vid_img feeds the flow-warped previous frame as
    a weighted temporal target; the CLIP pipeline does not (the reference
    computes but discards it, clip_video_style.py:164->173).
    """
    from .common import scale_styles

    content_size = mio.preprocess(frames[0]).shape[1:3]

    prev_size = args.image_sizes[0]
    for size_n, (current_size, num_iters) in enumerate(zip(args.image_sizes, args.num_iters)):
        next_size = args.image_sizes[min(len(args.image_sizes) - 1, size_n + 1)]
        if len(glob.glob(f"{output_dir}/{next_size}/*.png")) == len(frames):
            print(f"Skipping size: {current_size}, already done.")
            prev_size = current_size
            continue

        print(f"\nCurrent size {current_size}px")
        os.makedirs(f"{output_dir}/{current_size}", exist_ok=True)
        content_scale = current_size / max(*content_size)

        style_images = scale_styles(
            style_images_big,
            (1, int(content_scale * content_size[0]), int(content_scale * content_size[1])),
            args.style_scale,
        )
        ctx = on_scale(current_size, style_images)

        for pass_n in range(args.passes_per_scale):
            pastiche = None
            if args.loop:
                start_idx = random.randrange(0, len(frames) - 1)
                frames = frames[start_idx:] + frames[:start_idx]

            if len(glob.glob(f"{output_dir}/{current_size}/{pass_n + 2}_*.png")) == len(frames):
                print(f"Skipping pass: {pass_n + 1}, already done.")
                frames = list(reversed(frames))
                continue

            frame_pairs = zip(
                frames + frames[: 11 if args.loop else 1],
                frames[1:] + frames[: 10 if args.loop else 1],
            )
            for n, (prev_frame, this_frame) in enumerate(frame_pairs):
                out_path = f"{output_dir}/{current_size}/{pass_n + 1}_{name(this_frame)}.png"
                if os.path.isfile(out_path) and not n >= len(frames):
                    continue
                print(f"Optimizing... size: {current_size}, pass: {pass_n + 1}, frame: {name(this_frame)}")

                content_frames = [
                    resize_bilinear_np(mio.preprocess(prev_frame), scale_factor=content_scale),
                    resize_bilinear_np(mio.preprocess(this_frame), scale_factor=content_scale),
                ]
                content_frames = [
                    match_histogram(f, style_images_big[0], mode=args.match_histograms) for f in content_frames
                ]
                flow_direction = "forward" if pass_n % 2 == 0 else "backward"
                flo_file = f"{output_dir}/flow/{flow_direction}_{name(prev_frame)}_{name(this_frame)}.flo"

                temporal_target = None
                temporal_weights = None
                if size_n == 0 and pass_n == 0:
                    if args.init == "random":
                        pastiche = np.random.randn(*content_frames[1].shape).astype(np.float32) * 0.001
                    elif args.init == "prev_warp":
                        if pastiche is None:
                            pastiche = content_frames[0]
                        pastiche = warp(pastiche, flow_warp_map(flo_file, pastiche.shape[1:3]))
                    else:
                        pastiche = content_frames[1].copy()
                else:
                    if pass_n == 0:
                        src_size = prev_size if n <= len(frames) else current_size
                        src_pass = args.passes_per_scale if n <= len(frames) else pass_n + 1
                    else:
                        src_size = current_size
                        src_pass = pass_n if n <= len(frames) else pass_n + 1
                    if pastiche is None:
                        ifile = f"{output_dir}/{src_size}/{src_pass}_{name(prev_frame)}.png"
                        pastiche = resize_bilinear_np(mio.preprocess(ifile), size=content_frames[0].shape[1:3])
                    bfile = f"{output_dir}/{src_size}/{src_pass}_{name(this_frame)}.png"
                    blend_image = resize_bilinear_np(mio.preprocess(bfile), size=content_frames[0].shape[1:3])

                    if use_temporal_targets:
                        # (prev frame, warp map) — the engine fuses the flow
                        # warp into the jitted optimisation program (one
                        # device call per frame; reference warps separately,
                        # style.py:273-276)
                        temporal_target = (pastiche, flow_warp_map(flo_file, pastiche.shape[1:3]))
                        weight_file = (
                            f"{output_dir}/flow/{flow_direction}_{name(prev_frame)}_{name(this_frame)}.png"
                        )
                        temporal_weights = resize_bilinear_np(
                            reliable_flow_weighting(weight_file), size=pastiche.shape[1:3]
                        )

                    pastiche = (1 - args.temporal_blend) * blend_image + args.temporal_blend * pastiche

                output_image = optimize_frame(
                    ctx, content_frames[1], pastiche, temporal_target, temporal_weights,
                    max(num_iters // args.passes_per_scale, 1),
                )

                pastiche = match_histogram(output_image, style_images_big[0], mode=args.match_histograms)
                if pastiche.shape != content_frames[1].shape:
                    pastiche = resize_bilinear_np(pastiche, size=content_frames[1].shape[1:3])

                disp = mio.deprocess(pastiche)
                if args.original_colors:
                    from ..ops.colors import original_colors

                    disp = original_colors(mio.deprocess(content_frames[1]), disp)
                disp.save(out_path)

            frames = list(reversed(frames))

        mux_video(output_dir, current_size, args)
        prev_size = current_size


__all__ = ["run_video_style_passes"]
