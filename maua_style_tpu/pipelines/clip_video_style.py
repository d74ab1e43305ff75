"""CLIP-guided video styling (reference: clip_video_style.py): the vid_img
multi-pass/flow-warp loop with the CLIP+VQGAN engine as the inner optimiser
(optimize_cached reuses style/text targets across frames).

The loop operates in the Caffe-BGR space (for histogram matching and the
artifact files), converting to [0, 1] RGB at the engine boundary — the
reference feeds BGR-mean-subtracted tensors straight into the VQGAN encoder
(clip_video_style.py:168-181), which clamps into a degenerate range; the
conversion here is the deliberate fix.
"""

from __future__ import annotations

import glob
import os
import random

import numpy as np

from .. import flow as flowmod
from .. import io as mio
from ..io.flo import flow_warp_map
from ..io.image import CAFFE_MEAN
from ..ops.histogram import match_histogram
from ..ops.resize import resize_bilinear_np
from ..utils import name
from .flow_prepass import process_content_video
from .vid_img import _mux_video, _warp
from .clip_vqgan import get_engine


def _bgr_to_rgb01(x: np.ndarray) -> np.ndarray:
    return np.clip((x + CAFFE_MEAN)[..., ::-1] / 255.0, 0.0, 1.0)


def _rgb01_to_bgr(x: np.ndarray) -> np.ndarray:
    return x[..., ::-1] * 255.0 - CAFFE_MEAN


def clip_video_style(args) -> None:
    output_dir = args.output_dir + "/" + name(args.content) + "_" + "_".join(name(s) for s in args.style)

    flow_model = flowmod.get_flow_model(args)
    frames = process_content_video(flow_model, args)
    content_size = mio.preprocess(frames[0]).shape[1:3]

    style_images_big = mio.process_style_images(args)
    engine = get_engine(args.vqgan_dir, args.clip_backbone)

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

        from .common import scale_styles

        style_images = scale_styles(
            style_images_big,
            (1, int(content_scale * content_size[0]), int(content_scale * content_size[1])),
            args.style_scale,
        )
        # (re-)encode style/text targets for this scale (reference
        # clip_video_style.py:57-58 via clip_vqgan.update_styles)
        engine.target_embeds = engine.update_styles(
            [_bgr_to_rgb01(s) for s in style_images], args.content_text, args.style_text
        )

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

                if size_n == 0 and pass_n == 0:
                    if args.init == "random":
                        pastiche = np.random.randn(*content_frames[1].shape).astype(np.float32) * 0.001
                    elif args.init == "prev_warp":
                        if pastiche is None:
                            pastiche = content_frames[0]
                        flo = f"{output_dir}/flow/{flow_direction}_{name(prev_frame)}_{name(this_frame)}.flo"
                        pastiche = _warp(pastiche, flow_warp_map(flo, pastiche.shape[1:3]))
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

                    flo = f"{output_dir}/flow/{flow_direction}_{name(prev_frame)}_{name(this_frame)}.flo"
                    pastiche = _warp(pastiche, flow_warp_map(flo, pastiche.shape[1:3]))
                    pastiche = (1 - args.temporal_blend) * blend_image + args.temporal_blend * pastiche

                output01 = engine.optimize_cached(
                    init=_bgr_to_rgb01(pastiche),
                    content=_bgr_to_rgb01(content_frames[1]),
                    styles=None,
                    mask=None,  # reference computes a flow mask but passes None (clip_video_style.py:164->173)
                    content_text=args.content_text,
                    style_text=args.style_text,
                    content_weight=args.content_weight,
                    style_weight=args.style_weight,
                    text_weight=getattr(args, "text_weight", 1.0),
                    iterations=max(num_iters // args.passes_per_scale, 1),
                )
                output_image = _rgb01_to_bgr(output01)

                pastiche = match_histogram(output_image, style_images_big[0], mode=args.match_histograms)
                pastiche = resize_bilinear_np(pastiche, size=content_frames[1].shape[1:3])

                disp = mio.deprocess(pastiche)
                if args.original_colors:
                    from ..ops.colors import original_colors

                    disp = original_colors(mio.deprocess(content_frames[1]), disp)
                disp.save(out_path)

            frames = list(reversed(frames))

        _mux_video(output_dir, current_size, args)
        prev_size = current_size


def main(argv=None):
    from .. import config

    args = config.get_args(argv)
    if args.seed >= 0:
        np.random.seed(args.seed)
    clip_video_style(args)


if __name__ == "__main__":
    main()
