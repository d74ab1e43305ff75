"""Video stylisation with flow-warped temporal coherence — the Ruder et al.
multi-pass driver (reference: style.py:145-311).

Per scale: flow pre-pass artifacts feed per-frame warped temporal targets;
``passes_per_scale`` passes alternate frame direction; every frame resumes
from its PNG artifact ({output_dir}/{work}/{size}/{pass}_{frame}.png —
the reference's exact schema).  The feature net + jitted step compile once
per scale and are reused across every frame and pass.
"""

from __future__ import annotations

import glob
import os
import random
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np

from .. import flow as flowmod
from .. import io as mio
from ..io.flo import flow_warp_map, reliable_flow_weighting
from ..ops.histogram import match_histogram
from ..ops.resize import resize_bilinear_np
from ..ops.warp import grid_sample
from ..utils import name
from .common import build_engine, scale_styles
from .flow_prepass import process_content_video

_WARP_JIT = jax.jit(grid_sample)


def _warp(pastiche: np.ndarray, warp_map: np.ndarray) -> np.ndarray:
    return np.asarray(_WARP_JIT(jnp.asarray(pastiche), jnp.asarray(warp_map)))


def vid_img(args) -> None:
    output_dir = args.output_dir + "/" + name(args.content) + "_" + "_".join(name(s) for s in args.style)

    flow_model = flowmod.get_flow_model(args)
    frames = process_content_video(flow_model, args)
    content_size = mio.preprocess(frames[0]).shape[1:3]

    style_images_big = mio.process_style_images(args)

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

        engine = build_engine(args, current_size)

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

                temporal_target = None
                temporal_weights = None
                if size_n == 0 and pass_n == 0:
                    if args.init == "random":
                        pastiche = np.random.randn(*content_frames[1].shape).astype(np.float32) * 0.001
                    elif args.init == "prev_warp":
                        if pastiche is None:
                            pastiche = content_frames[0]
                        flo_file = f"{output_dir}/flow/{flow_direction}_{name(prev_frame)}_{name(this_frame)}.flo"
                        pastiche = _warp(pastiche, flow_warp_map(flo_file, pastiche.shape[1:3]))
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

                    flo_file = f"{output_dir}/flow/{flow_direction}_{name(prev_frame)}_{name(this_frame)}.flo"
                    warp_image = _warp(pastiche, flow_warp_map(flo_file, pastiche.shape[1:3]))

                    weight_file = f"{output_dir}/flow/{flow_direction}_{name(prev_frame)}_{name(this_frame)}.png"
                    temporal_weights = resize_bilinear_np(
                        reliable_flow_weighting(weight_file), size=pastiche.shape[1:3]
                    )
                    temporal_target = warp_image

                    pastiche = (1 - args.temporal_blend) * blend_image + args.temporal_blend * pastiche

                output_image = engine.optimize(
                    content_frames[1],
                    style_images,
                    pastiche,
                    num_iters // args.passes_per_scale,
                    transfer_type="vid_img",
                    blend_weights=args.style_blend_weights,
                    temporal_target=temporal_target,
                    temporal_weights=temporal_weights,
                )

                pastiche = match_histogram(output_image, style_images_big[0], mode=args.match_histograms)

                disp = mio.deprocess(pastiche)
                if args.original_colors:
                    from ..ops.colors import original_colors

                    disp = original_colors(mio.deprocess(content_frames[1]), disp)
                disp.save(out_path)

            frames = list(reversed(frames))

        _mux_video(output_dir, current_size, args)
        prev_size = current_size


def _mux_video(output_dir: str, size: int, args) -> None:
    """Assemble the final pass's frames into a video (reference style.py:302-304),
    with a frame-stack fallback when ffmpeg is absent."""
    pattern = f"{output_dir}/{size}/{args.passes_per_scale}_%05d.png"
    out = f"{output_dir}/{name(output_dir)}_{size}.mp4"
    if shutil.which("ffmpeg"):
        ffargs = []
        for k, v in (args.ffmpeg or {}).items():
            ffargs += [f"-{k}", str(v)]
        subprocess.run(
            ["ffmpeg", "-y", "-v", "error", "-i", pattern, *ffargs, out], check=False
        )
    else:
        files = sorted(glob.glob(f"{output_dir}/{size}/{args.passes_per_scale}_*.png"))
        if files:
            from PIL import Image

            stack = np.stack([np.asarray(Image.open(f).convert("RGB")) for f in files])
            np.save(out.replace(".mp4", ".npy"), stack)


__all__ = ["vid_img"]
