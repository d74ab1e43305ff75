"""Video flow pre-pass: extract frames, compute + cache forward/backward flow
and reliability maps (reference: load.py:141-188).

Artifacts (same schema as the reference, so runs resume across crashes):
    {output_dir}/{content}_{styles}/frames/%05d.png
    {output_dir}/{content}_{styles}/flow/forward_{a}_{b}.flo  (+ .png reliability)
    {output_dir}/{content}_{styles}/flow/backward_{b}_{a}.flo (+ .png)

Frame extraction uses ffmpeg when available; otherwise the content may be a
frame directory, .gif, or .npy/.npz stack (io/video.py fallbacks).
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np
from PIL import Image

from .. import flow as flowmod
from ..io.flo import write_flo
from ..io.video import read_video_rgb
from ..utils import name


def extract_frames(content: str, frames_dir: str) -> None:
    os.makedirs(frames_dir, exist_ok=True)
    if len(os.listdir(frames_dir)) > 0:
        return
    if shutil.which("ffmpeg") and os.path.isfile(content) and not content.endswith((".npy", ".npz", ".gif")):
        subprocess.run(
            ["ffmpeg", "-v", "error", "-i", content, os.path.join(frames_dir, "%05d.png")], check=True
        )
        return
    frames = read_video_rgb(content)
    for i, frame in enumerate(frames):
        Image.fromarray(np.clip(frame, 0, 255).astype(np.uint8)).save(
            os.path.join(frames_dir, f"{i + 1:05d}.png")
        )


def process_content_video(model, args) -> list[str]:
    """Run the flow pre-pass; returns the ordered frame paths
    (reference load.py:141-188)."""
    work_dir = args.output_dir + "/" + name(args.content) + "_" + "_".join(name(s) for s in args.style)
    frames_dir = work_dir + "/frames/"
    flow_dir = work_dir + "/flow/"
    os.makedirs(work_dir, exist_ok=True)
    os.makedirs(flow_dir, exist_ok=True)
    extract_frames(args.content, frames_dir)

    images = [
        frames_dir + f for f in sorted(os.listdir(frames_dir)) if f.endswith(".png") and "_" not in f
    ]
    images.append(images[0])  # wrap-around pair for loopable videos
    for img_file1, img_file2 in zip(images[:-1], images[1:]):
        n1, n2 = name(img_file1), name(img_file2)
        if os.path.isfile(f"{flow_dir}/backward_{n2}_{n1}.png"):
            continue
        im1 = np.array(Image.open(img_file1).convert("RGB"))
        im2 = np.array(Image.open(img_file2).convert("RGB"))

        # Fused pair models (flow.get_flow_pair_model) return all four maps
        # from one device program; plain estimate closures return one flow.
        result = model(im1, im2)
        if isinstance(result, tuple):
            forward, backward, fwd_rel, bwd_rel = result
        else:
            forward, backward = result, model(im2, im1)
            fwd_rel = bwd_rel = None
        write_flo(forward, f"{flow_dir}/forward_{n1}_{n2}.flo")
        write_flo(backward, f"{flow_dir}/backward_{n2}_{n1}.flo")

        if getattr(args, "no_check_occlusion", False):
            fwd_img = Image.fromarray(flowmod.flow_to_image(forward)).convert("L")
            bwd_img = Image.fromarray(flowmod.flow_to_image(backward)).convert("L")
        else:
            if fwd_rel is None:
                fwd_rel = flowmod.check_consistency(forward, backward)
                bwd_rel = flowmod.check_consistency(backward, forward)
            fwd_img = Image.fromarray(((1 - fwd_rel) * 255).astype(np.uint8)).convert("L")
            bwd_img = Image.fromarray(((1 - bwd_rel) * 255).astype(np.uint8)).convert("L")
        fwd_img.save(f"{flow_dir}/forward_{n1}_{n2}.png")
        bwd_img.save(f"{flow_dir}/backward_{n2}_{n1}.png")

        if getattr(args, "verbose", False):
            print(f"processed optical flow: {n1} <---> {n2}")

    images.pop(-1)
    return images


__all__ = ["process_content_video", "extract_frames"]
