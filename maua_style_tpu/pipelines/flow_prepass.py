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
import threading

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


def _list_frames_and_missing(args) -> tuple[list[str], list[tuple[str, str]], str]:
    """Extract frames (cheap, host/ffmpeg) and list the frame-pair flow
    artifacts that still need computing."""
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
    missing = [
        (f1, f2)
        for f1, f2 in zip(images[:-1], images[1:])
        if not os.path.isfile(f"{flow_dir}/backward_{name(f2)}_{name(f1)}.png")
    ]
    images.pop(-1)
    return images, missing, flow_dir


def start_flow_prepass(args) -> tuple[list[str], "callable"]:
    """Overlapped flow pre-pass: extract frames NOW, compute flow in a
    background thread while the caller starts optimizing.

    The reference serialises the whole pre-pass before the first styled frame
    (load.py:141-188 runs to completion first); here the first optimisation
    pass (which never reads flow unless ``--init prev_warp``) overlaps it —
    the device queue interleaves the flow programs with the style programs
    and the PNG/.flo writes ride the flow thread.  Artifacts and their schema
    are identical.

    Returns ``(frames, join)``; call ``join()`` before the first flow-artifact
    read (it re-raises any pre-pass error).
    """
    images, missing, flow_dir = _list_frames_and_missing(args)
    if not missing:
        return images, lambda: None

    box: dict = {}

    def work():
        try:
            model = flowmod.get_flow_pair_model(args)
            _compute_flow_pairs(model, missing, flow_dir, args)
        except BaseException as e:  # noqa: BLE001 — re-raised in join()
            box["err"] = e

    t = threading.Thread(target=work, name="flow-prepass", daemon=True)
    t.start()

    def join():
        t.join()
        if "err" in box:
            raise box["err"]

    return images, join


def process_content_video(model, args) -> list[str]:
    """Run the flow pre-pass synchronously; returns the ordered frame paths
    (reference load.py:141-188)."""
    images, missing, flow_dir = _list_frames_and_missing(args)
    if missing:
        _compute_flow_pairs(model, missing, flow_dir, args)
    return images


def _compute_flow_pairs(model, missing, flow_dir, args) -> None:
    def write_pair(img_file1, img_file2, forward, backward, fwd_rel, bwd_rel):
        n1, n2 = name(img_file1), name(img_file2)
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

    def load(f):
        return np.array(Image.open(f).convert("RGB"))

    batched = getattr(model, "batched", None)
    if batched is not None and len(missing) > 1:
        # whole-video prepass as a few PAIR-BATCHED device programs (8 pairs
        # per call) instead of one round trip per pair — same artifacts
        CHUNK = 8
        for i in range(0, len(missing), CHUNK):
            chunk = missing[i : i + CHUNK]
            # pad short tail chunks by repeating the last pair so every call
            # compiles to the same batch shape
            padded = chunk + [chunk[-1]] * (CHUNK - len(chunk))
            ims1 = np.stack([load(f1) for f1, _ in padded])
            ims2 = np.stack([load(f2) for _, f2 in padded])
            fwd, bwd, fr, br = batched(ims1, ims2)
            for k, (f1, f2) in enumerate(chunk):
                write_pair(f1, f2, fwd[k], bwd[k], fr[k], br[k])
    else:
        for img_file1, img_file2 in missing:
            im1, im2 = load(img_file1), load(img_file2)
            # Fused pair models (flow.get_flow_pair_model) return all four
            # maps from one device program; plain estimate closures return
            # one flow.
            result = model(im1, im2)
            if isinstance(result, tuple):
                forward, backward, fwd_rel, bwd_rel = result
            else:
                forward, backward = result, model(im2, im1)
                fwd_rel = bwd_rel = None
            write_pair(img_file1, img_file2, forward, backward, fwd_rel, bwd_rel)


__all__ = ["process_content_video", "start_flow_prepass", "extract_frames"]
