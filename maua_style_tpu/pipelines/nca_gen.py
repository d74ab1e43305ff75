"""Neural-CA texture generation (reference: NCA_gen.py).

Three rollout modes, all as jitted CA steps:
1. evolution video: 600 frames with an exponential step schedule
   (min(2**(k//30), 32) steps/frame) from a zero seed;
2. checkpoint grid: every training checkpoint evolves its own column of one
   shared grid (early checkpoints visibly diverge);
3. text-mask modulation: the update rate is a rendered-text mask, with a
   fade-out tail.

Usage: python -m maua_style_tpu.pipelines.nca_gen style.png out_dir/
"""

from __future__ import annotations

import os
import sys
from glob import glob

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image, ImageDraw, ImageFilter, ImageFont

from ..io.video import save_video
from ..io.image import CAFFE_MEAN
from ..models import nca
from ..utils import name


def _zoom(img: np.ndarray, scale: int = 2) -> np.ndarray:
    return np.repeat(np.repeat(img, scale, 0), scale, 1)


def _write_video(frames01: list[np.ndarray], path: str, fps: float = 30.0):
    stack = np.stack([np.clip(f, 0, 1) * 255.0 for f in frames01])
    # save_video expects Caffe-BGR space; convert from RGB [0,255]
    save_video(stack[..., ::-1] - CAFFE_MEAN, path, fps=fps)


def evolution_video(ca_params, out_path: str, num_frames: int = 600, size: int = 256, zoom: int = 2):
    step = jax.jit(nca.ca_step)
    x = nca.seed_state(1, size)
    key = jax.random.PRNGKey(0)
    frames = []
    for k in range(num_frames):
        step_n = min(2 ** (k // 30), 32)
        for _ in range(step_n):
            key, sub = jax.random.split(key)
            x = step(ca_params, x, sub)
        frames.append(_zoom(np.asarray(nca.to_rgb(x[0])), zoom))
    _write_video(frames, out_path)


def checkpoint_grid_video(ckpt_paths: list[str], out_path: str, num_frames: int = 600, w: int = 128):
    models = [nca.load_ca(p) for p in ckpt_paths]
    if not models:
        return
    chn = models[0]["w2"].shape[-1]
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, 512, w * len(models) + 2, chn)) * 0.1
    step = jax.jit(nca.ca_step)
    frames = []
    for k in range(num_frames):
        for _ in range(8):
            for ci, params in enumerate(models):
                key, sub = jax.random.split(key)
                sub_x = x[:, :, ci * w : ci * w + w + 2]
                out = step(params, sub_x, sub)
                x = x.at[:, :, ci * w + 1 : ci * w + w + 1].set(out[:, :, 1:-1])
        frames.append(_zoom(np.asarray(nca.to_rgb(x[0])), 2))
    _write_video(frames, out_path)


def text_mask(text: str = "WΛV", font_size: int = 256, pad: int = 64) -> np.ndarray:
    try:
        font = ImageFont.truetype("DejaVuSans.ttf", font_size)
    except OSError:
        font = ImageFont.load_default()
    bbox = ImageDraw.Draw(Image.new("L", (4, 4))).textbbox((0, 0), text, font=font)
    w, h = bbox[2] - bbox[0], bbox[3] - bbox[1]
    im = Image.new("L", (w + pad * 2, h + pad * 2))
    ImageDraw.Draw(im).text((pad - bbox[0], pad - bbox[1]), text, fill=255, font=font)
    im = im.filter(ImageFilter.GaussianBlur(5))
    p = np.float32(im)
    return p / p.max() * 0.6 + 0.05


def text_video(ca_params, out_path: str, text: str = "WΛV", num_frames: int = 600):
    p = text_mask(text)
    h, w = p.shape
    chn = ca_params["w2"].shape[-1]
    x = jnp.zeros((1, h, w, chn))
    rate = jnp.asarray(p)
    step = jax.jit(nca.ca_step)
    key = jax.random.PRNGKey(0)
    frames = []
    for k in range(num_frames):
        step_n = min(int(2 ** (k / 30)), 32)
        for _ in range(step_n):
            key, sub = jax.random.split(key)
            x = step(ca_params, x, sub, rate)
        img = np.asarray(nca.to_rgb(x[0])) * min(1.0 - (k - 400) / 100, 1.0)
        frames.append(_zoom(img, 2))
    _write_video(frames, out_path)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    import argparse

    ap = argparse.ArgumentParser("nca_gen")
    ap.add_argument("style_file")
    ap.add_argument("out_dir")
    ap.add_argument("--num_frames", type=int, default=600)
    ap.add_argument("--checkpoint", type=str, default=None)
    ap.add_argument("--text", type=str, default=None)
    args = ap.parse_args(argv)

    stem = name(args.style_file)
    ckpt = args.checkpoint or f"{args.out_dir}/{stem}_7500.npz"
    ca_params = nca.load_ca(ckpt)
    tag = name(ckpt).split("_")[-1]

    evolution_video(ca_params, f"{args.out_dir}/{stem}_{tag}.mp4", args.num_frames)
    ckpts = sorted(glob(f"{args.out_dir}/{stem}*.npz"))[2:-2]
    checkpoint_grid_video(ckpts, f"{args.out_dir}/{stem}_checkgrid.mp4", args.num_frames)
    if args.text:
        text_video(ca_params, f"{args.out_dir}/{stem}-{tag}-wav.mp4", args.text, args.num_frames)


if __name__ == "__main__":
    main()
