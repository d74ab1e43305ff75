"""Frame warping + video muxing helpers shared by the video pipelines."""

from __future__ import annotations

import glob
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.warp import grid_sample
from ..utils import name

_WARP_JIT = jax.jit(grid_sample)


def warp(pastiche: np.ndarray, warp_map: np.ndarray) -> np.ndarray:
    return np.asarray(_WARP_JIT(jnp.asarray(pastiche), jnp.asarray(warp_map)))


def mux_video(output_dir: str, size: int, args) -> None:
    """Assemble the final pass's frames into a video (reference style.py:302-304),
    with a frame-stack fallback when ffmpeg is absent."""
    pattern = f"{output_dir}/{size}/{args.passes_per_scale}_%05d.png"
    out = f"{output_dir}/{name(output_dir)}_{size}.mp4"
    if shutil.which("ffmpeg"):
        ffargs = []
        for k, v in (args.ffmpeg or {}).items():
            ffargs += [f"-{k}", str(v)]
        subprocess.run(["ffmpeg", "-y", "-v", "error", "-i", pattern, *ffargs, out], check=False)
    else:
        files = sorted(glob.glob(f"{output_dir}/{size}/{args.passes_per_scale}_*.png"))
        if files:
            from PIL import Image

            stack = np.stack([np.asarray(Image.open(f).convert("RGB")) for f in files])
            np.save(out.replace(".mp4", ".npy"), stack)


__all__ = ["warp", "mux_video"]
