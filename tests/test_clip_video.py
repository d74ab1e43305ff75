"""clip_video_style pipeline end-to-end at tiny sizes with tiny models."""

import glob
import os

import numpy as np
import pytest
from PIL import Image

from maua_style_tpu import config


def test_clip_video_style_end_to_end(tmp_path, monkeypatch):
    import maua_style_tpu.pipelines.clip_vqgan as cv
    from maua_style_tpu.models import vqgan as vq
    from maua_style_tpu.models.clip import CLIP
    from maua_style_tpu.models.clip.model import CLIPConfig
    from maua_style_tpu.pipelines.clip_video_style import clip_video_style

    tiny_vq = vq.VQGANConfig(embed_dim=8, n_embed=32, ch=16, ch_mult=(1, 2), num_res_blocks=1,
                             attn_resolutions=(8,), resolution=16, z_channels=8)
    monkeypatch.setattr(vq, "load_vqgan", lambda d, s=0: (vq.init_vqgan_params(tiny_vq, 0), tiny_vq))
    tiny_clip = CLIPConfig(image_resolution=16, patch_size=8, vision_width=32, vision_layers=1, vision_heads=2,
                           embed_dim=16, text_width=32, text_heads=2, text_layers=1)
    monkeypatch.setattr(cv, "_load_clip", lambda b: CLIP(cfg=tiny_clip))
    cv._ENGINE = None  # reset the cached engine

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, 24, 24, 3), dtype=np.uint8).astype(np.uint8)
    np.save(str(tmp_path / "vid.npy"), frames)
    Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8).astype(np.uint8)).save(
        str(tmp_path / "style.png")
    )

    args = config.get_args([
        "--content", str(tmp_path / "vid.npy"),
        "--style", str(tmp_path / "style.png"),
        "--style_text", "a watercolor painting",
        "--output_dir", str(tmp_path / "out"),
        "--image_sizes", "16",
        "--num_iters", "4",
        "--passes_per_scale", "2",
        "--flow_models", "spynet",
        "--init", "content",
        "--gpu", "c",
        "--scaling_args", str(tmp_path / "missing.json"),
        "--seed", "0",
    ])
    clip_video_style(args)
    cv._ENGINE = None

    out_dir = str(tmp_path / "out" / "vid_style")
    assert len(glob.glob(f"{out_dir}/16/1_*.png")) == 3
    assert len(glob.glob(f"{out_dir}/16/2_*.png")) == 3
    img = np.asarray(Image.open(glob.glob(f"{out_dir}/16/2_*.png")[0]))
    assert img.ndim == 3 and np.isfinite(img).all()
