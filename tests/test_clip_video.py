"""clip_video_style pipeline end-to-end at tiny sizes with tiny models."""

import glob
import os

import numpy as np
import pytest
from PIL import Image

from maua_style_tpu import config


@pytest.mark.slow
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


@pytest.mark.slow
def test_clip_video_update_styles_per_scale_and_mask_quirk(tmp_path, monkeypatch):
    """Per-scale style re-encoding (reference clip_video_style.py:57-58) and
    the mask-computed-but-unused quirk (clip_video_style.py:164->173): the
    engine must get update_styles once per scale with that scale's style
    sizes, and optimize_cached must receive mask=None."""
    import maua_style_tpu.pipelines.clip_video_style as cvs

    calls = {"update_styles": [], "optimize": []}

    class FakeEngine:
        target_embeds = None

        def update_styles(self, styles, content_text, style_text):
            calls["update_styles"].append([s.shape for s in styles])
            return "embeds"

        def optimize_cached(self, **kw):
            calls["optimize"].append(kw)
            return np.clip(kw["init"], 0.0, 1.0)

    monkeypatch.setattr(cvs, "get_engine", lambda d, b: FakeEngine())

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 24, 24, 3), dtype=np.uint8)
    np.save(str(tmp_path / "vid.npy"), frames)
    Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)).save(str(tmp_path / "style.png"))

    args = config.get_args([
        "--content", str(tmp_path / "vid.npy"),
        "--style", str(tmp_path / "style.png"),
        "--output_dir", str(tmp_path / "out"),
        "--image_sizes", "12,16",
        "--num_iters", "2,2",
        "--passes_per_scale", "1",
        "--flow_models", "spynet",
        "--init", "content",
        "--gpu", "c",
        "--scaling_args", str(tmp_path / "missing.json"),
        "--seed", "0",
    ])
    cvs.clip_video_style(args)

    # one update_styles per scale, styles rescaled per scale (area-matched)
    assert len(calls["update_styles"]) == 2
    assert calls["update_styles"][0] != calls["update_styles"][1]
    # every frame optimisation got the reference's mask=None quirk
    assert len(calls["optimize"]) == 4  # 2 scales x 1 pass x 2 frames
    assert all(kw["mask"] is None for kw in calls["optimize"])
    assert all(kw["styles"] is None for kw in calls["optimize"])
