"""Video pipelines end-to-end at tiny sizes: vid_img (flow-warped temporal
coherence, multi-pass) and img_vid (Gram frame windows)."""

import glob
import os

import numpy as np
import pytest
from PIL import Image

from maua_style_tpu import config


def _make_video(path, t=3, size=24):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (t, size, size, 3), dtype=np.uint8).astype(np.uint8)
    np.save(path, frames)


def _make_image(path, seed=1, size=24):
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8).astype(np.uint8)).save(path)


def test_vid_img_end_to_end(tmp_path):
    from maua_style_tpu.pipelines.vid_img import vid_img

    content = str(tmp_path / "vid.npy")
    style = str(tmp_path / "style.png")
    _make_video(content, t=3, size=24)
    _make_image(style)

    args = config.get_args([
        "--transfer_type", "vid_img",
        "--content", content,
        "--style", style,
        "--output_dir", str(tmp_path / "out"),
        "--image_sizes", "16",
        "--num_iters", "4",
        "--passes_per_scale", "2",
        "--optimizer", "adam",
        "--flow_models", "spynet",
        "--init", "prev_warp",
        "--gpu", "c",
        "--scaling_args", str(tmp_path / "missing.json"),
        "--seed", "0",
    ])
    vid_img(args)

    out_dir = str(tmp_path / "out" / "vid_style")
    # flow artifacts
    assert len(glob.glob(f"{out_dir}/flow/*.flo")) == 6  # 3 pairs x fwd/bwd
    # frame artifacts for both passes
    assert len(glob.glob(f"{out_dir}/16/1_*.png")) == 3
    assert len(glob.glob(f"{out_dir}/16/2_*.png")) == 3
    # muxed fallback stack exists (no ffmpeg in this env)
    assert os.path.exists(f"{out_dir}/vid_style_16.npy") or os.path.exists(f"{out_dir}/vid_style_16.mp4")


def test_vid_img_frame_resume(tmp_path):
    """Already-rendered frames are skipped on re-run (reference style.py:198)."""
    from maua_style_tpu.pipelines import vid_img as vi

    content = str(tmp_path / "vid.npy")
    style = str(tmp_path / "style.png")
    _make_video(content, t=3, size=24)
    _make_image(style)

    argv = [
        "--transfer_type", "vid_img",
        "--content", content,
        "--style", style,
        "--output_dir", str(tmp_path / "out"),
        "--image_sizes", "16",
        "--num_iters", "4",
        "--passes_per_scale", "1",
        "--optimizer", "adam",
        "--flow_models", "spynet",
        "--init", "content",
        "--gpu", "c",
        "--scaling_args", str(tmp_path / "missing.json"),
        "--seed", "0",
    ]
    vi.vid_img(config.get_args(argv))
    out_dir = str(tmp_path / "out" / "vid_style")
    files = sorted(glob.glob(f"{out_dir}/16/1_*.png"))
    mtimes = {f: os.path.getmtime(f) for f in files}
    vi.vid_img(config.get_args(argv))
    for f in files:
        assert os.path.getmtime(f) == mtimes[f]  # untouched on resume


def test_img_vid_end_to_end(tmp_path):
    from maua_style_tpu.pipelines.img_vid import img_vid

    content = str(tmp_path / "content.png")
    style_vid = str(tmp_path / "stylevid.npy")
    _make_image(content, size=20)
    _make_video(style_vid, t=6, size=20)

    args = config.get_args([
        "--transfer_type", "img_vid",
        "--content", content,
        "--style", style_vid,
        "--output_dir", str(tmp_path / "out"),
        "--image_sizes", "16",
        "--num_iters", "3",
        "--num_frames", "6",
        "--gram_frame_window", "3",
        "--avg_frame_window", "-1",
        "--video_style_factor", "100",
        "--optimizer", "adam",
        "--init", "random",
        "--gpu", "c",
        "--scaling_args", str(tmp_path / "missing.json"),
        "--temporal_blend", "0.5",
        "--seed", "0",
    ])
    out = img_vid(args)
    assert out.shape[0] == 6  # full video pastiche
    assert np.isfinite(out).all()
    assert _exists_any(f"{args.output}_16") and _exists_any(f"{args.output}")


def test_img_vid_window_scheduler_overlap():
    """Windows cover the whole video; overlap masks pin previously-styled
    frames (reference optim.py:114-123, 215-219)."""
    from maua_style_tpu.engine.windows import compute_windows, window_overlaps, overlap_grad_mask

    windows = compute_windows(10, [12], 4)
    assert len(windows[0]) == 4  # ceil(10/4)+1 windows
    covered = set()
    for w, start in enumerate(windows[0]):
        covered.update((start + k) % 10 for k in range(4))
        fo, eo = window_overlaps(windows[0], w, start, 4, 10)
        mask = overlap_grad_mask(4, w, fo, eo)
        assert mask.shape == (4, 1, 1, 1)
        if w == 0:
            assert mask.min() == 1.0
    assert covered == set(range(10))


def _exists_any(base):
    return any(os.path.exists(base + ext) for ext in (".mp4", ".npy"))
