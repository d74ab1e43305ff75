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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_warp_map_from_flow_matches_host():
    """In-graph warp-map construction == io.flo.flow_warp_map (normalise,
    gaussian sigma-5, meshgrid, resize)."""
    import jax.numpy as jnp

    from maua_style_tpu.io.flo import flow_warp_map
    from maua_style_tpu.ops.frame_ops import warp_map_from_flow

    rng = np.random.default_rng(0)
    flow = (rng.standard_normal((40, 48, 2)) * 3).astype(np.float32)
    for out_hw in [(40, 48), (20, 24)]:
        want = flow_warp_map(flow.copy(), out_hw)
        got = np.asarray(warp_map_from_flow(jnp.asarray(flow), out_hw))
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_fused_frame_program_matches_host_orchestration():
    """engine.optimize_frame (u8 in-graph preprocess + init + scan + u8 out)
    agrees with the host-orchestrated engine.optimize on the same frame."""
    import jax.numpy as jnp

    from maua_style_tpu.engine import StyleEngine
    from maua_style_tpu.io.image import preprocess
    from maua_style_tpu.losses import LossConfig
    from maua_style_tpu.models import init_params, select_model
    from maua_style_tpu.ops.frame_ops import deprocess_to_u8
    from maua_style_tpu.ops.resize import resize_bilinear_np, scale_shape

    rng = np.random.default_rng(3)
    u8 = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    style = rng.standard_normal((1, 40, 40, 3)).astype(np.float32) * 30

    spec = select_model("vgg19", "max")
    cfg = LossConfig(content_layers=("relu2_1",), style_layers=("relu1_1", "relu2_1"))
    engine = StyleEngine(spec, init_params(spec, seed=0), cfg, optimizer="adam", learning_rate=1.0)

    scale = 0.75
    out_hw = scale_shape((48, 64), scale)
    pastiche_dev, display = engine.optimize_frame(
        u8, [style], 5, out_hw=out_hw, content_scale=scale, blend_weights=[1.0], init_mode="content"
    )

    content = resize_bilinear_np(preprocess(u8), scale_factor=scale)
    want = engine.optimize(content, [style], content.copy(), 5, blend_weights=[1.0])

    got = np.asarray(pastiche_dev)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=0.05)
    np.testing.assert_array_equal(np.asarray(display), np.asarray(deprocess_to_u8(jnp.asarray(want))))


def test_fused_frame_temporal_blend_matches_host():
    """Blend init + flow-warped temporal target in the fused program match
    the host-path formulas (reference style.py:273-286)."""
    import jax.numpy as jnp

    from maua_style_tpu.engine import StyleEngine
    from maua_style_tpu.io.flo import flow_warp_map
    from maua_style_tpu.io.image import preprocess
    from maua_style_tpu.losses import LossConfig
    from maua_style_tpu.models import init_params, select_model
    from maua_style_tpu.ops.resize import resize_bilinear_np, scale_shape

    rng = np.random.default_rng(5)
    u8 = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    blend_u8 = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    style = rng.standard_normal((1, 24, 24, 3)).astype(np.float32) * 30
    flow = (rng.standard_normal((32, 32, 2)) * 2).astype(np.float32)
    weights_u8 = (rng.random((32, 32)) * 255).astype(np.uint8)
    prev = rng.standard_normal((1, 32, 32, 3)).astype(np.float32) * 40

    spec = select_model("vgg19", "max")
    cfg = LossConfig(content_layers=("relu2_1",), style_layers=("relu1_1",), temporal_weight=500.0)
    engine = StyleEngine(spec, init_params(spec, seed=0), cfg, optimizer="adam", learning_rate=1.0)

    out_hw = (32, 32)
    tb = 0.6
    pastiche_dev, _ = engine.optimize_frame(
        u8, [style], 4, out_hw=out_hw, blend_weights=[1.0], init_mode="blend",
        prev=jnp.asarray(prev), blend=blend_u8, temporal_blend=tb,
        flow=flow, weights_u8=weights_u8, use_temporal=True,
    )

    content = preprocess(u8)
    wmap = flow_warp_map(flow, out_hw)
    blend_f = preprocess(blend_u8)
    init = (1 - tb) * blend_f + tb * prev
    weights = resize_bilinear_np(
        (weights_u8.astype(np.float32) / 255.0)[None, :, :, None], size=out_hw
    )
    want = engine.optimize(
        content, [style], init, 4, blend_weights=[1.0],
        temporal_warp=(prev, wmap), temporal_weights=weights,
    )
    np.testing.assert_allclose(np.asarray(pastiche_dev), want, atol=0.05)


@pytest.mark.slow
def test_vid_img_frame_batch_matches_sequential(tmp_path):
    """--frame_batch batching of independent first-pass frames produces the
    same artifacts as the sequential per-frame path (chunks of 2+1 here)."""
    from maua_style_tpu.pipelines import vid_img as vi

    content = str(tmp_path / "vid.npy")
    style = str(tmp_path / "style.png")
    _make_video(content, t=3, size=24)
    _make_image(style)

    def argv(out, frame_batch):
        return [
            "--transfer_type", "vid_img",
            "--content", content,
            "--style", style,
            "--output_dir", str(tmp_path / out),
            "--image_sizes", "16",
            "--num_iters", "4",
            "--passes_per_scale", "1",
            "--optimizer", "adam",
            "--flow_models", "spynet",
            "--init", "content",
            "--gpu", "c",
            "--scaling_args", str(tmp_path / "missing.json"),
            "--seed", "0",
            "--frame_batch", str(frame_batch),
            "--allow_random_weights",
        ]

    vi.vid_img(config.get_args(argv("batched", 0)))
    vi.vid_img(config.get_args(argv("seq", 1)))

    batched = sorted(glob.glob(str(tmp_path / "batched" / "vid_style" / "16" / "1_*.png")))
    seq = sorted(glob.glob(str(tmp_path / "seq" / "vid_style" / "16" / "1_*.png")))
    assert len(batched) == len(seq) == 3
    for b, s in zip(batched, seq):
        _assert_u8_drift(b, s)


def _assert_u8_drift(a_path: str, b_path: str) -> None:
    """Artifact parity up to fused-program float drift: XLA fuses the
    chunked/batched and per-frame programs differently, and ambient FP state
    from earlier in-process tests (torch kernels) can shift results by an
    ulp, so a handful of pixels may cross an extra u8 rounding boundary
    (observed: max 3 on 5/768 pixels, mean 0.055, full-suite ordering only).
    Bound the drift tightly in aggregate instead of per-pixel-exactly."""
    a = np.asarray(Image.open(a_path)).astype(int)
    b = np.asarray(Image.open(b_path)).astype(int)
    d = np.abs(a - b)
    assert d.max() <= 6, (a_path, b_path, int(d.max()), float(d.mean()))
    assert d.mean() <= 0.5, (a_path, b_path, float(d.mean()))
    assert (d > 2).mean() <= 0.02, (a_path, b_path, int((d > 2).sum()))


@pytest.mark.slow
def test_vid_img_chain_chunks_match_sequential(tmp_path):
    """Chained-frame scan chunks (prev_warp first pass + blend/temporal later
    passes) produce the same artifacts as the per-frame path."""
    from maua_style_tpu.pipelines import vid_img as vi

    content = str(tmp_path / "vid.npy")
    style = str(tmp_path / "style.png")
    _make_video(content, t=3, size=24)
    _make_image(style)

    def argv(out, frame_batch):
        return [
            "--transfer_type", "vid_img",
            "--content", content,
            "--style", style,
            "--output_dir", str(tmp_path / out),
            "--image_sizes", "16",
            "--num_iters", "4",
            "--passes_per_scale", "2",
            "--optimizer", "adam",
            "--flow_models", "spynet",
            "--init", "prev_warp",
            "--gpu", "c",
            "--scaling_args", str(tmp_path / "missing.json"),
            "--seed", "0",
            "--frame_batch", str(frame_batch),
            "--allow_random_weights",
        ]

    vi.vid_img(config.get_args(argv("chunked", 0)))
    vi.vid_img(config.get_args(argv("seq", 1)))

    for pass_n in (1, 2):
        chunked = sorted(glob.glob(str(tmp_path / "chunked" / "vid_style" / "16" / f"{pass_n}_*.png")))
        seq = sorted(glob.glob(str(tmp_path / "seq" / "vid_style" / "16" / f"{pass_n}_*.png")))
        assert len(chunked) == len(seq) == 3
        for b, s in zip(chunked, seq):
            _assert_u8_drift(b, s)


@pytest.mark.slow
def test_vid_img_multiscale_chain_chunks_match_sequential(tmp_path):
    """Across scales, pass-0 chunks blend from the PREVIOUS scale's artifacts
    (reference style.py:233-250) — chunked and per-frame paths must agree.
    passes_per_scale is even: odd values leave the frame order reversed at
    the next scale, whose pass 0 then asks for forward-named flows of
    descending pairs that the prepass never writes (a latent reference
    constraint — its default is 4, load.py:158-169)."""
    from maua_style_tpu.pipelines import vid_img as vi

    content = str(tmp_path / "vid.npy")
    style = str(tmp_path / "style.png")
    _make_video(content, t=3, size=24)
    _make_image(style)

    def argv(out, frame_batch):
        return [
            "--transfer_type", "vid_img",
            "--content", content,
            "--style", style,
            "--output_dir", str(tmp_path / out),
            "--image_sizes", "12,16",
            "--num_iters", "4,4",
            "--passes_per_scale", "2",
            "--optimizer", "adam",
            "--flow_models", "spynet",
            "--init", "content",
            "--gpu", "c",
            "--scaling_args", str(tmp_path / "missing.json"),
            "--seed", "0",
            "--frame_batch", str(frame_batch),
            "--allow_random_weights",
        ]

    vi.vid_img(config.get_args(argv("chunked", 0)))
    vi.vid_img(config.get_args(argv("seq", 1)))

    for size in (12, 16):
      for pass_n in (1, 2):
        chunked = sorted(glob.glob(str(tmp_path / "chunked" / "vid_style" / str(size) / f"{pass_n}_*.png")))
        seq = sorted(glob.glob(str(tmp_path / "seq" / "vid_style" / str(size) / f"{pass_n}_*.png")))
        assert len(chunked) == len(seq) == 3
        for b, s in zip(chunked, seq):
            _assert_u8_drift(b, s)
