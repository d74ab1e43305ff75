"""img_img pipeline: multi-resolution loop, artifact resume, save schema."""

import os

import pytest

import numpy as np
from PIL import Image

from maua_style_tpu import config
from maua_style_tpu.pipelines.img_img import img_img


def _write_image(path, seed=0, size=24):
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8).astype(np.uint8)).save(path)


def _tiny_args(tmp_path, extra=()):
    content = str(tmp_path / "content.png")
    style = str(tmp_path / "style.png")
    _write_image(content, 0)
    _write_image(style, 1)
    argv = [
        "--content", content,
        "--style", style,
        "--output_dir", str(tmp_path / "out"),
        "--image_sizes", "16,24",
        "--num_iters", "4,3",
        "--optimizer", "adam",
        "--learning_rate", "1.0",
        "--gpu", "c",
        "--scaling_args", str(tmp_path / "missing.json"),  # no table -> keep CLI model
        "--seed", "0",
        *extra,
    ]
    return config.get_args(argv)


@pytest.mark.slow
def test_img_img_end_to_end(tmp_path):
    args = _tiny_args(tmp_path)
    os.makedirs(str(tmp_path / "out"), exist_ok=True)
    img_img(args)
    assert os.path.exists(f"{args.output}_16.png")
    assert os.path.exists(f"{args.output}_24.png")
    final = np.asarray(Image.open(f"{args.output}_24.png"))
    assert final.shape == (24, 24, 3)


def test_img_img_resume_skips_done_scales(tmp_path):
    args = _tiny_args(tmp_path)
    os.makedirs(str(tmp_path / "out"), exist_ok=True)
    # pre-seed the first scale artifact; pipeline must skip it
    _write_image(f"{args.output}_16.png", seed=9, size=16)
    before = np.asarray(Image.open(f"{args.output}_16.png")).copy()
    img_img(args)
    after = np.asarray(Image.open(f"{args.output}_16.png"))
    np.testing.assert_array_equal(before, after)
    assert os.path.exists(f"{args.output}_24.png")


@pytest.mark.slow
def test_img_img_init_content(tmp_path):
    args = _tiny_args(tmp_path, extra=("--init", "content", "--no_hist_match"))
    os.makedirs(str(tmp_path / "out"), exist_ok=True)
    img_img(args)
    assert os.path.exists(f"{args.output}_24.png")


@pytest.mark.slow
def test_img_img_flag_branches(tmp_path, capsys):
    """Exercise --init file, --original_colors, --use_covariance, multiple
    styles, style-directory expansion, and --print_iter in one tiny run."""
    content = str(tmp_path / "content.png")
    style_dir = tmp_path / "styles"
    style_dir.mkdir()
    _write_image(content, 0)
    _write_image(str(style_dir / "a.png"), 1)
    _write_image(str(style_dir / "b.jpg"), 2)
    init_file = str(tmp_path / "init.png")
    _write_image(init_file, 3)

    args = config.get_args([
        "--content", content,
        "--style", str(style_dir),
        "--init", init_file,
        "--original_colors",
        "--use_covariance",
        "--verbose", "--print_iter", "2",
        "--output_dir", str(tmp_path / "out"),
        "--image_sizes", "16",
        "--num_iters", "4",
        "--optimizer", "adam",
        "--gpu", "c",
        "--scaling_args", str(tmp_path / "missing.json"),
        "--seed", "0",
    ])
    os.makedirs(str(tmp_path / "out"), exist_ok=True)
    img_img(args)
    assert os.path.exists(f"{args.output}_16.png")
    out = capsys.readouterr().out
    assert "Iteration 2 / 4" in out and "Iteration 4 / 4" in out


@pytest.mark.slow
def test_img_img_multi_style_blend(tmp_path):
    content = str(tmp_path / "c.png")
    s1 = str(tmp_path / "s1.png")
    s2 = str(tmp_path / "s2.png")
    for p, seed in ((content, 0), (s1, 1), (s2, 2)):
        _write_image(p, seed)
    args = config.get_args([
        "--content", content,
        "--style", s1, s2,
        "--style_blend_weights", "3,1",
        "--output_dir", str(tmp_path / "out"),
        "--image_sizes", "16",
        "--num_iters", "3",
        "--optimizer", "adam",
        "--gpu", "c",
        "--scaling_args", str(tmp_path / "missing.json"),
        "--seed", "0",
    ])
    assert args.style_blend_weights == [0.75, 0.25]
    os.makedirs(str(tmp_path / "out"), exist_ok=True)
    img_img(args)
    assert os.path.exists(f"{args.output}_16.png")


def test_style_directory_weights_cover_all_images(tmp_path):
    """Directory styles must contribute: blend weights redistribute over the
    expansion (code-review finding: they were silently truncated)."""
    style_dir = tmp_path / "styles"
    style_dir.mkdir()
    for i in range(3):
        _write_image(str(style_dir / f"s{i}.png"), seed=i + 1)
    content = str(tmp_path / "c.png")
    _write_image(content, 0)
    args = config.get_args([
        "--content", content, "--style", str(style_dir),
        "--output_dir", str(tmp_path / "out"),
        "--image_sizes", "16", "--num_iters", "2",
        "--gpu", "c", "--scaling_args", str(tmp_path / "missing.json"),
    ])
    import maua_style_tpu.io as mio

    images = mio.process_style_images(args)
    assert len(images) == 3
    assert len(args.style_blend_weights) == 3
    np.testing.assert_allclose(sum(args.style_blend_weights), 1.0)


def test_img_img_cli_mesh_end_to_end(tmp_path):
    """--mesh space:2 wires args -> pastiche_sharding_for -> GSPMD engine
    through the REAL CLI pipeline (the engine-level sharding parity lives in
    test_parallel.py; this pins the config plumbing)."""
    args = _tiny_args(tmp_path, extra=["--mesh", "space:2"])
    args.devices = __import__("jax").devices()[:2]
    os.makedirs(str(tmp_path / "out"), exist_ok=True)
    img_img(args)
    final = np.asarray(Image.open(f"{args.output}_24.png"))
    assert final.shape == (24, 24, 3)
    assert final.std() > 0  # optimisation ran (not a blank artifact)


@pytest.mark.slow
def test_fidelity_vs_reference_tool(tmp_path, capsys):
    """tools/fidelity_vs_reference.py stages the BASELINE.md SSIM north star
    (>=0.98 at 1024² once real weights exist); here it runs the same small
    random-weights config twice and must score SSIM 1.0 against itself, and
    fail against a different image."""
    import sys

    sys.path.insert(0, "tools")
    try:
        import fidelity_vs_reference
    finally:
        sys.path.pop(0)

    content = str(tmp_path / "content.png")
    style = str(tmp_path / "style.png")
    _write_image(content, 0)
    _write_image(style, 1)

    def style_argv(out):
        os.makedirs(str(tmp_path / out), exist_ok=True)
        return [
            "--content", content, "--style", style,
            "--output_dir", str(tmp_path / out),
            "--image_sizes", "16,24", "--num_iters", "4,3",
            "--optimizer", "adam", "--learning_rate", "1.0", "--gpu", "c",
            "--scaling_args", str(tmp_path / "missing.json"), "--seed", "0",
        ]

    # produce the "reference" image (stands in for the torch repo's output)
    np.random.seed(0)
    img_img(config.get_args(style_argv("ref")))
    ref_png = str(tmp_path / "ref" / "content_style_24.png")
    assert os.path.exists(ref_png)

    v = fidelity_vs_reference.main(["--reference_output", ref_png, "--"] + style_argv("ours"))
    assert v["pass"] and v["ssim"] == 1.0, v
    line = capsys.readouterr().out.strip().splitlines()[-1]
    import json

    assert json.loads(line)["pass"] is True

    # a mismatched image must fail the bound
    other = str(tmp_path / "other.png")
    _write_image(other, seed=7, size=24)
    v2 = fidelity_vs_reference.main(["--reference_output", other, "--"] + style_argv("ours"))
    assert not v2["pass"] and v2["ssim"] < 0.98


def test_fuse_scales_matches_per_scale_loop(tmp_path):
    """--fuse_scales (whole pyramid as one jitted program) matches the
    per-scale loop when no host-only features are requested."""
    outs = {}
    for fused in (False, True):
        sub = tmp_path / ("f" if fused else "l")
        os.makedirs(sub, exist_ok=True)
        args = _tiny_args(
            sub,
            extra=("--init", "content", "--no_hist_match", *(("--fuse_scales",) if fused else ())),
        )
        os.makedirs(os.path.dirname(args.output), exist_ok=True)
        outs[fused] = np.asarray(img_img(args), np.float32)
    assert outs[True].shape == outs[False].shape
    np.testing.assert_allclose(outs[True], outs[False], atol=0.5, rtol=1e-4)
    # both scales' artifacts were written by the fused path too
    f_args = _tiny_args(tmp_path / "f", extra=("--fuse_scales",))
    for size in (16, 24):
        assert os.path.exists(f"{f_args.output}_{size}.png")


def test_fuse_scales_falls_back_on_save_iter(tmp_path, capsys):
    args = _tiny_args(tmp_path, extra=("--init", "content", "--no_hist_match",
                                       "--fuse_scales", "--save_iter", "2"))
    os.makedirs(os.path.dirname(args.output), exist_ok=True)
    out = img_img(args)
    assert out is not None
    assert "fuse_scales unavailable" in capsys.readouterr().out


def test_fuse_scales_histogram_smoke(tmp_path):
    """Fused pyramid with histogram matching on (single style): the device
    recolouring path traces and produces finite artifacts."""
    args = _tiny_args(tmp_path, extra=("--init", "content", "--fuse_scales"))
    os.makedirs(os.path.dirname(args.output), exist_ok=True)
    out = img_img(args)
    assert out is not None and np.isfinite(np.asarray(out)).all()
    assert os.path.exists(f"{args.output}_24.png")
