"""GSPMD sharding: spatial + frame-parallel optimisation on a virtual 8-device
CPU mesh gives the same result as single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from maua_style_tpu.engine import StyleEngine
from maua_style_tpu.losses import LossConfig
from maua_style_tpu.models import select_model, init_params
from maua_style_tpu.parallel import build_mesh, pastiche_sharding_for


def _engine(sharding=None, optimizer="adam"):
    cfg = LossConfig(
        content_layers=("relu2_2",),
        style_layers=("relu1_1", "relu2_1"),
        tv_weight=1e-3,
        temporal_weight=0.0,
        normalize_gradients=True,
    )
    spec = select_model("vgg16", "max")
    params = init_params(spec, seed=0)
    # parity tests pin pack_stem on BOTH sides: multi-device engines default
    # to the plain stem (packed block-1 defeats GSPMD sharding propagation),
    # and the packed/plain stems differ in float-summation order — a real
    # but chaotic-amplified non-equivalence the exactness tests in
    # test_packed_stem.py already bound
    return StyleEngine(
        spec, params, cfg, optimizer=optimizer, learning_rate=0.1, pastiche_sharding=sharding,
        pack_stem=False,
    )


def test_mesh_build():
    mesh = build_mesh(jax.devices(), [("frames", 2), ("space", 4)])
    assert mesh.shape == {"frames": 2, "space": 4}


def test_spatial_sharding_matches_single_device():
    np.random.seed(0)
    content = np.random.rand(1, 32, 32, 3).astype(np.float32) * 100
    style = np.random.rand(1, 32, 32, 3).astype(np.float32) * 100
    init = np.random.randn(1, 32, 32, 3).astype(np.float32) * 0.001

    single = _engine(None).optimize(content, [style], init.copy(), 5, blend_weights=[1.0])

    mesh = build_mesh(jax.devices()[:4], [("space", 4)])
    sharding = NamedSharding(mesh, P(None, "space", None, None))
    sharded = _engine(sharding).optimize(content, [style], init.copy(), 5, blend_weights=[1.0])

    np.testing.assert_allclose(sharded, single, atol=1e-4, rtol=1e-4)


def test_frame_parallel_video_batch_matches_single_device():
    np.random.seed(1)
    frames = 8
    content = np.random.rand(1, 16, 16, 3).astype(np.float32) * 100
    style = np.random.rand(1, 16, 16, 3).astype(np.float32) * 100
    init = np.random.randn(frames, 16, 16, 3).astype(np.float32) * 0.001

    single = _engine(None).optimize(content, [style], init.copy(), 4, blend_weights=[1.0])

    mesh = build_mesh(jax.devices(), [("frames", 8)])
    sharding = NamedSharding(mesh, P("frames", None, None, None))
    sharded = _engine(sharding).optimize(content, [style], init.copy(), 4, blend_weights=[1.0])

    np.testing.assert_allclose(sharded, single, atol=1e-4, rtol=1e-4)


def test_pastiche_sharding_for_policy():
    class A:
        pass

    a = A()
    a.devices = jax.devices()
    a.mesh_shape = [("frames", 2), ("space", 4)]
    s = pastiche_sharding_for(a)
    assert s is not None
    assert s.spec == P("frames", "space", None, None)

    a1 = A()
    a1.devices = jax.devices()[:1]
    a1.mesh_shape = [("space", 1)]
    assert pastiche_sharding_for(a1) is None


@pytest.mark.slow
def test_sharded_video_windows_match_single_device():
    """Gram frame windows + frame-parallel sharding compose: windowed video
    optimization on a mesh equals single-device."""
    np.random.seed(3)
    frames = 8
    content = np.random.rand(1, 16, 16, 3).astype(np.float32) * 100
    style = np.random.rand(8, 16, 16, 3).astype(np.float32) * 100
    init = np.random.randn(frames, 16, 16, 3).astype(np.float32) * 0.001

    def run(sharding):
        cfg = LossConfig(content_layers=("relu2_2",), style_layers=("relu1_1", "relu2_1"),
                         tv_weight=1e-3, temporal_weight=0.0, video_style_factor=100.0)
        spec = select_model("vgg16", "max")
        params = init_params(spec, seed=0)
        eng = StyleEngine(spec, params, cfg, optimizer="adam", learning_rate=0.1,
                          pastiche_sharding=sharding, pack_stem=False)
        return eng.optimize(content, [style], init.copy(), 3, transfer_type="img_vid",
                            blend_weights=[1.0], gram_frame_window=4, avg_frame_window=-1)

    single = run(None)
    mesh = build_mesh(jax.devices()[:4], [("frames", 4)])
    sharded = run(NamedSharding(mesh, P("frames", None, None, None)))
    np.testing.assert_allclose(sharded, single, atol=1e-4, rtol=1e-4)


def test_tensor_axis_sharding_matches_single_device():
    """The "tensor" mesh axis (channel sharding, the TP analogue from
    SURVEY.md §2.4) — exercised, not just claimed: policy maps it to the
    channel dim and the sharded run matches single-device."""
    np.random.seed(2)
    content = np.random.rand(1, 16, 16, 3).astype(np.float32) * 100
    style = np.random.rand(1, 16, 16, 3).astype(np.float32) * 100
    init = np.random.randn(1, 16, 16, 3).astype(np.float32) * 0.001

    single = _engine(None).optimize(content, [style], init.copy(), 2, blend_weights=[1.0])

    class Args:
        devices = jax.devices()[:6]
        mesh_shape = [("space", 2), ("tensor", 3)]

    sharding = pastiche_sharding_for(Args())
    assert sharding.spec == P(None, "space", None, "tensor")
    sharded = _engine(sharding).optimize(content, [style], init.copy(), 2, blend_weights=[1.0])
    # channel sharding partitions the conv CONTRACTION dim, so partial sums
    # arrive via psum in a different order than single-device — a legitimate
    # float-order divergence that pixel iteration amplifies chaotically;
    # 2 iterations + 1e-3 bounds it while still catching wrong math outright
    np.testing.assert_allclose(sharded, single, atol=1e-3, rtol=1e-3)


def test_pack_stem_defaults_off_for_multi_device():
    """Packed block-1 replicates per chip under GSPMD spatial sharding
    (measured 23.5 GiB/chip (OOM) vs 8.7 at 5792²/8 devices), so the engine defaults
    it off exactly when the pastiche sharding spans >1 device."""
    cfg = LossConfig(content_layers=("relu2_2",), style_layers=("relu1_1",))
    spec = select_model("vgg16", "max")
    params = init_params(spec, seed=0)

    assert StyleEngine(spec, params, cfg).pack_stem is True

    mesh = build_mesh(jax.devices()[:4], [("space", 4)])
    multi = NamedSharding(mesh, P(None, "space", None, None))
    assert StyleEngine(spec, params, cfg, pastiche_sharding=multi).pack_stem is False

    one = NamedSharding(build_mesh(jax.devices()[:1], [("space", 1)]), P())
    assert StyleEngine(spec, params, cfg, pastiche_sharding=one).pack_stem is True

    forced = StyleEngine(spec, params, cfg, pastiche_sharding=multi, pack_stem=True)
    assert forced.pack_stem is True


@pytest.mark.slow
def test_sharded_vqgan_decode_matches_single_device():
    """VQGAN decoder under GSPMD spatial sharding (the reference's 2-GPU
    hook-based decoder split, clip_vqgan.py:379-418, subsumed): sharded
    decode == single-device decode."""
    from jax.sharding import NamedSharding
    from maua_style_tpu.models import vqgan as vq

    cfg = vq.VQGANConfig(embed_dim=8, n_embed=32, ch=16, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(4,), resolution=16)
    params = vq.init_vqgan_params(cfg, seed=0)
    z = jnp.asarray(np.random.default_rng(3).standard_normal((1, 8, 8, 8)), jnp.float32)

    single = jax.jit(lambda p, z: vq.decode(p, z, cfg))(params, z)

    mesh = build_mesh(jax.devices()[:4], [("space", 4)])
    sharding = NamedSharding(mesh, P(None, "space", None, None))
    z_sharded = jax.device_put(z, sharding)
    sharded = jax.jit(lambda p, zz: vq.decode(p, zz, cfg))(params, z_sharded)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-4, rtol=1e-4)


def test_batched_frames_dp_sharding_matches_single_device():
    """optimize_frames (independent first-pass video frames) under a
    frames-mesh: each chip optimizes its own frames (DP) — results match the
    unsharded batch, and the outputs actually carry the frames sharding."""
    rng = np.random.default_rng(4)
    contents = rng.integers(0, 255, (4, 24, 24, 3)).astype(np.uint8)
    style = rng.random((1, 20, 20, 3), np.float32) * 255 - 128
    out_hw = (20, 20)

    pb0, db0 = _engine(None).optimize_frames(
        contents, [style], 5, out_hw=out_hw, init_mode="content", blend_weights=[1.0]
    )

    mesh = build_mesh(jax.devices(), [("frames", 2), ("space", 2)])
    sharding = NamedSharding(mesh, P("frames", "space", None, None))
    pb, db = _engine(sharding).optimize_frames(
        contents, [style], 5, out_hw=out_hw, init_mode="content", blend_weights=[1.0]
    )

    assert "frames" in str(pb.sharding.spec)  # DP actually applied
    np.testing.assert_allclose(np.asarray(pb), np.asarray(pb0), atol=1e-3, rtol=1e-4)
    assert np.abs(np.asarray(db).astype(int) - np.asarray(db0).astype(int)).max() <= 1

    # a batch that doesn't divide the frames axis falls back to replicated
    pb3, _ = _engine(sharding).optimize_frames(
        contents[:3], [style], 5, out_hw=out_hw, init_mode="content", blend_weights=[1.0]
    )
    np.testing.assert_allclose(np.asarray(pb3), np.asarray(pb0)[:3], atol=1e-3, rtol=1e-4)


def test_per_frame_program_strips_frames_axis():
    """Per-frame programs ((1, H, W, C) pastiches) can't shard the size-1
    frame dim: the engine constrains them to the frames-stripped spec, so a
    frames+space mesh still works for the chained vid_img path."""
    rng = np.random.default_rng(5)
    content = rng.integers(0, 255, (24, 24, 3)).astype(np.uint8)
    style = rng.random((1, 20, 20, 3), np.float32) * 255 - 128

    mesh = build_mesh(jax.devices(), [("frames", 2), ("space", 2)])
    sharding = NamedSharding(mesh, P("frames", "space", None, None))
    p1, d1 = _engine(sharding).optimize_frame(
        content, [style], 5, out_hw=(20, 20), init_mode="content", blend_weights=[1.0]
    )
    p0, d0 = _engine(None).optimize_frame(
        content, [style], 5, out_hw=(20, 20), init_mode="content", blend_weights=[1.0]
    )
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-3, rtol=1e-4)


@pytest.mark.slow
def test_vid_img_cli_on_frames_mesh(tmp_path):
    """vid_img end-to-end through config --mesh frames:2,space:2: the batched
    first pass DP-shards frames, the chained second pass runs frames-stripped
    (size-1 frame dim can't shard) — previously a frames mesh axis was
    unusable for vid_img at all."""
    from PIL import Image

    from maua_style_tpu import config
    from maua_style_tpu.pipelines.vid_img import vid_img

    rng = np.random.default_rng(0)
    np.save(tmp_path / "vid.npy", rng.integers(0, 255, (4, 24, 24, 3), dtype=np.uint8))
    Image.fromarray(rng.integers(0, 255, (24, 24, 3), dtype=np.uint8).astype(np.uint8)).save(
        tmp_path / "style.png"
    )
    args = config.get_args([
        "--transfer_type", "vid_img",
        "--content", str(tmp_path / "vid.npy"),
        "--style", str(tmp_path / "style.png"),
        "--output_dir", str(tmp_path / "out"),
        "--image_sizes", "16",
        "--num_iters", "4",
        "--passes_per_scale", "2",
        "--optimizer", "adam",
        "--flow_models", "spynet",
        "--init", "content",
        "--gpu", "c",
        "--mesh", "frames:2,space:2",
        "--scaling_args", str(tmp_path / "missing.json"),
        "--seed", "0",
        "--allow_random_weights",
    ])
    assert args.mesh_shape == [("frames", 2), ("space", 2)]
    vid_img(args)
    import glob

    out_dir = str(tmp_path / "out" / "vid_style")
    assert len(glob.glob(f"{out_dir}/16/1_*.png")) == 4
    assert len(glob.glob(f"{out_dir}/16/2_*.png")) == 4
