"""Neural CA: perception parity vs the reference's torch filters, CA step
behaviour, training convergence at tiny scale, generation rollouts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_style_tpu.models import nca


def test_perception_matches_torch():
    import torch
    import torch.nn.functional as F

    ident = torch.tensor([[0.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
    sobel_x = torch.tensor([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
    lap = torch.tensor([[1.0, 2.0, 1.0], [2.0, -12, 2.0], [1.0, 2.0, 1.0]])

    def torch_perception(x):
        filters = torch.stack([ident, sobel_x, sobel_x.T, lap])
        b, ch, h, w = x.shape
        y = x.reshape(b * ch, 1, h, w)
        y = F.pad(y, [1, 1, 1, 1], "circular")
        y = F.conv2d(y, filters[:, None])
        return y.reshape(b, -1, h, w)

    x = np.random.randn(2, 5, 8, 8).astype(np.float32)
    want = torch_perception(torch.from_numpy(x)).numpy()
    got = np.transpose(
        np.asarray(nca.perception(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), 5)), (0, 3, 1, 2)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ca_step_zero_init_is_identity():
    params = nca.init_ca_params(chn=4, seed=0)
    x = jnp.asarray(np.random.rand(1, 8, 8, 4).astype(np.float32))
    out = nca.ca_step(params, x, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))  # w2 zero-init -> no update


def test_ca_rollout_traced_steps():
    params = nca.init_ca_params(chn=4, seed=0)
    params = {**params, "w2": jnp.asarray(np.random.randn(1, 1, 96, 4).astype(np.float32)) * 0.01}
    x = jnp.asarray(np.random.rand(2, 8, 8, 4).astype(np.float32))

    @jax.jit
    def run(n):
        return nca.rollout(params, x, jax.random.PRNGKey(1), n, max_steps=16)

    out8 = run(8)
    out16 = run(16)
    assert out8.shape == x.shape
    assert np.abs(np.asarray(out8) - np.asarray(out16)).max() > 0  # different step counts differ


def test_ca_update_rate_map_masks_region():
    params = nca.init_ca_params(chn=4, seed=0)
    params = {**params, "w2": jnp.asarray(np.ones((1, 1, 96, 4), np.float32)) * 0.1}
    x = jnp.zeros((1, 8, 8, 4))
    rate = np.zeros((8, 8), np.float32)
    rate[:, 4:] = 1.0  # only right half updates
    out = np.asarray(nca.ca_step(params, x, jax.random.PRNGKey(0), jnp.asarray(rate)))
    assert np.abs(out[0, :, :4]).max() == 0.0


@pytest.mark.slow
def test_nca_training_step_decreases_loss(tmp_path):
    from maua_style_tpu.pipelines.nca_train import train
    from PIL import Image

    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8).astype(np.uint8)).save(
        str(tmp_path / "style.png")
    )
    params, loss_log = train(
        str(tmp_path / "style.png"),
        str(tmp_path / "out"),
        n_steps=30,
        pool_size=16,
        batch_size=2,
        grid_size=16,
        seed=0,
        log_every=0,
        save_every=15,
        min_rollout=4,
        max_rollout=12,
    )
    assert len(loss_log) == 30
    assert np.isfinite(loss_log).all()
    # the zero-initialised update head must have learned something
    assert np.abs(np.asarray(params["w2"])).max() > 0
    import os

    assert os.path.exists(str(tmp_path / "out" / "style_15.npz"))
    assert os.path.exists(str(tmp_path / "out" / "style_30.png"))


def test_nca_loss_restores_out_of_range_pixels(monkeypatch):
    """The training loss must push back on rgb channels OUTSIDE [0,1]: the
    quartic growth of the Gram MSE in the pixel scale is the only force
    bounding the CA state (reference NCA_train.py:224-229 feeds the style net
    unclipped).  Clipping before the style net zeroes this gradient and the
    rollout diverges to overflow within ~20 full-config train steps (measured
    on-chip, round 5) — this is the regression test for that bug."""
    monkeypatch.setenv("MAUA_ALLOW_RANDOM_WEIGHTS", "1")
    from maua_style_tpu.pipelines import nca_train as T

    # two shallow layers are enough to witness the restoring force (the full
    # 5-layer build costs ~14 s of CPU compile; keep the default tier fast)
    monkeypatch.setattr(T, "STYLE_LAYERS", ("relu1_1", "relu2_1"))
    calc = T._build_style_fn("vgg16", True)
    rng = np.random.default_rng(0)
    target = [g[0] for g in jax.jit(calc)(jnp.asarray(rng.random((1, 16, 16, 3), np.float32)))]

    def loss_of_state(x):
        grams = [g.mean(axis=0) for g in calc(nca.to_rgb(x))]
        return T.style_loss(grams, target)

    x = jnp.full((1, 16, 16, 12), 5.0)  # rgb channels far outside [0,1]
    g = jax.grad(loss_of_state)(x)
    g_rgb = np.asarray(g[..., :3])
    assert np.isfinite(g_rgb).all()
    assert np.abs(g_rgb).max() > 0.0, "no restoring gradient on out-of-range pixels"


def test_style_step_finite_at_caffe_scale_bf16():
    """One engine step on Caffe 255-scale inputs with random weights under the
    bf16 serving config must produce finite losses (VERDICT r4 #3: bf16 Grams
    of 255-scale activations are a plausible overflow path; the bench asserts
    the same on every artifact it records)."""
    from maua_style_tpu.engine import StyleEngine
    from maua_style_tpu.losses import LossConfig
    from maua_style_tpu.models import select_model, init_params

    spec = select_model("vgg16", "max")
    params = init_params(spec, seed=0)
    cfg = LossConfig(content_layers=("relu2_2",), style_layers=("relu1_1", "relu2_1", "relu3_1"))
    engine = StyleEngine(spec, params, cfg, optimizer="adam", learning_rate=1.0,
                         compute_dtype=jnp.bfloat16, precision="default")
    rng = np.random.default_rng(0)
    content = (rng.random((1, 32, 32, 3)).astype(np.float32) * 255.0 - 120.0)
    style = (rng.random((1, 32, 32, 3)).astype(np.float32) * 255.0 - 120.0)
    engine.optimize(content, [style], content.copy(), 5, blend_weights=[1.0])
    assert engine.last_loss_log is not None
    assert np.isfinite(np.asarray(engine.last_loss_log, np.float64)).all()


def test_ca_save_load_roundtrip(tmp_path):
    params = nca.init_ca_params(chn=12, seed=3)
    p = str(tmp_path / "ca.npz")
    nca.save_ca(params, p)
    loaded = nca.load_ca(p)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]), np.asarray(loaded[k]))


def test_nca_gen_videos(tmp_path):
    from maua_style_tpu.pipelines import nca_gen

    params = nca.init_ca_params(chn=12, seed=0)
    params = {**params, "w2": jnp.asarray(np.random.randn(1, 1, 96, 12).astype(np.float32)) * 0.01}
    nca.save_ca(params, str(tmp_path / "s_1.npz"))

    nca_gen.evolution_video(params, str(tmp_path / "evo.mp4"), num_frames=4, size=16, zoom=1)
    assert any((tmp_path / f"evo{ext}").exists() for ext in (".mp4", ".npy"))

    nca_gen.checkpoint_grid_video([str(tmp_path / "s_1.npz")], str(tmp_path / "grid.mp4"), num_frames=2, w=16)
    assert any((tmp_path / f"grid{ext}").exists() for ext in (".mp4", ".npy"))

    nca_gen.text_video(params, str(tmp_path / "text.mp4"), "A", num_frames=2)
    assert any((tmp_path / f"text{ext}").exists() for ext in (".mp4", ".npy"))
