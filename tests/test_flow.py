"""Flow subsystem: correlation kernel, flow nets, consistency check, viz, IO."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from maua_style_tpu.ops.correlation import correlation_xla, correlation_pallas
from maua_style_tpu.models.flownets import SPyNet, PWCNet, UnFlow, LiteFlowNet, backward_warp
from maua_style_tpu import flow as flowmod
from maua_style_tpu.io.flo import read_flo, write_flo, flow_warp_map


def test_correlation_xla_matches_manual():
    np.random.seed(0)
    f1 = np.random.rand(1, 6, 7, 5).astype(np.float32)
    f2 = np.random.rand(1, 6, 7, 5).astype(np.float32)
    out = np.asarray(correlation_xla(jnp.asarray(f1), jnp.asarray(f2), 2))
    assert out.shape == (1, 6, 7, 25)
    # center displacement (0,0) == plain dot product / C
    want_center = (f1 * f2).sum(-1) / 5
    np.testing.assert_allclose(out[0, ..., 12], want_center[0], atol=1e-6)
    # displacement (dy=1, dx=0) at k index (1+2)*5 + (0+2)
    want = np.zeros((6, 7))
    want[:5] = (f1[0, :5] * f2[0, 1:]).sum(-1) / 5
    np.testing.assert_allclose(out[0, :, :, 3 * 5 + 2], want, atol=1e-6)


def test_correlation_pallas_interpret_matches_xla():
    np.random.seed(1)
    f1 = jnp.asarray(np.random.rand(2, 13, 20, 16).astype(np.float32))
    f2 = jnp.asarray(np.random.rand(2, 13, 20, 16).astype(np.float32))
    ref = correlation_xla(f1, f2, 4)
    got = correlation_pallas(f1, f2, 4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_backward_warp_shifts():
    # constant flow of +2px in x: out(p) = x(p + 2ex)
    x = np.zeros((1, 8, 8, 1), np.float32)
    x[0, :, 5, 0] = 1.0
    flow = np.zeros((1, 8, 8, 2), np.float32)
    flow[..., 0] = 2.0
    out = np.asarray(backward_warp(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, :, 3, 0], 1.0, atol=1e-5)


@pytest.mark.parametrize(
    "net_cls,hw",
    [
        (SPyNet, (64, 96)),
        pytest.param(PWCNet, (64, 64), marks=pytest.mark.slow),
        pytest.param(UnFlow, (64, 64), marks=pytest.mark.slow),
        pytest.param(LiteFlowNet, (64, 64), marks=pytest.mark.slow),
    ],
)
def test_flow_nets_run(net_cls, hw):
    net = net_cls()
    np.random.seed(0)
    im1 = jnp.asarray(np.random.rand(1, *hw, 3).astype(np.float32))
    im2 = jnp.asarray(np.random.rand(1, *hw, 3).astype(np.float32))
    out = net(im1, im2)
    assert out.shape == (1, *hw, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_predict_wrapper_arbitrary_size():
    net = SPyNet()
    im1 = (np.random.rand(50, 70, 3) * 255).astype(np.uint8)
    im2 = (np.random.rand(50, 70, 3) * 255).astype(np.uint8)
    out = flowmod.predict(net, im1, im2)
    assert out.shape == (50, 70, 2)


def test_ensemble_averages():
    class Const:
        params = {}

        def __init__(self, v):
            self.v = v

        def _forward(self, params, t1, t2):
            return jnp.full((1, t1.shape[1], t1.shape[2], 2), self.v, jnp.float32)

    import maua_style_tpu.flow as fm

    fm._MODEL_CACHE.update({"a": Const(2.0), "b": Const(4.0)})

    class Args:
        flow_models = "a,b"

    model = fm.get_flow_model(Args())
    im = (np.random.rand(64, 64, 3) * 255).astype(np.uint8)
    out = model(im, im)
    np.testing.assert_allclose(out, 3.0, atol=1e-4)
    fm._MODEL_CACHE.clear()


def test_check_consistency_properties():
    h, w = 40, 40
    zero = np.zeros((h, w, 2), np.float32)
    rel = flowmod.check_consistency(zero, zero)
    assert rel.shape == (h, w)
    # interior fully reliable; the last row/col counts as out-of-frame
    # (reference flow.py:119 uses >= h-1) and gets blurred down
    np.testing.assert_allclose(rel[: h - 22, : w - 22], 1.0, atol=1e-5)

    # large forward flow with zero backward flow -> inconsistent interior
    fwd = np.full((h, w, 2), 6.0, np.float32)
    rel_bad = flowmod.check_consistency(fwd, zero)
    assert rel_bad.mean() < 0.6

    # strong translation maps edge pixels out of frame -> unreliable border
    fwd_t = np.zeros((h, w, 2), np.float32)
    fwd_t[..., 0] = 10.0
    bwd_t = np.zeros((h, w, 2), np.float32)
    bwd_t[..., 0] = -10.0
    rel_t = flowmod.check_consistency(fwd_t, bwd_t)
    assert rel_t[:, : w // 4].mean() > rel_t[:, -w // 8 :].mean()  # right edge maps outside


def test_flow_to_image():
    flow = np.random.randn(16, 16, 2).astype(np.float32) * 3
    img = flowmod.flow_to_image(flow)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    # zero flow maps to (near-)white center of the wheel
    img0 = flowmod.flow_to_image(np.zeros((8, 8, 2), np.float32))
    assert img0.min() >= 240


def test_flo_roundtrip(tmp_path):
    flow = np.random.randn(12, 17, 2).astype(np.float32)
    p = str(tmp_path / "test.flo")
    write_flo(flow, p)
    got = read_flo(p)
    np.testing.assert_array_equal(got, flow)


def test_flow_warp_map_shapes(tmp_path):
    flow = np.random.randn(20, 30, 2).astype(np.float32)
    p = str(tmp_path / "w.flo")
    write_flo(flow, p)
    warp = flow_warp_map(p, (40, 60))
    assert warp.shape == (1, 40, 60, 2)
    # neutral flow -> identity grid after resize
    write_flo(np.zeros((20, 30, 2), np.float32), p)
    warp0 = flow_warp_map(p, (20, 30))
    gx, gy = np.meshgrid(np.linspace(-1, 1, 30), np.linspace(-1, 1, 20))
    np.testing.assert_allclose(warp0[0, ..., 0], gx, atol=1e-5)
    np.testing.assert_allclose(warp0[0, ..., 1], gy, atol=1e-5)


def test_flow_prepass_caching(tmp_path):
    """process_content_video writes .flo + reliability artifacts and skips
    existing ones on re-run."""
    import os
    from maua_style_tpu.pipelines.flow_prepass import process_content_video

    frames = (np.random.rand(3, 32, 32, 3) * 255).astype(np.uint8)
    np.save(str(tmp_path / "vid.npy"), frames)

    class Args:
        content = str(tmp_path / "vid.npy")
        style = [str(tmp_path / "style.png")]
        output_dir = str(tmp_path / "out")
        no_check_occlusion = False
        verbose = False

    calls = []

    def fake_model(im1, im2):
        calls.append(1)
        return np.zeros((*im1.shape[:2], 2), np.float32)

    images = process_content_video(fake_model, Args())
    assert len(images) == 3
    assert len(calls) == 6  # fwd+bwd per pair incl. wrap-around
    flow_dir = Args.output_dir + "/vid_style/flow"
    assert os.path.exists(f"{flow_dir}/forward_00001_00002.flo")
    assert os.path.exists(f"{flow_dir}/backward_00001_00003.png")

    calls.clear()
    process_content_video(fake_model, Args())
    assert calls == []  # fully cached


def test_start_flow_prepass_overlap(tmp_path, monkeypatch):
    """start_flow_prepass returns frames immediately, computes the same
    artifacts as the synchronous path in the background, and its join handle
    re-raises pre-pass errors."""
    import os
    from maua_style_tpu.pipelines import flow_prepass

    frames = (np.random.rand(3, 32, 32, 3) * 255).astype(np.uint8)
    np.save(str(tmp_path / "vid.npy"), frames)

    class Args:
        content = str(tmp_path / "vid.npy")
        style = [str(tmp_path / "style.png")]
        output_dir = str(tmp_path / "out")
        no_check_occlusion = False
        verbose = False

    def fake_pair_model(args):
        return lambda im1, im2: np.zeros((*im1.shape[:2], 2), np.float32)

    monkeypatch.setattr(flow_prepass.flowmod, "get_flow_pair_model", fake_pair_model)
    images, join = flow_prepass.start_flow_prepass(Args())
    assert len(images) == 3
    join()
    flow_dir = Args.output_dir + "/vid_style/flow"
    assert os.path.exists(f"{flow_dir}/forward_00001_00002.flo")
    assert os.path.exists(f"{flow_dir}/backward_00001_00003.png")

    # fully cached second call: no thread, immediate no-op join
    def boom(args):  # pragma: no cover - must not be called
        raise AssertionError("model built despite cache")

    monkeypatch.setattr(flow_prepass.flowmod, "get_flow_pair_model", boom)
    images2, join2 = flow_prepass.start_flow_prepass(Args())
    assert images2 == images
    join2()

    # errors surface at join(), not silently
    class Args2(Args):
        output_dir = str(tmp_path / "out2")

    def broken_pair_model(args):
        raise RuntimeError("no checkpoint")

    monkeypatch.setattr(flow_prepass.flowmod, "get_flow_pair_model", broken_pair_model)
    _, join3 = flow_prepass.start_flow_prepass(Args2())
    with pytest.raises(RuntimeError, match="no checkpoint"):
        join3()


def test_deconv_matches_torch_convtranspose():
    import torch
    import torch.nn as nn
    from maua_style_tpu.models.flownets.common import deconv

    torch.manual_seed(0)
    m = nn.ConvTranspose2d(5, 3, 4, stride=2, padding=1)
    w = m.weight.detach().numpy()  # (in, out, kh, kw)
    b = m.bias.detach().numpy()
    params = {"d": {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "b": jnp.asarray(b)}}
    for hw in [(1, 1), (7, 9), (2, 2)]:
        x = np.random.rand(1, 5, *hw).astype(np.float32)
        want = m(torch.from_numpy(x)).detach().numpy()
        got = np.transpose(np.asarray(deconv(params, "d", jnp.asarray(np.transpose(x, (0, 2, 3, 1))))), (0, 3, 1, 2))
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_gram_interpret_matches_xla():
    from maua_style_tpu.ops.pallas_gram import gram_pallas, gram_nhwc
    from maua_style_tpu.ops.gram import batch_gram

    f = jnp.asarray(np.random.rand(300, 70).astype(np.float32))  # unaligned N and C
    want = np.asarray(jnp.dot(f.T, f))
    got = np.asarray(gram_pallas(f, True))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)

    a = jnp.asarray(np.random.rand(2, 9, 11, 33).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(gram_nhwc(a, interpret=True)), np.asarray(batch_gram(a)), atol=1e-3, rtol=1e-4
    )

    # backward routes through f @ (g + g^T)
    g = jax.grad(lambda x: jnp.sum(gram_pallas(x, True) * 2.0))(f)
    g_want = jax.grad(lambda x: jnp.sum(jnp.dot(x.T, x) * 2.0))(f)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_want), atol=1e-3, rtol=1e-3)


def test_correlation_stride_samples_every_other_displacement():
    """FlowNetC's stride-2 correlation: d=20,s=2 -> 21x21=441 channels equal to
    the full volume's even displacements."""
    rng = np.random.default_rng(3)
    f1 = jnp.asarray(rng.standard_normal((1, 8, 8, 5)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, 8, 8, 5)), jnp.float32)
    full = np.asarray(correlation_xla(f1, f2, 4, 1)).reshape(1, 8, 8, 9, 9)
    strided = np.asarray(correlation_xla(f1, f2, 4, 2)).reshape(1, 8, 8, 5, 5)
    np.testing.assert_allclose(strided, full[:, :, :, ::2, ::2], rtol=1e-6)


def test_correlation_pallas_stride_matches_xla():
    rng = np.random.default_rng(4)
    f1 = jnp.asarray(rng.standard_normal((1, 16, 32, 7)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, 16, 32, 7)), jnp.float32)
    ref = correlation_xla(f1, f2, 4, 2)
    got = correlation_pallas(f1, f2, 4, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
