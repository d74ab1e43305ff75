"""End-to-end engine tests: the jitted optimisation loop vs a torch replica
of the reference hot loop (optim.py:201-241), plus smoke/convergence tests."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from maua_style_tpu.engine import StyleEngine
from maua_style_tpu.losses import LossConfig
from maua_style_tpu.models import select_model

from test_models import build_torch_vgg, params_from_torch
from test_losses import torch_total_loss


def _small_setup(normalize=False, optimizer="adam"):
    from maua_style_tpu.models.registry import CHANNEL_LIST

    cfg = LossConfig(
        content_layers=("relu2_2",),
        style_layers=("relu1_1", "relu2_1"),
        content_weight=5.0,
        style_weight=100.0,
        tv_weight=1e-3,
        temporal_weight=0.0,
        normalize_gradients=normalize,
    )
    torch.manual_seed(0)
    net = build_torch_vgg(CHANNEL_LIST["vgg16"][:5], "max").eval()  # through relu2_2
    spec = select_model("vgg16", "max")
    params = params_from_torch(net, spec, strict=False)
    engine = StyleEngine(
        spec, params, cfg, optimizer=optimizer, learning_rate=0.1 if optimizer == "adam" else 1.0,
        lbfgs_history=10,
    )
    return cfg, net, spec, params, engine


def test_engine_matches_torch_adam_loop():
    cfg, net, spec, params, engine = _small_setup(normalize=False, optimizer="adam")
    name_to_idx = {layer.name: i for i, layer in enumerate(spec.layers)}

    np.random.seed(0)
    content = np.random.rand(1, 3, 16, 16).astype(np.float32) * 100 - 50
    style = np.random.rand(1, 3, 14, 14).astype(np.float32) * 100 - 50
    init = np.random.rand(1, 3, 16, 16).astype(np.float32) * 100 - 50
    n_iters = 8

    # torch replica of the reference loop
    p = torch.from_numpy(init.copy()).requires_grad_(True)
    opt = torch.optim.Adam([p], lr=0.1)
    for _ in range(n_iters):
        opt.zero_grad()
        loss = torch_total_loss(
            net, p, torch.from_numpy(content), [torch.from_numpy(style)], [1.0], cfg, name_to_idx
        )
        loss.backward()
        opt.step()
    want = p.detach().numpy()

    def nhwc(a):
        return np.transpose(a, (0, 2, 3, 1))

    got = engine.optimize(nhwc(content), [nhwc(style)], nhwc(init), n_iters, blend_weights=[1.0])
    got = np.transpose(got, (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)


def test_engine_matches_torch_lbfgs_loop():
    cfg, net, spec, params, engine = _small_setup(normalize=True, optimizer="lbfgs")
    name_to_idx = {layer.name: i for i, layer in enumerate(spec.layers)}

    np.random.seed(1)
    content = np.random.rand(1, 3, 12, 12).astype(np.float32) * 100 - 50
    style = np.random.rand(1, 3, 12, 12).astype(np.float32) * 100 - 50
    init = content.copy()
    n_iters = 6

    p = torch.from_numpy(init.copy()).requires_grad_(True)
    opt = torch.optim.LBFGS([p], lr=1.0, max_iter=n_iters, history_size=10,
                            tolerance_change=-1.0, tolerance_grad=-1.0)

    def closure():
        opt.zero_grad()
        loss = torch_total_loss(
            net, p, torch.from_numpy(content), [torch.from_numpy(style)], [1.0], cfg, name_to_idx
        )
        loss.backward()
        return loss

    opt.step(closure)
    want = p.detach().numpy()

    def nhwc(a):
        return np.transpose(a, (0, 2, 3, 1))

    got = engine.optimize(nhwc(content), [nhwc(style)], nhwc(init), n_iters, blend_weights=[1.0])
    got = np.transpose(got, (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_engine_loss_decreases():
    cfg, net, spec, params, engine = _small_setup(normalize=True, optimizer="adam")
    np.random.seed(2)
    content = np.random.rand(1, 20, 20, 3).astype(np.float32) * 100
    style = np.random.rand(1, 20, 20, 3).astype(np.float32) * 100
    init = np.random.randn(1, 20, 20, 3).astype(np.float32) * 0.001
    engine.optimize(content, [style], init, 30, blend_weights=[1.0])
    log = engine.last_loss_log
    assert log is not None and log.shape == (30, 4)
    assert log.sum(axis=1)[-1] < log.sum(axis=1)[0]


def test_engine_save_callback_chunks():
    cfg, net, spec, params, engine = _small_setup(optimizer="adam")
    saves = []
    content = np.random.rand(1, 12, 12, 3).astype(np.float32)
    engine.optimize(
        content, [content], content.copy(), 10,
        blend_weights=[1.0], save_iter=4, save_callback=lambda arr, i: saves.append((i, arr.shape)),
    )
    assert [i for i, _ in saves] == [4, 8]


def test_normalize_weights_scales_strengths():
    cfg, net, spec, params, _ = _small_setup()
    engine = StyleEngine(spec, params, cfg, optimizer="adam", learning_rate=0.1, normalize_weights=True)
    content = np.random.rand(1, 12, 12, 3).astype(np.float32)
    out = engine.optimize(content, [content], content.copy(), 3, blend_weights=[1.0])
    assert out.shape == content.shape


def test_run_checkpoint_resume_preserves_optimizer_state(tmp_path):
    """Interrupt an optimisation mid-way; resuming from the run checkpoint
    continues the exact trajectory (optimizer state intact)."""
    cfg, net, spec, params, engine = _small_setup(optimizer="adam")
    np.random.seed(4)
    content = np.random.rand(1, 12, 12, 3).astype(np.float32) * 100
    style = np.random.rand(1, 12, 12, 3).astype(np.float32) * 100
    init = np.random.randn(1, 12, 12, 3).astype(np.float32) * 0.001

    full = engine.optimize(content, [style], init.copy(), 10, blend_weights=[1.0])

    ckpt = str(tmp_path / "run_ckpt")
    # simulate an interruption: run 10 iters with checkpointing every 5,
    # then delete nothing and resume — the second call must pick up at 5
    engine2 = _small_setup(optimizer="adam")[4]

    calls = []
    orig_runner = engine2._runner

    def counting_runner(n, sk, m, frozen=None):
        calls.append(n)
        return orig_runner(n, sk, m, frozen)

    engine2._runner = counting_runner
    # first phase: checkpoint after 5, then raise to simulate a crash
    from maua_style_tpu.engine import checkpoint as ck

    orig_save = ck.save_state
    state = {"crashed": False}

    def crashing_save(path, *a, **k):
        orig_save(path, *a, **k)
        state["crashed"] = True
        raise KeyboardInterrupt

    ck.save_state = crashing_save
    try:
        engine2.optimize(content, [style], init.copy(), 10, blend_weights=[1.0],
                         run_checkpoint=ckpt, checkpoint_every=5)
    except KeyboardInterrupt:
        pass
    finally:
        ck.save_state = orig_save
    assert state["crashed"]
    import os

    assert os.path.exists(ckpt)

    calls.clear()
    resumed = engine2.optimize(content, [style], init.copy(), 10, blend_weights=[1.0],
                               run_checkpoint=ckpt, checkpoint_every=5)
    assert calls == [5]  # only the remaining 5 iterations ran
    np.testing.assert_allclose(resumed, full, atol=1e-4, rtol=1e-4)
    assert not os.path.exists(ckpt)  # cleaned up on completion


def test_single_frame_video_pastiche_no_crash():
    """A 1-frame pastiche with gram_frame_window > 1 must not blow up the scan
    carry via mask broadcasting (code-review finding)."""
    cfg, net, spec, params, engine = _small_setup(optimizer="adam")
    content = np.random.rand(1, 16, 16, 3).astype(np.float32)
    style = np.random.rand(4, 16, 16, 3).astype(np.float32)
    init = np.random.randn(1, 16, 16, 3).astype(np.float32) * 0.001
    out = engine.optimize(
        content, [style], init, 2,
        transfer_type="img_vid", blend_weights=[1.0], gram_frame_window=4, avg_frame_window=-1,
    )
    assert out.shape == init.shape and np.isfinite(out).all()


def test_mixed_image_video_styles_img_vid():
    cfg, net, spec, params, engine = _small_setup(optimizer="adam")
    content = np.random.rand(1, 16, 16, 3).astype(np.float32)
    video = np.random.rand(4, 16, 16, 3).astype(np.float32)
    image = np.random.rand(1, 16, 16, 3).astype(np.float32)
    init = np.random.randn(4, 16, 16, 3).astype(np.float32) * 0.001
    out = engine.optimize(
        content, [video, image], init, 2,
        transfer_type="img_vid", blend_weights=[0.5, 0.5], gram_frame_window=4, avg_frame_window=-1,
    )
    assert out.shape == init.shape and np.isfinite(out).all()


def test_optimize_frames_batch_matches_per_frame():
    """The vmapped frame-batch runner reproduces B independent per-frame
    optimisations exactly (per-frame L-BFGS state, grad normalisation,
    histogram match and random-init seeds must not couple across frames)."""
    from maua_style_tpu.ops.frame_ops import style_hist_stats

    rng = np.random.default_rng(0)
    style = rng.random((1, 20, 20, 3), np.float32) * 255 - 128
    contents = rng.integers(0, 255, (2, 24, 24, 3)).astype(np.uint8)
    hs = style_hist_stats(style, rng=np.random.default_rng(1))
    out_hw = (20, 20)

    for optimizer, init_mode, hist in [
        ("lbfgs", "content", True),
        ("adam", "random", False),
    ]:
        cfg, net, spec, params, _ = _small_setup(normalize=True, optimizer=optimizer)
        # pack_stem=False on the per-frame side too: both paths then run the
        # identical extract and the only difference left is the vmap batching
        engine = StyleEngine(
            spec, params, cfg, optimizer=optimizer,
            learning_rate=0.1 if optimizer == "adam" else 1.0,
            lbfgs_history=10, pack_stem=False,
        )
        singles = [
            engine.optimize_frame(
                contents[i], [style], 5, out_hw=out_hw, content_scale=None,
                init_mode=init_mode, hist_stats=hs if hist else None, seed=i,
                blend_weights=[1.0],
            )
            for i in range(2)
        ]
        pb, db = engine.optimize_frames(
            contents, [style], 5, out_hw=out_hw, init_mode=init_mode,
            hist_stats=hs if hist else None, seeds=range(2), blend_weights=[1.0],
        )
        for i in range(2):
            p1, d1 = np.asarray(singles[i][0]), np.asarray(singles[i][1])
            # residual diff = batched-conv reduction-order roundoff amplified
            # through the L-BFGS curvature pairs (~2e-3 on +-150-range pixels);
            # a cross-frame coupling bug would diverge to O(full scale)
            assert np.abs(np.asarray(pb)[i] - p1).max() < 1e-2, (optimizer, init_mode)
            assert np.abs(np.asarray(db)[i].astype(int) - d1.astype(int)).max() <= 1


@pytest.mark.parametrize("optimizer", ["adam", pytest.param("lbfgs", marks=pytest.mark.slow)])
def test_window_frozen_split_matches_masked(optimizer):
    """The frozen-split window runner (extraction of grad-masked frames
    hoisted out of the scan) must reproduce the masked full-window
    computation: same loss graph, gradients restricted to the active slice,
    zero updates on frozen frames (engine/optimize._runner)."""
    import maua_style_tpu.engine.optimize as eo

    if True:
        outs = []
        for split in (False, True):
            np.random.seed(0)
            cfg, net, spec, params, engine = _small_setup(optimizer=optimizer)
            content = np.random.rand(1, 16, 16, 3).astype(np.float32)
            style = np.random.rand(8, 16, 16, 3).astype(np.float32)
            init = np.random.randn(8, 16, 16, 3).astype(np.float32) * 0.001
            old = eo._WINDOW_SPLIT
            eo._WINDOW_SPLIT = split
            try:
                out = engine.optimize(
                    content, [style], init, 3,
                    transfer_type="img_vid", blend_weights=[1.0],
                    gram_frame_window=4, avg_frame_window=-1,
                )
            finally:
                eo._WINDOW_SPLIT = old
            outs.append(out)
        np.testing.assert_allclose(
            outs[0], outs[1], rtol=2e-4, atol=2e-4,
            err_msg=f"frozen-split diverges from masked path ({optimizer})",
        )
