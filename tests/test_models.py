"""Feature-extractor parity vs torch replicas of the reference architectures."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from maua_style_tpu.models import select_model, init_params, apply_extractor, truncate_spec
from maua_style_tpu.models.convert import convert_torch_state_dict, save_npz_params, load_npz_params


def build_torch_vgg(channels, pooling="max"):
    layers = []
    in_ch = 3
    pool = nn.MaxPool2d(2, 2) if pooling == "max" else nn.AvgPool2d(2, 2)
    for c in channels:
        if c == "P":
            layers.append(pool)
        else:
            layers += [nn.Conv2d(in_ch, c, 3, padding=1), nn.ReLU(inplace=True)]
            in_ch = c
    return nn.Sequential(*layers)


def build_torch_nin(pooling="max"):
    pool2d = nn.MaxPool2d((3, 3), (2, 2), (0, 0), ceil_mode=True) if pooling == "max" else nn.AvgPool2d(
        (3, 3), (2, 2), (0, 0), ceil_mode=True
    )
    return nn.Sequential(
        nn.Conv2d(3, 96, 11, 4), nn.ReLU(True),
        nn.Conv2d(96, 96, 1), nn.ReLU(True),
        nn.Conv2d(96, 96, 1), nn.ReLU(True),
        pool2d,
        nn.Conv2d(96, 256, 5, 1, 2), nn.ReLU(True),
        nn.Conv2d(256, 256, 1), nn.ReLU(True),
        nn.Conv2d(256, 256, 1), nn.ReLU(True),
        pool2d,
        nn.Conv2d(256, 384, 3, 1, 1), nn.ReLU(True),
        nn.Conv2d(384, 384, 1), nn.ReLU(True),
        nn.Conv2d(384, 384, 1), nn.ReLU(True),
        pool2d,
        nn.Dropout(0.5),
        nn.Conv2d(384, 1024, 3, 1, 1), nn.ReLU(True),
        nn.Conv2d(1024, 1024, 1), nn.ReLU(True),
        nn.Conv2d(1024, 1000, 1), nn.ReLU(True),
    )


def params_from_torch(net, spec, strict=True):
    sd = {f"features.{i}.{k}": v for i, m in enumerate(net) for k, v in m.state_dict().items()}
    return convert_torch_state_dict(spec, sd, strict=strict)


@pytest.mark.parametrize("arch,pooling", [("vgg19", "max"), ("vgg16", "avg"), ("prune", "max")])
def test_vgg_activations_match_torch(arch, pooling):
    from maua_style_tpu.models.registry import CHANNEL_LIST

    channels = CHANNEL_LIST["vgg16p" if arch == "prune" else ("vgg19" if arch == "vgg19" else "vgg16")]
    torch.manual_seed(0)
    net = build_torch_vgg(channels, pooling).eval()
    spec = select_model(arch, pooling)
    params = params_from_torch(net, spec)

    x = np.random.rand(1, 3, 37, 41).astype(np.float32) * 255 - 100
    with torch.no_grad():
        feats = []
        h = torch.from_numpy(x)
        for m in net:
            h = m(h)
            feats.append(h)
    # relu3_2 is the 8th relu-ish activation; map names to torch indices
    name_to_idx = {}
    i = 0
    for layer in spec.layers:
        name_to_idx[layer.name] = i
        i += 1

    acts = apply_extractor(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), spec, ("relu1_1", "relu3_2", "pool2"))
    for name in ("relu1_1", "relu3_2", "pool2"):
        want = feats[name_to_idx[name]].numpy()
        got = np.transpose(np.asarray(acts[name]), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_nin_activations_match_torch():
    torch.manual_seed(1)
    net = build_torch_nin("max").eval()
    spec = select_model("nin", "max")
    params = params_from_torch(net, spec)

    x = np.random.rand(1, 3, 67, 83).astype(np.float32) * 255 - 100
    with torch.no_grad():
        feats = []
        h = torch.from_numpy(x)
        for m in net:
            h = m(h)
            feats.append(h)
    # torch indices for relu1(1), relu5(9... count), pool2(13)
    acts = apply_extractor(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), spec, ("relu1", "pool2", "relu9"))
    torch_idx = {"relu1": 1, "pool2": 13, "relu9": 19}
    for name, ti in torch_idx.items():
        want = feats[ti].numpy()
        got = np.transpose(np.asarray(acts[name]), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-4)


def test_nin_avg_pool_ceil_mode_matches_torch():
    torch.manual_seed(2)
    net = build_torch_nin("avg").eval()
    spec = select_model("nin", "avg")
    params = params_from_torch(net, spec)
    x = np.random.rand(1, 3, 50, 50).astype(np.float32)
    with torch.no_grad():
        h = torch.from_numpy(x)
        feats = []
        for m in net:
            h = m(h)
            feats.append(h)
    acts = apply_extractor(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), spec, ("pool2",))
    np.testing.assert_allclose(
        np.transpose(np.asarray(acts["pool2"]), (0, 3, 1, 2)), feats[13].numpy(), atol=3e-5, rtol=1e-4
    )


def test_truncate_spec_stops_at_deepest():
    spec = select_model("vgg19", "max")
    t = truncate_spec(spec, ("relu1_1", "relu2_1"))
    assert t.layers[-1].name == "relu2_1"
    with pytest.raises(ValueError):
        truncate_spec(spec, ("bogus",))


def test_npz_roundtrip(tmp_path):
    spec = select_model("vgg16", "max")
    params = init_params(spec, seed=3)
    path = str(tmp_path / "vgg16.npz")
    save_npz_params(params, path)
    loaded = load_npz_params(spec, path)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]["w"]), np.asarray(loaded[k]["w"]))


def test_init_params_deterministic():
    spec = select_model("vgg19", "max")
    a = init_params(spec, seed=0)
    b = init_params(spec, seed=0)
    np.testing.assert_array_equal(np.asarray(a["conv3_1"]["w"]), np.asarray(b["conv3_1"]["w"]))


def test_space_to_depth_stem_equivalent():
    """s2d-packed stem conv == direct strided conv (NIN's 11x11/s4)."""
    import jax
    import jax.numpy as jnp
    from maua_style_tpu.ops.space_to_depth import stem_conv_s2d

    rng = np.random.default_rng(0)
    for k, s, h, w in [(11, 4, 67, 83), (7, 2, 33, 40), (11, 4, 64, 64)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, 3)).astype(np.float32))
        wgt = jnp.asarray(rng.standard_normal((k, k, 3, 8)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.standard_normal(8).astype(np.float32))
        direct = jax.lax.conv_general_dilated(
            x, wgt, (s, s), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        ) + b
        packed = stem_conv_s2d(x, wgt, b, s, jax.lax.Precision.HIGHEST)
        assert packed.shape == direct.shape
        np.testing.assert_allclose(np.asarray(packed), np.asarray(direct), atol=2e-4, rtol=1e-4)


def test_fast_maxpool_matches_torch_forward_and_backward():
    import jax
    import torch
    from maua_style_tpu.ops.fast_pool import max_pool_fast

    x = np.random.randn(2, 8, 12, 5).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).requires_grad_(True)
    want = torch.nn.functional.max_pool2d(xt, 2, 2)
    g = np.random.randn(*want.shape).astype(np.float32)
    want.backward(torch.from_numpy(g))
    want_grad = np.transpose(xt.grad.numpy(), (0, 2, 3, 1))

    got = np.asarray(max_pool_fast(jnp.asarray(x), 2))
    np.testing.assert_allclose(got, np.transpose(want.detach().numpy(), (0, 2, 3, 1)), atol=1e-6)

    g_nhwc = jnp.asarray(np.transpose(g, (0, 2, 3, 1)))
    got_grad = np.asarray(
        jax.grad(lambda a: jnp.sum(max_pool_fast(a, 2) * g_nhwc))(jnp.asarray(x))
    )
    np.testing.assert_allclose(got_grad, want_grad, atol=1e-6)


def test_missing_checkpoint_fails_loud(monkeypatch, tmp_path):
    """A missing feature-net checkpoint is an error naming the convert
    command; --allow_random_weights (or the test env var) opts out."""
    import pytest

    from maua_style_tpu.models import select_model
    from maua_style_tpu.models.registry import load_params

    monkeypatch.delenv("MAUA_ALLOW_RANDOM_WEIGHTS", raising=False)
    monkeypatch.chdir(tmp_path)  # no modelzoo/ here
    spec = select_model("vgg19", "max")
    with pytest.raises(FileNotFoundError, match="maua_style_tpu.models.convert"):
        load_params(spec, "vgg19")
    # explicit opt-out falls back to deterministic init
    params = load_params(spec, "vgg19", allow_random=True)
    assert "conv1_1" in params


def test_missing_flow_checkpoint_fails_loud(monkeypatch, tmp_path):
    import pytest

    from maua_style_tpu import flow as fm

    monkeypatch.delenv("MAUA_ALLOW_RANDOM_WEIGHTS", raising=False)
    monkeypatch.chdir(tmp_path)
    fm._MODEL_CACHE.clear()
    with pytest.raises(FileNotFoundError, match="flownets.convert"):
        fm._get_net("spynet")
    net = fm._get_net("spynet", allow_random=True)
    assert net is not None
    fm._MODEL_CACHE.clear()
