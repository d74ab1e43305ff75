"""Native C library: build, exactness vs torch/numpy, fallback behaviour."""

import numpy as np
import pytest

from maua_style_tpu import native


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("no C toolchain available")
    return l


def test_native_resize_matches_torch(lib):
    import torch
    import torch.nn.functional as F

    x = np.random.rand(1, 3, 37, 53).astype(np.float32)
    for kwargs in ({"size": (74, 106)}, {"size": (16, 21)}, {"scale_factor": 0.43},):
        want = F.interpolate(torch.from_numpy(x), mode="bilinear", align_corners=False, **kwargs).numpy()
        oh, ow = want.shape[2:]
        sf = kwargs.get("scale_factor")
        got = native.resize_bilinear_native(np.transpose(x, (0, 2, 3, 1)), oh, ow, sf)
        got = np.transpose(got, (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_native_resize_used_by_resize_np(lib):
    from maua_style_tpu.ops.resize import resize_bilinear_np

    x = np.random.rand(2, 30, 40, 3).astype(np.float32)
    out = resize_bilinear_np(x, size=(60, 80))
    assert out.shape == (2, 60, 80, 3)


def test_numpy_gather_fallback_matches_torch(monkeypatch):
    import torch
    import torch.nn.functional as F

    import maua_style_tpu.ops.resize as rz
    import maua_style_tpu.native as nat

    monkeypatch.setattr(nat, "resize_bilinear_native", lambda *a, **k: None)
    x = np.random.rand(1, 3, 25, 31).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), scale_factor=1.7, mode="bilinear", align_corners=False).numpy()
    got = rz.resize_bilinear_np(np.transpose(x, (0, 2, 3, 1)), scale_factor=1.7)
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, atol=2e-5, rtol=1e-5)


def test_native_preprocess_matches_python(lib):
    from maua_style_tpu.io.image import CAFFE_MEAN

    rgb = np.random.randint(0, 256, (17, 23, 3), dtype=np.uint8)
    got = native.caffe_preprocess_native(rgb)
    want = rgb[..., ::-1].astype(np.float32) - CAFFE_MEAN
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_native_chi2_matches_numpy(lib):
    from maua_style_tpu.pipelines.similarity import chi2_distance

    h = np.random.rand(5, 3, 64)
    got = native.chi2_matrix_native(h)
    flat = h.reshape(5, -1)
    for i in range(5):
        for j in range(5):
            if i == j:
                assert np.isinf(got[i, j])
            else:
                np.testing.assert_allclose(got[i, j], chi2_distance(flat[i], flat[j]), rtol=1e-10)
