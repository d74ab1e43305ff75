"""Lanczos cutout resampling vs a torch oracle of the reference's resample
(clip_vqgan.py:53-92): lanczos-2 prefilter under reflect padding when
downscaling, then bicubic align_corners=True."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from maua_style_tpu.ops.cutouts import (
    make_cutouts,
    resample_matrix,
    stratified_sizes,
)


def torch_reference_resample(img: torch.Tensor, size: int) -> torch.Tensor:
    """Oracle: the reference's resample() semantics in torch."""
    n, c, h, w = img.shape
    x = img.view(n * c, 1, h, w)

    def lanczos_kernel(ratio):
        count = math.ceil(2.0 / ratio + 1)
        taps = torch.arange(count, dtype=torch.float64) * ratio
        grid = torch.cat([-taps[1:].flip(0), taps])[1:-1]
        k = torch.where(
            (grid > -2.0) & (grid < 2.0),
            torch.sinc(grid) * torch.sinc(grid / 2.0),
            torch.zeros(()).double(),
        )
        return (k / k.sum()).float()

    if size < h:
        k = lanczos_kernel(size / h)
        pad = (k.shape[0] - 1) // 2
        x = F.pad(x, (0, 0, pad, pad), "reflect")
        x = F.conv2d(x, k[None, None, :, None])
    if size < w:
        k = lanczos_kernel(size / w)
        pad = (k.shape[0] - 1) // 2
        x = F.pad(x, (pad, pad, 0, 0), "reflect")
        x = F.conv2d(x, k[None, None, None, :])
    x = x.view(n, c, h, w)
    return F.interpolate(x, (size, size), mode="bicubic", align_corners=True)


@pytest.mark.parametrize("src,dst", [(64, 32), (100, 32), (33, 32), (32, 32), (20, 32)])
def test_resample_matrix_matches_torch(src, dst):
    rng = np.random.default_rng(0)
    img = rng.random((1, 3, src, src)).astype(np.float32)
    want = torch_reference_resample(torch.tensor(img), dst).numpy()

    mat = resample_matrix(src, dst)
    got = np.einsum("is,bcsw->bciw", mat, img)
    got = np.einsum("jw,bciw->bcij", mat, got)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_stratified_sizes_cover_reference_distribution():
    sizes = stratified_sizes(128, 128, 32, 16, cut_pow=1.0)
    assert len(sizes) == 16
    assert min(sizes) >= 32 and max(sizes) <= 128
    assert sizes == tuple(sorted(sizes))  # quantiles ascend
    # quantile of the reference law int(u * (max-min) + min) at u=0.5
    assert abs(sizes[8] - (32 + 0.53 * 96)) < 8


def test_make_cutouts_lanczos_shapes_and_grad():
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(1).random((1, 48, 40, 3)), jnp.float32)
    cuts = make_cutouts(key, x, cut_size=16, cutn=6)
    assert cuts.shape == (6, 16, 16, 3)
    assert float(cuts.min()) >= 0.0 and float(cuts.max()) <= 1.0

    g = jax.grad(lambda im: jnp.sum(make_cutouts(key, im, 16, 6) ** 2))(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_size_law_matches_reference_distribution():
    """The phased-stratified size set matches the reference's iid law
    int(u^cut_pow (max-min) + min) in distribution (KS distance bounded by
    the stratification resolution)."""
    h = w = 128
    cut_size, cutn, cut_pow, phases = 32, 16, 1.5, 4
    ours = np.array(
        [
            s
            for p in range(phases)
            for s in stratified_sizes(h, w, cut_size, cutn, cut_pow, phase=(p + 0.5) / phases)
        ],
        np.float64,
    )
    rng = np.random.default_rng(0)
    u = rng.random(200_000)
    ref = np.floor(u ** cut_pow * (min(h, w) - cut_size) + cut_size)

    grid = np.arange(cut_size, min(h, w) + 1)
    cdf_ours = (ours[None, :] <= grid[:, None]).mean(axis=1)
    cdf_ref = (ref[None, :] <= grid[:, None]).mean(axis=1)
    ks = np.abs(cdf_ours - cdf_ref).max()
    assert ks <= 1.0 / (cutn * phases) + 0.02, ks


def test_cutout_sizes_vary_across_calls():
    """With phases > 1 the realised crop content distribution varies with the
    key even at fixed offsets — different phases produce different outputs."""
    x = jnp.asarray(np.random.default_rng(2).random((1, 64, 64, 3)), jnp.float32)
    outs = [np.asarray(make_cutouts(jax.random.PRNGKey(k), x, 16, 4, phases=4)) for k in range(6)]
    # at least two keys must pick different phases; outputs then differ even
    # beyond offset noise — check pairwise distinctness of the largest slot
    big = np.stack([o[-1] for o in outs])
    assert len({b.tobytes() for b in big}) > 1
