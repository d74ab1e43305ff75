"""Similarity batch driver: histograms, chi^2 distances, neighbours, job plan."""

import numpy as np
from PIL import Image

from maua_style_tpu.pipelines.similarity import (
    chi2_distance,
    compute_histograms,
    distance_matrix,
    generate_grids,
    nearest_neighbors,
    run,
)


def _mk_dataset(tmp_path, n=5):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        base = np.full((16, 16, 3), i * 40, np.uint8) + rng.integers(0, 20, (16, 16, 3), dtype=np.uint8).astype(np.uint8)
        p = str(tmp_path / f"img{i}.png")
        Image.fromarray(base).save(p)
        paths.append(p)
    return paths


def test_histograms_cached(tmp_path):
    paths = _mk_dataset(tmp_path)
    cache = str(tmp_path / "hists.npy")
    h1 = compute_histograms(paths, cache)
    assert h1.shape == (5, 3, 64)
    import os

    assert os.path.exists(cache)
    h2 = compute_histograms(paths, cache)  # loaded, not recomputed
    np.testing.assert_array_equal(h1, h2)


def test_chi2_and_distance_matrix():
    h = np.random.rand(4, 3, 64)
    d = distance_matrix(h)
    assert d.shape == (4, 4)
    assert np.isinf(np.diag(d)).all()  # self-distance excluded
    # matches the scalar definition
    want = chi2_distance(h[0].flatten(), h[1].flatten())
    np.testing.assert_allclose(d[0, 1], want, rtol=1e-10)
    np.testing.assert_allclose(d, d.T)


def test_neighbors_prefer_similar_colors(tmp_path):
    paths = _mk_dataset(tmp_path)
    hists = compute_histograms(paths)
    dists = distance_matrix(hists)
    closest = nearest_neighbors(paths, dists, 2)
    # img1's nearest neighbours should include its brightness neighbours, not itself
    assert paths[1] not in closest[1]
    assert len(closest[1]) == 2


def test_run_dry_plan(tmp_path):
    paths = _mk_dataset(tmp_path, n=4)

    class Args:
        output_dir = str(tmp_path)

    jobs = run(str(tmp_path), Args(), dry_run=True)
    # per image: 3 pairs + C(3,2)=3 triples
    assert len(jobs) == 4 * 6
    content, styles = jobs[0]
    assert styles[0] == content and len(styles) in (2, 3)


def test_generate_grids(tmp_path):
    paths = _mk_dataset(tmp_path, n=4)
    hists = compute_histograms(paths)
    closest = nearest_neighbors(paths, distance_matrix(hists), 3)
    generate_grids(paths, closest, str(tmp_path / "grids"))
    import os

    assert len(os.listdir(str(tmp_path / "grids"))) == 4
