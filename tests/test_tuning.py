"""Capacity autotuner: analytic estimates + table generation."""

import json

import numpy as np

from maua_style_tpu.tuning.max_sizes import estimate_step_bytes, probe_max_sizes


def test_estimate_monotone_in_size():
    small = estimate_step_bytes("vgg19", "adam", 512)
    big = estimate_step_bytes("vgg19", "adam", 1024)
    assert big > small * 3  # ~quadratic in size


def test_lbfgs_needs_more_than_adam():
    assert estimate_step_bytes("vgg19", "lbfgs", 1024) > estimate_step_bytes("vgg19", "adam", 1024) * 2


def test_probe_table_structure():
    table = probe_max_sizes(models=("vgg19",), optimizers=("adam", "lbfgs"), method="estimate",
                            budget_bytes=16 * 2 ** 30, verbose=False)
    assert len(table) == 2
    for entry in table.values():
        assert entry["safe_max_size"] is not None
        assert entry["true_max_size"] > entry["safe_max_size"]
        assert entry["safe_max_size"] % 32 == 0
    adam = next(v for v in table.values() if v["optimizer"] == "adam")
    lbfgs = next(v for v in table.values() if v["optimizer"] == "lbfgs")
    assert adam["safe_max_size"] > lbfgs["safe_max_size"]  # matches the reference's capacity ordering


def test_shipped_tables_are_analysis_mode():
    """Every shipped capacity table is XLA-analysis-verified (reference ships
    a *measured* table, config/max-sizes-2x11GB.json — match that rigor)."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    paths = sorted(glob.glob(os.path.join(root, "max-sizes-*chip.json")))
    assert len(paths) >= 4  # 1/2/4/8-chip
    for path in paths:
        with open(path) as f:
            table = json.load(f)
        assert len(table) == 12, path  # 6 models x 2 optimizers
        for key, entry in table.items():
            assert entry["method"] == "analysis", (path, key)
            assert entry["true_max_size"] > entry["safe_max_size"] > 0, (path, key)
            assert entry["safe_max_size"] % 32 == 0, (path, key)


def test_probe_walks_down_when_start_too_big():
    table = probe_max_sizes(models=("vgg19",), optimizers=("adam",), method="estimate",
                            start_size=8192, budget_bytes=8 * 2 ** 30, verbose=False)
    entry = list(table.values())[0]
    assert entry["safe_max_size"] is not None and entry["safe_max_size"] < 8192
