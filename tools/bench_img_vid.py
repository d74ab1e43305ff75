"""Throughput probe for the img_vid (dynamic-textures) window path.

Measures the jitted windowed style step (reference: style.py:76-142 — a
T-frame pastiche optimised in circular Gram frame windows) as
megapixel-iterations/s, where one iteration touches all T frames
(T * H * W pixels).  Methodology matches bench.py: n-vs-2n scan slope,
varied inputs per timed call, median of 3 trials, idle machine required.

Usage:
    python tools/bench_img_vid.py [--size 256] [--frames 12] [--window 4]
        [--iters 30] [--opt adam]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--opt", type=str, default="adam,lbfgs")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from maua_style_tpu.engine import StyleEngine
    from maua_style_tpu.losses import LossConfig
    from maua_style_tpu.models import init_params, select_model

    size, T = args.size, args.frames
    rng = np.random.default_rng(0)
    content = rng.random((1, size, size, 3), np.float32) * 255 - 128
    style_video = rng.random((T, size, size, 3), np.float32) * 255 - 128

    spec = select_model("vgg19", "max")
    params = init_params(spec, seed=0)
    cfg = LossConfig()

    def fresh():
        return rng.standard_normal((T, size, size, 3)).astype(np.float32) * 0.001

    for opt in args.opt.split(","):
        engine = StyleEngine(
            spec, params, cfg, optimizer=opt, learning_rate=1.0,
            precision="default", compute_dtype=jnp.bfloat16,
        )

        def run(n):
            return engine.optimize(
                content, [style_video], fresh(), n,
                transfer_type="img_vid", blend_weights=[1.0],
                gram_frame_window=args.window,
            )

        n = args.iters
        run(n)
        run(2 * n)
        rates = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            run(n)
            t_n = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(2 * n)
            t_2n = time.perf_counter() - t0
            mp = T * size * size / 1e6
            rates.append(mp * n / max(t_2n - t_n, 1e-9))
        med = float(np.median(rates))
        ms = T * size * size / 1e6 / med * 1e3
        print(
            f"img_vid {opt:6s} size={size} T={T} window={args.window}: "
            f"{med:.2f} MP-it/s  ({ms:.1f} ms/iter over {T} frames)  "
            f"trials={[f'{r:.1f}' for r in rates]}"
        )


if __name__ == "__main__":
    main()
