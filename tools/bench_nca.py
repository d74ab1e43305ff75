"""Neural-CA training throughput (reference NCA_train.py:197-252 runs 7500
steps; its per-step loop syncs loss to host every iteration).

Measures training steps/sec at the reference configuration (pool 1024,
batch 4, 128² grid, 12 channels, VGG-16 Gram style loss, 32-96-step
rollouts) as a marginal slope between an N-chunk and a 2N-chunk run, so
compiles and executable loads cancel.

    python tools/bench_nca.py [--steps 50] [--grid 128]

Prints one JSON line.  Random VGG weights are fine: step cost does not
depend on weight values.
"""

import json
import os
import sys
import time

os.environ.setdefault("MAUA_ALLOW_RANDOM_WEIGHTS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse
    import tempfile

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--grid", type=int, default=128)
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    from maua_style_tpu.pipelines.nca_train import train

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="maua_bench_nca_")
    Image.fromarray(rng.integers(0, 255, (128, 128, 3), dtype=np.uint8).astype(np.uint8)).save(
        f"{tmp}/style.png"
    )

    def run(n):
        # log_every=n -> one chunk per run; save_every=0 -> no artifacts
        train(
            f"{tmp}/style.png", f"{tmp}/out", n_steps=n, grid_size=args.grid,
            log_every=n, save_every=0, seed=0,
        )

    n = args.steps
    run(n)
    run(2 * n)  # warm both chunk lengths
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(n)
        t_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(2 * n)
        t_2n = time.perf_counter() - t0
        rates.append(n / max(t_2n - t_n, 1e-9))
    print(json.dumps({
        "metric": "nca_train_steps_per_sec",
        "value": round(float(np.median(rates)), 2),
        "config": {"grid": args.grid, "pool": 1024, "batch": 4, "rollout": "32-96"},
    }))


if __name__ == "__main__":
    main()
