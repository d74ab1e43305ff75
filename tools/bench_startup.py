"""Time-to-first-iteration for the CLIP+VQGAN path (the reference's
usability pain point: clip_vqgan.py:525 rebuilds everything per process).

Measures a COLD PROCESS with a WARM persistent compile cache — i.e. the
restart cost a user actually pays: python startup + jax init + engine build
+ the single fused runner's executable load through the chip tunnel + one
optimisation chunk.  Round 2's floor was ~3 min (4 serialized executable
loads); the one-executable runner (z encode + content embed + Adam init as
a lax.cond prologue inside the scan program) leaves exactly one big load.

Run it twice: the first populates the compile cache, the second measures.

    python tools/bench_startup.py [--size 256] [--iters 1]

Prints one JSON line with phase timings.  Random weights are fine here —
program structure, compile-cache keys and executable loads are what cost;
MAUA_ALLOW_RANDOM_WEIGHTS=1 is set for that reason.
"""

import json
import os
import sys
import time

os.environ.setdefault("MAUA_ALLOW_RANDOM_WEIGHTS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.perf_counter()


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=1)
    args = ap.parse_args()

    import numpy as np

    t_imports0 = time.perf_counter()
    from maua_style_tpu.pipelines.clip_vqgan import ClipVQGANEngine

    t_imports = time.perf_counter() - t_imports0

    t_build0 = time.perf_counter()
    engine = ClipVQGANEngine("imagenet_16384", "ViT-B/32")
    t_build = time.perf_counter() - t_build0

    rng = np.random.default_rng(0)
    init = rng.random((1, args.size, args.size, 3), np.float32)

    t_opt0 = time.perf_counter()
    out = engine.optimize(
        init, init.copy(), None, None, None, "a painting in a distinctive style",
        iterations=args.iters,
    )
    t_first = time.perf_counter() - t_opt0
    assert np.isfinite(out).all()

    print(json.dumps({
        "metric": "clip_vqgan_time_to_first_iteration",
        "total_s": round(time.perf_counter() - T0, 1),
        "imports_s": round(t_imports, 1),
        "engine_build_s": round(t_build, 1),
        "first_chunk_s": round(t_first, 1),
        "size": args.size,
        "iterations": args.iters,
    }))


if __name__ == "__main__":
    main()
