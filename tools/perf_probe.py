"""Perf probe: per-iteration cost of the jitted style step under the exact
driver/bench configuration, with optimizer ablation and optional profiler
trace / HLO dump.

Usage:
    python tools/perf_probe.py [--size 1024] [--iters 60] [--opt lbfgs,adam]
        [--trace DIR] [--hlo DIR] [--method compact|two_loop] [--history 100]

Methodology (see PERF.md): slope between n and 2n scan iterations cancels
fixed per-call costs; inputs vary per call (the tunnel memoizes identical
buffers); median of 3 slopes (one-sided noise becomes two-sided in a
difference).  Run on an IDLE machine — concurrent host load contaminates
tunnel-fed runs 5-60x.
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
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--opt", type=str, default="lbfgs,adam")
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--hlo", type=str, default=None)
    ap.add_argument("--history", type=int, default=100)
    ap.add_argument("--method", type=str, default="compact")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from maua_style_tpu.engine import StyleEngine
    from maua_style_tpu.losses import LossConfig
    from maua_style_tpu.models import init_params, select_model

    size = args.size
    rng = np.random.default_rng(0)
    content = rng.random((1, size, size, 3), np.float32) * 255 - 128
    style = rng.random((1, size, size, 3), np.float32) * 255 - 128

    spec = select_model("vgg19", "max")
    params = init_params(spec, seed=0)
    cfg = LossConfig()

    def fresh():
        return rng.standard_normal((1, size, size, 3)).astype(np.float32) * 0.001

    for opt in args.opt.split(","):
        engine = StyleEngine(
            spec, params, cfg, optimizer=opt, learning_rate=1.0,
            lbfgs_history=args.history, lbfgs_method=args.method,
            precision="default", compute_dtype=jnp.bfloat16,
        )
        n = args.iters
        engine.optimize(content, [style], fresh(), n, blend_weights=[1.0])
        engine.optimize(content, [style], fresh(), 2 * n, blend_weights=[1.0])

        if args.hlo:
            runner = engine._runner(n, (), False)
            targets = {
                "content_img": jnp.asarray(content),
                "style": engine.style_targets([jnp.asarray(style)], [1.0]),
            }
            opt_state = engine._jit_opt_init(jnp.asarray(fresh()))
            lowered = runner.lower(
                engine.params, jnp.asarray(fresh()), opt_state, targets, jnp.ones((1, 1, 1, 1), jnp.float32)
            )
            compiled = lowered.compile()
            path = f"{args.hlo}/{opt}_{size}.hlo.txt"
            import os

            os.makedirs(args.hlo, exist_ok=True)
            with open(path, "w") as f:
                f.write(compiled.as_text())
            print(f"{opt}: wrote {path}", file=sys.stderr)

        slopes = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            engine.optimize(content, [style], fresh(), n, blend_weights=[1.0])
            t_n = time.perf_counter() - t0
            t0 = time.perf_counter()
            engine.optimize(content, [style], fresh(), 2 * n, blend_weights=[1.0])
            t_2n = time.perf_counter() - t0
            slopes.append((t_2n - t_n) / n)
        ms = float(np.median(slopes) * 1e3)
        mp = size * size / 1e6
        print(f"{opt:8s} size={size} iters={n} median {ms:.2f} ms/iter  "
              f"{mp / (ms / 1e3):.2f} MP-it/s  (trials: {[f'{s*1e3:.1f}' for s in slopes]})")

        if args.trace:
            engine.optimize(
                content, [style], fresh(), n, blend_weights=[1.0],
                profile_dir=f"{args.trace}/{opt}_{size}",
            )
            print(f"{opt}: trace in {args.trace}/{opt}_{size}", file=sys.stderr)


if __name__ == "__main__":
    main()
