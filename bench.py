"""Benchmark: megapixel-iterations/sec/chip for 1024x1024 Gram-loss style
transfer (the BASELINE.json north-star metric).

Measures the fully-jitted VGG-19 style-transfer step (feature forward,
Gram+content+TV losses with gradient normalisation, backward, Adam update)
as a ``lax.scan`` on one chip, end to end, at the reference's default flag
settings (content_weight 5, style_weight 100, tv 1e-3, relu4_2 +
relu{1..5}_1 layers).

Baseline: the reference publishes no throughput numbers (BASELINE.md), so the
comparison point is the driver's target formulation — the reference pipeline
(torch VGG-19, per-iteration python loss accumulation + .item() sync,
optim.py:201-241) on an RTX 2080 Ti, estimated at ~6.2 MP-iters/s
(~0.17 s/iter at 1024²; 2080 Ti VGG-19 fwd+bwd ≈ 110 ms + loss/backward/sync
overhead).  vs_baseline > 5 meets the BASELINE.json wall-clock target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

REFERENCE_BASELINE_MP_ITERS_PER_SEC = 6.2  # est. reference @ RTX 2080 Ti, see module docstring


def main():
    import jax
    import jax.numpy as jnp

    from maua_style_tpu.engine import StyleEngine
    from maua_style_tpu.losses import LossConfig
    from maua_style_tpu.models import select_model, init_params

    size = 1024
    iters_timed = 100
    precision = "default" if "--precision-default" in sys.argv else "high"

    cfg = LossConfig()  # reference defaults
    spec = select_model("vgg19", "max")
    params = init_params(spec, seed=0)
    engine = StyleEngine(spec, params, cfg, optimizer="adam", learning_rate=1.0, precision=precision)

    rng = np.random.default_rng(0)
    content = rng.random((1, size, size, 3), np.float32) * 255 - 128
    style = rng.random((1, size, size, 3), np.float32) * 255 - 128
    init = rng.standard_normal((1, size, size, 3)).astype(np.float32) * 0.001

    # warmup: compile capture + the exact scan we will time (same n_iters ->
    # the jitted runner is cached; the timed call reuses it)
    engine.optimize(content, [style], init, iters_timed, blend_weights=[1.0])

    start = time.perf_counter()
    out = engine.optimize(content, [style], init, iters_timed, blend_weights=[1.0])
    elapsed = time.perf_counter() - start

    megapixels = size * size / 1e6
    mp_iters_per_sec = megapixels * iters_timed / elapsed
    result = {
        "metric": "megapixel_iters_per_sec_per_chip_1024_gram",
        "value": round(mp_iters_per_sec, 3),
        "unit": "MP-iters/s/chip",
        "vs_baseline": round(mp_iters_per_sec / REFERENCE_BASELINE_MP_ITERS_PER_SEC, 3),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
