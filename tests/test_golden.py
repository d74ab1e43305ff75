"""Golden regression tests: fixed-seed tiny runs whose outputs are pinned.

These catch silent numeric drift across refactors (SURVEY.md §4 calls for
golden-image regression at tiny sizes).  Goldens are statistics of the
output rather than full arrays — stable against serialisation, sensitive to
behaviour changes.  If a change is *intentional* (e.g. a new default),
regenerate with: python -m tests.test_golden (prints fresh values).
"""

import numpy as np

import jax.numpy as jnp

from maua_style_tpu.engine import StyleEngine
from maua_style_tpu.losses import LossConfig
from maua_style_tpu.models import select_model, init_params


def _fixed_inputs():
    rng = np.random.default_rng(1234)
    content = (rng.random((1, 24, 24, 3)).astype(np.float32) * 200 - 100)
    style = (rng.random((1, 24, 24, 3)).astype(np.float32) * 200 - 100)
    init = rng.standard_normal((1, 24, 24, 3)).astype(np.float32) * 0.001
    return content, style, init


def _run(optimizer):
    cfg = LossConfig(content_layers=("relu2_2",), style_layers=("relu1_1", "relu2_1"))
    spec = select_model("vgg16", "max")
    params = init_params(spec, seed=0)
    engine = StyleEngine(spec, params, cfg, optimizer=optimizer,
                         learning_rate=1.0 if optimizer == "lbfgs" else 0.5, lbfgs_history=10)
    content, style, init = _fixed_inputs()
    out = engine.optimize(content, [style], init, 20, blend_weights=[1.0])
    return out, engine.last_loss_log


# pinned on 2026-08-16 (round 1), CPU f32/highest, deterministic init seed 0
GOLDEN = {
    "adam": {"mean": -0.18995072, "std": 9.9787035, "final_loss": 323374.25},
    "lbfgs": {"mean": -0.22360772, "std": 9.2784595, "final_loss": 318157.97},
}


def _stats(out, log):
    return {"mean": float(out.mean()), "std": float(out.std()), "final_loss": float(log[-1].sum())}


def test_golden_adam():
    out, log = _run("adam")
    got = _stats(out, log)
    for k, v in GOLDEN["adam"].items():
        np.testing.assert_allclose(got[k], v, rtol=2e-3, err_msg=f"adam golden drifted: {got}")


def test_golden_lbfgs():
    out, log = _run("lbfgs")
    got = _stats(out, log)
    for k, v in GOLDEN["lbfgs"].items():
        np.testing.assert_allclose(got[k], v, rtol=2e-3, err_msg=f"lbfgs golden drifted: {got}")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    for opt in ("adam", "lbfgs"):
        out, log = _run(opt)
        print(opt, _stats(out, log))
