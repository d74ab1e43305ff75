"""Neural-CA texture training (reference: NCA_train.py:197-256).

Sample-pool training: pool of 1024 CA states in device HBM, batches of 4,
seed reinjection every 32 iters, 32-96 CA steps per iteration, style loss =
MSE of VGG-16 Grams (relu{1..5}_1, ImageNet normalisation) against the
target image, batch-averaged Grams, per-parameter gradient normalisation,
Adam 1e-3 with a [2000, 4000] x0.3 schedule, 7500 steps, checkpoints + tile
grids every 500.

The whole train step — pool gather, rollout, VGG forward, backward, update,
pool scatter — is ONE jitted function; only logging/checkpoints touch the
host.

Usage: python -m maua_style_tpu.pipelines.nca_train style.png out_dir/
"""

from __future__ import annotations

import math
import os
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from PIL import Image

from ..models import nca
from ..models.extractor import apply_extractor, truncate_spec
from ..models.registry import select_model
from ..models.registry import load_params as load_feature_params
from ..utils import name

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
STYLE_LAYERS = ("relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1")


def _build_style_fn(model_file: str = "vgg16", allow_random: bool | None = None):
    spec = truncate_spec(select_model("vgg16", "max"), STYLE_LAYERS)
    params = load_feature_params(spec, model_file, allow_random=allow_random)

    def calc_styles(imgs01):
        """(B, H, W, 3) in [0,1] -> list of batch Grams (B, C, C)
        (reference NCA_train.py:123-136)."""
        x = (imgs01 - IMAGENET_MEAN) / IMAGENET_STD
        acts = apply_extractor(params, x, spec, STYLE_LAYERS)
        grams = []
        for l in STYLE_LAYERS:
            a = acts[l]
            h, w = a.shape[1], a.shape[2]
            grams.append(jnp.einsum("bhwc,bhwd->bcd", a, a, preferred_element_type=jnp.float32) / (h * w))
        return grams

    return calc_styles


def style_loss(grams_x, grams_y):
    loss = 0.0
    for x, y in zip(grams_x, grams_y):
        loss = loss + jnp.mean(jnp.square(x - y))
    return loss


def train(
    style_file: str,
    out_dir: str,
    *,
    n_steps: int = 7500,
    pool_size: int = 1024,
    batch_size: int = 4,
    grid_size: int = 128,
    chn: int = 12,
    seed: int = 0,
    log_every: int = 10,
    save_every: int = 500,
    model_file: str = "vgg16",
    allow_random_weights: bool | None = None,
    min_rollout: int = 32,
    max_rollout: int = 96,
):
    os.makedirs(out_dir, exist_ok=True)
    img = Image.open(style_file).convert("RGB")
    img.thumbnail((128, 128), Image.LANCZOS)
    style01 = np.asarray(img, np.float32)[None] / 255.0

    calc_styles = _build_style_fn(model_file, allow_random_weights)
    target_grams = [jax.lax.stop_gradient(g[0]) for g in jax.jit(calc_styles)(jnp.asarray(style01))]

    ca_params = nca.init_ca_params(chn=chn, seed=seed)
    schedule = optax.piecewise_constant_schedule(1e-3, {2000: 0.3, 4000: 0.3})
    opt = optax.adam(schedule)
    opt_state = opt.init(ca_params)
    pool = nca.seed_state(pool_size, grid_size, chn)

    def loss_fn(params, x, key):
        k_roll, k_steps = jax.random.split(key)
        step_n = jax.random.randint(k_steps, (), min_rollout, max_rollout)
        x = nca.rollout(params, x, k_roll, step_n, max_steps=max_rollout)
        # The loss sees the UNCLIPPED rgb channels (reference NCA_train.py:224-229
        # clips only when writing images).  This is load-bearing for stability:
        # the quartic growth of the Gram MSE in the pixel scale is the only
        # restoring force bounding the CA state — clipping to [0,1] zeroes the
        # gradient outside the box and the rollout diverges to overflow within
        # ~20 train steps (measured on-chip; see tests/test_nca.py finiteness test).
        grams = calc_styles(nca.to_rgb(x))
        grams = [g.mean(axis=0) for g in grams]  # batch-averaged (NCA_train.py:229)
        return style_loss(grams, target_grams), x

    def step_body(params, opt_state, pool, key, i):
        k_batch, k_loss = jax.random.split(key)
        batch_idx = jax.random.choice(k_batch, pool_size, (batch_size,), replace=False)
        x = pool[batch_idx]
        # seed reinjection every 32 iters (NCA_train.py:219-220)
        x = jax.lax.cond(
            i % 32 == 0, lambda x: x.at[0].set(jnp.zeros_like(x[0])), lambda x: x, x
        )
        (loss, x_out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, x, k_loss)
        grads = jax.tree_util.tree_map(lambda g: g / (jnp.linalg.norm(g) + 1e-8), grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        pool = pool.at[batch_idx].set(x_out)
        return params, opt_state, pool, loss, x_out

    @partial(jax.jit, static_argnames=("length",))
    def train_chunk(params, opt_state, pool, rng, i0, length):
        # many steps per device call: the per-step loop (reference
        # NCA_train.py:208-238) syncs a python float(loss) every iteration —
        # a host round trip per step on a tunneled TPU.  The scan carries the
        # rng and splits in-graph (identical threefry stream to the host
        # loop), so results are bit-for-bit the per-step version's.
        x0 = jnp.zeros((batch_size, grid_size, grid_size, chn), jnp.float32)

        def body(carry, t):
            params, opt_state, pool, rng, _ = carry
            rng, sub = jax.random.split(rng)
            params, opt_state, pool, loss, x_out = step_body(params, opt_state, pool, sub, i0 + t)
            return (params, opt_state, pool, rng, x_out), loss

        (params, opt_state, pool, rng, x_out), losses = jax.lax.scan(
            body, (params, opt_state, pool, rng, x0), jnp.arange(length)
        )
        return params, opt_state, pool, rng, losses, x_out

    rng = jax.random.PRNGKey(seed)
    loss_log: list[float] = []
    stem = name(style_file)
    boundaries = [v for v in (log_every, save_every) if v]
    chunk = math.gcd(*boundaries) if boundaries else n_steps
    done = 0
    while done < n_steps:
        this = min(chunk, n_steps - done)
        ca_params, opt_state, pool, rng, losses, x_out = train_chunk(
            ca_params, opt_state, pool, rng, done, this
        )
        done += this
        losses = np.asarray(losses, np.float64)
        if not np.isfinite(losses).all():
            # fail loud: a NaN loss means the CA rollout or the feature net
            # overflowed — printing nan (what the reference does,
            # NCA_train.py:241-247) poisons every artifact downstream
            bad = int(np.flatnonzero(~np.isfinite(losses))[0])
            raise FloatingPointError(
                f"non-finite NCA training loss at step {done - this + bad + 1} "
                f"(losses[{bad}] = {losses[bad]})"
            )
        loss_log.extend(losses.tolist())
        if log_every and (done % log_every == 0 or done == n_steps):
            recent = loss_log[-200:]
            print(
                f"\rstep_n: {len(loss_log):5d}  loss: [{np.min(recent):.3f}, {np.mean(recent):.3f}, "
                f"{np.max(recent):.3f}]    lr: {float(schedule(done - 1)):g}"
            )
        if save_every and done % save_every == 0:
            nca.save_ca(ca_params, f"{out_dir}/{stem}_{len(loss_log)}.npz")
            imgs = np.clip(np.asarray(nca.to_rgb(x_out)), 0, 1)
            grid = np.hstack(list(imgs))
            Image.fromarray((grid * 255).astype(np.uint8)).save(f"{out_dir}/{stem}_{len(loss_log)}.png")
    return ca_params, loss_log


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    import argparse

    ap = argparse.ArgumentParser("nca_train")
    ap.add_argument("style_file")
    ap.add_argument("out_dir")
    ap.add_argument("--n_steps", type=int, default=7500)
    ap.add_argument("--pool_size", type=int, default=1024)
    ap.add_argument("--grid_size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--model_file", type=str, default="vgg16")
    ap.add_argument("--allow_random_weights", action="store_true")
    args = ap.parse_args(argv)
    train(
        args.style_file,
        args.out_dir,
        n_steps=args.n_steps,
        pool_size=args.pool_size,
        grid_size=args.grid_size,
        seed=args.seed,
        model_file=args.model_file,
        allow_random_weights=args.allow_random_weights or None,
    )


if __name__ == "__main__":
    main()
