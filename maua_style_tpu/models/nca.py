"""Neural cellular automata texture model (reference: NCA_train.py:154-195,
after Mordvintsev/niklasson's kunstformen CA).

12-channel CA; perception = fixed per-channel 3x3 filters (identity,
sobel_x, sobel_x^T, laplacian) with circular padding, then a 1x1 conv MLP
(48 -> 96 -> 12, second layer zero-init, no bias) and a stochastic update
mask.  The rollout is a ``lax.fori_loop`` of the jitted step — the textbook
TPU shape for CA dynamics (SURVEY.md §3.5) — and the sample pool lives in
device memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IDENT = np.array([[0.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 0.0]], np.float32)
SOBEL_X = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], np.float32)
LAP = np.array([[1.0, 2.0, 1.0], [2.0, -12.0, 2.0], [1.0, 2.0, 1.0]], np.float32)


def _perception_kernel(chn: int) -> jnp.ndarray:
    """Depthwise kernel (3, 3, 1, chn*4): for each input channel the 4 fixed
    filters, matching the reference's channel-major ordering
    (NCA_train.py:159-170)."""
    filters = np.stack([IDENT, SOBEL_X, SOBEL_X.T, LAP], axis=-1)  # (3, 3, 4)
    kernel = np.zeros((3, 3, 1, chn * 4), np.float32)
    for c in range(chn):
        kernel[:, :, 0, c * 4 : (c + 1) * 4] = filters
    return jnp.asarray(kernel)


def perception(x: jax.Array, chn: int) -> jax.Array:
    """(B, H, W, C) -> (B, H, W, 4C) with circular padding."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="wrap")
    return jax.lax.conv_general_dilated(
        xp,
        _perception_kernel(chn),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=chn,
    )


def init_ca_params(chn: int = 12, hidden_n: int = 96, seed: int = 0) -> dict:
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    fan_in = chn * 4
    bound = 1.0 / np.sqrt(fan_in)
    return {
        # torch Conv2d default init: uniform weights AND bias.  The nonzero
        # bias matters: with zero states and zero-init w2 the CA would be a
        # fixed point with zero gradient everywhere without it.
        "w1": jax.random.uniform(k1, (1, 1, chn * 4, hidden_n), jnp.float32, -bound, bound),
        "b1": jax.random.uniform(k2, (hidden_n,), jnp.float32, -bound, bound),
        "w2": jnp.zeros((1, 1, hidden_n, chn), jnp.float32),  # zero-init (NCA_train.py:179)
    }


def ca_step(params: dict, x: jax.Array, key: jax.Array, update_rate=0.5) -> jax.Array:
    """One CA update (reference NCA_train.py:181-186).  ``update_rate`` may be
    a scalar or an (H, W)/(B, H, W, 1) map (the text-mask modulation in
    NCA_gen.py:50-56)."""
    chn = x.shape[-1]
    y = perception(x, chn)
    y = jax.lax.conv_general_dilated(
        y, params["w1"], (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + params["b1"]
    y = jnp.maximum(y, 0)
    y = jax.lax.conv_general_dilated(
        y, params["w2"], (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    b, h, w, _ = y.shape
    rate = update_rate if jnp.ndim(update_rate) == 0 else jnp.reshape(update_rate, (1, h, w, 1))
    mask = jnp.floor(jax.random.uniform(key, (b, h, w, 1)) + rate)
    return x + y * mask


def rollout(params: dict, x: jax.Array, key: jax.Array, n_steps, max_steps: int = 96, update_rate=0.5) -> jax.Array:
    """n_steps CA updates under jit (n_steps may be traced; bounded by
    max_steps)."""
    keys = jax.random.split(key, max_steps)

    def body(i, x):
        return jax.lax.cond(
            i < n_steps, lambda x: ca_step(params, x, keys[i], update_rate), lambda x: x, x
        )

    return jax.lax.fori_loop(0, max_steps, body, x)


def seed_state(n: int, size: int = 128, chn: int = 12) -> jnp.ndarray:
    return jnp.zeros((n, size, size, chn), jnp.float32)


def to_rgb(x: jax.Array) -> jax.Array:
    return x[..., :3]


def save_ca(params: dict, path: str) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_ca(path: str) -> dict:
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


__all__ = [
    "perception",
    "init_ca_params",
    "ca_step",
    "rollout",
    "seed_state",
    "to_rgb",
    "save_ca",
    "load_ca",
]
