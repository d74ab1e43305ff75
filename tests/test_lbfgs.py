"""L-BFGS parity vs torch.optim.LBFGS (the reference's default optimizer,
optim.py:180-190): same trajectory on the same objective, including history
updates, the curvature-skip branch, and the first-step scaling."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from maua_style_tpu.engine.lbfgs import lbfgs


def run_torch_lbfgs(x0, loss_grad_fn_torch, n_iters, lr=1.0, history=10):
    p = torch.from_numpy(x0.copy()).requires_grad_(True)
    opt = torch.optim.LBFGS(
        [p], lr=lr, max_iter=n_iters, history_size=history, tolerance_change=-1.0, tolerance_grad=-1.0
    )

    def closure():
        opt.zero_grad()
        loss = loss_grad_fn_torch(p)
        loss.backward()
        return loss

    opt.step(closure)
    return p.detach().numpy()


def run_jax_lbfgs(x0, loss_fn, n_iters, lr=1.0, history=10):
    opt = lbfgs(lr, history)
    p = jnp.asarray(x0.copy())
    state = opt.init(p)

    def step(carry, _):
        p, st = carry
        g = jax.grad(loss_fn)(p)
        updates, st = opt.update(g, st, p)
        return (optax.apply_updates(p, updates), st), None

    (p, _), _ = jax.lax.scan(step, (p, state), length=n_iters)
    return np.asarray(p)


def test_lbfgs_quadratic_matches_torch():
    np.random.seed(0)
    n = 12
    A = np.random.rand(n, n).astype(np.float32)
    H = A @ A.T + 0.5 * np.eye(n, dtype=np.float32)
    b = np.random.rand(n).astype(np.float32)
    x0 = np.random.rand(n).astype(np.float32)

    tH, tb = torch.from_numpy(H), torch.from_numpy(b)
    want = run_torch_lbfgs(x0, lambda p: 0.5 * p @ tH @ p - tb @ p, 25, lr=0.9, history=5)
    got = run_jax_lbfgs(x0, lambda p: 0.5 * p @ jnp.asarray(H) @ p - jnp.asarray(b) @ p, 25, lr=0.9, history=5)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_lbfgs_nonconvex_matches_torch():
    np.random.seed(1)
    x0 = (np.random.rand(8).astype(np.float32) - 0.5) * 2

    def f_torch(p):
        return (p ** 4).sum() - (p ** 2).sum() + 0.3 * p.sum()

    def f_jax(p):
        return (p ** 4).sum() - (p ** 2).sum() + 0.3 * p.sum()

    want = run_torch_lbfgs(x0, f_torch, 30, lr=0.5, history=7)
    got = run_jax_lbfgs(x0, f_jax, 30, lr=0.5, history=7)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_lbfgs_history_overflow_matches_torch():
    """More iterations than history slots exercises the circular buffer."""
    np.random.seed(2)
    n = 6
    A = np.random.rand(n, n).astype(np.float32)
    H = A @ A.T + np.eye(n, dtype=np.float32)
    x0 = np.random.rand(n).astype(np.float32)
    tH = torch.from_numpy(H)
    want = run_torch_lbfgs(x0, lambda p: 0.5 * p @ tH @ p, 20, lr=1.0, history=3)
    got = run_jax_lbfgs(x0, lambda p: 0.5 * p @ jnp.asarray(H) @ p, 20, lr=1.0, history=3)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_adam_matches_torch():
    np.random.seed(3)
    n = 10
    x0 = np.random.rand(n).astype(np.float32)
    A = np.random.rand(n, n).astype(np.float32)
    H = A @ A.T + np.eye(n, dtype=np.float32)

    p = torch.from_numpy(x0.copy()).requires_grad_(True)
    opt = torch.optim.Adam([p], lr=0.1)
    tH = torch.from_numpy(H)
    for _ in range(50):
        opt.zero_grad()
        (0.5 * p @ tH @ p).backward()
        opt.step()
    want = p.detach().numpy()

    oj = optax.adam(0.1)
    pj = jnp.asarray(x0.copy())
    st = oj.init(pj)
    for _ in range(50):
        g = jax.grad(lambda q: 0.5 * q @ jnp.asarray(H) @ q)(pj)
        upd, st = oj.update(g, st, pj)
        pj = optax.apply_updates(pj, upd)
    np.testing.assert_allclose(np.asarray(pj), want, atol=1e-4, rtol=1e-4)


def test_lbfgs_bf16_history_converges():
    """bf16 history storage (the serving config) must reach the same optimum
    as f32 histories on a well-conditioned quadratic — the curvature algebra
    accumulates in f32, only the stored s/y pairs are rounded."""
    np.random.seed(4)
    n = 64
    x0 = np.random.rand(n).astype(np.float32)
    A = np.random.rand(n, n).astype(np.float32)
    H = A @ A.T + np.eye(n, dtype=np.float32) * n  # conditioning ~O(1)
    loss = lambda q: 0.5 * q @ jnp.asarray(H) @ q

    def run(history_dtype):
        opt = lbfgs(1.0, 10, history_dtype=history_dtype)
        p = jnp.asarray(x0.copy())
        st = opt.init(p)

        def step(carry, _):
            p, s = carry
            g = jax.grad(loss)(p)
            upd, s = opt.update(g, s, p)
            return (optax.apply_updates(p, upd), s), None

        (p, _), _ = jax.lax.scan(step, (p, st), length=30)
        return np.asarray(p)

    got16, got32 = run(jnp.bfloat16), run(None)
    # both must essentially solve the problem (optimum is 0)
    assert float(np.abs(got32).max()) < 1e-4
    assert float(np.abs(got16).max()) < 1e-2
