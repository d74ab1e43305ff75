"""Test env: force CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (the standard JAX fake-mesh trick).

Note: this environment's sitecustomize imports jax with JAX_PLATFORMS=axon
before conftest runs, so the platform must be switched via jax.config (env
vars alone are too late)."""

import os

# the suite ships no model checkpoints; opt into the deterministic
# random-weight fallback (missing checkpoints are an error by default)
os.environ.setdefault("MAUA_ALLOW_RANDOM_WEIGHTS", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)


# ---- per-test wall-clock cap -------------------------------------------------
# pytest-timeout isn't vendored in this image; a SIGALRM cap enforces the
# two-tier budget contract instead (VERDICT r4 #5: nothing stopped the
# default tier from creeping past its documented "<5 min").  Defaults are
# generous multiples of the slowest legitimate test so only runaways trip:
# override with MAUA_TEST_TIMEOUT / MAUA_SLOW_TEST_TIMEOUT (seconds, 0=off).
import signal

_DEFAULT_CAP = int(os.environ.get("MAUA_TEST_TIMEOUT", "120"))
# generous: the bf16 convergence bound alone runs ~10 min on a quiet 1-CPU
# box and >15 under full-suite contention; an alarm that fires mid-jit also
# leaves the in-process XLA state unreliable for LATER tests (observed: a
# chunked-scan parity test failing only after a timed-out predecessor), so
# the slow cap is a runaway backstop, not a budget
_SLOW_CAP = int(os.environ.get("MAUA_SLOW_TEST_TIMEOUT", "1800"))


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    cap = _SLOW_CAP if item.get_closest_marker("slow") else _DEFAULT_CAP
    if cap <= 0 or not hasattr(signal, "SIGALRM"):
        yield
        return

    def _expired(signum, frame):
        raise TimeoutError(
            f"{item.nodeid} exceeded the {cap}s per-test cap "
            f"(mark it @pytest.mark.slow or raise MAUA_TEST_TIMEOUT)"
        )

    old = signal.signal(signal.SIGALRM, _expired)
    signal.alarm(cap)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
