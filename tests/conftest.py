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
