"""Test environment: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the 'fake backend' the reference
lacks — see SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the host env pins a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container's sitecustomize registers a remote TPU backend and pins
# jax_platforms to it via jax.config.update, which outranks the env var —
# pin it back to cpu before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
