"""Test configuration: force an 8-virtual-device CPU backend BEFORE jax initializes.

This lets every sharding/pjit test exercise a real ``jax.sharding.Mesh`` without TPU
hardware (SURVEY.md §4's fake-backend plan). The host environment registers a remote-TPU
("axon") PJRT plugin via sitecustomize and pins ``JAX_PLATFORMS=axon``; connecting to it
costs ~90 s per process, so the unit suite must (a) inject the virtual-device XLA flag
before jax's first import and (b) override the platform selection to cpu before backends
initialize.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
