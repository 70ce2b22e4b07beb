"""Test harness config: force CPU with 8 virtual devices so multi-chip
sharding paths (parallel/) are exercised without TPU hardware."""

import os

# Tests always run on CPU (the session sitecustomize registers the axon
# TPU platform and forces jax_platforms="axon,cpu"; benches use the TPU,
# tests must not).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running integration tests")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0x5F5FF77F)
