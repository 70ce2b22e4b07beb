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

import sys

import numpy as np
import pytest

# Absolute repo root on sys.path: the autouse chdir fixture below changes
# CWD per-test, which would otherwise break lazy `radiocapture_tpu`
# imports resolved through the '' (CWD) sys.path entry.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running integration tests")


@pytest.fixture(autouse=True)
def _isolate_cwd(tmp_path, monkeypatch):
    """Run every test from its own tmp dir so default-relative output
    paths (RcConfig.audio_dir='audio', spool dirs) never pollute the
    repo tree (VERDICT r3 weak #7)."""
    monkeypatch.chdir(tmp_path)


@pytest.fixture(autouse=True)
def _isolate_default_vocoder():
    """The recorder's process-global default vocoder (installed by
    runtime/vocoder tests) must not leak between tests — sidecar-
    fallback tests assert no-vocoder behavior."""
    from radiocapture_tpu.audio import recorder as _rec
    before = _rec.get_default_vocoder()
    yield
    _rec.set_default_vocoder(before)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0x5F5FF77F)
