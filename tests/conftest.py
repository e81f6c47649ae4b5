"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Multi-device sharding tests use the standard JAX fake-backend idiom
(SURVEY.md §4c): XLA_FLAGS=--xla_force_host_platform_device_count=8 on CPU.

This container boots every interpreter with an `axon` TPU PJRT plugin via a
sitecustomize hook (PYTHONPATH=/root/.axon_site) that selects the TPU backend
and routes every XLA compile through a remote tunnel.  Unit tests need the
local CPU backend (fast compiles, full f64/complex/linalg support), so we
force it via jax.config before any backend initializes.  Set EAQHM_TPU_TESTS=1
to run against the real TPU backend instead.
"""
import os

_TPU_MODE = os.environ.get("EAQHM_TPU_TESTS") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_MODE and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (sitecustomize may have imported jax already)

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# CI sanitizer tier (SURVEY.md §5): EAQHM_CI_DEBUG_NANS=1 turns on JAX's NaN
# checker for the fast unit tests (.github/workflows/ci.yml) so any
# non-finite intermediate fails loudly instead of propagating.
if os.environ.get("EAQHM_CI_DEBUG_NANS") == "1":
    jax.config.update("jax_debug_nans", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "sa19_golden.npz")
GOLDEN_FULL = os.path.join(os.path.dirname(__file__), "golden", "local_sa19_full.npz")


@pytest.fixture(scope="session")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden data not generated (tools/make_golden.py)")
    return np.load(GOLDEN)


@pytest.fixture(scope="session")
def golden_full():
    path = GOLDEN_FULL if os.path.exists(GOLDEN_FULL) else GOLDEN
    if not os.path.exists(path):
        pytest.skip("golden data not generated (tools/make_golden.py)")
    return np.load(path)


@pytest.fixture(scope="session")
def sa19():
    from scipy.io import wavfile
    fs, s = wavfile.read("/root/reference/SA19.WAV")
    return fs, s.astype(np.float64) / 32768.0


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tests (multi-process cluster, etc.)")
