"""Host-axis tests: 2-process jax.distributed local cluster (CPU).

The reference has no distributed anything (SURVEY.md §2.2); the framework's
host axis contract is: `jax.distributed.initialize` forms the cluster,
corpora stride by process index (parallel.corpus), global stats reduce over
a device mesh spanning every process.  tools/multihost_demo.py drives all
three against a REAL 2-process local cluster; this test runs it end-to-end.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_cluster():
    env = dict(os.environ)
    env.pop("EAQHM_MH_RANK", None)
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_demo.py")],
        env=env, capture_output=True, timeout=600)
    assert out.returncode == 0, out.stdout.decode()[-3000:]
    rep = json.loads(out.stdout.decode().strip().splitlines()[-1])
    assert rep["n_processes"] == 2
    assert rep["stride_disjoint_and_covering"] is True
    for r in rep["ranks"]:
        assert r["n_global_devices"] == 8
        assert r["global_psum"] == r["expected_psum"]


def test_multihost_init_benign_single_host():
    """No coordinator configured anywhere -> benign False, no raise."""
    from eaqhm_tpu.parallel.mesh import multihost_init
    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        assert k not in os.environ, f"{k} set; test expects a bare env"
    assert multihost_init() is False


def test_multihost_init_configured_failure_raises():
    """Coordinator env configured but unreachable -> loud RuntimeError."""
    from eaqhm_tpu.parallel.mesh import multihost_init
    os.environ["JAX_COORDINATOR_ADDRESS"] = "localhost:1"  # unreachable
    try:
        with pytest.raises(RuntimeError, match="multi-host init failed"):
            multihost_init()
    finally:
        del os.environ["JAX_COORDINATOR_ADDRESS"]
