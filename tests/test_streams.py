"""Per-device utterance streams (parallel.streams) vs the sequential engine.

Runs on the 8-virtual-CPU-device setup from conftest: every utterance
analyzed through a device-pinned stream must reproduce the default-device
sequential result exactly (same jitted programs, committed inputs only),
work must spread across devices, and failures must stay isolated.
"""
import numpy as np
import pytest

from tests.test_batch_engine import _harmonic_utterance


@pytest.fixture(scope="module")
def stream_setup():
    import jax
    from eaqhm_tpu.config import EaqhmConfig

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    cfg = EaqhmConfig(gender=(150.0, 280.0), max_adaptations=3)
    fs = 16000
    sigs = [_harmonic_utterance(9601, fs, f0=180.0 + 17 * i, seed=i,
                                jitter=0.005 * (i % 2))
            for i in range(6)]
    return cfg, fs, sigs


def test_streams_match_sequential(stream_setup):
    import jax
    from eaqhm_tpu.models import engine
    from eaqhm_tpu.parallel.streams import run_streams

    cfg, fs, sigs = stream_setup
    seq = [engine.analyze(s, fs, cfg) for s in sigs]
    out = run_streams(sigs, fs, cfg, devices=jax.devices()[:4])
    assert not out.failed, out.failed
    assert len(out.done) == len(sigs)
    for i, r in enumerate(seq):
        got = out.done[i]
        assert got["n_adaptations"] == len(r.srer)
        np.testing.assert_allclose(got["final_srer_db"], max(r.srer),
                                   atol=1e-9)


def test_streams_use_all_devices(stream_setup):
    import jax
    from eaqhm_tpu.parallel.streams import run_streams

    cfg, fs, sigs = stream_setup
    devs = jax.devices()[:3]
    out = run_streams(sigs, fs, cfg, devices=devs)
    assert len(out.done) == len(sigs)
    # dynamic load balance: the shared queue must have spread work over
    # more than one device (6 utterances, 3 devices)
    used = [d for d, st in out.per_device.items() if st["utterances"] > 0]
    assert len(used) >= 2, out.per_device
    assert sum(st["utterances"] for st in out.per_device.values()) \
        == len(sigs)


def test_streams_failure_isolation(stream_setup):
    import jax
    from eaqhm_tpu.parallel.streams import run_streams

    cfg, fs, sigs = stream_setup
    bad = np.zeros(64)            # shorter than the edge margin -> raises
    out = run_streams([sigs[0], bad, sigs[1]], fs, cfg,
                      devices=jax.devices()[:2])
    assert set(out.done) == {0, 2}
    assert 1 in out.failed
