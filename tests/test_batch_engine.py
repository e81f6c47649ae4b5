"""Batched/sharded full-pipeline engine vs the per-utterance engine.

Runs on the 8-virtual-CPU-device mesh from conftest (SURVEY.md §4c idiom):
the sharded batch path must reproduce the unsharded engine's SRER and
reconstruction, and its psum-reduced corpus statistics must equal the
host-side mean.
"""
import numpy as np
import pytest


def _harmonic_utterance(length, fs=16000, f0=205.0, n_harm=5, seed=0,
                        jitter=0.0):
    rng = np.random.default_rng(seed)
    t = np.arange(length) / fs
    f0t = f0 * (1.0 + jitter * np.sin(2 * np.pi * 1.3 * t))
    phase = 2 * np.pi * np.cumsum(f0t) / fs
    s = np.zeros(length)
    for k in range(1, n_harm + 1):
        s += (0.4 / k) * np.cos(k * phase + rng.uniform(0, 2 * np.pi))
    # fade the edge margins (the engine never models the first/last
    # analysis_window*step samples, functions.py:123,141,180) so edge
    # energy doesn't put a ~10 dB ceiling on the full-signal SRER
    fade = 1200
    env = np.ones(length)
    env[:fade] = 0.5 - 0.5 * np.cos(np.pi * np.arange(fade) / fade)
    env[-fade:] = env[:fade][::-1]
    return s * env


@pytest.fixture(scope="module")
def batch_setup():
    import jax
    from eaqhm_tpu.config import EaqhmConfig
    from eaqhm_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = make_mesh(4, model_parallel=2)           # (data=2, model=2)
    cfg = EaqhmConfig(gender="female", partials=10, max_adaptations=3,
                      dtype="float64")
    fs = 16000
    length = 9601
    sigs = [_harmonic_utterance(length, fs, f0=205.0, seed=0),
            _harmonic_utterance(length, fs, f0=230.0, seed=1, jitter=0.01)]
    return mesh, cfg, fs, sigs


def test_sharded_batch_matches_unsharded(batch_setup):
    from eaqhm_tpu.parallel.batch_engine import analyze_batch

    mesh, cfg, fs, sigs = batch_setup
    out_mesh = analyze_batch(sigs, fs, cfg, mesh=mesh)
    out_none = analyze_batch(sigs, fs, cfg, mesh=None)
    np.testing.assert_allclose(out_mesh.srer, out_none.srer,
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(out_mesh.s_recon, out_none.s_recon,
                               rtol=0, atol=1e-9)
    # harmonic signals must actually fit well — not merely "finite"
    assert (out_mesh.final_srer > 15.0).all(), out_mesh.final_srer


def test_batch_matches_per_utterance_engine(batch_setup):
    from eaqhm_tpu.models import engine
    from eaqhm_tpu.parallel.batch_engine import analyze_batch

    mesh, cfg, fs, sigs = batch_setup
    out = analyze_batch(sigs, fs, cfg, mesh=mesh)
    for i, s in enumerate(sigs):
        ref = engine.analyze(s, fs, cfg)
        n = min(len(ref.srer), out.srer.shape[1])
        np.testing.assert_allclose(out.srer[i, :n], ref.srer[:n],
                                   rtol=0, atol=5e-4)
        assert abs(float(out.final_srer[i]) - max(ref.srer)) < 5e-4


def test_psum_corpus_stats(batch_setup):
    import jax.numpy as jnp
    from eaqhm_tpu.parallel.batch_engine import (
        make_batch_geometry, make_batch_step)

    mesh, cfg, fs, sigs = batch_setup
    L = len(sigs[0])
    geom = make_batch_geometry(fs, L, cfg, mesh)
    # minimal direct step-level check of the psum reduction: run adaptation 0
    from eaqhm_tpu.parallel.batch_engine import analyze_batch
    out = analyze_batch(sigs, fs, cfg, mesh=mesh)
    assert np.isclose(out.srer_mean, np.mean(out.final_srer), atol=1e-9)


def test_run_corpus_sharded(tmp_path, batch_setup):
    from scipy.io import wavfile
    from eaqhm_tpu.parallel.corpus import run_corpus_sharded

    mesh, cfg, fs, sigs = batch_setup
    paths = []
    for i, s in enumerate(sigs):
        p = tmp_path / f"utt{i}.wav"
        wavfile.write(p, fs, (s * 32767).astype(np.int16))
        paths.append(str(p))
    res = run_corpus_sharded(paths, cfg, mesh=mesh, batch_size=2,
                             checkpoint_dir=str(tmp_path / "ckpt"))
    assert len(res.done) == 2 and not res.failed
    for uid, summ in res.done.items():
        assert summ["final_srer_db"] > 14.0, (uid, summ)  # int16 quantized
    # resume: a second run skips everything
    res2 = run_corpus_sharded(paths, cfg, mesh=mesh, batch_size=2,
                              checkpoint_dir=str(tmp_path / "ckpt"))
    assert sorted(res2.skipped) == sorted(res.done.keys())


def test_deterministic_reductions(batch_setup):
    """Sanitizer-tier policy (SURVEY §5): within a fixed mesh shape the
    psum-reduced SRER statistics are bit-identical across repeated runs —
    XLA collectives have a fixed combining order and jitted reductions a
    static schedule (see eaqhm_tpu.parallel.determinism)."""
    from eaqhm_tpu.parallel import determinism
    from eaqhm_tpu.parallel.batch_engine import analyze_batch

    import jax

    prev = jax.config.jax_default_matmul_precision
    applied = determinism.apply()
    assert "xla_cpu_enable_fast_math=false" in applied["xla_flags"]
    try:
        mesh, cfg, fs, sigs = batch_setup
        out1 = analyze_batch(sigs, fs, cfg, mesh=mesh)
        out2 = analyze_batch(sigs, fs, cfg, mesh=mesh)
        # bitwise, not allclose: the reduction ORDER itself must be stable
        assert (out1.srer == out2.srer).all()
        assert float(out1.srer_mean) == float(out2.srer_mean)
        assert (out1.s_recon == out2.s_recon).all()
    finally:
        jax.config.update("jax_default_matmul_precision", prev)
