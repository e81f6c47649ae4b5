"""Aux-subsystem tests: plots, checkpoint/resume, corpus isolation, CLI.

These cover the SURVEY.md §5 subsystems the reference lacks: diagnostics
(reference plotGraphs, main.py:18-42), checkpoint/resume, and per-utterance
failure isolation in corpus mode.
"""
import json
import os
import sys

import numpy as np
import pytest

from eaqhm_tpu.config import EaqhmConfig
from eaqhm_tpu.utils.checkpoint import (CorpusCheckpoint,
                                        load_adaptation_state,
                                        save_adaptation_state)
from eaqhm_tpu.parallel.corpus import pad_batch, run_corpus


def _tone_wav(path, fs=16000, dur=0.5, f0=200.0, amp=0.3):
    from scipy.io import wavfile
    t = np.arange(int(fs * dur)) / fs
    s = sum(amp / k * np.sin(2 * np.pi * k * f0 * t) for k in range(1, 4))
    wavfile.write(path, fs, (s * 32767 / np.max(np.abs(s))).astype(np.int16))
    return path


# ---------------------------------------------------------------- plots

def test_plot_graphs_writes_pngs(tmp_path):
    from eaqhm_tpu.utils.plots import plot_graphs
    fs = 16000
    s = np.random.default_rng(0).normal(size=fs).astype(np.float64) * 0.1
    paths = plot_graphs(s, s * 0.9, fs, out_dir=str(tmp_path))
    assert len(paths) == 4
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_plot_pitch(tmp_path):
    from eaqhm_tpu.utils.plots import plot_pitch
    grid = np.stack([np.linspace(0, 1, 100), 200 + 10 * np.sin(
        np.linspace(0, 6, 100))], axis=1)
    out = plot_pitch(grid, out=str(tmp_path / "f0.png"))
    assert os.path.getsize(out) > 1000


# ---------------------------------------------------------- checkpointing

def test_corpus_checkpoint_roundtrip(tmp_path):
    ck = CorpusCheckpoint(str(tmp_path / "ck"))
    assert not ck.is_done("u1")
    srer = [17.8, 24.4, 24.6]
    s_rec = np.random.default_rng(1).normal(size=1000)
    ck.save_result("u1", srer, s_rec)
    assert ck.is_done("u1")
    assert ck.completed() == ["u1"]
    got = ck.load_result("u1")
    np.testing.assert_allclose(got["s_recon"], s_rec)
    np.testing.assert_allclose(got["srer"], srer)
    ck.mark_failed("u2", "boom")
    assert not ck.is_done("u2")
    assert ck.manifest()["u2"]["status"] == "failed"


def test_adaptation_state_roundtrip(tmp_path):
    path = str(tmp_path / "state.npz")
    state = {"s_recon": np.arange(10.0), "am": np.ones((10, 3))}
    save_adaptation_state(path, 2, [17.0, 24.0, 24.5], state)
    a, srer, got = load_adaptation_state(path)
    assert a == 2
    assert srer == [17.0, 24.0, 24.5]
    np.testing.assert_array_equal(got["am"], state["am"])


# ------------------------------------------------------------- corpus mode

def test_run_corpus_isolation_and_resume(tmp_path):
    good = _tone_wav(str(tmp_path / "good.wav"))
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"RIFFnotawav")
    cfg = EaqhmConfig(gender=(150.0, 250.0), max_adaptations=1)
    ckdir = str(tmp_path / "ck")
    res = run_corpus([good, bad], cfg, checkpoint_dir=ckdir)
    assert "good" in res.done
    assert "bad" in res.failed            # isolated, run continued
    assert res.done["good"]["final_srer_db"] > 5.0
    assert res.audio_seconds > 0

    # resume skips the finished utterance
    res2 = run_corpus([good, bad], cfg, checkpoint_dir=ckdir)
    assert res2.skipped == ["good"]
    assert "good" not in res2.done


def test_pad_batch():
    sigs = [np.ones(5), np.ones(8)]
    b, ls = pad_batch(sigs)
    assert b.shape == (2, 8)
    assert list(ls) == [5, 8]
    assert b[0, 5:].sum() == 0


# ------------------------------------------------------------------- CLI

def test_cli_end_to_end(tmp_path, capsys):
    from eaqhm_tpu import cli
    wav = _tone_wav(str(tmp_path / "tone.wav"))
    out = str(tmp_path / "rec.wav")
    plots = str(tmp_path / "plots")
    rc = cli.main([wav, "--gender", "150,250", "--max-adaptations", "1",
                   "--out", out, "--plots", plots, "--json", "--quiet"])
    assert rc == 0
    assert os.path.exists(out)
    assert len(os.listdir(plots)) == 4
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["final_srer_db"] > 5.0


def test_cli_corpus_mode(tmp_path, capsys):
    from eaqhm_tpu import cli
    d = tmp_path / "corpus"
    d.mkdir()
    _tone_wav(str(d / "a.wav"))
    _tone_wav(str(d / "b.wav"), f0=180.0)
    rc = cli.main([str(d), "--corpus", "--gender", "150,250",
                   "--max-adaptations", "0", "--quiet",
                   "--checkpoint-dir", str(tmp_path / "ck")])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["n_done"] == 2 and payload["n_failed"] == 0


# ------------------------------------------------------------- metrics

def test_engine_metrics_collection():
    from eaqhm_tpu.models import engine
    fs = 16000
    t = np.arange(fs) / fs
    s = 0.3 * np.sin(2 * np.pi * 200 * t) + 0.1 * np.sin(2 * np.pi * 400 * t)
    cfg = EaqhmConfig(gender=(150.0, 250.0), max_adaptations=1,
                      collect_metrics=True)
    res = engine.analyze(s, fs, cfg)
    assert len(res.metrics) == len(res.srer)
    for m in res.metrics:
        assert m["accepted_harmonics"] > 0
        assert np.isfinite(m["srer_db"])


def test_fused_adapt_loop_matches_host_loop():
    """The single-dispatch lax.while_loop adaptation phase
    (engine._adapt_loop_full) must reproduce the host-driven loop exactly:
    same SRER trajectory, same kept reconstruction, same DetComponents
    (keep-previous-on-decline semantics, reference functions.py:394-402)."""
    from eaqhm_tpu.models import engine
    fs = 16000
    t = np.arange(fs) / fs
    s = sum(0.3 / k * np.sin(2 * np.pi * k * 210 * t) for k in range(1, 5))
    cfg_host = EaqhmConfig(gender=(150.0, 250.0), max_adaptations=3,
                           fused_adapt_loop=False)
    cfg_fused = EaqhmConfig(gender=(150.0, 250.0), max_adaptations=3,
                            fused_adapt_loop=True)
    r_host = engine.analyze(s, fs, cfg_host)
    r_fused = engine.analyze(s, fs, cfg_fused)
    assert len(r_host.srer) == len(r_fused.srer)
    np.testing.assert_allclose(r_fused.srer, r_host.srer, atol=1e-9)
    # the while-loop module fuses the same graph differently than the
    # standalone step programs, so near-zero margin samples can differ at
    # denormal scale (~1e-24 observed); assert to f64 noise, not bitwise
    np.testing.assert_allclose(r_fused.s_recon, r_host.s_recon, atol=1e-12)
    np.testing.assert_allclose(r_fused.det_ak, r_host.det_ak, atol=1e-12)
    np.testing.assert_allclose(r_fused.det_pk, r_host.det_pk, atol=1e-10)


# ---------------------------------------------------------- data model shim

def test_structs_from_result():
    from eaqhm_tpu import structs
    from eaqhm_tpu.models import engine
    fs = 16000
    t = np.arange(fs) / fs
    s = 0.3 * np.sin(2 * np.pi * 200 * t) + 0.1 * np.sin(2 * np.pi * 400 * t)
    cfg = EaqhmConfig(gender=(150.0, 250.0), max_adaptations=0)
    res = engine.analyze(s, fs, cfg)
    dets = structs.from_result(res)
    assert len(dets) == len(res.det_ti)
    voiced = [d for d in dets if d.isVoiced]
    assert voiced and all(len(d.ak) == len(d.frange) == len(d.pk)
                          for d in voiced)
    assert any(len(d.ak) > 0 for d in voiced)
    frames = structs.frames_from_result(res)
    assert len(frames) == len(dets)
    assert frames[0].ti == dets[0].ti
