"""Corpus-scale driver: many utterances, error isolation, checkpoint/resume.

The reference processes exactly one file per run (reference main.py:62);
scaling out is a build target, not a ported component (SURVEY.md §2.2).  Two
modes:

- `run_corpus`: the robust production path — per-utterance analysis with the
  full convergence loop, failures isolated (a bad file marks the utterance
  failed and the run continues, SURVEY.md §5 "failure detection"), completed
  utterances persisted through `CorpusCheckpoint` so a restarted run resumes
  where it stopped.  Within one host, utterances stream through the jitted
  engine whose compiled kernels are reused across same-geometry utterances.

- `run_corpus_sharded`: the throughput path for BASELINE.json configs 3/5 —
  a batch of equal-length (padded) utterances vmapped + sharded over the
  'data' mesh axis, SRER statistics reduced with psum collectives.  On a
  multi-host pod each host feeds its own shard of the corpus
  (`jax.process_index()`-strided) and the collectives ride ICI/DCN.
"""
from __future__ import annotations

import os
import time
import traceback
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from eaqhm_tpu.config import EaqhmConfig
from eaqhm_tpu.utils import io as io_mod
from eaqhm_tpu.utils.checkpoint import CorpusCheckpoint


@dataclass
class CorpusResult:
    done: Dict[str, dict] = field(default_factory=dict)     # utt_id -> summary
    failed: Dict[str, str] = field(default_factory=dict)    # utt_id -> error
    skipped: List[str] = field(default_factory=list)        # resumed-over
    elapsed: float = 0.0
    audio_seconds: float = 0.0

    @property
    def audio_seconds_per_second(self) -> float:
        return self.audio_seconds / self.elapsed if self.elapsed else 0.0


def _utt_id(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def run_corpus(paths: Sequence[str], config: EaqhmConfig = EaqhmConfig(),
               checkpoint_dir: Optional[str] = None,
               write_wavs: Optional[str] = None,
               verbose: bool = False) -> CorpusResult:
    """Analyze a corpus of wav files with isolation + resume.

    Host-sharded on multi-process runs: process i handles paths[i::n].
    """
    from eaqhm_tpu.models import engine
    import jax

    nproc = jax.process_count() if jax.process_count() > 1 else 1
    pidx = jax.process_index() if nproc > 1 else 0
    my_paths = list(paths)[pidx::nproc]

    ckpt = CorpusCheckpoint(checkpoint_dir) if checkpoint_dir else None
    res = CorpusResult()
    t0 = time.time()
    from eaqhm_tpu.utils.progress import progress_bar
    bar = progress_bar(total=len(my_paths), desc="corpus",
                       enabled=config.loading_screen)
    def _tick(outcome):
        # bar reflects COMPLETED work (ADVICE r3): update after the
        # analyze/skip outcome, with the outcome as postfix
        if bar is not None:
            bar.set_postfix_str(outcome)
            bar.update(1)

    for path in my_paths:
        uid = _utt_id(path)
        if ckpt is not None and ckpt.is_done(uid):
            res.skipped.append(uid)
            _tick(f"skipped {uid}")
            continue
        try:
            fs, s = io_mod.read_wav(path)
            out = engine.analyze(s, fs, config, verbose=verbose)
            res.audio_seconds += len(s) / fs
            summary = {"final_srer_db": float(np.max(out.srer)),
                       "srer_db": [float(x) for x in out.srer],
                       "n_adaptations": len(out.srer)}
            res.done[uid] = summary
            if ckpt is not None:
                ckpt.save_result(uid, out.srer, out.s_recon)
            if write_wavs:
                os.makedirs(write_wavs, exist_ok=True)
                io_mod.write_wav(
                    os.path.join(write_wavs, f"{uid}_reconstructed.wav"),
                    fs, out.s_recon)
            _tick(f"done {uid} ({summary['final_srer_db']:.2f} dB)")
        except Exception as e:  # noqa: BLE001 — isolation is the point
            err = f"{type(e).__name__}: {e}\n{traceback.format_exc()}"
            res.failed[uid] = err
            if ckpt is not None:
                ckpt.mark_failed(uid, err)
            if verbose:
                print(f"[corpus] FAILED {uid}: {type(e).__name__}: {e}")
            _tick(f"FAILED {uid}")
    if bar is not None:
        bar.close()
    res.elapsed = time.time() - t0
    return res


def pad_batch(signals: Sequence[np.ndarray], length: Optional[int] = None):
    """Zero-pad a list of 1-D signals to a common length -> ([B, L], [B])."""
    ls = np.array([len(s) for s in signals])
    L = int(length or ls.max())
    out = np.zeros((len(signals), L), np.float64)
    for i, s in enumerate(signals):
        out[i, :min(len(s), L)] = s[:L]
    return out, ls


def run_corpus_sharded(paths: Sequence[str],
                       config: EaqhmConfig = EaqhmConfig(),
                       mesh=None, batch_size: Optional[int] = None,
                       checkpoint_dir: Optional[str] = None,
                       verbose: bool = False) -> CorpusResult:
    """Throughput corpus path: the FULL pipeline (SWIPE' pitch, VAD,
    adaptation 0, eaQHM convergence loop), batched over padded utterances
    and sharded over the (data, model) mesh (parallel.batch_engine).

    Batches are data-parallel over mesh axis 'data' (batch_size defaults to
    the data-axis size); within an utterance frames/harmonics shard over
    'model'; SRER statistics reduce with psum collectives.  On a multi-host
    pod each process feeds its own `jax.process_index()`-strided shard of
    the corpus.  Failure isolation is per-batch (a bad file fails its
    batch's members individually on the host read, not the run).
    """
    import jax
    from eaqhm_tpu.parallel.batch_engine import analyze_batch

    nproc = jax.process_count() if jax.process_count() > 1 else 1
    pidx = jax.process_index() if nproc > 1 else 0
    my_paths = list(paths)[pidx::nproc]

    if mesh is None:
        try:
            from eaqhm_tpu.parallel.mesh import make_mesh
            mesh = make_mesh()
        except Exception:
            mesh = None
    if mesh is None or int(np.prod(mesh.devices.shape)) == 1:
        # Degenerate mesh: the batched/sharded engine pays its padding +
        # collective structure with nothing to parallelize over — measured
        # 8x slower per audio-second than the per-utterance engine on one
        # chip (tools/out/benchmarks_r4.json, config 3).  The sequential
        # driver IS the single-device corpus fast path.
        return run_corpus(paths, config, checkpoint_dir=checkpoint_dir,
                          verbose=verbose)
    if batch_size is None:
        batch_size = mesh.devices.shape[0]

    ckpt = CorpusCheckpoint(checkpoint_dir) if checkpoint_dir else None
    res = CorpusResult()
    t0 = time.time()

    def flush(batch):
        # pad the batch up to the mesh's data-axis size with a repeat of the
        # first member (dropped from the stats below)
        real_n = len(batch)
        while mesh is not None and len(batch) % mesh.devices.shape[0]:
            batch.append(batch[0])
        fs0 = batch[0][1]
        try:
            out = analyze_batch([b[2] for b in batch], fs0, config,
                                mesh=mesh, verbose=verbose)
        except Exception as e:  # noqa: BLE001
            for uid, _, _ in batch[:real_n]:
                res.failed[uid] = f"{type(e).__name__}: {e}"
                if ckpt is not None:
                    ckpt.mark_failed(uid, str(e))
            return
        for i, (uid, fs_i, s_i) in enumerate(batch[:real_n]):
            res.audio_seconds += len(s_i) / fs_i
            res.done[uid] = {
                "final_srer_db": float(out.final_srer[i]),
                "srer_db": [float(x) for x in out.srer[i]],
                "n_adaptations": int(out.n_adaptations),
            }
            if ckpt is not None:
                ckpt.save_result(uid, list(out.srer[i]),
                                 out.s_recon[i, :len(s_i)])

    # pending utterances are grouped BY SAMPLE RATE: a batch is analyzed at
    # one fs (analyze_batch takes a single rate), so a 22.05 kHz file must
    # never ride a 16 kHz batch — it would "succeed" at the wrong rate.
    pending: dict = {}                              # fs -> [(uid, fs, signal)]
    for path in my_paths:
        uid = _utt_id(path)
        if ckpt is not None and ckpt.is_done(uid):
            res.skipped.append(uid)
            continue
        try:
            fs, s = io_mod.read_wav(path)
            pending.setdefault(int(fs), []).append((uid, fs, s))
        except Exception as e:  # noqa: BLE001 — isolation is the point
            res.failed[uid] = f"{type(e).__name__}: {e}"
            if ckpt is not None:
                ckpt.mark_failed(uid, str(e))
            continue
        if len(pending[int(fs)]) >= batch_size:
            flush(pending[int(fs)][:batch_size])
            pending[int(fs)] = pending[int(fs)][batch_size:]
    for fsk in sorted(pending):                     # flush the tails
        q = pending[fsk]
        while q:
            flush(q[:batch_size])
            q = q[batch_size:]
    res.elapsed = time.time() - t0
    return res
