"""Per-device utterance streams: program-level data parallelism.

The sharded batch engine (parallel.batch_engine) pays worst-case geometry
for every utterance — the pitch-floor (W, Kc) padding and lockstep
convergence make it ~8x slower per audio-second than the per-utterance
engine on one device (measured r4, tools/out/benchmarks_r4.json config 3).
This module is the alternative the r4 review called for (VERDICT r4 item
4): each device runs the TIGHT per-utterance engine (models.engine.analyze,
quantized-geometry jit programs) on its own stream of utterances, so
per-device work is exactly the sequential engine's — data parallelism at
program level, with nothing padded and nobody waiting for the batch's last
convergence.

How it maps to JAX: analyze(..., device=d) commits every uploaded array to
device d, and computation follows committed inputs — each worker thread
drives one device's stream through the shared jitted programs (compiled
once per (geometry page, device); the persistent compile cache makes the
per-device executables cheap).  Threads interleave naturally: a thread
blocked on its device's SRER fetch releases the GIL while other threads
dispatch to their devices.

Corpus statistics: per-utterance summaries are reduced host-side here (one
process owns its local devices); across HOSTS the stats ride the existing
collective path (parallel.corpus.run_corpus_sharded / multihost_init) —
streams scale the intra-host axis, collectives the inter-host axis.

Reference semantics per utterance are untouched: each stream runs the
full keep-previous-on-decline loop (reference functions.py:394-402)
independently, like N sequential reference runs side by side.
"""
from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from eaqhm_tpu.config import EaqhmConfig


@dataclass
class StreamResult:
    """Corpus-level outcome of a multi-stream run."""
    done: Dict[int, dict] = field(default_factory=dict)   # index -> summary
    failed: Dict[int, str] = field(default_factory=dict)  # index -> error
    per_device: Dict[str, dict] = field(default_factory=dict)
    elapsed: float = 0.0
    audio_seconds: float = 0.0

    @property
    def audio_seconds_per_second(self) -> float:
        return self.audio_seconds / self.elapsed if self.elapsed else 0.0

    @property
    def srer_mean(self) -> float:
        vals = [v["final_srer_db"] for v in self.done.values()]
        return float(np.mean(vals)) if vals else float("nan")


def run_streams(signals: Sequence, fs: int,
                config: EaqhmConfig = EaqhmConfig(),
                devices: Optional[List] = None,
                verbose: bool = False) -> StreamResult:
    """Analyze utterances over per-device streams.

    signals: numpy arrays (or (fs, array) pairs of equal fs).  Utterances
    are pulled from one shared queue, so faster devices take more work
    (dynamic load balance — no lockstep).  Failures are isolated per
    utterance (SURVEY.md §5 failure-detection row).
    """
    import jax
    from eaqhm_tpu.models import engine

    if devices is None:
        devices = jax.local_devices()
    work: "queue.Queue" = queue.Queue()
    for i, s in enumerate(signals):
        work.put((i, np.asarray(s, np.float64)))

    res = StreamResult()
    lock = threading.Lock()
    t0 = time.time()

    def worker(dev):
        n_utt = 0
        t_dev = 0.0
        while True:
            try:
                i, s = work.get_nowait()
            except queue.Empty:
                break
            t_u = time.time()
            try:
                out = engine.analyze(s, fs, config, device=dev)
                summary = {
                    "final_srer_db": float(np.max(out.srer)),
                    "n_adaptations": len(out.srer),
                    "seconds": time.time() - t_u,
                    "device": str(dev),
                }
                with lock:
                    res.done[i] = summary
                    res.audio_seconds += len(s) / fs
            except Exception as e:  # noqa: BLE001 — isolate per utterance
                with lock:
                    res.failed[i] = f"{type(e).__name__}: {e}"
            n_utt += 1
            t_dev += time.time() - t_u
        with lock:
            res.per_device[str(dev)] = {"utterances": n_utt,
                                        "busy_seconds": round(t_dev, 3)}

    threads = [threading.Thread(target=worker, args=(d,), daemon=True)
               for d in devices]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    res.elapsed = time.time() - t0
    if verbose:
        print(f"[streams] {len(res.done)} done / {len(res.failed)} failed "
              f"on {len(devices)} devices in {res.elapsed:.2f}s "
              f"({res.audio_seconds_per_second:.2f} audio-s/s)")
    return res
