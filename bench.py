"""Benchmark: full eaQHM analysis+synthesis pipeline on SA19.WAV.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-s/s", "vs_baseline": N}

Baseline: the reference implementation measured end-to-end in this container
(BASELINE.md): 221.07 s for 3.968 s of audio = 0.01795 audio-seconds/second
on one CPU core, SRER converging to 25.4974 dB.  The benchmark reports
audio-seconds processed per wall-second at matched SRER (full adaptation
loop to convergence, default female config).
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_AUDIO_S_PER_S = 0.01795  # reference, 1 CPU core (BASELINE.md)
REF_FINAL_SRER = 25.497403658214047

# Axon-backend first-exec lottery (docs/WARMUP.md): identical warmups
# measured 23.6-444 s across runs — pool noise outside this process, not
# compile time.  If the first warmup draws badly, retry once in a FRESH
# process so a single outlier cannot define the round's cold-start story;
# the JSON reports every draw in "warmup_runs".
WARMUP_RETRY_THRESHOLD_S = 60.0


def _warmup_probe():
    """Child mode: one cold analyze, print the wall seconds, exit."""
    from eaqhm_tpu.config import EaqhmConfig
    from eaqhm_tpu.models import engine
    from eaqhm_tpu.utils.io import read_wav
    fs, s = read_wav("/root/reference/SA19.WAV")
    t0 = time.time()
    engine.analyze(s, fs, EaqhmConfig(gender="female"))
    print(json.dumps({"warmup_s": round(time.time() - t0, 1)}))


def main():
    import jax
    from eaqhm_tpu.config import EaqhmConfig
    from eaqhm_tpu.models import engine
    from eaqhm_tpu.utils.io import read_wav

    fs, s = read_wav("/root/reference/SA19.WAV")
    audio_seconds = len(s) / fs
    cfg = EaqhmConfig(gender="female")

    # warmup: triggers all compiles (cached afterwards)
    t0 = time.time()
    res = engine.analyze(s, fs, cfg)
    warm = time.time() - t0
    print(f"warmup: {warm:.1f}s srer={max(res.srer):.6f}", file=sys.stderr)
    print("warmup timings:", {k: round(v, 2) for k, v in
                              res.timings.items()}, file=sys.stderr)
    warmup_runs = [round(warm, 1)]
    if warm > WARMUP_RETRY_THRESHOLD_S:
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--warmup-probe"],
                capture_output=True, text=True, timeout=900)
            row = json.loads(out.stdout.strip().splitlines()[-1])
            warmup_runs.append(float(row["warmup_s"]))
            print(f"warmup retry (fresh process): {warmup_runs[-1]:.1f}s",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — probe is best-effort
            print(f"warmup retry failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    times = []
    for _ in range(3):
        t0 = time.time()
        res = engine.analyze(s, fs, cfg)
        times.append(time.time() - t0)
    elapsed = min(times)
    value = audio_seconds / elapsed
    final_srer = float(max(res.srer))

    # metric honesty: the kept adaptation's SRER (the engine's keep-best rule
    # mirrors the reference's keep-previous-on-decline, functions.py:394-402)
    # must reach the reference's final value.  One-sided: exceeding the
    # reference is an improvement, not a mismatch.  The metric name stays
    # fixed so cross-round tooling can key on it; the boolean carries the
    # verdict (ADVICE r2).
    matched = (final_srer - REF_FINAL_SRER) > -0.1
    print(json.dumps({
        "metric": "sa19_audio_seconds_per_second_at_matched_srer",
        "srer_matched": matched,
        "value": round(value, 4),
        "unit": "audio-s/s",
        "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 2),
        "elapsed_s": round(elapsed, 3),
        "audio_seconds": audio_seconds,
        "final_srer_db": round(final_srer, 6),
        "ref_final_srer_db": REF_FINAL_SRER,
        "srer_delta_db": round(final_srer - REF_FINAL_SRER, 6),
        "backend": jax.default_backend(),
        "n_adaptations": len(res.srer),
        "warmup_runs": warmup_runs,
        "warmup_s": min(warmup_runs),
        "timings": {k: round(v, 3) for k, v in res.timings.items()},
    }))


if __name__ == "__main__":
    if "--warmup-probe" in sys.argv:
        _warmup_probe()
    else:
        main()
