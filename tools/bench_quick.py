"""Quick perf probe: one warmup + one timed repeat of the full SA19 pipeline.

Prints the same JSON shape as bench.py (single line) and appends it, tagged
with the active EAQHM_* toggle set and git HEAD, to
tools/out/bench_history.jsonl — the bench-before-commit record (VERDICT r3
item 2: every perf-touching commit carries a measured number from
HEAD-at-commit).

Usage:  python tools/bench_quick.py [note...]
Toggles (env): EAQHM_PLANAR, EAQHM_PHASE_SPLIT, EAQHM_FUSED, EAQHM_FUSED_LOOP,
EAQHM_CHUNK, EAQHM_SOLVE_METHOD, EAQHM_REFINE.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

BASELINE_AUDIO_S_PER_S = 0.01795  # reference, 1 CPU core (BASELINE.md)
REF_FINAL_SRER = 25.497403658214047


def main():
    import jax
    from eaqhm_tpu.config import EaqhmConfig
    from eaqhm_tpu.models import engine
    from eaqhm_tpu.utils.io import read_wav

    fs, s = read_wav("/root/reference/SA19.WAV")
    audio_seconds = len(s) / fs
    kw = {}
    if os.environ.get("EAQHM_CHUNK"):
        kw["chunk"] = int(os.environ["EAQHM_CHUNK"])
    if os.environ.get("EAQHM_SOLVE_METHOD"):
        kw["solve_method"] = os.environ["EAQHM_SOLVE_METHOD"]
    cfg = EaqhmConfig(gender="female", **kw)

    t0 = time.time()
    res = engine.analyze(s, fs, cfg)
    warm = time.time() - t0
    print(f"warmup: {warm:.1f}s srer={max(res.srer):.6f}", file=sys.stderr)
    print("warmup timings:", {k: round(v, 2) for k, v in
                              res.timings.items()}, file=sys.stderr)

    t0 = time.time()
    res = engine.analyze(s, fs, cfg)
    elapsed = time.time() - t0
    value = audio_seconds / elapsed
    final_srer = float(max(res.srer))

    try:
        head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True,
                              cwd=HERE).stdout.strip()
    except Exception:
        head = "?"
    row = {
        "metric": "sa19_audio_seconds_per_second_at_matched_srer",
        "srer_matched": (final_srer - REF_FINAL_SRER) > -0.1,
        "value": round(value, 4),
        "unit": "audio-s/s",
        "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 2),
        "elapsed_s": round(elapsed, 3),
        "warmup_s": round(warm, 1),
        "final_srer_db": round(final_srer, 6),
        "srer_delta_db": round(final_srer - REF_FINAL_SRER, 6),
        "backend": jax.default_backend(),
        "n_adaptations": len(res.srer),
        "timings": {k: round(v, 3) for k, v in res.timings.items()},
        "git": head,
        "toggles": {k: os.environ[k] for k in sorted(os.environ)
                    if k.startswith("EAQHM_") and k != "EAQHM_JAX_CACHE"},
        "note": " ".join(sys.argv[1:]),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    print(json.dumps(row))
    out = os.path.join(HERE, "out", "bench_history.jsonl")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
