"""Sweep the lax.map chunk size (and solve method) on the real pipeline.

Usage (TPU): python tools/bench_chunk.py 128 256 512
             python tools/bench_chunk.py --method pallas 128
Prints per-config: total time, per-adaptation time, final SRER.
"""
import argparse
import time

import numpy as np
from scipy.io import wavfile

from eaqhm_tpu.config import EaqhmConfig
from eaqhm_tpu.models import engine


def main():
    p = argparse.ArgumentParser()
    p.add_argument("chunks", nargs="*", type=int, default=[128])
    p.add_argument("--method", default="auto")
    args = p.parse_args()

    fs, s16 = wavfile.read("/root/reference/SA19.WAV")
    sig = s16.astype(np.float64) / 32768.0
    for chunk in (args.chunks or [128]):
        cfg = EaqhmConfig(gender="female", chunk=chunk,
                          solve_method=args.method)
        res = engine.analyze(sig, fs, cfg)       # warmup/compile
        times = []
        for _ in range(3):
            t0 = time.time()
            res = engine.analyze(sig, fs, cfg)
            times.append(time.time() - t0)
        el = min(times)
        per_adapt = np.mean([v for k, v in res.timings.items()
                             if k != "adaptation_0"])
        print(f"chunk={chunk:4d} method={args.method}: total {el:6.3f}s  "
              f"a0={res.timings['adaptation_0']:.3f}s  "
              f"a>=1 {per_adapt:.3f}s  srer={max(res.srer):.4f} "
              f"n={len(res.srer)}", flush=True)


if __name__ == "__main__":
    main()
