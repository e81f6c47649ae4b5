"""Device-trace one steady-state _adapt_full call on the real TPU and
summarize where the ~0.35 s goes (VERDICT r4 item 3: MXU vs dispatch/cond/
DMA attribution by measurement, not wall timers).

Captures the engine's real _adapt_full arguments from a live analyze() run
(same spy approach as bench_adapt.py), then traces N repeats with
jax.profiler and aggregates the device-side op spans from the exported
Perfetto trace (vm.trace.json.gz).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_adapt.py
"""
import glob
import gzip
import json
import os
import time
from collections import defaultdict

import numpy as np
import jax

import eaqhm_tpu.models.engine as engine
from eaqhm_tpu.config import EaqhmConfig
from eaqhm_tpu.utils.io import read_wav

captured = {}
orig = engine._adapt_full


def spy(s, fm_current, am_current, buckets, centers, h, do_update,
        det, std_det, n_valid, **statics):
    out = orig(s, fm_current, am_current, buckets, centers, h, do_update,
               det, std_det, n_valid, **statics)
    if "args" not in captured:
        captured["args"] = (s, fm_current, am_current, buckets, centers, h,
                            do_update, det, std_det, n_valid)
        captured["statics"] = dict(statics)
    return out


def main():
    fs, s = read_wav("/root/reference/SA19.WAV")
    engine._adapt_full = spy
    res = engine.analyze(s, fs, EaqhmConfig(gender="female"))
    engine._adapt_full = orig
    print("captured; srer:", [round(x, 3) for x in res.srer[:3]])
    args = captured["args"]
    statics = captured["statics"]

    def step():
        return orig(*args, **statics)

    jax.block_until_ready(step())
    t0 = time.time()
    N = 5
    for _ in range(N):
        out = step()
    jax.block_until_ready(out)
    wall = (time.time() - t0) / N
    print(f"steady-state _adapt_full wall: {wall * 1e3:.1f} ms")

    trace_dir = "/tmp/adapt_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(N):
            out = step()
        jax.block_until_ready(out)

    # ---- parse the Perfetto trace: aggregate op spans per device track ----
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    # map pid/tid -> track name
    procs = {}
    threads = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            procs[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = e["args"]["name"]
    by_track = defaultdict(float)
    by_op = defaultdict(float)
    t_min, t_max = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        pname = procs.get(pid, str(pid))
        tname = threads.get((pid, e.get("tid")), "")
        dur = e.get("dur", 0) / 1e6          # us -> s
        if "TPU" in pname or "tpu" in pname.lower():
            key = f"{pname}/{tname}"
            by_track[key] += dur
            nm = e.get("name", "?")
            # collapse fusion suffixes
            base = nm.split(".")[0].split("(")[0]
            by_op[base] += dur
            ts = e.get("ts", 0) / 1e6
            t_min = min(t_min, ts)
            t_max = max(t_max, ts + dur)
    print(f"\ntrace span {t_max - t_min:.3f} s for {N} steps "
          f"({(t_max - t_min) / N * 1e3:.1f} ms/step)")
    print("\nper-track busy time (s, over all steps):")
    for k, v in sorted(by_track.items(), key=lambda kv: -kv[1])[:8]:
        print(f"  {v:8.3f}  {k}")
    print(f"\ntop device ops (ms per step):")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v / N * 1e3:8.2f}  {k}")


if __name__ == "__main__":
    main()
