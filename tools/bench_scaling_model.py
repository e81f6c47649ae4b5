"""Scaling-efficiency evidence pinned to XLA's cost model (VERDICT r3 #5).

Wall-clock scaling curves on an N-virtual-device CPU mesh backed by 2
physical cores measure host contention, not the sharding design.  This tool
runs the production batched pipeline for each mesh size, captures the real
jitted step + its real arguments (spy on make_batch_step, same idiom as
tools/bench_adapt.py), and reads XLA's OWN cost analysis of the per-device
program: if per-device FLOPs scale as 1/N while the SRER stays put, the
program the compiler will run on N real chips does 1/N of the work per
chip — the property real >= 85% weak scaling requires (the residual is ICI
collective latency, which the multichip dryrun exercises functionally).

Writes tools/out/scaling_model.json.
Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools/bench_scaling_model.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from eaqhm_tpu.config import EaqhmConfig
    from eaqhm_tpu.parallel.mesh import make_mesh
    from eaqhm_tpu.parallel import batch_engine as be
    from __graft_entry__ import _sa19_tiles

    fs, tiles = _sa19_tiles(8, 6001)
    cfg = EaqhmConfig(gender="female", max_adaptations=2, dtype="float32")
    ndev = len(jax.devices())
    rows = []

    orig_make = be.make_batch_step

    for n in (1, 2, 4, 8):
        if n > ndev:
            continue
        mesh = make_mesh(n) if n > 1 else None
        dp, mp = (mesh.devices.shape if mesh is not None else (1, 1))

        cap = {}

        def spy_make(mesh_, geom_, adapt0):
            fn = orig_make(mesh_, geom_, adapt0)
            def wrapper(*args):
                key = "step0" if adapt0 else "stepN"
                if key not in cap:
                    cap[key] = (fn, args)
                return fn(*args)
            return wrapper

        be.make_batch_step = spy_make
        try:
            t0 = time.time()
            out = be.analyze_batch(tiles, fs, cfg, mesh=mesh)
            wall = time.time() - t0
        finally:
            be.make_batch_step = orig_make

        row = {"n_devices": n, "mesh": [int(dp), int(mp)],
               "wall_s_contended": round(wall, 2),
               "mean_final_srer_db": round(float(out.srer_mean), 4)}
        for key, (fn, args) in cap.items():
            try:
                comp = fn.lower(*args).compile()
                ca = comp.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                row[key] = {
                    "flops_per_device": float(ca.get("flops", float("nan"))),
                    "bytes_accessed_per_device":
                        float(ca.get("bytes accessed", float("nan"))),
                }
            except Exception as e:  # noqa: BLE001 — report, don't die
                row[key] = {"error": f"{type(e).__name__}: {e}"}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # derived efficiency: per-device flops should halve per doubling
    base = next((r for r in rows if r["n_devices"] == 1), None)
    if base and "step0" in base and "flops_per_device" in base.get("step0", {}):
        f1 = base["step0"]["flops_per_device"]
        for r in rows:
            f = r.get("step0", {}).get("flops_per_device")
            if f and f == f:  # not NaN
                r["step0"]["parallel_fraction_vs_1dev"] = round(
                    f1 / (f * r["n_devices"]), 4)
    out_p = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out",
                         "scaling_model.json")
    with open(out_p, "w") as f:
        json.dump({"rows": rows,
                   "note": ("parallel_fraction_vs_1dev = flops(1dev) / "
                            "(N * flops_per_device(Ndev)): 1.0 = perfect "
                            "1/N work division by the compiled program")},
                  f, indent=1)
    print("wrote", out_p)


if __name__ == "__main__":
    main()
