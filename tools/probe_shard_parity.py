"""Discriminate sharding-bug vs f32-chaos in the SA19-shaped dryrun.

Runs the same 8-tile SA19 batch sharded vs unsharded in BOTH dtypes:
f64 parity ~1e-12 + f32 divergence => decision-flip chaos (benign);
f64 divergence => real sharding bug in the batch engine.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from eaqhm_tpu.config import EaqhmConfig
    from eaqhm_tpu.parallel.mesh import make_mesh
    from eaqhm_tpu.parallel.batch_engine import analyze_batch
    from __graft_entry__ import _sa19_tiles

    import json
    import time

    fs, tiles = _sa19_tiles(8, 6001)
    mesh = make_mesh(8)
    dtypes = sys.argv[1:] or ["float64", "float32"]
    rows = []
    for dt in dtypes:
        cfg = EaqhmConfig(gender="female", max_adaptations=3, dtype=dt)
        om = analyze_batch(tiles, fs, cfg, mesh=mesh)
        ou = analyze_batch(tiles, fs, cfg, mesh=None)
        n = min(om.srer.shape[1], ou.srer.shape[1])
        a_m, a_r = om.srer[:, :n], ou.srer[:, :n]
        both = np.isfinite(a_m) & np.isfinite(a_r)
        err = np.abs(np.where(both, a_m - a_r, 0.0)).max()
        err01 = np.abs(np.where(both[:, :2], (a_m - a_r)[:, :2], 0.0)).max()
        ferr = np.abs(om.final_srer - ou.final_srer).max()
        row = {"dtype": dt, "srer_parity_db": float(f"{err:.3e}"),
               "adapt01_parity_db": float(f"{err01:.3e}"),
               "final_parity_db": float(f"{ferr:.3e}"),
               "mask_skew": int((np.isfinite(a_m) != np.isfinite(a_r)).sum()),
               "mesh_final": np.round(om.final_srer, 4).tolist(),
               "ref_final": np.round(ou.final_srer, 4).tolist()}
        rows.append(row)
        print(f"dtype={dt}: srer parity {err:.3e} dB (adapt0-1 "
              f"{err01:.3e}), final {ferr:.3e} dB, "
              f"mask_skew={row['mask_skew']}", flush=True)
        print("  mesh trajs:", np.round(a_m, 4).tolist(), flush=True)
        print("  ref  trajs:", np.round(a_r, 4).tolist(), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out",
                       "shard_parity.json")
    art = {"mesh_shape": list(mesh.devices.shape), "B": len(tiles),
           "tile_len": len(tiles[0]), "n_adapt": 4,
           "backend": jax.default_backend(),
           "ts": time.strftime("%Y-%m-%dT%H:%M:%S"), "rows": rows,
           "conclusion": ("f64 parity ~1e-12 => sharding exact; f32 "
                          "divergence past adaptation 1 is acceptance-"
                          "decision chaos (docs/NUMERICS.md)")}
    prev = []
    if os.path.exists(out):
        try:
            prev = json.load(open(out)).get("runs", [])
        except Exception:
            prev = []
    with open(out, "w") as f:
        json.dump({"runs": prev + [art]}, f, indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
