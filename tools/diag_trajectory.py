"""Diagnostic: full SRER trajectory with the decline-stop rule disabled.

Usage: python tools/diag_trajectory.py [cpu|tpu] [float32|float64]
Prints per-adaptation SRER vs the reference trajectory (BASELINE.md).
"""
import json
import os
import sys
import time

REF = [17.86520945273994, 24.431728752204954, 24.67698055430504,
       25.291120491477024, 25.497403658214047, 25.446628776435006]


def main():
    plat = sys.argv[1] if len(sys.argv) > 1 else None
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    if plat == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    from eaqhm_tpu.config import EaqhmConfig
    from eaqhm_tpu.models import engine
    from eaqhm_tpu.utils.io import read_wav
    import jax

    fs, s = read_wav("/root/reference/SA19.WAV")
    cfg = EaqhmConfig(gender="female", dtype=dtype, stop_on_decline=False,
                      max_adaptations=7)
    t0 = time.time()
    res = engine.analyze(s, fs, cfg, verbose=True)
    out = {
        "backend": jax.default_backend(),
        "dtype": dtype,
        "elapsed": round(time.time() - t0, 1),
        "srer": [round(x, 6) for x in res.srer],
        "delta_vs_ref": [round(res.srer[i] - REF[i], 6)
                         for i in range(min(len(res.srer), len(REF)))],
        "timings": {k: round(v, 3) for k, v in res.timings.items()},
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
