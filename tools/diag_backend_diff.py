"""Cross-backend numerics probe: where does TPU f32 diverge from CPU f32?

Phase A (cpu): run the SA19 pipeline on CPU f32, capture the exact inputs of
each _adapt_full call (and _adapt0_full), save to /tmp/eaqhm_diag/inputs.npz.
Phase B (tpu): load the captured inputs, run the SAME jitted step on the TPU,
save outputs.  Phase C (cpu): recompute on CPU and print per-stage deltas.

Usage:
  python tools/diag_backend_diff.py capture     # CPU, saves inputs+cpu outputs
  python tools/diag_backend_diff.py tpu         # TPU, saves tpu outputs
  python tools/diag_backend_diff.py compare     # prints deltas
"""
import os
import pickle
import sys

import numpy as np

DIR = "/tmp/eaqhm_diag"


def _tree_np(x):
    import jax
    return jax.tree_util.tree_map(lambda a: np.asarray(a), x)


def capture():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import eaqhm_tpu.models.engine as engine
    from eaqhm_tpu.config import EaqhmConfig
    from eaqhm_tpu.utils.io import read_wav

    fs, s = read_wav("/root/reference/SA19.WAV")
    calls = []
    orig = engine._adapt_full

    def spy(*args, **statics):
        out = orig(*args, **statics)
        if len(calls) < 3:
            calls.append((_tree_np(args), dict(statics), _tree_np(out)))
        return out

    engine._adapt_full = spy
    cfg = EaqhmConfig(gender="female", dtype="float32", max_adaptations=4,
                      stop_on_decline=False)
    res = engine.analyze(s, fs, cfg, verbose=True)
    engine._adapt_full = orig
    os.makedirs(DIR, exist_ok=True)
    with open(f"{DIR}/capture.pkl", "wb") as f:
        pickle.dump({"calls": calls, "srer": res.srer}, f)
    print("captured", len(calls), "adaptation calls; srer:", res.srer)


def run(backend):
    if backend == "cpu2":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import eaqhm_tpu.models.engine as engine
    with open(f"{DIR}/capture.pkl", "rb") as f:
        data = pickle.load(f)
    outs = []
    for args, statics, _cpu_out in data["calls"]:
        out = engine._adapt_full(*jax.tree_util.tree_map(np.asarray, args),
                                 **statics)
        outs.append(_tree_np(out))
    with open(f"{DIR}/out_{backend}.pkl", "wb") as f:
        pickle.dump(outs, f)
    print(f"saved {len(outs)} outputs on", jax.default_backend())


def compare():
    with open(f"{DIR}/capture.pkl", "rb") as f:
        data = pickle.load(f)
    with open(f"{DIR}/out_tpu.pkl", "rb") as f:
        tpu = pickle.load(f)
    names = ["a0_interp", "am_f", "fm_f", "ph_f", "fm_cur", "s_rec", "srer"]
    for ai, ((args, statics, cpu_out), tpu_out) in enumerate(
            zip(data["calls"], tpu)):
        print(f"--- adaptation call {ai} (same inputs) ---")
        for n, c, t in zip(names, cpu_out, tpu_out):
            c = np.asarray(c, np.float64)
            t = np.asarray(t, np.float64)
            d = np.abs(c - t)
            denom = np.maximum(np.abs(c), 1e-12)
            print(f"  {n:10s} max_abs={d.max():.3e} "
                  f"max_rel={(d / denom).max():.3e} "
                  f"rms={np.sqrt((d ** 2).mean()):.3e} "
                  f"cpu_srer={c.ravel()[-1] if n == 'srer' else 0:.6f}")


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "capture":
        capture()
    elif mode in ("tpu", "cpu2"):
        run(mode)
    else:
        compare()
