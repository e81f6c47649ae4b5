"""Finer cross-backend probe: split solve vs track-interp divergence.

Uses the capture from diag_backend_diff.py.  For adaptation call 0:
  stage A: per-bucket eaQHM analysis (_eaqhm_bucket) -> amps/fm/ph/acc
  stage B: _scatter_and_interp on FIXED (cpu) stage-A outputs
Run `a` on cpu and tpu, save; `compare` prints per-stage deltas.

Usage:
  python tools/diag_stage_diff.py run cpu      (JAX_PLATFORMS=cpu prefix)
  python tools/diag_stage_diff.py run tpu
  python tools/diag_stage_diff.py compare
"""
import os
import pickle
import sys

import numpy as np

DIR = "/tmp/eaqhm_diag"


def run(tag):
    if tag == "f64":
        os.environ["JAX_ENABLE_X64"] = "1"
    import jax
    import jax.numpy as jnp
    from functools import partial
    import eaqhm_tpu.models.engine as engine

    with open(f"{DIR}/capture.pkl", "rb") as f:
        data = pickle.load(f)
    args, statics, _ = data["calls"][0]
    (s, fm_current, am_current, buckets, centers, h, do_update,
     det, std_det) = jax.tree_util.tree_map(jnp.asarray, args)
    if tag == "f64":
        up = lambda x: x.astype(jnp.float64) if x.dtype == jnp.float32 else x
        s, fm_current, am_current, h, det, std_det = map(
            up, (s, fm_current, am_current, h, det, std_det))
    geom = statics["geom"]
    fs = statics["fs"]
    chunk = statics["chunk"]
    length = statics["length"]
    step = statics["step"]
    No = statics["No"]
    L = s.shape[0]

    # ---- prologue masks (deterministic) ----
    all_centers = jnp.concatenate([b[1] for b in buckets])
    fmc_all = fm_current[all_centers]
    mask_all = fmc_all != 0
    dead_all = ~jnp.any(mask_all, axis=1)
    dead_center = jnp.zeros(L, bool).at[all_centers].set(dead_all)

    # ---- stage A: bucketed solves ----
    @partial(jax.jit, static_argnames=("Wb", "Kb"))
    def bucket_fn(c_b, wl_b, dd_b, mk_b, Wb, Kb):
        with jax.default_matmul_precision("highest"):
            return engine._eaqhm_bucket(
                s, fm_current, am_current, c_b, wl_b, dd_b, mk_b,
                dead_center, h, do_update, W=Wb, Kc=Kb, fs=fs, chunk=chunk)

    partsA = []
    off = 0
    for (idx, c_b, wl_b), (Wb, Kb) in zip(buckets, geom):
        nb = c_b.shape[0]
        dd_b = dead_all[off:off + nb]
        mk_b = mask_all[off:off + nb, :Kb]
        mk_b = jnp.where(dd_b[:, None], jnp.arange(Kb)[None, :] == 0, mk_b)
        out = bucket_fn(c_b, wl_b, dd_b, mk_b, Wb, Kb)
        partsA.append(jax.tree_util.tree_map(np.asarray, out))
        off += nb

    # ---- stage B: interp on FIXED inputs (cpu stage-A saved separately) ----
    resB = None
    if os.path.exists(f"{DIR}/stageA_cpu.pkl"):
        with open(f"{DIR}/stageA_cpu.pkl", "rb") as f:
            partsA_cpu = pickle.load(f)
        Kcm = max(k for _, k in geom)
        pj = [tuple(jnp.asarray(x) for x in p) for p in partsA_cpu]
        a0_v, am_v, fm_v, ph_v, acc_v = engine._combine_buckets(
            pj, [b[0] for b in buckets], No, Kcm, s.dtype)
        voiced = jnp.zeros(No, bool)
        for b in buckets:
            voiced = voiced.at[b[0]].set(True)
        with jax.default_matmul_precision("highest"):
            outB = jax.jit(
                lambda *a: engine._scatter_and_interp(
                    *a[:6], length=length, step=step, fs=fs, voiced=a[6])
            )(a0_v, am_v, fm_v, ph_v, acc_v, centers, voiced)
        resB = jax.tree_util.tree_map(np.asarray, outB)

    with open(f"{DIR}/stageA_{tag}.pkl", "wb") as f:
        pickle.dump(partsA, f)
    if resB is not None:
        with open(f"{DIR}/stageB_{tag}.pkl", "wb") as f:
            pickle.dump(resB, f)
    print("saved stages for", tag, "backend:", jax.default_backend())


def _cmp(name, c, t):
    c = np.asarray(c, np.float64)
    t = np.asarray(t, np.float64)
    d = np.abs(c - t)
    print(f"  {name:8s} max={d.max():.3e} rms={np.sqrt((d**2).mean()):.3e} "
          f"p99.9={np.quantile(d, 0.999):.3e}")


def compare():
    with open(f"{DIR}/stageA_cpu.pkl", "rb") as f:
        A_cpu = pickle.load(f)
    with open(f"{DIR}/stageA_tpu.pkl", "rb") as f:
        A_tpu = pickle.load(f)
    A_f64 = None
    if os.path.exists(f"{DIR}/stageA_f64.pkl"):
        with open(f"{DIR}/stageA_f64.pkl", "rb") as f:
            A_f64 = pickle.load(f)
    names = ["a0_val", "am", "fm", "ph", "acc"]
    for bi, (pc, pt) in enumerate(zip(A_cpu, A_tpu)):
        print(f"--- bucket {bi} (stage A: solves+acceptance) ---")
        accc = pc[4]
        acct = pt[4]
        flips = int(np.count_nonzero(accc != acct))
        both = accc & acct
        print(f"  acc flips cpu-vs-tpu: {flips} / {accc.size}  (both-on: "
              f"{int(both.sum())})")
        if A_f64 is not None:
            pg = A_f64[bi]
            both3 = both & pg[4]
            for n, c, t, g in zip(names[:4], pc[:4], pt[:4], pg[:4]):
                m = both3 if c.ndim == 2 else np.ones(c.shape, bool)
                print(f"  {n}: err vs f64 —")
                _cmp("  cpu", np.where(m, c, 0), np.where(m, g, 0))
                _cmp("  tpu", np.where(m, t, 0), np.where(m, g, 0))
        else:
            for n, c, t in zip(names[:4], pc[:4], pt[:4]):
                if c.ndim == 2:
                    _cmp(n, np.where(both, c, 0), np.where(both, t, 0))
                else:
                    _cmp(n, c, t)
    if os.path.exists(f"{DIR}/stageB_tpu.pkl"):
        with open(f"{DIR}/stageB_cpu.pkl", "rb") as f:
            B_cpu = pickle.load(f)
        with open(f"{DIR}/stageB_tpu.pkl", "rb") as f:
            B_tpu = pickle.load(f)
        B_f64 = None
        if os.path.exists(f"{DIR}/stageB_f64.pkl"):
            with open(f"{DIR}/stageB_f64.pkl", "rb") as f:
                B_f64 = pickle.load(f)
        print("--- stage B (interp+synthesis on identical inputs) ---")
        for i, n in enumerate(["a0_i", "am_f", "fm_f", "ph_f", "fm_cur",
                               "s_rec"]):
            if B_f64 is not None:
                print(f"  {n}: err vs f64 —")
                _cmp("  cpu", B_cpu[i], B_f64[i])
                _cmp("  tpu", B_tpu[i], B_f64[i])
            else:
                _cmp(n, B_cpu[i], B_tpu[i])


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "run":
        run(sys.argv[2])
    else:
        compare()
