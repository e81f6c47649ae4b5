"""Time the real per-adaptation dispatch and its halves on SA19 (TPU).

Intercepts the engine's _adapt_full arguments from a live analyze() run,
then re-times: full step, analysis-only (solves), interp+synthesis-only.
Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_adapt.py
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from scipy.io import wavfile

import eaqhm_tpu.models.engine as engine
from eaqhm_tpu.config import EaqhmConfig


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return min(ts) * 1e3


captured = {}
orig = engine._adapt_full  # jitted


def spy(s, fm_current, am_current, buckets, centers, h, do_update,
        det, std_det, n_valid, **statics):
    if "args" not in captured:
        captured["args"] = (s, fm_current, am_current, buckets, centers, h,
                            do_update, det, std_det, n_valid)
        captured["statics"] = dict(statics)
    return orig(s, fm_current, am_current, buckets, centers, h, do_update,
                det, std_det, n_valid, **statics)


def main():
    fs, s16 = wavfile.read("/root/reference/SA19.WAV")
    sig = s16.astype(np.float64) / 32768.0

    import os
    quant = os.environ.get("BA_QUANT", "1") == "1"
    chunk = int(os.environ.get("BA_CHUNK", "128"))
    method = os.environ.get("BA_METHOD") or "auto"
    engine._adapt_full = spy
    res = engine.analyze(sig, fs, EaqhmConfig(gender="female",
                                              max_adaptations=2,
                                              quantize_geometry=quant,
                                              chunk=chunk,
                                              solve_method=method))
    print("captured; srer:", [round(x, 3) for x in res.srer])

    args = captured["args"]
    st = captured["statics"]
    (s, fm_current, am_current, buckets, centers, h, do_update,
     det, std_det, n_valid) = args  # noqa: F841 (n_valid reused below)
    geom = st["geom"]
    print("geom:", geom, "bucket sizes:", [b[0].shape[0] for b in buckets])

    full = partial(orig, **st)
    print(f"full _adapt_full: {timeit(full, *args):7.1f}ms")

    # analysis-only: run the per-bucket solves but skip scatter/interp
    def analysis_only(s, fm_current, am_current, buckets, centers, h,
                      do_update, det, std_det, n_valid, geom, fs, chunk,
                      length, step, No, method=None):
        dtype = s.dtype
        L = s.shape[0]
        Kcm = max(k for _, k in geom)
        with jax.default_matmul_precision("highest"):
            all_centers = jnp.concatenate([b[1] for b in buckets])
            fmc_all = fm_current[all_centers]
            mask_all = fmc_all != 0
            dead_all = ~jnp.any(mask_all, axis=1)
            dead_center = jnp.zeros(L, bool).at[all_centers].set(dead_all)
            parts = []
            off = 0
            for (idx, c_b, wl_b), (Wb, Kb) in zip(buckets, geom):
                nb = c_b.shape[0]
                dd_b = dead_all[off:off + nb]
                mk_b = mask_all[off:off + nb, :Kb]
                mk_b = jnp.where(dd_b[:, None],
                                 jnp.arange(Kb)[None, :] == 0, mk_b)
                parts.append(engine._eaqhm_bucket(
                    s, fm_current, am_current, c_b, wl_b, dd_b, mk_b,
                    dead_center, h, do_update, W=Wb, Kc=Kb, fs=fs,
                    chunk=chunk, method=method))
                off += nb
            return engine._combine_buckets(
                parts, [b[0] for b in buckets], No, Kcm, dtype)

    ana = partial(jax.jit, static_argnames=("geom", "fs", "chunk", "length",
                                            "step", "No",
                                            "method"))(analysis_only)
    ana_p = partial(ana, **st)
    print(f"analysis only:    {timeit(ana_p, *args):7.1f}ms")

    # interp-only: fixed analysis outputs -> scatter/interp/synth/SRER
    a0_v, am_v, fm_v, ph_v, acc_v = jax.block_until_ready(ana_p(*args))
    voiced = np.zeros(st["No"] + 1, bool)   # row No = bucket-padding dump
    for b in buckets:
        voiced[np.asarray(b[0])] = True
    voiced_j = jnp.asarray(voiced[:st["No"]])

    @partial(jax.jit, static_argnames=("length", "step", "fs"))
    def interp_only(a0_v, am_v, fm_v, ph_v, acc_v, centers, det, std_det,
                    voiced, length, step, fs):
        out = engine._scatter_and_interp(a0_v, am_v, fm_v, ph_v, acc_v,
                                         centers, length, step, fs, voiced)
        srer = 20.0 * jnp.log10(std_det / jnp.std(det - out[-1]))
        return out + (srer,)

    it = partial(interp_only, length=st["length"], step=st["step"],
                 fs=st["fs"])
    print(f"interp+synth:     "
          f"{timeit(it, a0_v, am_v, fm_v, ph_v, acc_v, centers, det, std_det, voiced_j):7.1f}ms")

    # ---- chained (dispatch-noise-free) timings ----
    def chain_time(step_fn, state, k=10, n=3):
        @jax.jit
        def run(state):
            return jax.lax.fori_loop(0, k, lambda i, a: step_fn(a), state)
        out = jax.block_until_ready(run(state))
        ts = []
        for _ in range(n):
            t0 = time.time()
            jax.block_until_ready(run(state))
            ts.append(time.time() - t0)
        return min(ts) / k * 1e3

    def full_step(state):
        fmc, amc = state
        out = orig(s, fmc, amc, buckets, centers, h, do_update, det,
                   std_det, n_valid, **st)
        return out[4], out[1]          # fm_cur, am_f

    print(f"chained full _adapt_full: {chain_time(full_step, (fm_current, am_current)):7.1f}ms")

    def ana_step(state):
        fmc, amc = state
        a0_v, am_v, fm_v, ph_v, acc_v = analysis_only(
            s, fmc, amc, buckets, centers, h, do_update, det, std_det,
            n_valid, **st)
        # cheap feedback keeping shapes [L, Kcm]
        upd = jnp.zeros_like(fmc).at[centers].set(jnp.where(acc_v, fm_v, 0.0))
        upd_a = jnp.zeros_like(amc).at[centers].set(
            jnp.where(acc_v, am_v, 0.0))
        return (jnp.where(upd != 0, upd, fmc),
                jnp.where(upd_a != 0, upd_a, amc))

    print(f"chained analysis only:    {chain_time(ana_step, (fm_current, am_current)):7.1f}ms")

    def interp_step(state):
        a0s, ams, fms, phs = state
        out = engine._scatter_and_interp(a0s, ams, fms, phs, acc_v, centers,
                                         st["length"], st["step"], st["fs"],
                                         voiced_j)
        srer = 20.0 * jnp.log10(std_det / jnp.std(det - out[-1]))
        eps = srer * 1e-12
        # perturb every input so XLA cannot hoist work out of the loop
        return (a0s + eps, ams + eps, fms + eps, phs + eps)

    print(f"chained interp+synth:     "
          f"{chain_time(interp_step, (a0_v, am_v, fm_v, ph_v)):7.1f}ms")

    def noa0_step(state):
        a0s, ams, fms, phs = state
        dtype = a0s.dtype
        Kc = ams.shape[1]
        length, step, fs = st["length"], st["step"], st["fs"]
        am_d = jnp.zeros((length, Kc), dtype).at[centers].set(
            jnp.where(acc_v, ams, 0.0))
        fm_d = jnp.zeros((length, Kc), dtype).at[centers].set(
            jnp.where(acc_v, fms, 0.0))
        ph_d = jnp.zeros((length, Kc), dtype).at[centers].set(
            jnp.where(acc_v, phs, 0.0))
        from eaqhm_tpu.models.tracks import interpolate_tracks
        am_f, fm_f, ph_f, fm_cur = interpolate_tracks(
            am_d, fm_d, ph_d, int(step), float(fs), centers.shape[0], length)
        s_rec = 2.0 * jnp.sum(am_f * jnp.cos(ph_f), axis=1)
        srer = 20.0 * jnp.log10(std_det / jnp.std(det - s_rec))
        eps = srer * 1e-12
        return (a0s + eps, ams + eps, fms + eps, phs + eps)

    print(f"chained interp w/o a0:    "
          f"{chain_time(noa0_step, (a0_v, am_v, fm_v, ph_v)):7.1f}ms")


if __name__ == "__main__":
    main()
