"""Sweep LS-solve variants at the real SA19 tier shapes on the TPU.

Decomposes one adaptation's analysis cost (repair / basis / gram / solve)
per live tier and compares solve strategies:
  - bi_highest: hpd_block_inverse at Precision.HIGHEST (production default)
  - bi_fast:    inverse at DEFAULT precision, refinement GEMVs at HIGHEST
  - pallas:     ops.pallas_chol blocked VMEM factorization + 1 refinement
  - cholesky:   XLA batched Cholesky + triangular solves
plus a Gram-precision variant (HIGH vs HIGHEST) and an MXU-aligned tier
shape (Kc=31 -> M=126 vs Kc=32 -> M=130).

Writes tools/out/solve_sweep.json.  Run: python tools/bench_solve_sweep.py
"""
import json
import os
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eaqhm_tpu.ops.solver import (repair_tracks, hamming_window,
                                  hpd_block_inverse)

L = 65536
FS = 16000.0
# real SA19 female quantized-tier live distribution (see VERDICT r2 item 1):
# (live_frames, W, Kc) -> chunks of 128: 19 / 14 / 2
TIERS = [(2307, 120, 32), (1682, 128, 40), (180, 152, 48)]
CHUNK = int(os.environ.get("SW_CHUNK", "128"))
HP = jax.lax.Precision.HIGHEST


def timeit(fn, *args, n=5):
    t_c0 = time.time()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.time() - t_c0
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return min(ts), compile_s


def build_basis(s_win, fm_win, am_win, o, wl, colmask_k, fs, eps=1e-4):
    dtype = jnp.float32
    cdtype = jnp.complex64
    B, N = s_win.shape
    Kc = fm_win.shape[-1]
    W = (N - 1) // 2
    fm_r, am_r = repair_tracks(fm_win, am_win, o, wl)
    fm_r = fm_r * colmask_k[:, None, :]
    am_r = am_r * colmask_k[:, None, :]
    csum = jnp.cumsum(fm_r, axis=1)
    psi = csum - csum[:, W:W + 1, :]
    phase = (2 * jnp.pi / fs) * psi
    am_mid = am_r[:, W:W + 1, :]
    rho = (eps + am_r) / (am_mid + eps)
    pos = rho * jnp.exp(1j * phase).astype(cdtype) * colmask_k[:, None, :]
    fm_mid = fm_r[:, W:W + 1, :]
    psi_ext = jnp.concatenate([-csum[:, W:W + 1, :], psi[:, :-1, :]], axis=1)
    neg_phase = (2 * jnp.pi / fs) * (jnp.flip(psi_ext, axis=1) + fm_mid)
    neg = (jnp.flip(rho, axis=1) * jnp.exp(1j * neg_phase).astype(cdtype))
    neg = jnp.flip(neg * colmask_k[:, None, :], axis=2)
    dc = jnp.ones((B, N, 1), cdtype)
    E1 = jnp.concatenate([neg, dc, pos], axis=-1)
    E = jnp.concatenate([E1, o[None, :, None].astype(cdtype) * E1], axis=-1)
    w = hamming_window(o[None, :].astype(dtype), wl[:, None].astype(dtype))
    return E, w


def build_gram(E, w, s_win, colmask, gram_prec=HP):
    Ew = E * w[..., None].astype(E.dtype)
    R = jnp.einsum("bnm,bnp->bmp", jnp.conj(Ew), Ew, precision=gram_prec)
    eye = jnp.eye(R.shape[-1], dtype=R.dtype)
    R = R + eye * (~colmask[:, None, :])
    rhs = jnp.einsum("bnm,bn->bm", jnp.conj(Ew),
                     (w * s_win).astype(E.dtype), precision=gram_prec)
    dinv = jax.lax.rsqrt(jnp.maximum(
        jnp.real(jnp.diagonal(R, axis1=-2, axis2=-1)), 1e-30))
    R = R * (dinv[:, None, :] * dinv[:, :, None]).astype(R.dtype)
    rhs = rhs * dinv
    return R, rhs, dinv


def solve_bi(R, rhs, inv_prec=HP, n_refine=2):
    Ri = hpd_block_inverse(R, precision=inv_prec)
    x = jnp.einsum("bmp,bp->bm", Ri, rhs, precision=HP)
    for _ in range(n_refine):
        r = rhs - jnp.einsum("bmp,bp->bm", R, x, precision=HP)
        x = x + jnp.einsum("bmp,bp->bm", Ri, r, precision=HP)
    return x


def solve_pallas(R, rhs):
    from eaqhm_tpu.ops.pallas_chol import chol_solve
    interpret = jax.default_backend() != "tpu"
    x = chol_solve(R, rhs, interpret=interpret)
    r = rhs - jnp.einsum("bmp,bp->bm", R, x, precision=HP)
    return x + chol_solve(R, r.astype(jnp.complex64), interpret=interpret)


def solve_chol(R, rhs):
    Lc = jnp.linalg.cholesky(R)
    y = jax.scipy.linalg.solve_triangular(Lc, rhs[..., None], lower=True)
    return jax.scipy.linalg.solve_triangular(
        Lc, y, lower=True, trans="C")[..., 0]


def main():
    print("backend:", jax.default_backend(), "chunk:", CHUNK, flush=True)
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=L).astype(np.float32) * 0.1)
    results = {"backend": jax.default_backend(), "chunk": CHUNK, "tiers": []}

    for (Blive, W, Kc) in TIERS:
        N = 2 * W + 1
        M = 2 * (2 * Kc + 1)
        centers = jnp.asarray(np.sort(
            rng.choice(np.arange(600, L - 600), Blive,
                       replace=False)).astype(np.int32))
        wl = jnp.full((Blive,), W, jnp.int32)
        mask = jnp.ones((Blive, Kc), bool)
        fm_d = jnp.asarray(np.clip(
            rng.normal(200, 20, size=(L, Kc)), 100, None).astype(np.float32)
            * np.arange(1, Kc + 1))
        am_d = jnp.asarray(rng.uniform(1e-3, 0.1, size=(L, Kc))
                           .astype(np.float32))
        npad = (-Blive) % CHUNK
        nch = (Blive + npad) // CHUNK
        c_ch = jnp.pad(centers, (0, npad)).reshape(nch, CHUNK)
        wl_ch = jnp.pad(wl, (0, npad)).reshape(nch, CHUNK)
        mk_ch = jnp.pad(mask, ((0, npad), (0, 0))).reshape(nch, CHUNK, Kc)
        o = jnp.arange(-W, W + 1)

        def chunked(stage):
            @jax.jit
            def run(s, fm_d, am_d, c_ch, wl_ch, mk_ch):
                def do_chunk(args):
                    c, wlc, mk = args
                    rows = jnp.clip(c[:, None] + o[None, :], 0, L - 1)
                    return stage(s[rows], fm_d[rows], am_d[rows],
                                 jnp.maximum(wlc, 1), mk)
                return jax.lax.map(do_chunk, (c_ch, wl_ch, mk_ch))
            return run

        def st_gather(s_win, fm_win, am_win, wlc, mk):
            # the s[rows]/fm[rows]/am[rows] window gathers alone
            return (s_win.sum(), fm_win.sum(), am_win.sum())

        def st_repair(s_win, fm_win, am_win, wlc, mk):
            return repair_tracks(fm_win, am_win, o, wlc)

        def st_basis(s_win, fm_win, am_win, wlc, mk):
            return build_basis(s_win, fm_win, am_win, o, wlc, mk, FS)

        def mk_full(solver, gram_prec=HP):
            def st(s_win, fm_win, am_win, wlc, mk):
                E, w = build_basis(s_win, fm_win, am_win, o, wlc, mk, FS)
                cm1 = jnp.concatenate([jnp.flip(mk, -1),
                                       jnp.ones((mk.shape[0], 1), bool), mk],
                                      axis=-1)
                cm = jnp.concatenate([cm1, cm1], axis=-1)
                R, rhs, dinv = build_gram(E, w, s_win, cm, gram_prec)
                return solver(R, rhs) * dinv
            return st

        def st_gram(s_win, fm_win, am_win, wlc, mk):
            E, w = build_basis(s_win, fm_win, am_win, o, wlc, mk, FS)
            cm1 = jnp.concatenate([jnp.flip(mk, -1),
                                   jnp.ones((mk.shape[0], 1), bool), mk],
                                  axis=-1)
            cm = jnp.concatenate([cm1, cm1], axis=-1)
            return build_gram(E, w, s_win, cm)[:2]

        variants = {
            "gather": st_gather,
            "repair": st_repair,
            "basis": st_basis,
            "gram": st_gram,
            "bi_highest": mk_full(lambda R, b: solve_bi(R, b, HP, 2)),
            "bi_fast": mk_full(
                lambda R, b: solve_bi(R, b, jax.lax.Precision.DEFAULT, 2)),
            "pallas": mk_full(solve_pallas),
            "cholesky": mk_full(solve_chol),
            "gramhigh_bifast": mk_full(
                lambda R, b: solve_bi(R, b, jax.lax.Precision.DEFAULT, 2),
                gram_prec=jax.lax.Precision.HIGH),
        }
        # full-solve variants (complex solution rows) get the accuracy
        # cross-check below; derived from the dict so the list can't go
        # stale when variants are added/removed (ADVICE r3)
        solver_variants = set(variants) - {"gather", "repair", "basis",
                                           "gram"}
        only = os.environ.get("SW_ONLY")
        if only:
            keep = set(only.split(","))
            variants = {k: v for k, v in variants.items() if k in keep}
        row = {"live": Blive, "W": W, "Kc": Kc, "N": N, "M": M,
               "chunks": nch, "ms": {}, "compile_s": {}}
        ref_x = None
        for name, st in variants.items():
            try:
                t, c = timeit(chunked(st), s, fm_d, am_d, c_ch, wl_ch, mk_ch)
                row["ms"][name] = round(t * 1e3, 2)
                row["compile_s"][name] = round(c, 1)
                if name in solver_variants:
                    # complex device->host transfers are UNIMPLEMENTED on the
                    # axon backend (and a failed transfer wedges the client):
                    # split to planar real/imag ON DEVICE before fetching
                    xc = jax.block_until_ready(
                        chunked(st)(s, fm_d, am_d, c_ch, wl_ch, mk_ch))
                    x = (np.asarray(jnp.real(xc))
                         + 1j * np.asarray(jnp.imag(xc)))
                    if name == "bi_highest":
                        ref_x = x
                    elif ref_x is not None:
                        err = (np.abs(x - ref_x).max()
                               / max(np.abs(ref_x).max(), 1e-30))
                        row.setdefault("rel_err_vs_bi_highest", {})[name] = \
                            float(f"{err:.3e}")
            except Exception as e:
                row["ms"][name] = None
                print(f"  {name} failed: {type(e).__name__}: {e}",
                      flush=True)
            print(f"tier W={W} Kc={Kc}: {name} = {row['ms'][name]} ms "
                  f"(compile {row['compile_s'].get(name)}s)", flush=True)
        results["tiers"].append(row)

    tot = {}
    for row in results["tiers"]:
        for k, v in row["ms"].items():
            if v is not None:
                tot[k] = round(tot.get(k, 0.0) + v, 2)
    results["totals_ms"] = tot
    print("TOTALS(ms):", json.dumps(tot), flush=True)
    os.makedirs(os.path.join(os.path.dirname(__file__), "out"), exist_ok=True)
    out = os.path.join(os.path.dirname(__file__), "out", "solve_sweep.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out, flush=True)


if __name__ == "__main__":
    main()
