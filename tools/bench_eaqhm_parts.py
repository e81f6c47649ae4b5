"""Decompose the eaQHM analysis stage cost at real SA19 bucket shapes.

Run on TPU.  Per bucket: (a) gather+repair, (b) +basis build (cumsum phase,
exp), (c) +Gram/rhs, (d) full with each solve method.  All chunked with
lax.map exactly like the engine.
"""
import time
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from eaqhm_tpu.ops.solver import (eaqhm_batch, repair_tracks,
                                  hamming_window, _solve_ls)

L = 63488
STEP = 15
FS = 16000.0
BUCKETS = [(2308, 120, 32), (1681, 126, 40), (180, 150, 48)]
CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 128


def timeit(fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return min(ts)


def basis_only(s_win, fm_win, am_win, o, wl, colmask_k, fs, dtype, eps=1e-4):
    """eaqhm_batch through the E/window build, skipping the solve."""
    cdtype = jnp.complex64
    B, N = s_win.shape
    Kc = fm_win.shape[-1]
    W = (N - 1) // 2
    fm_r, am_r = repair_tracks(fm_win.astype(dtype), am_win.astype(dtype),
                               o, wl)
    fm_r = fm_r * colmask_k[:, None, :]
    am_r = am_r * colmask_k[:, None, :]
    csum = jnp.cumsum(fm_r, axis=1)
    psi = csum - csum[:, W:W + 1, :]
    phase = (2 * jnp.pi / fs) * psi
    am_mid = am_r[:, W:W + 1, :]
    rho = (eps + am_r) / (am_mid + eps)
    pos = rho * jnp.exp(1j * phase.astype(dtype)).astype(cdtype)
    pos = pos * colmask_k[:, None, :]
    fm_mid = fm_r[:, W:W + 1, :]
    psi_ext = jnp.concatenate([-csum[:, W:W + 1, :], psi[:, :-1, :]], axis=1)
    neg_phase = (2 * jnp.pi / fs) * (jnp.flip(psi_ext, axis=1) + fm_mid)
    neg = (jnp.flip(rho, axis=1)
           * jnp.exp(1j * neg_phase.astype(dtype)).astype(cdtype))
    neg = jnp.flip(neg * colmask_k[:, None, :], axis=2)
    dc = jnp.ones((B, N, 1), cdtype)
    E1 = jnp.concatenate([neg, dc, pos], axis=-1)
    E = jnp.concatenate([E1, o[None, :, None].astype(cdtype) * E1], axis=-1)
    w = hamming_window(o[None, :].astype(dtype), wl[:, None].astype(dtype))
    return E, w


def gram_only(s_win, fm_win, am_win, o, wl, colmask_k, fs, dtype):
    E, w = basis_only(s_win, fm_win, am_win, o, wl, colmask_k, fs, dtype)
    hp = jax.lax.Precision.HIGHEST
    Ew = E * w[..., None].astype(E.dtype)
    R = jnp.einsum("bnm,bnp->bmp", jnp.conj(Ew), Ew, precision=hp)
    rhs = jnp.einsum("bnm,bn->bm", jnp.conj(Ew),
                     (w * s_win.astype(dtype)).astype(E.dtype), precision=hp)
    return R, rhs


def main():
    print("backend:", jax.default_backend(), "chunk:", CHUNK)
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=L).astype(np.float32) * 0.1)
    totals = {}
    for (B, W, Kc) in BUCKETS:
        N = 2 * W + 1
        centers = jnp.asarray(np.sort(
            rng.choice(np.arange(600, L - 600), B, replace=False)))
        wl = jnp.full((B,), W, jnp.int32)
        mask = jnp.ones((B, Kc), bool)
        fm_d = jnp.asarray(np.clip(
            rng.normal(200, 20, size=(L, Kc)), 100, None).astype(np.float32)
            * np.arange(1, Kc + 1))
        am_d = jnp.asarray(rng.uniform(1e-3, 0.1, size=(L, Kc))
                           .astype(np.float32))
        npad = (-B) % CHUNK
        nch = (B + npad) // CHUNK
        c_ch = jnp.pad(centers, (0, npad)).reshape(nch, CHUNK)
        wl_ch = jnp.pad(wl, (0, npad)).reshape(nch, CHUNK)
        mk_ch = jnp.pad(mask, ((0, npad), (0, 0))).reshape(nch, CHUNK, Kc)
        o = jnp.arange(-W, W + 1)

        def chunked(fn, extra=()):
            @jax.jit
            def run(s, fm_d, am_d, c_ch, wl_ch, mk_ch):
                def do_chunk(args):
                    c, wlc, mk = args
                    rows = jnp.clip(c[:, None] + o[None, :], 0, L - 1)
                    return fn(s[rows], fm_d[rows], am_d[rows], o,
                              jnp.maximum(wlc, 1), mk, FS, jnp.float32,
                              *extra)
                with jax.default_matmul_precision("highest"):
                    return jax.lax.map(do_chunk, (c_ch, wl_ch, mk_ch))
            return run

        def rep(s_win, fm_win, am_win, o, wl, mk, fs, dtype):
            return repair_tracks(fm_win, am_win, o, wl)

        t_rep = timeit(chunked(rep), s, fm_d, am_d, c_ch, wl_ch, mk_ch)
        t_bas = timeit(chunked(basis_only), s, fm_d, am_d, c_ch, wl_ch, mk_ch)
        t_grm = timeit(chunked(gram_only), s, fm_d, am_d, c_ch, wl_ch, mk_ch)
        row = {"repair": t_rep, "basis": t_bas, "gram": t_grm}
        for meth in ("block_inverse", "pallas", "cholesky"):
            def f(s_win, fm_win, am_win, o, wl, mk, fs, dtype, m=meth):
                return eaqhm_batch(s_win, fm_win, am_win, o, wl, mk, fs,
                                   dtype=dtype, method=m)
            try:
                row[meth] = timeit(chunked(f), s, fm_d, am_d, c_ch, wl_ch,
                                   mk_ch)
            except Exception as e:
                row[meth] = float("nan")
                print(f"  {meth} failed: {type(e).__name__}: {e}")
        print(f"B={B:5d} N={N} Kc={Kc} M={2*(2*Kc+1)}: " +
              "  ".join(f"{k}={v*1e3:7.1f}ms" for k, v in row.items()))
        for k, v in row.items():
            totals[k] = totals.get(k, 0.0) + v
    print("totals: " + "  ".join(f"{k}={v*1e3:7.1f}ms"
                                 for k, v in totals.items()))


if __name__ == "__main__":
    main()
