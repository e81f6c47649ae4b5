"""Chained (dispatch-noise-free) timing of eaQHM analysis sub-stages at
SA19 bucket-1 shapes.  Run: PYTHONPATH=/root/repo:$PYTHONPATH python
tools/bench_analysis_parts.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from eaqhm_tpu.ops.solver import (repair_tracks, hamming_window, _solve_ls,
                                  hpd_block_inverse, eaqhm_batch)

L = 63488
B, W, Kc = 2308, 120, 32
N = 2 * W + 1
M = 2 * (2 * Kc + 1)
FS = 16000.0


def chain_time(fn, args, k=10, n=3):
    @jax.jit
    def run(args):
        return jax.lax.fori_loop(0, k, lambda i, a: fn(a), args)
    out = jax.block_until_ready(run(args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(run(args))
        ts.append(time.time() - t0)
    return min(ts) / k * 1e3


def main():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=L).astype(np.float32) * 0.1)
    fm_d = jnp.asarray(
        np.clip(rng.normal(200, 20, size=(L, Kc)), 100, None)
        .astype(np.float32) * (np.arange(1, Kc + 1)))
    am_d = jnp.asarray(rng.uniform(1e-3, 0.1, size=(L, Kc))
                       .astype(np.float32))
    centers = jnp.asarray(
        np.sort(rng.choice(np.arange(600, L - 600), B, replace=False)))
    wl = jnp.full((B,), W, jnp.int32)
    mask = jnp.ones((B, Kc), bool)
    o = jnp.arange(-W, W + 1)
    w = hamming_window(o[None, :].astype(jnp.float32),
                       wl[:, None].astype(jnp.float32))

    # 1. gathers
    def gather(args):
        fm, am = args
        rows = jnp.clip(centers[:, None] + o[None, :], 0, L - 1)
        sw, fw, aw = s[rows], fm[rows], am[rows]
        return (fm + fw.sum() * 1e-20, am + aw.sum() * 1e-20)
    print(f"gathers:        {chain_time(gather, (fm_d, am_d)):8.2f} ms")

    rows = jnp.clip(centers[:, None] + o[None, :], 0, L - 1)
    s_win = s[rows]
    fm_win = fm_d[rows]
    am_win = am_d[rows]

    # 2. repair scans
    def rep(args):
        fw, aw = args
        fr, ar = repair_tracks(fw, aw, o, wl)
        return (fw + fr * 1e-20, aw + ar * 1e-20)
    print(f"repair scans:   {chain_time(rep, (fm_win, am_win)):8.2f} ms")

    # 3. basis build (cumsum + exp, pos+neg blocks)
    def basis(args):
        fw, aw = args
        csum = jnp.cumsum(fw, axis=1)
        psi = csum - csum[:, W:W + 1, :]
        phase = (2 * jnp.pi / FS) * psi
        rho = (1e-4 + aw) / (aw[:, W:W + 1, :] + 1e-4)
        pos = rho * jnp.exp(1j * phase).astype(jnp.complex64)
        neg = jnp.conj(jnp.flip(pos, axis=2))
        E1 = jnp.concatenate([neg, jnp.ones((B, N, 1), jnp.complex64), pos],
                             axis=-1)
        E = jnp.concatenate([E1, o[None, :, None] * E1], axis=-1)
        return (fw + jnp.real(E).sum() * 1e-20, aw)
    print(f"basis build:    {chain_time(basis, (fm_win, am_win), k=5):8.2f} ms")

    # 4. full eaqhm_batch (repair+basis+gram+solve)
    def full(args):
        fw, aw = args
        amps, slopes, fmis = eaqhm_batch(s_win, fw, aw, o, wl, mask, FS,
                                         dtype=jnp.float32)
        return (fw + jnp.abs(amps).sum() * 1e-20, aw)
    with jax.default_matmul_precision("highest"):
        print(f"full eaqhm_batch: {chain_time(full, (fm_win, am_win), k=5):8.2f} ms")

    # 5. gram + solve only (fixed basis)
    csum = jnp.cumsum(fm_win, axis=1)
    psi = csum - csum[:, W:W + 1, :]
    rho = (1e-4 + am_win) / (am_win[:, W:W + 1, :] + 1e-4)
    pos = rho * jnp.exp(1j * (2 * jnp.pi / FS) * psi).astype(jnp.complex64)
    E1 = jnp.concatenate([jnp.conj(jnp.flip(pos, axis=2)),
                          jnp.ones((B, N, 1), jnp.complex64), pos], axis=-1)
    E = jnp.concatenate([E1, o[None, :, None] * E1], axis=-1)
    colmask = jnp.ones((B, M), bool)

    def solve(args):
        Ex, sx = args
        with jax.default_matmul_precision("highest"):
            x = _solve_ls(Ex, w, sx, colmask, jnp.float32)
        return (Ex, sx + jnp.abs(x).sum() * 1e-20)
    print(f"gram+solve:     {chain_time(solve, (E, s_win), k=5):8.2f} ms")

    # 6. gram only
    def gram(args):
        Ex, sx = args
        hp = jax.lax.Precision.HIGHEST
        Ew = Ex * w[..., None].astype(Ex.dtype)
        R = jnp.einsum("bnm,bnp->bmp", jnp.conj(Ew), Ew, precision=hp)
        rhs = jnp.einsum("bnm,bn->bm", jnp.conj(Ew),
                         (w * sx).astype(Ex.dtype), precision=hp)
        return (Ex, sx + (jnp.abs(R).sum() + jnp.abs(rhs).sum()) * 1e-20)
    print(f"gram only:      {chain_time(gram, (E, s_win), k=5):8.2f} ms")


if __name__ == "__main__":
    main()
