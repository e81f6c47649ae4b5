"""Micro-timing of eaQHM sub-ops at SA19 bucket-1 shapes (TPU).

Run: PYTHONPATH=/root/repo python tools/bench_micro.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from eaqhm_tpu.ops.solver import (repair_tracks, hpd_block_inverse,
                                  _solve_ls, hamming_window)

L = 63488
B, W, Kc = 2307, 120, 32
N = 2 * W + 1
M = 2 * (2 * Kc + 1)
FS = 16000.0


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return min(ts)


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
    o = jnp.arange(-W, W + 1)

    @jax.jit
    def gather_only(s, fm_d, am_d, centers):
        rows = jnp.clip(centers[:, None] + o[None, :], 0, L - 1)
        return s[rows], fm_d[rows], am_d[rows]

    s_win, fm_win, am_win = gather_only(s, fm_d, am_d, centers)
    print(f"gather [B={B},N={N},Kc={Kc}]: "
          f"{timeit(gather_only, s, fm_d, am_d, centers)*1e3:7.1f}ms")

    repair_j = jax.jit(lambda f, a: repair_tracks(f, a, o, wl))
    print(f"repair scans: {timeit(repair_j, fm_win, am_win)*1e3:7.1f}ms")

    @jax.jit
    def basis_only(fm_win, am_win):
        csum = jnp.cumsum(fm_win, axis=1)
        psi = csum - csum[:, W:W + 1, :]
        phase = (2 * jnp.pi / FS) * psi
        rho = (1e-4 + am_win) / (am_win[:, W:W + 1, :] + 1e-4)
        pos = rho * jnp.exp(1j * phase).astype(jnp.complex64)
        E1 = jnp.concatenate(
            [jnp.conj(jnp.flip(pos, axis=2)),
             jnp.ones((B, N, 1), jnp.complex64), pos], axis=-1)
        return jnp.concatenate([E1, o[None, :, None] * E1], axis=-1)

    E = basis_only(fm_win, am_win)
    print(f"basis build [B,N,M={M}]: "
          f"{timeit(basis_only, fm_win, am_win)*1e3:7.1f}ms")

    w = hamming_window(o[None, :].astype(jnp.float32),
                       wl[:, None].astype(jnp.float32))

    for prec in ["default", "high", "highest"]:
        p = {"default": jax.lax.Precision.DEFAULT,
             "high": jax.lax.Precision.HIGH,
             "highest": jax.lax.Precision.HIGHEST}[prec]

        @jax.jit
        def gram_only(E, w):
            Ew = E * w[..., None].astype(E.dtype)
            return jnp.einsum("bnm,bnp->bmp", jnp.conj(Ew), Ew, precision=p)

        print(f"gram ({prec}): {timeit(gram_only, E, w)*1e3:7.1f}ms")

    R = jax.jit(lambda E, w: jnp.einsum(
        "bnm,bnp->bmp",
        jnp.conj(E * w[..., None].astype(E.dtype)),
        E * w[..., None].astype(E.dtype),
        precision=jax.lax.Precision.HIGHEST))(E, w)
    R = R + 1e-2 * jnp.eye(M, dtype=R.dtype)
    print(f"block_inverse [B,{M},{M}]: "
          f"{timeit(jax.jit(hpd_block_inverse), R)*1e3:7.1f}ms")
    print(f"cholesky      [B,{M},{M}]: "
          f"{timeit(jax.jit(jnp.linalg.cholesky), R)*1e3:7.1f}ms")

    colmask = jnp.ones((B, M), bool)
    solve_j = jax.jit(lambda E, w, sw: _solve_ls(E, w, sw, colmask,
                                                 jnp.float32))
    print(f"full _solve_ls: {timeit(solve_j, E, w, s_win)*1e3:7.1f}ms")


if __name__ == "__main__":
    main()
