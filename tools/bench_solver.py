"""Micro-benchmark: LS solve strategies at real SA19 bucket shapes.

Run on the TPU:  python tools/bench_solver.py
Compares XLA batched Cholesky+triangular vs recursive Schur block-inverse
(GEMMs only) vs LU, at the (B, M) shapes the bucketed engine produces.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

SHAPES = [(2307, 130), (1682, 162), (250, 194), (4233, 194)]


def make_R(B, M, seed=0):
    rng = np.random.default_rng(seed)
    A = (rng.normal(size=(B, M, 16)) + 1j * rng.normal(size=(B, M, 16))
         ).astype(np.complex64)
    R = A @ np.conj(np.swapaxes(A, -1, -2)) + 2.0 * np.eye(M, dtype=np.complex64)
    b = (rng.normal(size=(B, M)) + 1j * rng.normal(size=(B, M))
         ).astype(np.complex64)
    return jnp.asarray(R), jnp.asarray(b)


@jax.jit
def solve_chol(R, b):
    L = jnp.linalg.cholesky(R)
    y = jax.scipy.linalg.solve_triangular(L, b[..., None], lower=True)
    return jax.scipy.linalg.solve_triangular(L, y, lower=True, trans="C")[..., 0]


@jax.jit
def solve_blockinv(R, b):
    from eaqhm_tpu.ops.solver import hpd_block_inverse
    Ri = hpd_block_inverse(R)
    return jnp.einsum("bmp,bp->bm", Ri, b,
                      precision=jax.lax.Precision.HIGHEST)


@jax.jit
def solve_lu(R, b):
    return jnp.linalg.solve(R, b[..., None])[..., 0]


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    print("backend:", jax.default_backend())
    for B, M in SHAPES:
        R, b = make_R(B, M)
        t_ch, x_ch = timeit(solve_chol, R, b)
        t_bi, x_bi = timeit(solve_blockinv, R, b)
        t_lu, _ = timeit(solve_lu, R, b)
        rel = float(jnp.linalg.norm(x_bi - x_ch) / jnp.linalg.norm(x_ch))
        print(f"B={B:5d} M={M:3d}: chol {t_ch*1e3:7.1f}ms  "
              f"blockinv {t_bi*1e3:7.1f}ms ({t_ch/t_bi:4.1f}x)  "
              f"lu {t_lu*1e3:7.1f}ms  rel_err={rel:.2e}")


if __name__ == "__main__":
    main()
