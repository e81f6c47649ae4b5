"""Stage-level timing of one eaQHM adaptation at real SA19 bucket shapes.

Run on TPU: python tools/bench_stages.py [chunk]
Times, per bucket: window gathers + basis build + Gram/solve (eaqhm_batch),
track repair alone, and the track-interpolation/synthesis stage.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from eaqhm_tpu.ops.solver import eaqhm_batch, repair_tracks
from eaqhm_tpu.models.tracks import interpolate_tracks

L = 63488
STEP = 15
FS = 16000.0
BUCKETS = [(2307, 120, 32), (1682, 126, 40), (250, 150, 48)]  # (B, W, Kc)
CHUNK = int(sys.argv[1]) if len(sys.argv) > 1 else 128


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
    print("backend:", jax.default_backend(), "chunk:", CHUNK)
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=L).astype(np.float32) * 0.1)
    total = 0.0
    for (B, W, Kc) in BUCKETS:
        N = 2 * W + 1
        centers = jnp.asarray(
            np.sort(rng.choice(np.arange(600, L - 600), B, replace=False)))
        wl = jnp.full((B,), W, jnp.int32)
        mask = jnp.ones((B, Kc), bool)
        fm_d = jnp.asarray(
            np.clip(rng.normal(200, 20, size=(L, Kc)), 100, None)
            .astype(np.float32) * (np.arange(1, Kc + 1)))
        am_d = jnp.asarray(rng.uniform(1e-3, 0.1, size=(L, Kc))
                           .astype(np.float32))

        npad = (-B) % CHUNK
        nch = (B + npad) // CHUNK
        c_ch = jnp.pad(centers, (0, npad)).reshape(nch, CHUNK)
        wl_ch = jnp.pad(wl, (0, npad)).reshape(nch, CHUNK)
        mk_ch = jnp.pad(mask, ((0, npad), (0, 0))).reshape(nch, CHUNK, Kc)
        o = jnp.arange(-W, W + 1)

        @jax.jit
        def full_stage(s, fm_d, am_d, c_ch, wl_ch, mk_ch):
            def do_chunk(args):
                c, wlc, mk = args
                rows = jnp.clip(c[:, None] + o[None, :], 0, L - 1)
                return eaqhm_batch(s[rows], fm_d[rows], am_d[rows], o,
                                   jnp.maximum(wlc, 1), mk, FS,
                                   dtype=jnp.float32)
            with jax.default_matmul_precision("highest"):
                return jax.lax.map(do_chunk, (c_ch, wl_ch, mk_ch))

        @jax.jit
        def repair_only(s, fm_d, am_d, c_ch, wl_ch):
            def do_chunk(args):
                c, wlc = args
                rows = jnp.clip(c[:, None] + o[None, :], 0, L - 1)
                return repair_tracks(fm_d[rows], am_d[rows], o, wlc)
            return jax.lax.map(do_chunk, (c_ch, wl_ch))

        t_full = timeit(full_stage, s, fm_d, am_d, c_ch, wl_ch, mk_ch)
        t_rep = timeit(repair_only, s, fm_d, am_d, c_ch, wl_ch)
        total += t_full
        print(f"bucket B={B:5d} N={N} Kc={Kc} M={2*(2*Kc+1)}: "
              f"full {t_full*1e3:7.1f}ms  repair+gather {t_rep*1e3:7.1f}ms")

    Kcm = BUCKETS[-1][2]
    am = jnp.asarray(rng.uniform(0, 0.1, size=(L, Kcm)).astype(np.float32))
    fm = jnp.asarray(rng.uniform(100, 7000, size=(L, Kcm)).astype(np.float32))
    ph = jnp.asarray(rng.uniform(-3, 3, size=(L, Kcm)).astype(np.float32))
    n_ti = len(np.arange(1, L, STEP))
    interp_fn = partial(interpolate_tracks, step=STEP, fs=FS, n_ti=n_ti,
                        length=L)
    t_int = timeit(interp_fn, am, fm, ph)
    print(f"interpolate_tracks: {t_int*1e3:7.1f}ms")
    print(f"solve stages total: {total*1e3:7.1f}ms  "
          f"(+interp = {(total+t_int)*1e3:7.1f}ms per adaptation)")


if __name__ == "__main__":
    main()
