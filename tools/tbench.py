"""Trustworthy TPU op timing: chain k dependent iterations inside ONE jit.

The axon tunnel adds ~20-80 ms of noisy per-dispatch latency, so single-op
wall timings are garbage.  `chain(fn, k)` folds fn k times with a data
dependency (lax.fori_loop) so device time dominates; report (t_total)/k.
"""
import time

import jax
import jax.numpy as jnp


def chain_time(fn, args, k=50, n=3):
    """fn: pytree -> pytree of same structure.  Returns per-iter ms."""

    @jax.jit
    def run(args):
        return jax.lax.fori_loop(0, k, lambda i, a: fn(a), args)

    out = run(args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(run(args))
        ts.append(time.time() - t0)
    return min(ts) / k * 1e3


def main():
    import numpy as np
    rng = np.random.default_rng(0)
    L, K, STEP = 63488, 48, 15
    No = len(np.arange(1, L, STEP))
    centers = jnp.asarray(np.arange(1, L, STEP) - 1)

    # --- scatter+gather pair ---
    vals = jnp.asarray(rng.normal(size=(No, K)).astype(np.float32))

    def scat(v):
        dense = jnp.zeros((L, K), jnp.float32).at[centers].set(v)
        return dense[centers] * 0.999

    print(f"scatter+gather pair: {chain_time(scat, vals):7.3f} ms")

    # --- strided construct + strided gather ---
    def strided(v):
        blk = jnp.concatenate(
            [v[:, None, :], jnp.zeros((No, STEP - 1, K), jnp.float32)],
            axis=1)
        dense = blk.reshape(No * STEP, K)[:L]
        return dense[::STEP][:No] * 0.999

    print(f"strided pair:        {chain_time(strided, vals):7.3f} ms")

    # --- synthesis ---
    am = jnp.asarray(rng.normal(size=(L, K)).astype(np.float32))

    def synth(a):
        s = 2.0 * jnp.sum(a * jnp.cos(a), axis=1)
        return a + s[:, None] * 1e-9

    print(f"synthesis:           {chain_time(synth, am):7.3f} ms")


if __name__ == "__main__":
    main()
