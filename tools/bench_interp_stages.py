"""Staged timing of interpolate_tracks internals (TPU).

Replicates the function body with early returns at stage boundaries to
localize cost.  Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_interp_stages.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from eaqhm_tpu.models import tracks
from eaqhm_tpu.ops.interp import cubic4_eval

L, K, STEP, FS = 63488, 48, 15, 16000.0
n_ti = len(np.arange(1, L, STEP))
n_pairs = n_ti - 1
h = float(STEP)
anchor_rows = np.arange(n_ti) * STEP
dtype = jnp.float32


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


def body(am_recon, fm_recon, ph_recon, stage):
    A_am = am_recon[anchor_rows]
    A_fm = fm_recon[anchor_rows]
    A_ph = ph_recon[anchor_rows]
    if stage == 0:
        return A_am, A_fm, A_ph

    acc = A_am != 0
    acc_prev = jnp.concatenate([jnp.zeros((1, K), bool), acc[:-1]])
    acc_next = jnp.concatenate([acc[1:], jnp.zeros((1, K), bool)])
    in_run = acc & (acc_prev | acc_next)
    run_start = acc & ~acc_prev & acc_next
    run_end = acc & acc_prev & ~acc_next
    pair = acc[:-1] & acc[1:]
    s_idx = jnp.arange(n_ti)[:, None]
    start_slot = jax.lax.cummax(jnp.where(run_start, s_idx, -1), axis=0)
    end_slot = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(run_end, s_idx, n_ti + 1), axis=0), axis=0),
        axis=0)
    run_len = end_slot - start_slot + 1
    if stage == 1:
        return start_slot, end_slot, run_len

    M = tracks._segmented_notaknot_M(A_fm, in_run, start_slot, end_slot, h,
                                     dtype)
    if stage == 2:
        return M

    r = jnp.arange(1, STEP)[None, :, None].astype(dtype)
    Bc = r / h
    Ac = 1.0 - Bc
    fm_spline = (Ac * A_fm[:-1][:, None, :] + Bc * A_fm[1:][:, None, :]
                 + ((Ac ** 3 - Ac) * M[:-1][:, None, :]
                    + (Bc ** 3 - Bc) * M[1:][:, None, :]) * (h * h) / 6.0)
    st = start_slot[:-1]
    m_len = run_len[:-1]
    small = pair & (m_len < 4)
    sl3 = jnp.stack([jnp.zeros_like(st), st, st + 1, st + 2], axis=-1)
    sl2 = jnp.stack([jnp.zeros_like(st), jnp.ones_like(st), st, st + 1],
                    axis=-1)
    slots4 = jnp.where((m_len == 3)[..., None], sl3, sl2)
    slots4 = jnp.where(small[..., None], slots4,
                       jnp.broadcast_to(jnp.arange(4), slots4.shape))
    slots4 = jnp.clip(slots4, 0, n_ti - 1)
    x4 = slots4.astype(dtype) * h
    kk = jnp.arange(K)[None, :, None]
    y4 = A_fm[slots4, kk]
    q = (jnp.arange(n_pairs)[:, None, None].astype(dtype) * h
         + jnp.arange(1, STEP)[None, None, :].astype(dtype))
    fm_small = cubic4_eval(x4, y4, jnp.broadcast_to(q, (n_pairs, K, STEP - 1)))
    fm_small = fm_small.transpose(0, 2, 1)
    fm_fill = jnp.where(small[:, None, :], fm_small, fm_spline)
    am_fill = (1.0 - Bc) * A_am[:-1][:, None, :] + Bc * A_am[1:][:, None, :]
    if stage == 3:
        return fm_fill, am_fill

    Lp = n_pairs * STEP + 1

    def assemble(dense, fill):
        prefix = dense[:Lp]
        block = prefix[:-1].reshape(n_pairs, STEP, K)
        inner = jnp.where(pair[:, None, :], fill, block[:, 1:, :])
        block = jnp.concatenate([block[:, :1, :], inner], axis=1)
        return jnp.concatenate(
            [block.reshape(-1, K), prefix[-1:], dense[Lp:]], axis=0)

    fm_out = assemble(fm_recon, fm_fill)
    am_out = assemble(am_recon, am_fill)
    if stage == 4:
        return fm_out, am_out

    fm_blocks = fm_out[:Lp - 1].reshape(n_pairs, STEP, K)
    seg_fm = jnp.concatenate(
        [fm_blocks[:, 1:, :],
         jnp.concatenate([fm_blocks[1:, :1, :], fm_out[Lp - 1:Lp][None]],
                         axis=0)], axis=1)
    csum = jnp.cumsum(seg_fm, axis=1) * (2.0 * jnp.pi / FS)
    ph_s = A_ph[:-1][:, None, :]
    ph_e = A_ph[1:]
    pm = ph_s + csum
    pm_end = pm[:, -1, :]
    Mw = jnp.round((pm_end - ph_e) / (2.0 * jnp.pi))
    er = jnp.pi * (pm_end - ph_e - 2.0 * jnp.pi * Mw) / (2.0 * h)
    t_grid = np.arange(0, STEP + 1)
    ft_cum = np.cumsum(np.sin(np.pi * t_grid / STEP))
    corr = er[:, None, :] * jnp.asarray(ft_cum[1:], dtype)[None, :, None]
    pm_c = pm - corr
    ph_fill = pm_c[:, :STEP - 1, :]
    ph_out = assemble(ph_recon, ph_fill)
    end_anchor_rows2 = anchor_rows[1:]
    prev_pair_end = pm_c[:, -1, :]
    take_end = pair & run_end[1:]
    ph_out = ph_out.at[end_anchor_rows2].set(
        jnp.where(take_end, prev_pair_end, ph_out[end_anchor_rows2]))
    if stage == 5:
        return ph_out

    slot_of = np.minimum(np.arange(L) // STEP, n_pairs - 1)
    r_of = np.arange(L) - slot_of * STEP
    is_anchor = (np.arange(L) % STEP == 0) & (np.arange(L) < Lp)
    cov_pair = pair[slot_of] & (r_of[:, None] > 0) & (r_of[:, None] <= STEP)
    cov_anchor = jnp.where(jnp.asarray(is_anchor)[:, None],
                           tracks.jnp.asarray(in_run)[
                               np.minimum(np.arange(L) // STEP, n_ti - 1)],
                           False)
    cov = cov_pair | cov_anchor
    dph = ph_out - jnp.concatenate([ph_out[:1], ph_out[:-1]], axis=0)
    ddmod = jnp.mod(dph + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    ddmod = jnp.where((ddmod == -jnp.pi) & (dph > 0), jnp.pi, ddmod)
    starts_dense = jnp.zeros((L, K), bool).at[anchor_rows].set(run_start)
    fm_current = jnp.where(
        starts_dense, fm_out,
        jnp.where(cov & ~starts_dense, (FS / (2.0 * jnp.pi)) * ddmod, 0.0))
    return am_out, fm_out, ph_out, fm_current


def main():
    rng = np.random.default_rng(0)
    am = np.zeros((L, K), np.float32)
    am[anchor_rows] = rng.uniform(0, 0.1, size=(n_ti, K))
    # punch some holes so runs exist
    am[anchor_rows[rng.random(n_ti) < 0.1]] = 0
    fm = np.zeros((L, K), np.float32)
    fm[anchor_rows] = rng.uniform(100, 7000, size=(n_ti, K))
    ph = np.zeros((L, K), np.float32)
    ph[anchor_rows] = rng.uniform(-3, 3, size=(n_ti, K))
    am_j, fm_j, ph_j = jnp.asarray(am), jnp.asarray(fm), jnp.asarray(ph)

    prev = 0.0
    names = ["anchor gathers", "run masks+cummax", "notaknot scans",
             "fill values (spline+small)", "assemble am/fm",
             "phase block", "fm_current/cov"]
    for stage in range(7):
        f = jax.jit(lambda a, b, c, s=stage: body(a, b, c, s))
        t = timeit(f, am_j, fm_j, ph_j)
        print(f"stage {stage} ({names[stage]}): cum {t:7.1f}ms  "
              f"delta {t - prev:7.1f}ms")
        prev = t


if __name__ == "__main__":
    main()
