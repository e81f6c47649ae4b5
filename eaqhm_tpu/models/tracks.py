"""Per-harmonic track interpolation: the reference's second hot loop.

Reference functions.py:346-381: for each harmonic k, find contiguous anchor
runs (consecutive accepted analysis instants), linearly interpolate AM,
cubic-spline (not-a-knot) interpolate FM, integrate phase with 2*pi*M endpoint
correction (functions.py:537-575), and rebuild the instantaneous-frequency
track from the unwrapped phase.

TPU-native design: anchors live on the uniform analysis grid (spacing `step`
samples), so runs are maximal *consecutive-slot* intervals (gaps are exact
multiples of step).  All harmonics and all runs are processed at once:

- run detection = shifted boolean masks on the [n_ti, K] anchor grid;
- the not-a-knot spline becomes a *segmented Thomas solve*: with uniform
  spacing the not-a-knot end conditions decouple (M_second = d/(6h)), so
  second/second-last anchors of every run are Dirichlet-known and one
  forward+backward scan over the slot axis (reset at known slots) solves
  every run of every harmonic simultaneously;
- runs with fewer than `min_interp_size=4` anchors replicate the reference's
  synthetic-left-anchor padding (functions.py:366-371) as an exact 4-point
  cubic (interp1d kind=3 through 4 points IS that cubic);
- phase integration is segment-local (each inter-anchor segment of step+1
  samples integrates from its own left-anchor phase, functions.py:560-571),
  so all segments vectorize as one [n_pairs, step, K] cumsum; the sine-bump
  correction uses a precomputed cumulative-sine vector.

Reference sentinel quirks (diff-of-indicator with 0/length-1 sentinels,
functions.py:350-358): with the default 480-sample analysis margin the
sentinels can never suppress or truncate a run (first anchor slot >= 32),
so plain maximal consecutive blocks of length >= 2 are exact.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

MIN_INTERP_SIZE = 4  # reference misc.py:14


def _segmented_notaknot_M(y, in_run, start_slot, end_slot, h, dtype):
    """Second derivatives M on the anchor grid for every run at once.

    y: [n, K] anchor values; in_run: [n, K]; start/end_slot: [n, K] (valid
    where in_run); h: spacing.  Returns M [n, K].

    The segmented Thomas elimination is a sequential recurrence, but both
    sweeps are reformulated as log-depth ``associative_scan``s (a
    sequential ``lax.scan`` over ~4k anchor slots costs ~100 ms on TPU vs
    ~2 ms here):

    - forward: with uniform spacing the elimination multiplier
        cp_i = 1 / (4 - cp_{i-1}),  cp_0 = 0
      depends ONLY on the distance from the last reset slot and converges
      geometrically to 2 - sqrt(3), so it comes from a small host-side
      table indexed by position-in-run; the remaining recurrence
        dp_i = (d_i/h - dp_{i-1}) / (4 - cp_{i-1})
      is a scalar affine prefix composition (a, b) whose a-products decay
      by ~0.27 per slot — numerically benign in f32.  (A projective 3x3
      matrix-product formulation used previously lost ~3 digits to its
      max-normalization under f32 on TPU — measured 780 Hz max FM-track
      error vs 0.8 Hz for this form.)
    - backward: v_i = dp_i - cp_i * v_{i+1} is an affine suffix
      composition (a, b) with a = -cp, b = dp (constants at known slots).
    """
    n, K = y.shape
    s = jnp.arange(n)[:, None]
    y_prev = jnp.roll(y, 1, axis=0)
    y_next = jnp.roll(y, -1, axis=0)
    d = (6.0 / h) * (y_next - 2.0 * y + y_prev)          # valid at interior
    interior = in_run & (s > start_slot) & (s < end_slot)
    known = interior & ((s == start_slot + 1) | (s == end_slot - 1))
    unknown = interior & ~known
    M_known = d / (6.0 * h)

    un = unknown
    kn = known
    # position-in-run cp table (host f64): ctab[k] = cp after k unknowns
    CPLEN = 48                         # fixed point reached to f64 eps by ~24
    ctab = np.zeros(CPLEN + 1)
    for k in range(1, CPLEN + 1):
        ctab[k] = 1.0 / (4.0 - ctab[k - 1])
    ctab_j = jnp.asarray(ctab, dtype)
    prev_block = jax.lax.cummax(jnp.where(~un, s, -1), axis=0)
    pos = jnp.clip(s - prev_block, 0, CPLEN)             # >= 1 on unknowns
    cp_prev = ctab_j[jnp.clip(pos - 1, 0, CPLEN)]
    g = 4.0 - cp_prev
    cp = jnp.where(un, ctab_j[pos], 0.0)

    a_f = jnp.where(un, -1.0 / g, 0.0)
    b_f = jnp.where(un, d / (h * g), jnp.where(kn, M_known, 0.0))

    def aff_fwd(l, r):
        la, lb = l
        ra, rb = r
        return la * ra, ra * lb + rb

    _, dp = jax.lax.associative_scan(aff_fwd, (a_f, b_f), axis=0)

    a_b = jnp.where(un, -cp, 0.0)
    b_b = jnp.where(kn, M_known, jnp.where(un, dp, 0.0))

    def aff(l, r):
        # reverse=True flips the sequence, scans, and flips back, so `l`
        # holds the HIGHER-original-index block (inner maps) and `r` the
        # lower (outer): composite v -> r(l(v))
        la, lb = l
        ra, rb = r
        return la * ra, ra * lb + rb

    _, vb = jax.lax.associative_scan(aff, (a_b, b_b), axis=0, reverse=True)
    M = vb
    # not-a-knot endpoints: linear extrapolation of M (uniform h)
    M1 = jnp.roll(M, -1, axis=0)
    M2 = jnp.roll(M, -2, axis=0)
    Mm1 = jnp.roll(M, 1, axis=0)
    Mm2 = jnp.roll(M, 2, axis=0)
    is_start = in_run & (s == start_slot)
    is_end = in_run & (s == end_slot)
    M = jnp.where(is_start, 2.0 * M1 - M2, M)
    M = jnp.where(is_end, 2.0 * Mm1 - Mm2, M)
    return M


@partial(jax.jit, static_argnames=("step", "fs", "n_ti", "length"))
def interpolate_tracks(am_recon, fm_recon, ph_recon, step: int, fs: float,
                       n_ti: int, length: int):
    """Full track-interpolation stage on dense [length, K] arrays.

    Inputs hold scattered anchor values (rows ti-1); returns
    (am_filled, fm_filled, ph_filled, fm_current) with runs interpolated
    exactly as reference functions.py:346-381.
    """
    anchor_rows = np.arange(n_ti) * step
    return interpolate_tracks_anchors(
        am_recon[anchor_rows], fm_recon[anchor_rows], ph_recon[anchor_rows],
        step, fs, length)


@partial(jax.jit, static_argnames=("step", "fs", "length"))
def interpolate_tracks_anchors(A_am, A_fm, A_ph, step: int, fs: float,
                               length: int):
    """Track interpolation from anchor values directly.

    A_am/A_fm/A_ph: [n_ti, K] per-analysis-instant values (zero = not
    accepted).  Anchor i sits at sample i*step; off-anchor samples of the
    implied dense tracks are zero by construction, so the dense arrays are
    never needed as inputs — this avoids a [n_ti,K]->[length,K] scatter
    whose fusion into the anchor gathers costs ~80 ms/array on TPU.
    Returns dense (am_filled, fm_filled, ph_filled, fm_current), each
    [length, K], interpolated exactly as reference functions.py:346-381.
    """
    dtype = A_am.dtype
    n_ti, K = A_am.shape
    L = length
    n_pairs = n_ti - 1
    h = float(step)

    acc = A_am != 0
    acc_prev = jnp.concatenate([jnp.zeros((1, K), bool), acc[:-1]])
    acc_next = jnp.concatenate([acc[1:], jnp.zeros((1, K), bool)])
    in_run = acc & (acc_prev | acc_next)
    run_start = acc & ~acc_prev & acc_next
    run_end = acc & acc_prev & ~acc_next
    pair = acc[:-1] & acc[1:]                          # [n_pairs, K]

    s_idx = jnp.arange(n_ti)[:, None]
    start_slot = jax.lax.cummax(jnp.where(run_start, s_idx, -1), axis=0)
    end_slot = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(run_end, s_idx, n_ti + 1), axis=0), axis=0), axis=0)
    run_len = end_slot - start_slot + 1

    # ---- FM spline values ----
    M = _segmented_notaknot_M(A_fm, in_run, start_slot, end_slot, h, dtype)

    r = jnp.arange(1, step)[None, :, None].astype(dtype)  # [1, step-1, 1]
    Bc = r / h
    Ac = 1.0 - Bc
    ys = A_fm[:-1][:, None, :]
    ye = A_fm[1:][:, None, :]
    Ms = M[:-1][:, None, :]
    Me = M[1:][:, None, :]
    fm_spline = (Ac * ys + Bc * ye
                 + ((Ac ** 3 - Ac) * Ms
                    + (Bc ** 3 - Bc) * Me) * (h * h) / 6.0)  # [n_pairs, step-1, K]

    # small runs (< 4 anchors): synthetic left anchors at 0, step, ...
    st = start_slot[:-1]                               # run start per pair
    m_len = run_len[:-1]
    small = pair & (m_len < MIN_INTERP_SIZE)
    # m==3 -> slots [0, s0, s0+1, s0+2]; m==2 -> [0, 1, s0, s0+1]
    sl3 = jnp.stack([jnp.zeros_like(st), st, st + 1, st + 2], axis=-1)
    sl2 = jnp.stack([jnp.zeros_like(st), jnp.ones_like(st), st, st + 1],
                    axis=-1)
    slots4 = jnp.where((m_len == 3)[..., None], sl3, sl2)  # [n_pairs, K, 4]
    # keep abscissae distinct where the small-run path is unused (avoids
    # singular 4x4 systems whose NaNs would be discarded by the select)
    slots4 = jnp.where(small[..., None], slots4,
                       jnp.broadcast_to(jnp.arange(4), slots4.shape))
    slots4 = jnp.clip(slots4, 0, n_ti - 1)
    x4 = slots4.astype(dtype) * h                          # positions
    # y4[p, k, j] = A_fm[slots4[p, k, j], k]
    kk = jnp.arange(K)[None, :, None]
    y4 = A_fm[slots4, kk]
    q = (jnp.arange(n_pairs)[:, None, None].astype(dtype) * h
         + jnp.arange(1, step)[None, None, :].astype(dtype))  # [n_pairs,1,step-1]
    from eaqhm_tpu.ops.interp import cubic4_eval
    fm_small = cubic4_eval(x4, y4, jnp.broadcast_to(q, (n_pairs, K, step - 1)))
    fm_small = fm_small.transpose(0, 2, 1)               # [n_pairs, step-1, K]

    fm_fill = jnp.where(small[:, None, :],
                        fm_small, fm_spline)

    # ---- AM linear values ----
    am_fill = (1.0 - Bc) * A_am[:-1][:, None, :] + Bc * A_am[1:][:, None, :]

    # ---- assemble dense blocks [n_pairs, step, K] from anchors ----
    # off-anchor samples of the implied dense inputs are zero, so the dense
    # arrays are built purely by reshape/concat (no scatters)
    Lp = n_pairs * step + 1

    def assemble(anchors, fill):
        inner = jnp.where(pair[:, None, :], fill,
                          jnp.zeros((1, 1, 1), anchors.dtype))
        block = jnp.concatenate([anchors[:-1][:, None, :], inner], axis=1)
        return jnp.concatenate(
            [block.reshape(-1, K), anchors[-1:],
             jnp.zeros((L - Lp, K), anchors.dtype)], axis=0)

    def strided(anchors):
        """Dense [L, K] with anchors at rows i*step, zero elsewhere."""
        z = jnp.zeros((n_pairs, step - 1, K), anchors.dtype)
        block = jnp.concatenate([anchors[:-1][:, None, :], z], axis=1)
        return jnp.concatenate(
            [block.reshape(-1, K), anchors[-1:],
             jnp.zeros((L - Lp, K), anchors.dtype)], axis=0)

    fm_out = assemble(A_fm, fm_fill)
    am_out = assemble(A_am, am_fill)

    # ---- phase integration per segment (functions.py:537-575) ----
    # seg_fm[p, r, k] = fm_out[p*step + 1 + r], r = 0..step-1
    fm_blocks = fm_out[:Lp - 1].reshape(n_pairs, step, K)
    seg_fm = jnp.concatenate(
        [fm_blocks[:, 1:, :],
         jnp.concatenate([fm_blocks[1:, :1, :], fm_out[Lp - 1:Lp][None]],
                         axis=0)], axis=1)              # [n_pairs, step, K]
    csum = jnp.cumsum(seg_fm, axis=1) * (2.0 * jnp.pi / fs)
    ph_s = A_ph[:-1][:, None, :]
    ph_e = A_ph[1:]                                     # [n_pairs, K]
    pm = ph_s + csum                                    # pm[r] = phase @ +r+1
    pm_end = pm[:, -1, :]
    Mw = jnp.round((pm_end - ph_e) / (2.0 * jnp.pi))
    er = jnp.pi * (pm_end - ph_e - 2.0 * jnp.pi * Mw) / (2.0 * h)
    t_grid = np.arange(0, step + 1)
    ft_cum = np.cumsum(np.sin(np.pi * t_grid / step))   # [step+1]
    corr = er[:, None, :] * jnp.asarray(ft_cum[1:], dtype)[None, :, None]
    pm_c = pm - corr                                    # phases @ r = 1..step

    ph_fill = pm_c[:, :step - 1, :]
    # run-end anchors take the final segment's corrected endpoint — applied
    # at anchor level before assembly (anchor i >= 1 is block i's first row)
    prev_pair_end = pm_c[:, -1, :]                      # [n_pairs, K]
    take_end = pair & run_end[1:]
    A_ph2 = jnp.concatenate(
        [A_ph[:1], jnp.where(take_end, prev_pair_end, A_ph[1:])], axis=0)
    ph_out = assemble(A_ph2, ph_fill)

    # ---- fm_current from unwrapped phase diffs (functions.py:375) ----
    slot_of = np.minimum(np.arange(L) // step, n_pairs - 1)
    r_of = np.arange(L) - slot_of * step                # r in [0, step] (tail>step)
    rmask = jnp.asarray((r_of > 0) & (r_of <= step))[:, None]
    pair_dense = jnp.concatenate(
        [jnp.repeat(pair, step, axis=0),
         jnp.broadcast_to(pair[-1:], (L - n_pairs * step, K))], axis=0)
    cov = (pair_dense & rmask) | strided(in_run)
    dph = ph_out - jnp.concatenate([ph_out[:1], ph_out[:-1]], axis=0)
    ddmod = jnp.mod(dph + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    ddmod = jnp.where((ddmod == -jnp.pi) & (dph > 0), jnp.pi, ddmod)
    starts_dense = strided(run_start)
    fm_current = jnp.where(
        starts_dense, fm_out,
        jnp.where(cov & ~starts_dense, (fs / (2.0 * jnp.pi)) * ddmod, 0.0))
    return am_out, fm_out, ph_out, fm_current
