"""Batched windowed complex least-squares solvers — the hot path.

The reference fits, per voiced frame, a quasi-harmonic model by windowed
normal equations ``R = (WE)^H (WE)``, ``x = R^{-1} (WE)^H (W s)`` with
basis ``E = [e^{j phi_k(t)}, t e^{j phi_k(t)}]`` (reference
functions.py:420-470 `iqhmLS_complexamps`, functions.py:472-535
`eaqhmLS_complexamps`), one ~(2(2K+1))^2 complex solve per frame in Python.
Here *all* frames solve at once: windows are padded to a static half-width W
(rows outside a frame's actual +-wl get window weight 0, which reproduces the
reference R exactly), harmonic columns are padded to a static Kc with masked
columns replaced by identity rows (block-diagonal: the live solution is
unchanged), and the batch maps onto the MXU as two einsum contractions plus a
batched Cholesky/LU solve.

Shapes: B frames, N = 2W+1 window rows, Kc max harmonic, M = 2(2Kc+1) columns.
Column slot j: j < Kc -> harmonic -(Kc-j); j == Kc -> DC; j > Kc -> +(j-Kc);
slots Kc2..2Kc2 are the slope (t*E) block, same order (Kc2 = 2Kc+1).

eaQHM quirks replicated (SURVEY.md §2.5): the negative-frequency columns are
built from *time-reversed* negated tracks (the reference's ``-flipud(fm)`` at
functions.py:284 flips the time axis); column permutation within the negative
block does not affect the consumed (DC/positive) solution entries and is not
reproduced.  Amplitude normalization eps = 10e-5 = 1e-4 (functions.py:517).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Numerics-experiment toggles (tools/bench_quick.py perturbation studies).
# Defaults = the round-4 bisect winner, measured on the real chip
# 2026-08-21 (tools/out/bench_history.jsonl): planar OFF (the planar SPD
# embedding made each adaptation ~40% SLOWER at production shapes — 0.505 s
# vs 0.365 s — contradicting its microbenchmark; see hpd_inverse_planar),
# phase split ON (no measurable cost, locally ~100x more accurate cumsum).
_PLANAR = os.environ.get("EAQHM_PLANAR", "0") != "0"
_PHASE_SPLIT = os.environ.get("EAQHM_PHASE_SPLIT", "1") != "0"
_REFINE = int(os.environ.get("EAQHM_REFINE", "2"))
# Gauss-Jordan leaf size of the block recursions (gj_inverse unrolls this
# many elimination steps; larger = fewer recursion levels/concats, more
# VPU work per leaf)
_GJ_BASE = int(os.environ.get("EAQHM_GJ_BASE", "16"))
# Gram-contraction precision: "highest" (6-pass f32 emulation, production
# default — see build_gram) vs "high" (3-pass) for perf experiments
_GRAM_PREC = {"highest": jax.lax.Precision.HIGHEST,
              "high": jax.lax.Precision.HIGH,
              "default": jax.lax.Precision.DEFAULT}[
    os.environ.get("EAQHM_GRAM_PREC", "highest")]


def blackman_window(o, wl):
    """np.blackman(2*wl+1) sampled at centered offsets o, 0 outside +-wl."""
    r = o / wl
    w = 0.42 + 0.5 * jnp.cos(jnp.pi * r) + 0.08 * jnp.cos(2 * jnp.pi * r)
    return jnp.where(jnp.abs(o) <= wl, w, 0.0)


def hamming_window(o, wl):
    """np.hamming(2*wl+1) sampled at centered offsets o, 0 outside +-wl."""
    w = 0.54 + 0.46 * jnp.cos(jnp.pi * o / wl)
    return jnp.where(jnp.abs(o) <= wl, w, 0.0)


def gj_inverse(R):
    """Batched explicit inverse of small HPD/SPD blocks by UNROLLED
    Gauss-Jordan elimination — pure VPU elementwise ops, no pivoting
    (stable for (equilibrated) positive-definite blocks).

    Replaces `jnp.linalg.inv` at the block-recursion leaves: XLA lowers
    batched inv to a sequential LU custom-call that measured 8-11 ms per
    [128,16,16] batch on TPU v5e (device trace, tools/profile_adapt.py,
    2026-08-21) — 76 ms of a 320 ms adaptation was spent in these leaves
    alone.  The unrolled loop fuses to microseconds.

    R: [B, m, m] (m small, trace-unrolled); returns [B, m, m].
    """
    B, m, _ = R.shape
    eye = jnp.broadcast_to(jnp.eye(m, dtype=R.dtype), R.shape)
    A = jnp.concatenate([R, eye], axis=-1)            # [B, m, 2m]
    for j in range(m):
        row = A[:, j, :] / A[:, j, j:j + 1]
        A = A - A[:, :, j:j + 1] * row[:, None, :]
        A = A.at[:, j, :].set(row)
    return A[:, :, m:]


def hpd_block_inverse(R, base: int = None, precision=None):
    """Batched inverse of Hermitian-positive-definite matrices via recursive
    Schur-complement block inversion — GEMMs only, no triangular kernels.

    XLA's batched Cholesky on TPU is latency-bound (sequential panel loop:
    measured ~90 us/matrix regardless of batch), while this recursion is
    ~2.5x the flops but runs entirely on the MXU.  For [[P, Q], [Q^H, S]]
    with T = P^{-1} Q and Sc = S - Q^H T:

        inv = [[P^{-1} + T Sc^{-1} T^H,  -T Sc^{-1}],
               [-Sc^{-1} T^H,             Sc^{-1}]]

    The reference solves these systems with an explicit inverse too
    (numpy.linalg.inv at functions.py:465,530), so the numerics policy
    matches upstream.  R: [B, M, M]; returns [B, M, M].
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    if base is None:
        base = _GJ_BASE
    M = R.shape[-1]
    if M <= base:
        return gj_inverse(R)
    m = (M // 2 + 7) & ~7 if M >= 32 else M // 2   # MXU-aligned split
    m = min(m, M - 1)
    P = R[..., :m, :m]
    Q = R[..., :m, m:]
    S = R[..., m:, m:]
    Pi = hpd_block_inverse(P, base, precision)
    T = jnp.einsum("bij,bjk->bik", Pi, Q, precision=precision)
    Sc = S - jnp.einsum("bij,bik->bjk", jnp.conj(Q), T, precision=precision)
    Si = hpd_block_inverse(Sc, base, precision)
    U = jnp.einsum("bij,bjk->bik", T, Si, precision=precision)
    TL = Pi + jnp.einsum("bij,bkj->bik", U, jnp.conj(T), precision=precision)
    top = jnp.concatenate([TL, -U], axis=-1)
    bot = jnp.concatenate([-jnp.conj(jnp.swapaxes(U, -1, -2)), Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def spd_block_inverse(G, base: int = None, precision=None):
    """Batched inverse of real symmetric-positive-definite matrices via the
    same recursive Schur-complement block recursion as hpd_block_inverse.

    Used as the engine of the planar complex path: a complex HPD R = A+iB
    maps to the real SPD G = [[A, -B], [B, A]] of size 2M, whose inverse
    holds (A+iB)^{-1} = Ai+iBi in the same block layout.

    NOT the production path (round-4 bisect, real chip, 2026-08-21): in the
    full pipeline this made each adaptation ~40% slower than the complex
    hpd_block_inverse (0.505 s vs 0.365 s per adaptation on SA19) — the 2M
    recursion's extra depth and concatenate/slice traffic outweigh the
    better GEMM tiling at production batch sizes.  Kept because the real
    SPD recursion is numerically robust at large M where the complex f32
    recursion degrades (M >= ~250; see the round-4 lattice-E collapse in
    tools/out/bench_history.jsonl), so it is a candidate for the big-M
    tiers of the 80 Hz stress config.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    if base is None:
        base = _GJ_BASE
    M = G.shape[-1]
    if M <= base:
        return gj_inverse(G)
    m = (M // 2 + 7) & ~7 if M >= 32 else M // 2   # MXU-aligned split
    m = min(m, M - 1)
    P = G[..., :m, :m]
    Q = G[..., :m, m:]
    S = G[..., m:, m:]
    Pi = spd_block_inverse(P, base, precision)
    T = jnp.einsum("bij,bjk->bik", Pi, Q, precision=precision)
    Sc = S - jnp.einsum("bij,bik->bjk", Q, T, precision=precision)
    Si = spd_block_inverse(Sc, base, precision)
    U = jnp.einsum("bij,bjk->bik", T, Si, precision=precision)
    TL = Pi + jnp.einsum("bij,bkj->bik", U, T, precision=precision)
    top = jnp.concatenate([TL, -U], axis=-1)
    bot = jnp.concatenate([-jnp.swapaxes(U, -1, -2), Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def hpd_inverse_planar(R, precision=None):
    """Complex HPD batched inverse through the real SPD embedding.

    R: [B, M, M] complex.  G = [[A, -B], [B, A]] is SPD when R is HPD; its
    inverse has the same structure, so Ri = Gi[:M,:M] + i*Gi[M:,:M].
    """
    A = jnp.real(R)
    Bm = jnp.imag(R)
    G = jnp.concatenate(
        [jnp.concatenate([A, -Bm], axis=-1),
         jnp.concatenate([Bm, A], axis=-1)], axis=-2)
    Gi = spd_block_inverse(G, precision=precision)
    M = R.shape[-1]
    return jax.lax.complex(Gi[..., :M, :M], Gi[..., M:, :M])


def default_solve_method(rdtype, M: int | None = None) -> str:
    """LS solve algorithm by dtype and (optionally) system size.

    f64 -> "cholesky" (XLA batched Cholesky + triangular solves;
    bit-for-bit stable, used for CPU parity).  f32 -> "block_inverse" at
    EVERY size: the round-5 device trace (tools/profile_adapt.py, TPU
    v5e, 2026-08-21) showed ~199 ms of the 320 ms adaptation inside
    LAPACK-style custom-calls — 76 ms in the recursion's old
    [128,<=16,<=16] `inv` LU leaves (8-11 ms each!) and 96 ms in the
    mid-M tiers' Cholesky/triangular panels.  With the unrolled
    Gauss-Jordan leaves (gj_inverse) the custom-call-free recursion beats
    Cholesky at every measured tier, INCLUDING the big-M ones the round-4
    crossover reserved for Cholesky (that sweep was polluted by the slow
    LU leaves): SA19 0.165 vs 0.347 s/adaptation; stress config 4
    (M~386/514) 26.4x vs 20.4x; male preset (M~450 real speech) config 2
    238.8x vs 188.4x — all at IDENTICAL final SRER to 4 decimals
    (tools/out/bench_history.jsonl + benchmarks_r5.json).  A
    NaN-triggered ridged-Cholesky rerun backs the recursion on
    pathological batches (solve_gram).  "pallas" (ops.pallas_chol)
    measured slower at every production tier and stays opt-in; the planar
    real-SPD embedding measured 23.8x on config 4 — between Cholesky and
    the complex recursion — retiring its M>=250 hypothesis."""
    if rdtype == jnp.float64:
        return "cholesky"
    return "block_inverse"


def build_gram_split(E1, w, o, s_win, colmask1):
    """Windowed normal equations via the basis' block structure
    (equilibrated): E = [E1, t*E1], so

        R = [[G0, G1], [G1^H, G2]],  Gk = E1^H W^2 t^k E1

    computed as three half-size grams of A = w*E1 and B = (w*t)*E1
    (G0 = A^H A, G1 = A^H B, G2 = B^H B; G1 is Hermitian since the
    diagonal weights commute) — 3/4 of the concatenated gram's FLOPs and
    no materialized [B, N, 2*Kc2] E (the concat alone costs a full
    write+read of E per chunk).  Identity padding + Jacobi equilibration
    as in build_gram; returns (R, rhs, dinv) with R exactly Hermitian
    (lower-left set to G1^H).
    """
    hp = _GRAM_PREC
    A = E1 * w[..., None].astype(E1.dtype)
    B = A * o[None, :, None].astype(E1.dtype)
    G0 = jnp.einsum("bnm,bnp->bmp", jnp.conj(A), A, precision=hp)
    G1 = jnp.einsum("bnm,bnp->bmp", jnp.conj(A), B, precision=hp)
    G2 = jnp.einsum("bnm,bnp->bmp", jnp.conj(B), B, precision=hp)
    G1h = jnp.conj(jnp.swapaxes(G1, -1, -2))
    R = jnp.concatenate(
        [jnp.concatenate([G0, G1], axis=-1),
         jnp.concatenate([G1h, G2], axis=-1)], axis=-2)
    ws = (w * s_win).astype(E1.dtype)
    rhs = jnp.concatenate(
        [jnp.einsum("bnm,bn->bm", jnp.conj(A), ws, precision=hp),
         jnp.einsum("bnm,bn->bm", jnp.conj(B), ws, precision=hp)], axis=-1)
    colmask = jnp.concatenate([colmask1, colmask1], axis=-1)
    eye = jnp.eye(R.shape[-1], dtype=R.dtype)
    R = R + eye * (~colmask[:, None, :])
    dinv = jax.lax.rsqrt(jnp.maximum(
        jnp.real(jnp.diagonal(R, axis1=-2, axis2=-1)), 1e-30))
    R = R * (dinv[:, None, :] * dinv[:, :, None]).astype(R.dtype)
    rhs = rhs * dinv
    return R, rhs, dinv


_SPLIT_GRAM = os.environ.get("EAQHM_SPLIT_GRAM", "1") != "0"


def build_gram(E, w, s_win, colmask):
    """Windowed normal equations, equilibrated: returns (R, rhs, dinv).

    E: [B, N, M] complex basis (already column-masked);
    w: [B, N] window; s_win: [B, N]; colmask: [B, M] bool.

    The Gram contraction runs at Precision.HIGHEST: TPU f32 matmuls default
    to bf16-multiply passes whose error is amplified by cond(R) in the solve
    (measured ~0.8 dB per-adaptation SRER drift at default precision).
    """
    hp = _GRAM_PREC
    Ew = E * w[..., None].astype(E.dtype)
    R = jnp.einsum("bnm,bnp->bmp", jnp.conj(Ew), Ew, precision=hp)
    # identity rows for padded columns keep R nonsingular without touching
    # the live block (masked columns are exactly zero)
    eye = jnp.eye(R.shape[-1], dtype=R.dtype)
    R = R + eye * (~colmask[:, None, :])
    rhs = jnp.einsum("bnm,bn->bm", jnp.conj(Ew),
                     (w * s_win).astype(E.dtype), precision=hp)
    # Jacobi equilibration: the slope block's columns (t*E, |t|<=W) and the
    # amplitude-normalized eaQHM columns have norms spanning ~4 orders of
    # magnitude, so cond(R) ~ cond(E)^2 overwhelms f32 solves.  Scaling to a
    # unit diagonal (exact in infinite precision; x = D * solve(DRD, D b))
    # brings the f32 solve error down to the well-conditioned regime.
    dinv = jax.lax.rsqrt(jnp.maximum(
        jnp.real(jnp.diagonal(R, axis1=-2, axis2=-1)), 1e-30))
    R = R * (dinv[:, None, :] * dinv[:, :, None]).astype(R.dtype)
    rhs = rhs * dinv
    return R, rhs, dinv


def solve_gram(R, rhs, rdtype, method=None):
    """Solve equilibrated HPD normal equations R x' = rhs (batched).

    R: [B, M, M]; rhs: [B, M]; the caller de-equilibrates (x = x' * dinv).

    Placement: the PRODUCTION path calls this fused inside each lax.map
    chunk (engine._fused_solve = True; measured on the real chip: hoisting
    the solve to one whole-tier batched call made the adaptation ~3x
    slower — the [~4.5k, M, M] batch spills the recursion's intermediates
    to HBM while per-chunk [128, M, M] solves stay VMEM-resident).  The
    build_gram/solve_gram split is kept so whole-tier placement remains
    expressible for hardware where the trade flips.

    method: None (dtype default) | "block_inverse" | "cholesky" | "pallas".
    """
    hp = jax.lax.Precision.HIGHEST
    if method is None:
        method = default_solve_method(rdtype, int(R.shape[-1]))
    if method == "pallas":
        # blocked VMEM Cholesky factorize+solve (ops.pallas_chol); f32-only.
        # R is already equilibrated to unit diagonal + identity-padded — the
        # kernel's documented input contract.  One refinement step with the
        # HIGHEST-precision residual recovers the f32 factorization error.
        from eaqhm_tpu.ops.pallas_chol import chol_solve
        interpret = jax.default_backend() != "tpu"
        cdt = R.dtype
        x = chol_solve(R.astype(jnp.complex64), rhs.astype(jnp.complex64),
                       interpret=interpret).astype(cdt)
        r = rhs - jnp.einsum("bmp,bp->bm", R, x, precision=hp)
        x = x + chol_solve(R.astype(jnp.complex64),
                           r.astype(jnp.complex64),
                           interpret=interpret).astype(cdt)
    elif method == "block_inverse":
        # recursive Schur-complement inverse: GEMMs only (MXU); matches the
        # reference's inv()-based solve policy (functions.py:465,530).
        # Complex recursion by default — the planar real-SPD embedding is
        # ~40% slower end-to-end at production shapes (round-4 bisect and
        # re-confirmed at the r5 M~514 stress tiers: 23.8x vs 26.4x; see
        # hpd_inverse_planar docstring).  Iterative-refinement steps push
        # the f32 inverse error from ~cond(R)*eps to ~(cond(R)*eps)^3: the
        # inverse is only a preconditioner, the residual GEMVs carry the
        # accuracy.
        Ri = hpd_inverse_planar(R) if _PLANAR else hpd_block_inverse(R)
        x = jnp.einsum("bmp,bp->bm", Ri, rhs, precision=hp)
        for _ in range(_REFINE):
            r = rhs - jnp.einsum("bmp,bp->bm", R, x, precision=hp)
            x = x + jnp.einsum("bmp,bp->bm", Ri, r, precision=hp)
        if rdtype != jnp.float64:
            # belt-and-braces (SURVEY §5 failure handling): if a
            # pathological batch overflows the f32 recursion, rerun it as
            # ridged Cholesky + refinement — same fallback the cholesky
            # branch uses.  Healthy tiers never take the branch (the cond
            # predicate is one reduction over x).
            def _ridge_rerun(_):
                eye = jnp.eye(R.shape[-1], dtype=R.dtype)
                Lj = jnp.linalg.cholesky(R + 1e-5 * eye)

                def tri(b):
                    y = jax.scipy.linalg.solve_triangular(
                        Lj, b[..., None], lower=True)
                    return jax.scipy.linalg.solve_triangular(
                        Lj, y, lower=True, trans="C")[..., 0]

                xj = tri(rhs)
                r = rhs - jnp.einsum("bmp,bp->bm", R, xj, precision=hp)
                return xj + tri(r)

            x = jax.lax.cond(jnp.all(jnp.isfinite(
                jnp.real(x) + jnp.imag(x))), lambda _: x, _ridge_rerun, 0)
    else:
        # batched Cholesky + two triangular solves (2.7x faster than LU on
        # TPU — no pivoting; measured 388ms vs 1035ms for [4352,238,238] c64)
        if rdtype == jnp.float64:
            # f64 parity path: exact, unjittered (golden oracles)
            L = jnp.linalg.cholesky(R)
            y = jax.scipy.linalg.solve_triangular(L, rhs[..., None],
                                                  lower=True)
            x = jax.scipy.linalg.solve_triangular(
                L, y, lower=True, trans="C")[..., 0]
        else:
            # f32 fast path: plain Cholesky.  Ill-conditioned batches
            # (male preset / 80 Hz big-M tiers, cond ~ 1/eps32) make it
            # produce non-finite solutions; a lax.cond then reruns the
            # batch as Cholesky-with-jitter + one refinement step
            # (SURVEY §5 failure-handling row: ridge instead of asserts).
            # Healthy tiers — all of SA19 — never pay for the fallback
            # (measured: fallback-always cost 1.812 vs 1.868 audio-s/s).
            def tri_solve(L, b):
                y = jax.scipy.linalg.solve_triangular(L, b[..., None],
                                                      lower=True)
                return jax.scipy.linalg.solve_triangular(
                    L, y, lower=True, trans="C")[..., 0]

            x = tri_solve(jnp.linalg.cholesky(R), rhs)

            def ridge(_):
                # equilibrated R has unit diagonal: a 1e-5 ridge keeps the
                # factorization PD; the HIGHEST-precision refinement GEMVs
                # absorb the ridge bias where conditioning allows
                eye = jnp.eye(R.shape[-1], dtype=R.dtype)
                Lj = jnp.linalg.cholesky(R + 1e-5 * eye)
                xj = tri_solve(Lj, rhs)
                r = rhs - jnp.einsum("bmp,bp->bm", R, xj, precision=hp)
                return xj + tri_solve(Lj, r)

            x = jax.lax.cond(jnp.all(jnp.isfinite(
                jnp.real(x) + jnp.imag(x))), lambda _: x, ridge, 0)
    return x


def _solve_ls(E, w, s_win, colmask, rdtype, method=None):
    """build_gram + solve_gram + de-equilibration in one call (the
    single-dispatch path used by the batch engine; the per-utterance engine
    splits the two so the solve batches over a whole tier)."""
    R, rhs, dinv = build_gram(E, w, s_win, colmask)
    return solve_gram(R, rhs, rdtype, method=method) * dinv


def iqhm_gram(s_win, o, wl, f0, K, fs, Kc, dtype=jnp.float64):
    """Stationary-fit normal equations (reference functions.py:420-470).

    s_win: [B, N] signal windows centered on each frame;
    o: [N] centered offsets (-W..W); wl: [B] half-widths; f0: [B];
    K: [B] per-frame harmonic count; Kc: static max harmonic.
    Returns (R, rhs, dinv) — feed solve_gram, then split_amps.
    """
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    k = jnp.arange(-Kc, Kc + 1)                                  # [Kc2]
    colmask1 = jnp.abs(k)[None, :] <= K[:, None]                 # [B, Kc2]
    phase = (2 * jnp.pi / fs) * o[None, :, None] * (k[None, None, :]
                                                    * f0[:, None, None])
    E1 = jnp.exp(1j * phase.astype(dtype)).astype(cdtype)
    E1 = E1 * colmask1[:, None, :]
    w = blackman_window(o[None, :].astype(dtype), wl[:, None].astype(dtype))
    if _SPLIT_GRAM:
        return build_gram_split(E1, w, o, s_win.astype(dtype), colmask1)
    E = jnp.concatenate([E1, o[None, :, None].astype(cdtype) * E1], axis=-1)
    colmask = jnp.concatenate([colmask1, colmask1], axis=-1)
    return build_gram(E, w, s_win.astype(dtype), colmask)


def split_amps(x, Kc: int):
    """Split a solution row [.., 2(2Kc+1)] into (amps, slopes)."""
    Kc2 = 2 * Kc + 1
    return x[..., :Kc2], x[..., Kc2:]


def iqhm_batch(s_win, o, wl, f0, K, fs, Kc, dtype=jnp.float64, method=None):
    """Batched stationary fit: gram + solve in one dispatch.

    Returns (amps, slopes): [B, 2Kc+1] complex, slot layout as module doc.
    """
    R, rhs, dinv = iqhm_gram(s_win, o, wl, f0, K, fs, Kc, dtype=dtype)
    x = solve_gram(R, rhs, dtype, method=method) * dinv
    return split_amps(x, Kc)


def repair_tracks(fm_win, am_win, o, wl, colmask=None):
    """Zero-gap repair of gathered track windows (functions.py:217-278).

    For each (frame, harmonic): inside the frame's actual window (+-wl),
    zeros of fm are filled by linear interpolation between the surrounding
    nonzeros (constant extension at the edges); am is repaired at fm's zero
    positions.  Outside +-wl both are set to 0.

    fm_win, am_win: [B, N, K]; o: [N]; wl: [B].  colmask: optional [B, K]
    harmonics the caller will keep — when every kept in-window sample is
    already nonzero (the common case once tracks are dense inside voiced
    runs), the whole batch skips the scans via lax.cond and returns the
    masked input unchanged (bit-identical to the scan path, which fills
    nothing when there are no zeros).  Returns the repaired pair.
    """
    B, N, K = fm_win.shape
    dtype = fm_win.dtype
    inwin = (jnp.abs(o)[None, :, None] <= wl[:, None, None])     # [B, N, 1]
    nz = inwin & (fm_win != 0)

    def identity(_):
        return (jnp.where(inwin, fm_win, 0.0), jnp.where(inwin, am_win, 0.0))

    def scan_repair(_):
        idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :, None],
                               fm_win.shape)

        # value-carrying associative scans replace take_along_axis gathers
        # (measured: 4 big gathers ~4s vs 2 scans ~90ms per adaptation on
        # TPU)
        elems = (jnp.where(nz, idx, jnp.int32(-1)),
                 jnp.where(nz, fm_win, 0.0), jnp.where(nz, am_win, 0.0))

        def op_last(l, r):
            """keep the later element if valid (prefix 'last nonzero')."""
            t = r[0] >= 0
            return tuple(jnp.where(t, rv, lv) for lv, rv in zip(l, r))

        prev_i, prev_fm, prev_am = jax.lax.associative_scan(op_last, elems,
                                                            axis=1)
        # reverse=True flips, scans, flips back with the SAME op, so op_last
        # in flipped coordinates yields the suffix 'first nonzero'
        nxt_i, nxt_fm, nxt_am = jax.lax.associative_scan(op_last, elems,
                                                         axis=1, reverse=True)
        has_prev = prev_i >= 0
        has_next = nxt_i >= 0

        def fill(x, xp, xn):
            denom = (nxt_i - prev_i).astype(dtype)
            ok = denom != 0
            g = jnp.where(ok, (idx - prev_i) / jnp.where(ok, denom, 1.0), 0.0)
            interp = xp + (xn - xp) * g
            out = jnp.where(nz, x,
                            jnp.where(has_prev & has_next, interp,
                                      jnp.where(has_prev, xp,
                                                jnp.where(has_next, xn,
                                                          0.0))))
            return jnp.where(inwin, out, 0.0)

        return (fill(fm_win, prev_fm, nxt_fm), fill(am_win, prev_am, nxt_am))

    if colmask is None:
        return scan_repair(0)
    needs = jnp.any(inwin & (fm_win == 0) & colmask[:, None, :])
    return jax.lax.cond(needs, scan_repair, identity, 0)


def eaqhm_gram(s_win, fm_win, am_win, o, wl, colmask_k, fs,
               dtype=jnp.float64, eps=1e-4):
    """Non-stationary-fit normal equations (reference functions.py:472-535).

    fm_win/am_win: [B, N, Kc] instantaneous track windows (positive
    harmonics 1..Kc at slots 0..Kc-1), already overlay-corrected; zeros are
    repaired here.  colmask_k: [B, Kc] selected harmonics (center nonzero).
    Returns (R, rhs, dinv) — feed solve_gram, then eaqhm_extract.
    """
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    B, N = s_win.shape
    Kc = fm_win.shape[-1]
    W = (N - 1) // 2

    fm_r, am_r = repair_tracks(fm_win.astype(dtype), am_win.astype(dtype),
                               o, wl, colmask=colmask_k)
    fm_r = fm_r * colmask_k[:, None, :]
    am_r = am_r * colmask_k[:, None, :]

    # centered cumulative phase: psi(t) = C(t) - C(mid), C = inclusive
    # cumsum.  |C| reaches fm*N ~ 2e6, where f32 cumsum accumulates
    # ~sqrt(N)*eps*|C| ~ 1 Hz-sample of error (~4e-4 rad after scaling) —
    # the dominant f32-vs-f64 SRER term.  Exact-integer split: fm = q + r
    # with q = round(fm) an integer; integer partial sums stay < 2^24 so
    # cumsum(q) is EXACT in f32, and its phase contribution reduces mod fs
    # exactly; the residual cumsum (|r| <= 0.5) carries negligible error.
    if _PHASE_SPLIT:
        fm_q = jnp.round(fm_r)
        fm_res = fm_r - fm_q
    else:
        # plain-cumsum path (pre-r3 behavior): q = 0, whole fm in residual
        fm_q = jnp.zeros_like(fm_r)
        fm_res = fm_r
    cq = jnp.cumsum(fm_q, axis=1)
    cr = jnp.cumsum(fm_res, axis=1)
    psi_q = cq - cq[:, W:W + 1, :]
    psi_r = cr - cr[:, W:W + 1, :]

    def mk_phase(pq, pr):
        if not _PHASE_SPLIT:
            return (2 * jnp.pi / fs) * pr
        return (2 * jnp.pi / fs) * (jnp.mod(pq, fs) + pr)

    phase = mk_phase(psi_q, psi_r)

    am_mid = am_r[:, W:W + 1, :]
    rho = (eps + am_r) / (am_mid + eps)

    pos = rho * jnp.exp(1j * phase.astype(dtype)).astype(cdtype)
    pos = pos * colmask_k[:, None, :]
    # negative block: the reference feeds -flipud(fm) (time-reversed negated
    # tracks) through the same inclusive cumsum, which recenters to
    #   phase_neg(t) = (2pi/fs) * (psi(N-2-t) + fm(mid))
    # (one-sample shift vs a naive conjugate-flip because cumsum of a
    # reversed sequence != reversed cumsum).
    fm_mid_q = fm_q[:, W:W + 1, :]
    fm_mid_r = fm_res[:, W:W + 1, :]

    def ext_flip(pq_or_pr, c_mid):
        ext = jnp.concatenate([-c_mid, pq_or_pr[:, :-1, :]], axis=1)
        return jnp.flip(ext, axis=1)

    neg_phase = mk_phase(
        ext_flip(psi_q, cq[:, W:W + 1, :]) + fm_mid_q,
        ext_flip(psi_r, cr[:, W:W + 1, :]) + fm_mid_r)
    neg = (jnp.flip(rho, axis=1)
           * jnp.exp(1j * neg_phase.astype(dtype)).astype(cdtype))
    neg = neg * colmask_k[:, None, :]
    # slots -Kc..-1 ascending = harmonics Kc..1  -> flip harmonic axis
    neg = jnp.flip(neg, axis=2)
    dc = jnp.ones((B, N, 1), cdtype)
    E1 = jnp.concatenate([neg, dc, pos], axis=-1)                # [B,N,Kc2]
    w = hamming_window(o[None, :].astype(dtype), wl[:, None].astype(dtype))
    colmask1 = jnp.concatenate([jnp.flip(colmask_k, axis=-1),
                                jnp.ones((B, 1), bool), colmask_k], axis=-1)
    if _SPLIT_GRAM:
        return build_gram_split(E1, w, o, s_win.astype(dtype), colmask1)
    E = jnp.concatenate([E1, o[None, :, None].astype(cdtype) * E1], axis=-1)
    colmask = jnp.concatenate([colmask1, colmask1], axis=-1)
    return build_gram(E, w, s_win.astype(dtype), colmask)


def eaqhm_extract(x, colmask_k, Kc: int, fs):
    """Split a solved row into (amps, slopes, fmismatch) — the frequency-
    mismatch corrector Δf = fs/(2π)·(Re a·Im b − Im a·Re b)/|a|²
    (reference functions.py:297)."""
    amps, slopes = split_amps(x, Kc)
    a_pos = amps[..., Kc + 1:]
    b_pos = slopes[..., Kc + 1:]
    denom = jnp.abs(a_pos) ** 2
    fmis = (fs / (2 * jnp.pi)) * (jnp.real(a_pos) * jnp.imag(b_pos)
                                  - jnp.imag(a_pos) * jnp.real(b_pos))
    fmis = jnp.where(denom > 0, fmis / jnp.where(denom > 0, denom, 1.0), 0.0)
    fmis = fmis * colmask_k
    return amps, slopes, fmis


def eaqhm_batch(s_win, fm_win, am_win, o, wl, colmask_k, fs,
                dtype=jnp.float64, eps=1e-4, method=None):
    """Batched non-stationary fit: gram + solve + extract in one dispatch.

    Returns (amps, slopes, fmismatch):
      amps/slopes [B, 2Kc+1] complex in the module slot layout,
      fmismatch [B, Kc] for the positive harmonics (functions.py:297).
    """
    Kc = fm_win.shape[-1]
    R, rhs, dinv = eaqhm_gram(s_win, fm_win, am_win, o, wl, colmask_k, fs,
                              dtype=dtype, eps=eps)
    x = solve_gram(R, rhs, dtype, method=method) * dinv
    return eaqhm_extract(x, colmask_k, Kc, fs)
