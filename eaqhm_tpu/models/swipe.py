"""SWIPE' pitch estimation, TPU-native.

Re-design of the reference estimator (reference SWIPE.py:14-195) as a
static *plan* (host-precomputed float64 constants per (fs, plim, length)) plus
a jittable runtime that is, per power-of-2 window size: one batched STFT with
matplotlib-PSD semantics, a sparse-gather ERB interpolation, column
normalization, and a dense [nCand x nERB] @ [nERB x T] kernel matmul (MXU),
followed by a vectorized parabolic fine-tune on a 1/768-octave grid.

Replicated reference quirks (SURVEY.md §2.5):
  #2  the last selected candidate row per window size is zero
      (SWIPE.py:147 loops to len(pc)-1) -> kernel matrix row zeroed;
  #3  argmax at the top edge returns pc[0] (SWIPE.py:120-121);
  #6  spectra are one-sided PSDs (matplotlib specgram), so loudness is
      sqrt(PSD) with frequency-dependent doubling baked in.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import List

import numpy as np
import jax.numpy as jnp

from eaqhm_tpu.ops import stft as stft_ops


def hz2erbs(hz):
    """Hz -> ERB-rate scale (reference SWIPE.py:186-189)."""
    return 21.4 * np.log10(1 + np.asarray(hz) / 229.0)


def erbs2hz(erbs):
    """ERB-rate -> Hz (reference SWIPE.py:192-195)."""
    return (np.power(10, np.asarray(erbs) / 21.4) - 1) * 229.0


def _primes_upto(n: int) -> List[int]:
    """{1} U primes <= n+1 (reference SWIPE.py:151-163 includes 1)."""
    out = []
    for i in range(1, n + 2):
        isp = True
        for d in range(2, int(np.sqrt(i)) + 1):
            if i % d == 0:
                isp = False
                break
        if isp:
            out.append(i)
    return out


def _candidate_kernel(fERBs: np.ndarray, pc: float) -> np.ndarray:
    """Prime-harmonic cosine kernel row for one candidate (SWIPE.py:166-183).

    Weight 1 within |q-i|<.25 of each prime harmonic i, 1/2 in the
    .25<|q-i|<.75 skirts, scaled by 1/sqrt(f) and unit-normalized over the
    positive part.
    """
    n = int(np.fix(fERBs[-1] / pc - 0.75))
    q = fERBs / pc
    k = np.zeros_like(fERBs)
    for i in _primes_upto(n):
        a = np.abs(q - i)
        k[a < 0.25] = np.cos(2 * np.pi * q[a < 0.25])
        v = (0.25 < a) & (a < 0.75)
        k[v] = np.cos(2 * np.pi * q[v]) / 2.0
    k = k * np.sqrt(1.0 / fERBs)
    pos = k[k > 0.0]
    k = k / np.linalg.norm(pos)
    return k


@dataclass
class _WindowPlan:
    nfft: int
    hop: int
    pad_pre: int
    pad_post: int
    window: np.ndarray
    erb_lo: np.ndarray       # [nerb] gather index into rfft bins
    erb_w: np.ndarray        # [nerb] lerp weight
    j: np.ndarray            # candidate subset indices [nj]
    kernel: np.ndarray       # [nj, nerb], last row zeroed (quirk #2)
    mu: np.ndarray           # [nj] blend weights
    t_lo: np.ndarray         # [T] gather index into frame-time grid
    t_w: np.ndarray          # [T] lerp weight


@dataclass
class SwipePlan:
    """All static constants for one (fs, plim, signal length)."""
    fs: float
    length: int
    pc: np.ndarray           # [nc] pitch candidates (1/96 octave)
    t: np.ndarray            # [T] output times (1 ms)
    windows: List[_WindowPlan] = field(default_factory=list)
    # fine-tune constants
    vinv: np.ndarray = None  # [nc, 3, 3]: parabola coeffs = vinv[i] @ y
    nftc: np.ndarray = None  # [nc, gmax] fine grid abscissae
    nftc_mask: np.ndarray = None
    log2pc_left: np.ndarray = None  # [nc] log2(pc[i-1]) (0 at edges)


@functools.lru_cache(maxsize=16)
def make_plan(fs: float, f0min: float, f0max: float, length: int) -> SwipePlan:
    """Precompute the full SWIPE' plan (host, float64).

    Mirrors the setup math of reference SWIPE.py:26-50 and the per-window
    constants of SWIPE.py:52-105; all data-independent given (fs, plim, len).
    """
    fs = float(fs)
    plim = np.array([f0min, f0max], dtype=np.float64)
    dt = 0.001
    dlog2p = 1.0 / 96.0
    dERBs = 0.1

    t = np.arange(0, length / fs, dt)
    log2pc = np.arange(np.log2(plim[0]), np.log2(plim[1]), dlog2p)
    pc = np.power(2.0, log2pc)
    nc = len(pc)

    logWs = np.round(np.log2(8.0 * fs / plim))
    ws_list = np.power(2, np.arange(logWs[0], logWs[1] - 1, -1))
    pO = 8.0 * fs / ws_list
    d = 1 + log2pc - np.log2(8.0 * fs / ws_list[0])

    fERBs = erbs2hz(np.arange(hz2erbs(pc[0] / 4), hz2erbs(fs / 2), dERBs))

    plan = SwipePlan(fs=fs, length=length, pc=pc, t=t)

    for i in range(len(ws_list)):
        nfft = int(ws_list[i])
        dn = int(round(4.0 * fs / pO[i]))          # == nfft/2 (dc=4, K=2)
        hop = dn
        pad_pre = nfft // 2
        pad_post = int(dn + nfft / 2)
        npadded = pad_pre + length + pad_post
        window = np.hanning(nfft)

        # rfft bin grid -> ERB grid linear-interp gathers
        f = np.arange(nfft // 2 + 1) * fs / nfft
        lo = np.clip(np.searchsorted(f, fERBs, side="right") - 1, 0, len(f) - 2)
        w = (fERBs - f[lo]) / (f[lo + 1] - f[lo])

        # candidate subset for this window size (reference SWIPE.py:79-88)
        if i == len(ws_list) - 1:
            j = np.argwhere(d - (i + 1) > -1).ravel()
            k = np.argwhere(d[j] - (i + 1) < 0).ravel()
        elif i == 0:
            j = np.argwhere(d - (i + 1) < 1).ravel()
            k = np.argwhere(d[j] - (i + 1) > 0).ravel()
        else:
            j = np.argwhere(np.abs(d - (i + 1)) < 1).ravel()
            k = np.arange(len(j))
        mu = np.ones(len(j))
        mu[k] = 1 - np.abs(d[j[k]] - (i + 1))

        kern = np.stack([_candidate_kernel(fERBs, pc[jj]) for jj in j])
        kern[-1, :] = 0.0                           # quirk #2: last row unused

        # frame times, shifted as the reference does (SWIPE.py:92-97):
        # prepend 0, drop the last -> ti = [0, t_0, t_1, ... t_{n-2}]
        tf = stft_ops.frame_times(npadded, nfft, hop, fs)
        ti = np.concatenate([[0.0], tf[:-1]])
        tlo = np.clip(np.searchsorted(ti, t, side="right") - 1, 0, len(ti) - 2)
        tw = (t - ti[tlo]) / (ti[tlo + 1] - ti[tlo])

        plan.windows.append(_WindowPlan(
            nfft=nfft, hop=hop, pad_pre=pad_pre, pad_post=pad_post,
            window=window, erb_lo=lo, erb_w=w, j=j, kernel=kern, mu=mu,
            t_lo=tlo, t_w=tw))

    # ---- fine-tune constants (reference SWIPE.py:108-131) ----
    vinv = np.zeros((nc, 3, 3))
    grids = []
    log2pc_left = np.zeros(nc)
    for ci in range(1, nc - 1):
        I = np.arange(ci - 1, ci + 2)
        tc = 1.0 / pc[I]
        ntc = (tc / tc[1] - 1) * 2 * np.pi
        V = np.vander(ntc, 3)                      # columns x^2, x, 1
        vinv[ci] = np.linalg.inv(V)
        ftc = 1.0 / np.power(2.0, np.arange(np.log2(pc[I[0]]),
                                            np.log2(pc[I[2]]), 0.0013021))
        nftc = (ftc / tc[1] - 1) * 2 * np.pi
        grids.append(nftc)
        log2pc_left[ci] = np.log2(pc[I[0]])
    gmax = max((len(g) for g in grids), default=0)
    nftc = np.zeros((nc, gmax))
    mask = np.zeros((nc, gmax), dtype=bool)
    for ci in range(1, nc - 1):
        g = grids[ci - 1]
        nftc[ci, :len(g)] = g
        mask[ci, :len(g)] = True
    plan.vinv = vinv
    plan.nftc = nftc
    plan.nftc_mask = mask
    plan.log2pc_left = log2pc_left
    return plan


def pitch_strength(plan: SwipePlan, x, dtype=jnp.float64):
    """Blended pitch-strength matrix S [nc, T] (reference SWIPE.py:52-105)."""
    x = jnp.asarray(x, dtype)
    nc = len(plan.pc)
    T = len(plan.t)
    S = jnp.zeros((nc, T), dtype)
    for wp in plan.windows:
        xz = jnp.pad(x, (wp.pad_pre, wp.pad_post))
        P = stft_ops.specgram_psd(xz, wp.nfft, wp.hop, wp.window, plan.fs,
                                  dtype=dtype)                 # [nbins, nt]
        # ERB-grid lerp of the PSD, loudness = sqrt(max(0, .))
        lo = wp.erb_lo
        w = jnp.asarray(wp.erb_w, dtype)[:, None]
        Pe = P[lo, :] * (1 - w) + P[lo + 1, :] * w             # [nerb, nt]
        L = jnp.sqrt(jnp.maximum(0.0, Pe))
        # column-normalize (SWIPE.py:139-145); zero-norm columns -> 0
        norms = jnp.sqrt(jnp.sum(L * L, axis=0, keepdims=True))
        Ln = jnp.where(norms > 0, L / jnp.where(norms > 0, norms, 1.0), 0.0)
        Si = jnp.asarray(wp.kernel, dtype) @ Ln                # [nj, nt] (MXU)
        # shifted-time lerp onto the 1 ms grid (SWIPE.py:92-98)
        tlo = wp.t_lo
        tw = jnp.asarray(wp.t_w, dtype)[None, :]
        Sit = Si[:, tlo] * (1 - tw) + Si[:, tlo + 1] * tw      # [nj, T]
        S = S.at[jnp.asarray(wp.j)].add(jnp.asarray(wp.mu, dtype)[:, None] * Sit)
    return S


def fine_tune(plan: SwipePlan, S, dtype=jnp.float64):
    """Parabolic fine-tune on the 1/768-octave grid (SWIPE.py:108-131).

    Returns (p, s): pitch and strength per 1 ms step.  Top/bottom-edge
    argmax returns pc[0] (reference quirk #3 for the top edge).
    """
    nc = S.shape[0]
    i = jnp.argmax(S, axis=0)                       # [T]
    smax = jnp.max(S, axis=0)
    il = jnp.clip(i, 1, nc - 2)
    y = jnp.stack([S[il - 1, jnp.arange(S.shape[1])],
                   S[il, jnp.arange(S.shape[1])],
                   S[il + 1, jnp.arange(S.shape[1])]], axis=-1)  # [T, 3]
    c = jnp.einsum("tab,tb->ta", jnp.asarray(plan.vinv, dtype)[il], y)  # [T,3]
    g = jnp.asarray(plan.nftc, dtype)[il]           # [T, gmax]
    gm = jnp.asarray(plan.nftc_mask)[il]
    vals = c[:, 0:1] * g * g + c[:, 1:2] * g + c[:, 2:3]
    vals = jnp.where(gm, vals, -jnp.inf)
    kbest = jnp.argmax(vals, axis=-1)
    sfine = jnp.max(vals, axis=-1)
    p = jnp.power(2.0, jnp.asarray(plan.log2pc_left, dtype)[il]
                  + (kbest - 1) / 768.0)
    edge = (i == 0) | (i == nc - 1)
    p = jnp.where(edge, plan.pc[0], p)
    s = jnp.where(edge, smax, sfine)
    return p, s


def swipep(plan: SwipePlan, x, dtype=jnp.float64):
    """Full SWIPE' estimate: returns (T, 3) [t, f0, strength]."""
    S = pitch_strength(plan, x, dtype=dtype)
    p, s = fine_tune(plan, S, dtype=dtype)
    t = jnp.asarray(plan.t, dtype)
    return jnp.stack([t, p, s], axis=1)
