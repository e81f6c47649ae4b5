"""eaQHM engine: per-adaptation analysis/synthesis + host-side adaptation loop.

Reference parity target: functions.py:35-418 `eaQHMAnalysisAndSynthesis`.
Design (SURVEY.md §7): arrays over structs — dense [length, K] track arrays
with boolean masks replace per-frame Python loops; each adaptation is jitted
work (batched LS solves + acceptance + track interpolation + synthesis); the
<=11-iteration adaptation loop and its keep-previous-on-decline convergence
rule (functions.py:394-402) run host-side by default, or as ONE fused
device program (lax.while_loop, `_adapt_loop_full`) when
EaqhmConfig.fused_adapt_loop is set.
"""
from __future__ import annotations

import os
import threading
import time
from collections import OrderedDict
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from eaqhm_tpu.config import EaqhmConfig
from eaqhm_tpu.ops import filters, interp
from eaqhm_tpu.ops import solver
from eaqhm_tpu.ops.solver import iqhm_gram, eaqhm_gram
from eaqhm_tpu.models import swipe as swipe_mod
from eaqhm_tpu.models import vad as vad_mod
from eaqhm_tpu.models.tracks import interpolate_tracks_anchors
from eaqhm_tpu.utils import io as io_mod

DEAD_TRACK_F0 = 140.0    # reference functions.py:209
DEAD_TRACK_AM = 1e-3     # reference functions.py:210 (10e-4)


def resample_f0_grid(f0s, tq, dtype=jnp.float64):
    """Linear row resampler == reference `getLinear` (functions.py:644-681).

    f0s: [T, C] rows with col 0 = time; tq: [Q] query times (must not exceed
    the last row time; the reference would raise / index out of bounds).
    Returns [Q, C] with col 0 = tq.
    """
    f0s = jnp.asarray(f0s, dtype)
    tq = jnp.asarray(tq, dtype)
    times = f0s[:, 0]
    T = f0s.shape[0]
    previ = jnp.searchsorted(times, tq, side="right") - 1
    below = previ < 0
    pc = jnp.clip(previ, 0, T - 1)
    nx = jnp.clip(pc + 1, 0, T - 1)
    denom = times[nx] - times[pc]
    g = jnp.where(denom != 0, (tq - times[pc]) / jnp.where(denom != 0, denom,
                                                           1.0), 0.0)
    g = jnp.where(below | (times[pc] == tq), 0.0, g)
    rows = f0s[pc, 1:] * (1 - g[:, None]) + f0s[nx, 1:] * g[:, None]
    rows = jnp.where(below[:, None], f0s[0, 1:], rows)
    return jnp.concatenate([tq[:, None], rows], axis=1)


@dataclass
class FramePlan:
    """Static per-utterance frame geometry (host)."""
    length: int
    n_ti: int
    centers: np.ndarray       # [No] 0-based window centers (ti - 1)
    voiced: np.ndarray        # [No] analyzed-frame mask
    W: int                    # static window half-width bound
    Kc: int                   # static harmonic bound (max per-frame K)
    Kmax: int                 # reference Kmax (reported)
    chunk: int = 128


@dataclass
class EaqhmResult:
    s_recon: np.ndarray
    srer: List[float]
    # dense per-instant deterministic components (reference DetComponents,
    # structs.py:7-22, packaged as arrays)
    det_ti: np.ndarray
    det_is_speech: np.ndarray
    det_is_voiced: np.ndarray
    det_a0: np.ndarray
    det_ak: np.ndarray
    det_frange: np.ndarray
    det_pk: np.ndarray
    elapsed: float = 0.0
    f0_grid: Optional[np.ndarray] = None
    timings: dict = field(default_factory=dict)
    # structured per-adaptation observability (SURVEY.md §5 metrics):
    # srer_db, seconds, accepted-harmonic count per adaptation
    metrics: List[dict] = field(default_factory=list)


def _pad_chunks(arrs, chunk):
    n = arrs[0].shape[0]
    npad = (-n) % chunk
    out = []
    for a in arrs:
        pad = [(0, npad)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, pad).reshape((n + npad) // chunk, chunk,
                                           *a.shape[1:]))
    return out, n


def _loud_enough(pos):
    """150 dB relative-amplitude acceptance gate (functions.py:303-312)."""
    absp = jnp.abs(pos)
    logamp = jnp.where(absp > 0,
                       20.0 * jnp.log10(jnp.where(absp > 0, absp, 1.0)),
                       -jnp.inf)
    maxlog = jnp.max(logamp, axis=1, keepdims=True)
    return logamp > maxlog - 150.0


def iqhm_accept(amps, voiced, f0, Kc: int, dtype):
    """Adaptation-0 acceptance + parameter extraction (functions.py:303-324,
    a == 0 branch: fmismatch == 0, fm = k*f0).  amps: [B, 2Kc+1] complex;
    voiced: [B] analyzed-frame mask; f0: [B].
    Returns (a0_val, am, fm, ph, acc) — [B] / [B, Kc] arrays.
    Shared by the per-utterance (engine) and batched (batch_engine) paths."""
    a0_val = jnp.real(amps[:, Kc]) * voiced
    pos = amps[:, Kc + 1:]                                  # [B, Kc]
    acc = voiced[:, None] & _loud_enough(pos)
    k1 = jnp.arange(1, Kc + 1)[None, :].astype(dtype)
    return a0_val, jnp.abs(pos), k1 * f0[:, None], jnp.angle(pos), acc


def eaqhm_accept(amps, fmis, fmc, dead, h, do_update, voiced, Kc: int):
    """Adaptation >=1 acceptance + fm update (functions.py:303-324, a > 0:
    150 dB gate AND |fmismatch| < h; fm <- fm + fmismatch gated on the
    stale-f0 test, with the dead-track bootstrap's 140 Hz overlay on the
    first harmonic).  voiced may be None when every row is analyzed.
    Returns (a0_val, am, fm, ph, acc).  Single source for both engines."""
    a0_val = jnp.real(amps[:, Kc])
    pos = amps[:, Kc + 1:]
    acc = _loud_enough(pos) & (jnp.abs(fmis) < h)
    if voiced is not None:
        a0_val = a0_val * voiced
        acc = voiced[:, None] & acc
    fmc_eff = jnp.where(dead[:, None] & (jnp.arange(Kc)[None, :] == 0),
                        DEAD_TRACK_F0, fmc)
    fm = jnp.where(do_update, fmc_eff + fmis, fmc_eff)
    return a0_val, jnp.abs(pos), fm, jnp.angle(pos), acc


def dead_overlay_windows(fm_k, am_k, rows, dead_center, dd, o, Kc: int):
    """Gather per-frame track windows with the dead-track bootstrap overlay
    (functions.py:204-210) applied with the reference's left-visibility
    semantics: a frame's window sees bootstrap values (fm=140 Hz, am=1e-3
    on harmonic 1) at dead centers strictly left of its own center, plus
    its own center when the frame itself is dead.  fm_k/am_k: [L, Kc];
    rows: [B, N] gather rows; dd: [B] this-frame-dead.  Shared by both
    engines."""
    fm_win = fm_k[rows]                                      # [B, N, Kc]
    am_win = am_k[rows]
    use = dead_center[rows] & ((o[None, :] < 0)
                               | ((o[None, :] == 0) & dd[:, None]))
    k0 = (jnp.arange(Kc) == 0)[None, None, :]
    fm_win = jnp.where(use[..., None] & k0, DEAD_TRACK_F0, fm_win)
    am_win = jnp.where(use[..., None] & k0, DEAD_TRACK_AM, am_win)
    return fm_win, am_win


def _combined_gather() -> bool:
    """Pack (fm, am, s, dead) into one table so each chunk does ONE
    row-gather instead of four (see _eaqhm_bucket).  Default ON pending
    the r5 trace A/B; EAQHM_COMBINED_GATHER=0 restores separate gathers."""
    return os.environ.get("EAQHM_COMBINED_GATHER", "1") != "0"


def _fused_solve() -> bool:
    """Solve placement: fused inside each chunk's lax.cond on every backend.

    Measured on TPU v5e (tools/bench_solve_sweep.py + ad-hoc probes,
    2026-08-21): hoisting the solve to one whole-tier batched call made the
    adaptation ~3x SLOWER (1.65 s vs 0.37 s) — the [4480, M, M] complex
    batch spills the recursion's intermediates to HBM (~150 GB/s effective
    through that path), while per-chunk [128, M, M] solves stay
    VMEM-resident.  On CPU the fused path additionally skips identity
    padding work via the chunk cond.  The non-fused branch is kept for
    future hardware where the trade flips."""
    return os.environ.get("EAQHM_FUSED", "1") != "0"


def _iqhm_stage(s, centers, f0, K, wl, voiced, W: int, Kc: int, fs: float,
                chunk: int, method=None):
    """Adaptation-0 analysis: batched stationary fits + acceptance.

    Both the normal-equation build AND the HPD solve run fused per lax.map
    chunk (_fused_solve; see its docstring for the measurement) — the
    non-fused whole-tier solve is the retained fallback.

    Returns per-frame (a0_val, am, fm, ph, acc) on the frame grid
    ([No], [No, Kc] ...).  Reference functions.py:183-324 (a == 0 branch).
    """
    dtype = s.dtype
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    o = jnp.arange(-W, W + 1)
    M = 2 * (2 * Kc + 1)

    (c_ch, f0_ch, K_ch, wl_ch), No = _pad_chunks(
        [jnp.asarray(centers), f0, K, wl], chunk)

    fused = _fused_solve()

    def do_chunk(args):
        c, f0c, Kc_, wlc = args

        def live(_):
            s_win = s[jnp.clip(c[:, None] + o[None, :], 0, s.shape[0] - 1)]
            R, rhs, dinv = iqhm_gram(s_win, o, jnp.maximum(wlc, 1), f0c,
                                     Kc_, fs, Kc, dtype=dtype)
            if fused:
                return (solver.solve_gram(R, rhs, dtype, method=method)
                        * dinv,)
            return R, rhs, dinv

        def empty(_):
            # identity systems: solve_gram returns x = 0 for them
            B = c.shape[0]
            if fused:
                return (jnp.zeros((B, M), cdtype),)
            return (jnp.broadcast_to(jnp.eye(M, dtype=cdtype), (B, M, M)),
                    jnp.zeros((B, M), cdtype), jnp.ones((B, M), dtype))

        # capacity-padded tiers: chunks holding only padding frames
        # (wl == 0) skip the basis/gram work entirely (lax.cond on TPU)
        return jax.lax.cond(jnp.any(wlc > 0), live, empty, 0)

    out = jax.lax.map(do_chunk, (c_ch, f0_ch, K_ch, wl_ch))
    if fused:
        x = out[0].reshape(-1, M)
    else:
        R, rhs, dinv = out
        x = solver.solve_gram(R.reshape(-1, M, M), rhs.reshape(-1, M),
                              dtype, method=method) * dinv.reshape(-1, M)
    amps, _ = solver.split_amps(x[:No], Kc)
    return iqhm_accept(amps, voiced, f0, Kc, dtype)


def _eaqhm_bucket(s, fm_current, am_current, centers, wl, dead, mask_k,
                  dead_center, h, do_update, W: int, Kc: int, fs: float,
                  chunk: int, method=None):
    """Adaptation >=1 analysis for one frame bucket: fits + acceptance.

    Reference functions.py:198-324 (a > 0 branch), including the dead-track
    bootstrap (fm=140 Hz, am=1e-3, functions.py:204-210) with its
    left-visibility semantics: the reference writes the bootstrap values
    into fm_current *as frames are processed left-to-right*, so a frame's
    window sees bootstrap centers only strictly left of its own center.
    `dead`/`mask_k`/`dead_center` are computed globally over all analyzed
    frames by the caller (windows overlap frames in other buckets).
    Track columns beyond this bucket's Kc are structurally zero (per-frame
    harmonic support never exceeds the adaptation-0 K, which fixes the
    bucket), so slicing fm/am windows to [:, :, :Kc] is exact.
    """
    dtype = s.dtype
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    L = s.shape[0]
    o = jnp.arange(-W, W + 1)
    centers = jnp.asarray(centers)

    fm_k = fm_current[:, :Kc]                # slice columns before gathering
    am_k = am_current[:, :Kc]
    fmc = fm_k[centers]                                      # [Nb, Kc]

    (c_ch, wl_ch, dead_ch, mk_ch), No = _pad_chunks(
        [centers, wl, dead, mask_k], chunk)

    M = 2 * (2 * Kc + 1)
    fused = _fused_solve()
    combined = _combined_gather()
    if combined:
        # one row-gather per chunk instead of four: pack (fm, am, s, dead)
        # into a [L, 2Kc+2] table (concat is ~2 HBM passes of ~17 MB,
        # negligible; each separate gather launch costs ~0.13-0.2 ms/chunk
        # on TPU — r5 device trace, tools/out/adapt_trace_r5.json)
        Dtab = jnp.concatenate(
            [fm_k, am_k, s[:, None],
             dead_center.astype(dtype)[:, None]], axis=1)

    def do_chunk(args):
        c, wlc, dd, mk = args

        def live(_):
            rows = jnp.clip(c[:, None] + o[None, :], 0, L - 1)
            if combined:
                d = Dtab[rows]                       # [B, N, 2Kc+2]
                fm_win = d[..., :Kc]
                am_win = d[..., Kc:2 * Kc]
                s_win = d[..., 2 * Kc]
                use = (d[..., 2 * Kc + 1] != 0) & (
                    (o[None, :] < 0) | ((o[None, :] == 0) & dd[:, None]))
                k0 = (jnp.arange(Kc) == 0)[None, None, :]
                fm_win = jnp.where(use[..., None] & k0, DEAD_TRACK_F0,
                                   fm_win)
                am_win = jnp.where(use[..., None] & k0, DEAD_TRACK_AM,
                                   am_win)
            else:
                s_win = s[rows]
                fm_win, am_win = dead_overlay_windows(
                    fm_k, am_k, rows, dead_center, dd, o, Kc)
            R, rhs, dinv = eaqhm_gram(s_win, fm_win, am_win, o,
                                      jnp.maximum(wlc, 1), mk, fs,
                                      dtype=dtype)
            if fused:
                return (solver.solve_gram(R, rhs, dtype, method=method)
                        * dinv,)
            return R, rhs, dinv

        def empty(_):
            B = c.shape[0]
            if fused:
                return (jnp.zeros((B, M), cdtype),)
            return (jnp.broadcast_to(jnp.eye(M, dtype=cdtype), (B, M, M)),
                    jnp.zeros((B, M), cdtype), jnp.ones((B, M), dtype))

        return jax.lax.cond(jnp.any(wlc > 0), live, empty, 0)

    out = jax.lax.map(do_chunk, (c_ch, wl_ch, dead_ch, mk_ch))
    if fused:
        x = out[0].reshape(-1, M)
    else:
        R, rhs, dinv = out
        x = solver.solve_gram(R.reshape(-1, M, M), rhs.reshape(-1, M),
                              dtype, method=method) * dinv.reshape(-1, M)
    mask_pad = jnp.pad(mask_k, ((0, x.shape[0] - No), (0, 0)))
    amps, _, fmis = solver.eaqhm_extract(x, mask_pad, Kc, fs)
    amps = amps[:No]
    fmis = fmis[:No]
    return eaqhm_accept(amps, fmis, fmc, dead, h, do_update, None, Kc)


# Bounded LRU (matches swipe.make_plan's maxsize=16): each entry pins a
# compiled SWIPE'+resample callable for one (fs, plim, Lpad page, grid)
# combination.  Geometry quantization keeps distinct utterances on few
# pages, so 16 covers realistic corpora; heterogeneous 10k-utterance runs
# evict oldest-first instead of growing without bound (VERDICT r2 weak #8).
_PITCH_JIT_CACHE_MAX = 16
_PITCH_JIT_CACHE = OrderedDict()
# parallel.streams drives analyze() from one thread per device; the LRU
# mutations below must not interleave
_PITCH_JIT_LOCK = threading.Lock()


def _pitch_fn(plan, grid_step: int, length: int, dtype=None, device=None):
    """One fused jit: SWIPE' + 5 ms f0-grid resample (minimizes dispatches;
    each device call costs ~30 ms through the remote tunnel).

    device: non-None pins execution to that device (per-device utterance
    streams, parallel.streams): the callable is a plain jit dispatched on
    the committed input instead of the default-device AOT executable."""
    # key on the plan's defining parameters (id() could be reused after the
    # make_plan lru cache evicts an entry)
    if dtype is None:
        dtype = (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    key = (plan.fs, float(plan.pc[0]), float(plan.pc[-1]), plan.length,
           grid_step, length, jnp.dtype(dtype).name,
           None if device is None else str(device))
    with _PITCH_JIT_LOCK:
        return _pitch_fn_locked(plan, grid_step, length, dtype, device, key)


def _pitch_fn_locked(plan, grid_step, length, dtype, device, key):
    if key in _PITCH_JIT_CACHE:
        _PITCH_JIT_CACHE.move_to_end(key)
    else:
        while len(_PITCH_JIT_CACHE) >= _PITCH_JIT_CACHE_MAX:
            _PITCH_JIT_CACHE.popitem(last=False)
        t_grid = np.arange(0, length - 1, grid_step) / plan.fs

        @jax.jit
        def _eaqhm_pitch_swipe(x):
            f0s = swipe_mod.swipep(plan, x, dtype=x.dtype)
            grid = resample_f0_grid(f0s, jnp.asarray(t_grid, x.dtype),
                                    dtype=x.dtype)
            return f0s, grid

        # Compile OUTSIDE the persistent compilation cache.  Measured on
        # the axon TPU backend (2026-08-21, tools/out/bench_history.jsonl):
        # loading this program's DESERIALIZED cache entry onto the device
        # takes 98-126 s (reproducibly, entry key f2293951..; the FFT
        # custom-call is the prime suspect) while compiling it fresh takes
        # ~3 s.  The adaptation programs don't exhibit this (130 MB
        # entries load in ~6 s), so only the pitch program opts out.
        # Belt-and-braces: cache writes are asynchronous in jax, so a
        # pitch entry can land even with the flag toggled off around the
        # compile — purge on-disk entries for THIS closure only (the
        # closure's unique name scopes the glob; purging a generic
        # "jit_fn-*" prefix would delete unrelated programs sharing the
        # cache dir).
        cache_dir = getattr(jax.config, "jax_compilation_cache_dir", None)
        if cache_dir and os.path.isdir(cache_dir):
            import glob as _glob
            for p in _glob.glob(
                    os.path.join(cache_dir, "jit__eaqhm_pitch_swipe-*")):
                try:
                    os.remove(p)
                except OSError:
                    pass
        if device is not None:
            # stream mode: committed input selects the device; AOT would
            # pin to the default device
            _PITCH_JIT_CACHE[key] = _eaqhm_pitch_swipe
            return _PITCH_JIT_CACHE[key]
        try:
            cache_flag = jax.config.jax_enable_compilation_cache
            jax.config.update("jax_enable_compilation_cache", False)
            try:
                compiled = _eaqhm_pitch_swipe.lower(
                    jax.ShapeDtypeStruct((length,), dtype)).compile()
            finally:
                jax.config.update("jax_enable_compilation_cache",
                                  cache_flag)
            _PITCH_JIT_CACHE[key] = compiled
        except Exception:   # AOT unavailable: fall back to lazy jit
            _PITCH_JIT_CACHE[key] = _eaqhm_pitch_swipe
    return _PITCH_JIT_CACHE[key]


def _combine_buckets(parts, idx_list, No: int, Kcm: int, dtype):
    """Scatter per-bucket frame results back onto the full frame grid.

    parts: list of (a0_val [Nb], am/fm/ph [Nb, Kb], acc [Nb, Kb]);
    idx_list: list of [Nb] frame indices — index No is a dump row for
    bucket-size-quantization padding entries (sliced off).  Returns
    full-grid arrays ([No], [No, Kcm] x3, acc [No, Kcm]).
    """
    a0 = jnp.zeros(No + 1, dtype)
    am = jnp.zeros((No + 1, Kcm), dtype)
    fm = jnp.zeros((No + 1, Kcm), dtype)
    ph = jnp.zeros((No + 1, Kcm), dtype)
    acc = jnp.zeros((No + 1, Kcm), bool)

    def padk(x, fill=0):
        kpad = Kcm - x.shape[1]
        return jnp.pad(x, ((0, 0), (0, kpad)), constant_values=fill)

    for (a0_b, am_b, fm_b, ph_b, acc_b), idx in zip(parts, idx_list):
        a0 = a0.at[idx].set(a0_b)
        am = am.at[idx].set(padk(am_b))
        fm = fm.at[idx].set(padk(fm_b))
        ph = ph.at[idx].set(padk(ph_b))
        acc = acc.at[idx].set(padk(acc_b, False))
    return a0[:No], am[:No], fm[:No], ph[:No], acc[:No]


def _masked_srer(det, s_rec, std_det, n_valid):
    """SRER over the first n_valid samples (padded tail excluded) —
    identical to 20*log10(std_det/std(det - s_rec)) when n_valid == len
    (reference functions.py:388)."""
    dtype = det.dtype
    resid = det - s_rec
    m = (jnp.arange(resid.shape[0]) < n_valid).astype(dtype)
    n = jnp.maximum(n_valid.astype(dtype), 1.0)
    mu = jnp.sum(resid * m) / n
    sd = jnp.sqrt(jnp.sum(m * (resid - mu) ** 2) / n)
    return 20.0 * jnp.log10(std_det / sd)


@partial(jax.jit,
         static_argnames=("geom", "fs", "chunk", "length", "step", "No",
                          "method"))
def _adapt0_full(s, buckets, centers, det, std_det, n_valid, geom, fs: float,
                 chunk: int, length: int, step: int, No: int, method=None):
    """Whole adaptation 0 as ONE device dispatch: bucketed analysis +
    tracks + synthesis + SRER.

    buckets: tuple of (idx, centers_b, f0_b, K_b, wl_b) arrays per bucket;
    geom: tuple of (W_b, Kc_b) static shapes, Kcm = max Kc_b.
    """
    dtype = s.dtype
    Kcm = max(k for _, k in geom)
    with jax.default_matmul_precision("highest"):
        parts = []
        for (idx, c_b, f0_b, K_b, wl_b), (Wb, Kb) in zip(buckets, geom):
            vo_b = jnp.ones(c_b.shape[0], bool)
            parts.append(_iqhm_stage(s, c_b, f0_b, K_b, wl_b, vo_b,
                                     W=Wb, Kc=Kb, fs=fs, chunk=chunk,
                                     method=method))
        a0_v, am_v, fm_v, ph_v, acc_v = _combine_buckets(
            parts, [b[0] for b in buckets], No, Kcm, dtype)
        voiced = jnp.zeros(No + 1, bool)
        for b in buckets:
            voiced = voiced.at[b[0]].set(True)
        voiced = voiced[:No]
        a0_i, am_f, fm_f, ph_f, fm_cur, s_rec = _scatter_and_interp(
            a0_v, am_v, fm_v, ph_v, acc_v, centers, length, step, fs, voiced)
    srer = _masked_srer(det, s_rec, std_det, n_valid)
    return a0_i, am_f, fm_f, ph_f, fm_cur, s_rec, srer


@partial(jax.jit,
         static_argnames=("geom", "fs", "chunk", "length", "step", "No",
                          "method"))
def _adapt_full(s, fm_current, am_current, buckets, centers, h, do_update,
                det, std_det, n_valid, geom, fs: float, chunk: int,
                length: int, step: int, No: int, method=None):
    """Whole adaptation >=1 as ONE device dispatch, bucketed.

    The dead-track bootstrap's left-visibility overlay (functions.py:204-210)
    is computed globally over ALL analyzed frames before the per-bucket
    solves, so every bucket's windows see every dead frame's overlay exactly
    as the reference's sequential in-place writes would.
    """
    dtype = s.dtype
    Kcm = max(k for _, k in geom)
    L = s.shape[0]
    with jax.default_matmul_precision("highest"):
        # global dead/selected-harmonic masks (reference functions.py:202-210)
        all_centers = jnp.concatenate([b[1] for b in buckets])
        # bucket-size-quantization padding entries (idx == No) must not
        # enter the dead overlay (their center is a dummy sample)
        real_all = jnp.concatenate([b[0] for b in buckets]) < No
        fmc_all = fm_current[all_centers]                     # [Nv, Kcm]
        mask_all = (fmc_all != 0) & real_all[:, None]
        dead_all = ~jnp.any(mask_all, axis=1) & real_all
        dead_center = jnp.zeros(L, bool).at[all_centers].set(dead_all)

        parts = []
        off = 0
        for (idx, c_b, wl_b), (Wb, Kb) in zip(buckets, geom):
            nb = c_b.shape[0]
            dd_b = dead_all[off:off + nb]
            mk_b = mask_all[off:off + nb, :Kb]
            mk_b = jnp.where(dd_b[:, None], jnp.arange(Kb)[None, :] == 0,
                             mk_b)
            parts.append(_eaqhm_bucket(
                s, fm_current, am_current, c_b, wl_b, dd_b, mk_b,
                dead_center, h, do_update, W=Wb, Kc=Kb, fs=fs, chunk=chunk,
                method=method))
            off += nb
        a0_v, am_v, fm_v, ph_v, acc_v = _combine_buckets(
            parts, [b[0] for b in buckets], No, Kcm, dtype)
        voiced = jnp.zeros(No + 1, bool)
        for b in buckets:
            voiced = voiced.at[b[0]].set(True)
        voiced = voiced[:No]
        a0_i, am_f, fm_f, ph_f, fm_cur, s_rec = _scatter_and_interp(
            a0_v, am_v, fm_v, ph_v, acc_v, centers, length, step, fs, voiced)
    srer = _masked_srer(det, s_rec, std_det, n_valid)
    return a0_i, am_f, fm_f, ph_f, fm_cur, s_rec, srer


@partial(jax.jit, static_argnames=("length", "step", "fs"))
def _scatter_and_interp(a0_val, am, fm, ph, acc, centers, length: int,
                        step: int, fs: float, voiced):
    """Scatter frame results to dense tracks, interpolate, synthesize."""
    # DC track: not-a-knot cubic over ALL analysis instants, extrapolated
    # (reference functions.py:340); the analysis grid is uniform
    # (ti = arange(1, length, step)) so the uniform fast path applies
    yv = jnp.where(voiced, a0_val, 0.0)
    a0_interp = interp.notaknot_interp_uniform(yv, step, length)

    # harmonic tracks: anchor values feed the interpolator directly — the
    # dense scattered arrays the reference materializes (functions.py:299)
    # are implied (off-anchor rows are zero) and never built
    am_f, fm_f, ph_f, fm_cur = interpolate_tracks_anchors(
        jnp.where(acc, am, 0.0), jnp.where(acc, fm, 0.0),
        jnp.where(acc, ph, 0.0), int(step), float(fs), length)

    s_rec = a0_interp + 2.0 * jnp.sum(am_f * jnp.cos(ph_f), axis=1)
    return a0_interp, am_f, fm_f, ph_f, fm_cur, s_rec


@partial(jax.jit,
         static_argnames=("geom", "fs", "chunk", "length", "step", "No",
                          "method", "max_adpt"))
def _adapt_loop_full(s, buckets0, bucketsN, centers, f0_stale, do_update,
                     det, std_det, n_valid, geom, fs: float, chunk: int,
                     length: int, step: int, No: int, method,
                     max_adpt: int):
    """The ENTIRE adaptation phase as ONE device dispatch: adaptation 0,
    the eaQHM loop (lax.while_loop), the keep-previous-on-decline rule
    (reference functions.py:394-402) and the DetComponents packaging gather.

    The host-driven loop pays one dispatch + one scalar-fetch round trip
    per adaptation (~40-60 ms each through the remote TPU tunnel, vs a
    ~132 ms device step — tools/profile_adapt.py device trace); fusing the
    loop removes every per-adaptation host sync.  The while_loop stops
    EXACTLY at the reference's decline test, so no speculative work is
    wasted and the device queue is never left with orphan steps.

    Returns (srer_hist [max_adpt+1], n_done, pkg_stk, pkg_vec): entries
    srer_hist[:n_done] are valid; pkg_* hold the kept (last-improving)
    adaptation's packaged DetComponents + reconstruction.
    """
    dtype = s.dtype
    h_base = jnp.asarray(f0_stale, dtype)
    (a0_i, am_f, fm_f, ph_f, fm_cur, s_rec, srer0) = _adapt0_full(
        s, buckets0, centers, det, std_det, n_valid, geom=geom, fs=fs,
        chunk=chunk, length=length, step=step, No=No, method=method)
    stk0, vec0 = _package_strided(am_f, fm_f, ph_f, a0_i, s_rec, step, No)
    # sentinel 0.0 (not NaN: the CI tier runs under jax_debug_nans);
    # entries beyond n_done are never read
    hist = jnp.zeros(max_adpt + 1, dtype).at[0].set(srer0)

    def cond(c):
        a, *_, stop = c
        return (a <= max_adpt) & ~stop

    def body(c):
        (a, fm_c, am_c, prev_srer, pstk, pvec, hist, _stop) = c
        h = h_base / (a + 1).astype(dtype)
        (a0_i, am_f, fm_f, ph_f, fm_n, s_rec, srer) = _adapt_full(
            s, fm_c, am_c, bucketsN, centers, h, do_update, det, std_det,
            n_valid, geom=geom, fs=fs, chunk=chunk, length=length,
            step=step, No=No, method=method)
        improved = srer > prev_srer
        nstk, nvec = _package_strided(am_f, fm_f, ph_f, a0_i, s_rec, step,
                                      No)
        pstk = jnp.where(improved, nstk, pstk)
        pvec = jnp.where(improved, nvec, pvec)
        hist = hist.at[a].set(srer)
        return (a + 1, fm_n, am_f, srer, pstk, pvec, hist, ~improved)

    init = (jnp.asarray(1, jnp.int32), fm_cur, am_f, srer0, stk0, vec0,
            hist, jnp.asarray(False))
    a_end, _fm, _am, _srer, pstk, pvec, hist, stop = jax.lax.while_loop(
        cond, body, init)
    # a_end = 1 + last computed adaptation index; entries 0..a_end-1 valid
    return hist, a_end, pstk, pvec


@partial(jax.jit, static_argnames=("step", "No"))
def _package_strided(am, fm, ph, a0, s_recon, step: int, No: int):
    """DetComponents packaging via STRIDED SLICES: the analysis grid is
    uniform (centers = arange(No) * step, all < length), so the anchor rows
    are a strided slice of the dense tracks — measured 8.6 ms as an XLA
    gather vs ~1 ms as a slice (fusion.19 in the r5 device trace).
    Returns (stk [3, No, Kc], vec [No + L])."""
    hi = (No - 1) * step + 1

    def rows(x):
        return x[:hi:step]

    stk = jnp.stack([rows(am), rows(fm), rows(ph)])
    vec = jnp.concatenate([rows(a0), s_recon])
    return stk, vec


@jax.jit
def _package(am, fm, ph, a0, s_recon, centers):
    """Fused DetComponents gather: stack the three [No, Kc] track gathers
    into one array and concatenate the two vectors, so packaging is one
    device dispatch + two host transfers (reference functions.py:404-411)."""
    stk = jnp.stack([am[centers], fm[centers], ph[centers]])
    vec = jnp.concatenate([a0[centers], s_recon])
    return stk, vec


def analyze(signal, fs: int, config: EaqhmConfig = EaqhmConfig(),
            verbose: bool = False, device=None) -> EaqhmResult:
    """Full eaQHM analysis/synthesis of one utterance.

    Mirrors reference `eaQHMAnalysisAndSynthesis(speechFile, ...)`
    (functions.py:35-418) with a host-side adaptation loop around jitted
    per-adaptation device work.

    device: optional jax.Device — commits every uploaded array to that
    device so the whole utterance executes there (per-device utterance
    streams, parallel.streams; computation follows committed inputs).
    """
    from eaqhm_tpu import ensure_compile_cache
    ensure_compile_cache()      # persistent cache, non-CPU backends only
    t_start = time.time()

    def _up(x, dt=None):
        """Host->device upload, committed to `device` in stream mode."""
        a = np.asarray(x, dt) if dt is not None else np.asarray(x)
        if device is None:
            return jnp.asarray(a)
        return jax.device_put(a, device)
    if config.dtype == "auto":
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    else:
        dtype = jnp.float64 if config.dtype == "float64" else jnp.float32
    if dtype == jnp.float64 and not jax.config.jax_enable_x64:
        raise ValueError(
            "dtype='float64' requires jax_enable_x64 (use dtype='auto' or "
            "'float32' on backends without f64)")
    s_np = np.asarray(signal, np.float64).ravel()
    length = int(s_np.shape[0])
    fs = int(fs)
    step = int(config.step)

    if config.fc > 0:
        # pre-analysis high-pass in host f64 (f32 elliptic recursions near
        # the unit circle diverge; see vad.voiced_unvoiced_frames_host)
        from scipy.signal import filtfilt as _filtfilt
        b, a_, _ = filters.design_ellip(fs, config.fc, "highpass")
        s_np = _filtfilt(b, a_, s_np)

    # ---- shape quantization (compile-cache sharing across utterances):
    # jit-visible shapes derive from the padded Lpad; all *semantics*
    # (margins, VAD, SRER, Kmax) derive from the true length ----
    LQ = 4096
    Lpad = ((length + LQ - 1) // LQ) * LQ if config.quantize_geometry \
        else length
    stage_t = {}
    t_s = time.time()
    s = _up(np.pad(s_np, (0, Lpad - length)), dtype)
    stage_t["signal_upload"] = time.time() - t_s

    f0min, f0max = config.pitch_limits

    # ---- pitch (SWIPE') + 5 ms f0 grid (one fused device dispatch) ----
    t_s = time.time()
    plan = swipe_mod.make_plan(float(fs), float(f0min), float(f0max), Lpad)
    stage_t["pitch_plan"] = time.time() - t_s
    grid_step = int(round(fs * 5 / 1000))
    Ng_true = len(np.arange(0, length - 1, grid_step))
    if config.replicate_quirks:
        # reference getLinear raises when a 5 ms-grid query lies beyond the
        # last SWIPE' pitch row (extrapolation factor outside [0,1],
        # functions.py:676-677); non-quirk mode clamps instead
        t_last = (Ng_true - 1) * grid_step / fs
        t_swipe_last = np.arange(0, length / fs, 0.001)[-1]
        if t_last > t_swipe_last:
            raise ValueError(
                "Can't interpolate f0 grid: query time "
                f"{t_last:.6f}s exceeds last pitch row {t_swipe_last:.6f}s "
                "(reference getLinear raise, functions.py:676-677)")
    t_s = time.time()
    with jax.profiler.TraceAnnotation("eaqhm/pitch"):
        # async dispatch: JAX returns futures; the host VAD below runs
        # while the device computes SWIPE', and the f0-grid fetch after it
        # is the only sync point
        f0s, f0_grid = _pitch_fn(plan, grid_step, Lpad, s.dtype,
                                 device=device)(s)
    stage_t["pitch_dispatch"] = time.time() - t_s

    # ---- VAD (host f64; exact reference parity) + fullWaveform fixup ----
    t_s = time.time()
    vti, v_sp, v_vo, frame_step = vad_mod.voiced_unvoiced_frames_host(
        s_np, fs, config.is_male,
        replicate_quirks=config.replicate_quirks)
    stage_t["vad"] = time.time() - t_s

    t_s = time.time()
    with jax.profiler.TraceAnnotation("eaqhm/pitch_fetch"):
        f0_grid_np = np.asarray(f0_grid)
    stage_t["pitch"] = time.time() - t_s

    Fmax = int(fs / 2 - 200)
    if config.partials > 0:
        Kmax = int(config.partials)
    else:
        # min over the TRUE-length grid rows only (padded-tail rows estimate
        # pitch on silence and would corrupt the Kmax derivation)
        Kmax = int(round(Fmax / f0_grid_np[:Ng_true, 1].min()) + 10)
    t_s = time.time()
    margin = config.margin_samples
    if config.full_waveform:
        # numpy in, numpy out: keep the VAD/flag stage entirely host-side
        # (a jnp round-trip here is a tunnel dispatch on the TPU backend)
        v_sp, v_vo = vad_mod.full_waveform_fixup(
            vti, np.asarray(v_sp), np.asarray(v_vo), margin, length)
        det = s_np
    else:
        mask = vad_mod.deterministic_part_mask(
            vti, np.asarray(v_sp), np.asarray(v_vo), frame_step, length)
        det = s_np * mask
    v_vo_np = np.asarray(v_vo)
    v_sp_np = np.asarray(v_sp)
    std_det = float(np.std(det))
    det_j = _up(np.pad(det, (0, Lpad - length)), dtype)

    # ---- frame geometry (host; static shapes for jit) ----
    # anchor/scatter grid spans the padded length (static shapes); frames
    # beyond the true grid are never voiced and never bucketed
    ti_pad = np.arange(1, Lpad, step)
    No_pad = len(ti_pad)
    centers = ti_pad - 1
    ti = ti_pad[:len(np.arange(1, length, step))]
    No_ti = len(ti)
    framei = ti / frame_step
    fi = framei.astype(int)
    in_margin = (ti > margin) & (ti < length - margin)
    fi_prev = np.clip(fi - 1, 0, len(v_vo_np) - 1)
    fi_c = np.clip(fi, 0, len(v_vo_np) - 1)
    voiced = in_margin & v_vo_np[fi_prev] & v_vo_np[fi_c]

    # per-frame f0 at adaptation 0 (functions.py:183-185)
    dec = framei - fi
    g1 = f0_grid_np[fi_prev, 1]
    g2 = f0_grid_np[fi_c, 1]
    f0_frame = (1 - dec) * g1 + dec * g2
    K_frame = np.minimum(Kmax, (Fmax / f0_frame).astype(int))
    wl_frame = np.maximum(120, np.round(
        (config.pitch_periods / 2) * fs / f0_frame)).astype(int)
    wl_frame = np.where(voiced, wl_frame, 0)

    voiced_idx = np.nonzero(voiced)[0]
    if len(voiced_idx) == 0:
        raise ValueError("no voiced frames to analyze")
    f0_stale = float(f0_frame[voiced_idx[-1]])   # quirk #1 (SURVEY §2.5)

    W = int(wl_frame.max())
    Kc = int(K_frame[voiced].max())
    fplan = FramePlan(length=length, n_ti=No_ti, centers=centers[:No_ti],
                      voiced=voiced, W=W, Kc=Kc, Kmax=Kmax,
                      chunk=int(config.chunk))

    # ---- bucket voiced frames by harmonic count (solve cost ~ M^3 with
    # M = 2(2K+1); padding every frame to the global Kc wastes ~3x flops
    # on typical speech — SA19: 55% of frames need K<=32 vs Kc=48).
    #
    # With quantize_geometry every jit-visible shape is a function of
    # (Lpad page, config, fs) ONLY: the tier list and per-tier (W, K)
    # bounds derive from the pitch floor, and every tier is
    # capacity-padded to the full frame grid — chunks holding only
    # padding skip their solves via lax.cond, so runtime still scales
    # with the actual voiced-frame count while any utterance that lands
    # on the same length page reuses every compiled kernel.
    K_v = K_frame[voiced_idx]
    wl_v = wl_frame[voiced_idx]
    # Harmonic tier lattice.  The round-3 "MXU-aligned" lattice
    # (23,31,...,255: K ≡ 7 mod 8 puts M = 4K+2 just under the 128-lane
    # tile boundary) was REVERTED by the round-4 on-chip bisect: it showed
    # no measurable speedup (tile-spill cost is hidden behind the
    # HIGHEST-precision gram passes) and pushing SA19's K=48 frames into a
    # K=63 (M=254) tier collapsed the f32 complex block-inverse (SRER
    # declined at adaptation 1; tools/out/bench_history.jsonl, config E).
    K_LATTICE = (24, 32, 40, 48, 64, 96, 128, 192, 256)
    pp2 = config.pitch_periods / 2

    if config.quantize_geometry:
        # static bounds from the pitch floor (fine-tune can dip 1/768
        # octave below f0min — reference SWIPE.py:108-131)
        f0_floor = f0min * 2.0 ** (-1.0 / 768.0)
        if config.partials > 0:
            Kc_bound = int(config.partials)
        else:
            Kc_bound = int(round(Fmax / f0_floor) + 10) + 1
        Kc_bq = next((t for t in K_LATTICE if t >= Kc_bound), Kc_bound)
        tiers = [t for t in K_LATTICE if t < Kc_bq] + [Kc_bq]

        def tier_W(tk, top):
            # frames in tier tk have K = int(Fmax/f0) <= tk, i.e.
            # f0 > Fmax/(tk+1) -> wl < max(120, pp2*fs*(tk+1)/Fmax);
            # the top tier (K capped at Kmax) sees f0 down to the floor
            if top:
                w = max(120, int(np.ceil(pp2 * fs / f0_floor)))
            else:
                w = max(120, int(np.ceil(pp2 * fs * (tk + 1) / Fmax)))
            return -(-w // 8) * 8

        tW = [tier_W(tk, i == len(tiers) - 1) for i, tk in enumerate(tiers)]
        # tier assignment needs BOTH bounds to hold (wl is data)
        tsel = np.searchsorted(tiers, K_v)
        for i, w in enumerate(tW):
            tsel = np.where((tsel == i) & (wl_v > w), i + 1, tsel)
        if tsel.max(initial=0) >= len(tiers):
            # out-of-model frame (shouldn't happen) — widen the top tier
            tsel = np.minimum(tsel, len(tiers) - 1)
            tW[-1] = max(tW[-1], -(-int(wl_v.max()) // 8) * 8)
        cap = -(-(No_pad + 1) // fplan.chunk) * fplan.chunk
        buckets = []
        geom = []
        for i, tk in enumerate(tiers):
            gi = voiced_idx[tsel == i]
            if len(gi) == 0:
                # unoccupied tier: drop it from the jit geometry — the
                # compiled program shrinks (warmup) and its empty-chunk
                # cond iterations disappear (runtime).  The compile cache
                # keys on the occupied-tier tuple, so utterances sharing a
                # length page AND occupancy pattern still share kernels
                # (occupancy patterns per preset are few in practice).
                continue
            buckets.append((gi, cap))
            geom.append((tW[i], tk))
    else:
        bucket_tier = np.searchsorted(
            [t for t in K_LATTICE if t < Kc] + [Kc], K_v)
        tiers_e = [t for t in K_LATTICE if t < Kc] + [Kc]
        buckets = []
        geom = []
        min_bucket = max(256, len(voiced_idx) // 16)
        pending_idx = []
        for b in range(len(tiers_e)):
            sel = bucket_tier == b
            if not sel.any():
                continue
            pending_idx.append(np.nonzero(sel)[0])
            # merge undersized buckets upward (compile > solve savings)
            if (sum(len(p) for p in pending_idx) < min_bucket
                    and b < len(tiers_e) - 1):
                continue
            vsel = np.concatenate(pending_idx)
            pending_idx = []
            gi = voiced_idx[vsel]
            buckets.append((gi, len(gi)))
            geom.append((int(wl_v[vsel].max()), int(K_v[vsel].max())))

    def _padded(gi, vals, fill, n):
        # pad to the bucket's capacity: dump-index scatter + zero windows
        # make the padding numerically inert; all-padding chunks skip their
        # solves via lax.cond inside the stage
        pad = n - len(gi)
        return np.concatenate([vals, np.full(pad, fill, vals.dtype)])

    # device bucket tensors are identical across adaptations: build + upload
    # ONCE (each jnp.asarray is a separate host->device transfer through the
    # tunnel; re-uploading ~10 arrays per adaptation cost ~20 ms each step)
    bucket_args0 = tuple(
        (_up(_padded(gi, gi, No_pad, n)),
         _up(_padded(gi, centers[gi], 0, n)),
         _up(_padded(gi, f0_frame[gi], 100.0, n), dtype),
         _up(_padded(gi, K_frame[gi], 0, n)),
         _up(_padded(gi, wl_frame[gi], 0, n)))
        for gi, n in buckets)
    # padding entries: dump frame index No_pad, dummy center 0, wl 0
    # (zero window -> identity solve), K 0 (no live columns)
    bucket_argsN = tuple(
        (_up(_padded(gi, gi, No_pad, n)),
         _up(_padded(gi, centers[gi], 0, n)),
         _up(_padded(gi, wl_frame[gi], 0, n)))
        for gi, n in buckets)

    geom = tuple(geom)
    centers_j = _up(centers)
    n_valid = _up(length, jnp.int32)
    std_det_j = _up(std_det, dtype)
    method = None if config.solve_method == "auto" else config.solve_method
    stage_t["host_geometry"] = time.time() - t_s

    srer: List[float] = []
    fm_cur = am_cur = None
    timings = {}
    metrics: List[dict] = []

    # ---- fused adaptation loop: ONE dispatch for the whole phase ----
    fused_env = os.environ.get("EAQHM_FUSED_LOOP")
    fused_on = (config.fused_adapt_loop if fused_env is None
                else fused_env != "0")
    use_fused = (fused_on and config.stop_on_decline
                 and not config.collect_metrics)
    if use_fused:
        t_a = time.time()
        with jax.profiler.TraceAnnotation("eaqhm/adapt_loop"):
            hist_d, n_done_d, stk_d, vec_d = _adapt_loop_full(
                s, bucket_args0, bucket_argsN, centers_j,
                f0_stale, bool(f0_stale > f0min), det_j, std_det_j, n_valid,
                geom=geom, fs=float(fs), chunk=fplan.chunk, length=Lpad,
                step=step, No=No_pad, method=method,
                max_adpt=int(config.max_adaptations))
            n_done = int(n_done_d)
            hist_np = np.asarray(hist_d, np.float64)
            fetched = (np.asarray(stk_d), np.asarray(vec_d))
        srer = [float(x) for x in hist_np[:n_done]]
        dt = time.time() - t_a
        timings["adapt_loop"] = dt
        for a, v in enumerate(srer):
            metrics.append({"adaptation": a, "srer_db": v,
                            "seconds": dt / max(n_done, 1)})
            if verbose:
                print(f"SRER: {v} dB in Adaptation No: {a}")
        return _finish_result(
            srer, fetched, centers, No_ti, length, in_margin, voiced,
            t_start, f0_grid_np, timings, stage_t, metrics)

    # loadingScreen analogue (reference functions.py:173-181): live bar over
    # the adaptation loop with the SRER trajectory as it lands
    from eaqhm_tpu.utils.progress import progress_bar
    bar = progress_bar(total=config.max_adaptations + 1, desc="adaptations",
                       enabled=config.loading_screen)

    pending = None    # device-side best package awaiting fetch
    fetched = None    # host copy of the best package
    for a in range(config.max_adaptations + 1):
        t_a = time.time()
        with jax.profiler.TraceAnnotation(f"eaqhm/adaptation_{a}"):
            if a == 0:
                (a0_i, am_f, fm_f, ph_f, fm_cur, s_rec, srer_d) = _adapt0_full(
                    s, bucket_args0, centers_j, det_j,
                    std_det_j, n_valid,
                    geom=geom, fs=float(fs), chunk=fplan.chunk, length=Lpad,
                    step=step, No=No_pad, method=method)
            else:
                h = f0_stale / (a + 1)
                (a0_i, am_f, fm_f, ph_f, fm_cur, s_rec, srer_d) = _adapt_full(
                    s, fm_cur, am_cur, bucket_argsN, centers_j,
                    jnp.asarray(h, dtype), bool(f0_stale > f0min), det_j,
                    std_det_j, n_valid,
                    geom=geom, fs=float(fs), chunk=fplan.chunk, length=Lpad,
                    step=step, No=No_pad, method=method)
            am_cur = am_f
            # fetch the previous best's package while THIS adaptation
            # computes: its gather was dispatched last iteration (already
            # complete on the serial device queue), so the ~2.5 MB D2H
            # tunnel transfer overlaps the current device work instead of
            # stalling after the loop
            if pending is not None:
                fetched = (np.asarray(pending[0]), np.asarray(pending[1]))
                pending = None
            cur = float(srer_d)
        srer.append(cur)
        dt = time.time() - t_a
        timings[f"adaptation_{a}"] = dt
        m = {"adaptation": a, "srer_db": cur, "seconds": dt}
        if config.collect_metrics:
            m["accepted_harmonics"] = int(np.count_nonzero(
                np.asarray(am_f[centers_j])))
        metrics.append(m)
        if bar is not None:
            bar.set_postfix_str(f"SRER {cur:.3f} dB")
            bar.update(1)
        if verbose:
            print(f"SRER: {cur} dB in Adaptation No: {a}")
        if a != 0 and srer[a] <= srer[a - 1]:
            if config.stop_on_decline:
                break
            if srer[a] <= max(srer[:a]):
                continue    # diagnostic mode: keep best-so-far, keep going
        # fused DetComponents gather dispatched NOW (async); the host
        # fetches it one step behind, overlapped with the next
        # adaptation's device compute (the declining final adaptation
        # never updates best, so the kept snapshot's fetch is hidden)
        pending = _package(am_f, fm_f, ph_f, a0_i, s_rec, centers_j)
        fetched = None

    if bar is not None:
        bar.close()

    # ---- package DetComponents (reference functions.py:404-411) ----
    # gather the analysis instants on-device: transfers [No, K] (~1 MB)
    # instead of the dense [length, K] tracks (~15 MB each via the tunnel);
    # one fused dispatch + two transfers (usually already fetched inside
    # the loop) instead of five sequential dispatch+transfer round trips
    if fetched is None:
        fetched = (np.asarray(pending[0]), np.asarray(pending[1]))
    return _finish_result(srer, fetched, centers, No_ti, length, in_margin,
                          voiced, t_start, f0_grid_np, timings, stage_t,
                          metrics)


def _finish_result(srer, fetched, centers, No_ti, length, in_margin, voiced,
                   t_start, f0_grid_np, timings, stage_t, metrics):
    """Unpack the fetched DetComponents package into an EaqhmResult
    (reference functions.py:404-411 packaging semantics)."""
    t_s = time.time()
    stk, vec = fetched
    No_grid = stk.shape[1]
    am_fin, fm_fin, ph_fin = (stk[0][:No_ti], stk[1][:No_ti],
                              stk[2][:No_ti])
    a0_fin = vec[:No_ti]
    s_recon_np = vec[No_grid:No_grid + length]
    stage_t["packaging"] = time.time() - t_s
    timings.update(stage_t)
    nz = am_fin != 0
    return EaqhmResult(
        s_recon=s_recon_np,
        srer=srer,
        det_ti=centers[:No_ti],
        # reference marks every in-margin instant isSpeech=True
        # (functions.py:325-329)
        det_is_speech=in_margin,
        det_is_voiced=voiced,
        det_a0=np.where(voiced, a0_fin, 0.0),
        det_ak=np.where(nz & voiced[:, None], am_fin, 0.0),
        det_frange=np.where(nz & voiced[:, None], fm_fin, 0.0),
        det_pk=np.where(nz & voiced[:, None], ph_fin, 0.0),
        elapsed=time.time() - t_start,
        f0_grid=f0_grid_np,
        timings=timings,
        metrics=metrics,
    )


def eaqhm_analysis_and_synthesis(speech_file: str, gender="other",
                                 step: int = 15, max_adpt: int = 10,
                                 pitch_periods: int = 3,
                                 analysis_window: int = 32,
                                 full_waveform: bool = True, fc: float = 0,
                                 partials: int = 0, print_prompts: bool = True,
                                 loading_screen: bool = False,
                                 **kw):
    """Reference-signature entry point (functions.py:35-37).

    `loading_screen` mirrors the reference's `loadingScreen` tqdm toggle
    (functions.py:173-181) as a live bar over the adaptation loop.
    Returns (s_recon, SRER, result, elapsed) — `result` carries the dense
    DetComponents arrays.
    """
    fs, s = io_mod.read_wav(speech_file)
    cfg = EaqhmConfig(gender=gender, step=step, max_adaptations=max_adpt,
                      pitch_periods=pitch_periods,
                      analysis_window=analysis_window,
                      full_waveform=full_waveform, fc=fc, partials=partials,
                      loading_screen=loading_screen,
                      **kw)
    res = analyze(s, fs, cfg, verbose=print_prompts)
    return res.s_recon, res.srer, res, res.elapsed
