"""Batched full-pipeline eaQHM engine over a device mesh.

The reference analyzes exactly one utterance per process run
(reference main.py:62); this module is the TPU-native scale-out of the
*whole* pipeline — SWIPE' pitch, f0 grid, adaptation 0 (iQHM), the eaQHM
adaptation loop with the keep-previous-on-decline rule
(reference functions.py:394-402) applied per utterance — over a batch of
equal-padded utterances on a (data, model) mesh:

- **data axis**: utterances, classic DP.  Corpus SRER statistics are
  reduced with `psum` collectives (SURVEY.md §5 "distributed communication
  backend").
- **model axis**: within each utterance, the *frame* axis of the batched
  LS solves is sharded (frames are solve-independent), then the per-frame
  anchor results are `all_gather`ed (a few MB) and the track-interpolation
  stage re-shards over the *harmonic* axis (tracks are independent per
  harmonic); synthesis partial sums reduce with `psum` over 'model'.
  This is the ≤1-frame-halo structure SURVEY.md §2.2 calls for, realized
  as gather-at-the-stage-boundary instead of a halo exchange (the anchor
  tensor is tiny relative to the dense tracks).

Static-shape policy: the batch shares one padded length L, one frame grid,
and the (W, Kc) bounds implied by the pitch floor f0min (per-frame window
half-lengths and harmonic counts stay data-dependent *values* under fixed
bounds, masked exactly as the per-utterance engine does).

When to use which engine (round-4 on-chip measurement,
tools/out/benchmarks_r4.json config 3): on a SINGLE device this engine is
~8x slower per audio-second than models.engine.analyze — the pitch-floor
(W, Kc) bounds and shared frame grid pad every utterance to worst-case
geometry, and the lockstep loop runs every utterance to the batch's last
convergence.  parallel.corpus.run_corpus_sharded therefore delegates
degenerate meshes to the sequential engine; this module is the
multi-device path for a SINGLE long utterance (model-parallel frames/
harmonics).  For corpus throughput across devices, parallel.streams (r5)
runs independent per-utterance programs pinned per device — it inherits
the sequential engine's tight per-utterance geometry while scaling across
chips, and is the preferred data-parallel path; this module remains the
one that shards WITHIN an utterance.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from eaqhm_tpu.config import EaqhmConfig
from eaqhm_tpu.models import engine as engine_mod
from eaqhm_tpu.models import swipe as swipe_mod
from eaqhm_tpu.models import vad as vad_mod
from eaqhm_tpu.models.tracks import interpolate_tracks_anchors
from eaqhm_tpu.ops import interp
from eaqhm_tpu.ops.solver import iqhm_batch, eaqhm_batch


@dataclass(frozen=True)
class BatchGeometry:
    """Static geometry shared by every utterance in a batch."""
    fs: float
    length: int          # padded common length
    step: int
    No: int              # frames on the analysis grid (padded to mp multiple)
    W: int               # window half-width bound (from f0min)
    Kc: int              # harmonic-count bound (from f0min)
    chunk: int = 64
    dp: int = 1          # data-parallel size
    mp: int = 1          # model-parallel size (frame/harmonic sharding)
    # bucket lattice: ascending (W_t, K_t) tiers, last == (W, Kc).  Frames
    # solve in the smallest tier whose bounds fit them (host-assigned; see
    # make_tier_plan), so low-f0 presets don't pay the worst-case Kc on
    # every frame (the per-utterance engine's tier idea, adapted to the
    # traced batch path).  () means the single worst-case tier.
    tiers: tuple = ()

    @property
    def tier_list(self) -> tuple:
        return self.tiers if self.tiers else ((self.W, self.Kc),)

    @property
    def No_loc(self) -> int:
        return self.No // self.mp

    @property
    def n_chunks_loc(self) -> int:
        return -(-self.No_loc // self.chunk)

    @property
    def Kc_pad(self) -> int:
        return ((self.Kc + self.mp - 1) // self.mp) * self.mp

    @property
    def Kc_loc(self) -> int:
        return self.Kc_pad // self.mp


def make_batch_geometry(fs: int, length: int, config: EaqhmConfig,
                        mesh: Optional[Mesh] = None,
                        chunk: int = 64) -> BatchGeometry:
    """Derive the static batch geometry from the pitch floor.

    W bound: max(120, round((pitchPeriods/2)*fs/f0min)) (functions.py:191);
    Kc bound: round((fs/2-200)/f0min) + 10 (functions.py:115-120) unless
    `partials` overrides.
    """
    f0min, _ = config.pitch_limits
    step = int(config.step)
    W = int(max(120, round((config.pitch_periods / 2) * fs / f0min)))
    if config.partials > 0:
        Kc = int(config.partials)
    else:
        Kc = int(round((fs / 2 - 200) / f0min) + 10)
    dp, mp = (1, 1)
    if mesh is not None:
        dp, mp = mesh.devices.shape
    No = len(np.arange(1, length, step))
    No = ((No + mp - 1) // mp) * mp
    # the uniform anchor grid must fit inside the padded length
    # (interpolate_tracks_anchors assembles (No-1)*step+1 samples)
    length = max(int(length), (No - 1) * step + 1)
    tiers = _make_tiers(W, Kc, float(fs), config.pitch_periods)
    return BatchGeometry(fs=float(fs), length=int(length), step=step, No=No,
                         W=W, Kc=Kc, chunk=chunk, dp=dp, mp=mp, tiers=tiers)


# MXU-aligned harmonic-count lattice: M = 2(2K+1) = 4K+2 basis columns, so
# K in {31, 47, 63, 95, 127} puts M at {126, 190, 254, 382, 510} — just
# under the 128-lane tile boundaries instead of just over (K=32 -> M=130
# spills into a second, 2%-utilized lane tile on every Gram/inverse GEMM).
_K_LATTICE = (23, 31, 47, 63, 95, 127, 191, 255)


def _make_tiers(W: int, Kc: int, fs: float, pitch_periods: int) -> tuple:
    """2-3 tier (W_t, K_t) lattice under the worst-case (W, Kc) bound.

    Frames in a sub-tier have K = int(Fmax/f0) <= K_t, i.e. f0 above
    Fmax/(K_t+1), which also bounds their window half-length
    wl < max(120, pp2*fs*(K_t+1)/Fmax) (reference functions.py:191).
    """
    Fmax = fs / 2 - 200
    pp2 = pitch_periods / 2

    def tier_W(K_t):
        w = max(120, int(np.ceil(pp2 * fs * (K_t + 1) / Fmax)))
        return min(W, -(-w // 8) * 8)

    subs = [t for t in _K_LATTICE if t < Kc][-2:]
    tiers = tuple((tier_W(t), t) for t in subs) + ((W, Kc),)
    return tiers


def make_tier_plan(geom: BatchGeometry, voiced, wl_frame, K_frame):
    """Host-side tier assignment for one utterance -> (order, chunk_tier).

    voiced/wl_frame/K_frame: [No] numpy arrays.  Within each model shard's
    local frame range, frames are stably sorted by tier id (non-analyzed
    frames carry a sentinel and sort last, so their chunks are skipped
    entirely); each chunk of the sorted order then runs in ONE tier — the
    largest present — via lax.cond inside the device stage.

    Returns order [No] int32 (local indices per shard, concatenated) and
    chunk_tier [mp * n_chunks_loc] int32 (-1 = chunk has nothing to solve).
    """
    tiers = geom.tier_list
    nt = len(tiers)
    sent = nt                                    # sentinel: not analyzed
    tsel = np.full(geom.No, sent, np.int32)
    for i in reversed(range(nt)):
        W_t, K_t = tiers[i]
        fits = (K_frame <= K_t) & (wl_frame <= W_t)
        tsel = np.where(voiced & fits, i, tsel)
    tsel = np.where(voiced & (tsel == sent), nt - 1, tsel)

    No_loc, chunk = geom.No_loc, geom.chunk
    n_ch = geom.n_chunks_loc
    order = np.empty(geom.No, np.int32)
    ct = np.empty(geom.mp * n_ch, np.int32)
    for m in range(geom.mp):
        loc = tsel[m * No_loc:(m + 1) * No_loc]
        o = np.argsort(loc, kind="stable").astype(np.int32)
        order[m * No_loc:(m + 1) * No_loc] = o
        st = np.full(n_ch * chunk, sent, np.int32)
        st[:No_loc] = loc[o]
        st = st.reshape(n_ch, chunk)
        live = st < sent
        mx = np.where(live, st, -1).max(axis=1)
        ct[m * n_ch:(m + 1) * n_ch] = mx
    return order, ct


# --------------------------------------------------------------------------
# local (per model-shard) analysis stages
# --------------------------------------------------------------------------

def _unsort(order_l, xs):
    """Map sorted-row outputs back to grid order: grid[j] = rows[inv[j]]."""
    inv = jnp.zeros_like(order_l).at[order_l].set(
        jnp.arange(order_l.shape[0], dtype=order_l.dtype))
    return tuple(x[inv] for x in xs)


def _local_iqhm(s, centers_l, f0_l, K_l, wl_l, vo_l, order_l, ct_l,
                geom: BatchGeometry):
    """Adaptation-0 solves for this shard's frames (reference
    functions.py:183-196), tier-sorted and chunked for VMEM.

    order_l/ct_l: the host tier plan (make_tier_plan) — frames sorted by
    tier; each chunk solves once, in its chunk_tier's (W_t, K_t) geometry
    (unanalyzed chunks skip entirely).  Returns (a0_val, am, fm, ph, acc)
    on the local frame grid [Nl, Kc_pad]."""
    dtype = s.dtype
    Kc, fs, chunk = geom.Kc, geom.fs, geom.chunk
    L = s.shape[0]
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
    c_s = centers_l[order_l]
    f0_s = f0_l[order_l]
    K_s = K_l[order_l]
    wl_s = jnp.maximum(wl_l[order_l], 1)
    vo_s = vo_l[order_l]
    (c_ch, f0_ch, K_ch, wl_ch), Nl = engine_mod._pad_chunks(
        [c_s, f0_s, K_s, wl_s], chunk)

    amps = jnp.zeros((c_ch.shape[0], chunk, 2 * Kc + 1), cdtype)
    for t, (W_t, K_t) in enumerate(geom.tier_list):
        o = jnp.arange(-W_t, W_t + 1)

        def do_chunk(args, _t=t, _o=o, _Kt=K_t):
            ci, c, f0c, Kci, wlc = args

            def live(_):
                s_win = s[jnp.clip(c[:, None] + _o[None, :], 0, L - 1)]
                a, _ = iqhm_batch(s_win, _o, wlc, f0c, Kci, fs, _Kt,
                                  dtype=dtype)
                return jnp.pad(a, ((0, 0), (Kc - _Kt, Kc - _Kt)))

            def empty(_):
                return jnp.zeros((c.shape[0], 2 * Kc + 1), cdtype)

            return jax.lax.cond(ci == _t, live, empty, 0)

        amps = amps + jax.lax.map(do_chunk, (ct_l, c_ch, f0_ch, K_ch, wl_ch))
    amps = amps.reshape(-1, 2 * Kc + 1)[:Nl]
    # shared acceptance core (engine.iqhm_accept — single source for both
    # the per-utterance and batched paths), on sorted rows, then unsort
    out = engine_mod.iqhm_accept(amps, vo_s, f0_s, Kc, dtype)
    out = _unsort(order_l, out)
    return tuple(_pad_k(x, geom.Kc_pad) if x.ndim == 2 else x for x in out)


def _local_eaqhm(s, fm_current, am_current, centers_l, wl_l, vo_l,
                 dead_center, h, do_update, order_l, ct_l,
                 geom: BatchGeometry):
    """Adaptation >=1 solves for this shard's frames (reference
    functions.py:198-324 incl. the dead-track bootstrap overlay),
    tier-sorted like _local_iqhm.  Tier-validity invariant: a frame
    assigned tier t (from its adaptation-0 K bound) never carries live
    harmonics above K_t, so the tier's column capacity is exact."""
    dtype = s.dtype
    Kc, fs, chunk = geom.Kc, geom.fs, geom.chunk
    L = s.shape[0]
    cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64

    fm_k = fm_current[:, :Kc]
    am_k = am_current[:, :Kc]
    c_s = centers_l[order_l]
    wl_s = jnp.maximum(wl_l[order_l], 1)
    vo_s = vo_l[order_l]
    fmc_s = fm_k[c_s]                                         # [Nl, Kc]
    mask_s = (fmc_s != 0) & vo_s[:, None]
    dead_s = vo_s & ~jnp.any(mask_s, axis=1)
    mask_s = jnp.where(dead_s[:, None], jnp.arange(Kc)[None, :] == 0, mask_s)

    (c_ch, wl_ch, dead_ch, mk_ch), Nl = engine_mod._pad_chunks(
        [c_s, wl_s, dead_s, mask_s], chunk)

    amps = jnp.zeros((c_ch.shape[0], chunk, 2 * Kc + 1), cdtype)
    fmis = jnp.zeros((c_ch.shape[0], chunk, Kc), dtype)
    for t, (W_t, K_t) in enumerate(geom.tier_list):
        o = jnp.arange(-W_t, W_t + 1)

        def do_chunk(args, _t=t, _o=o, _Kt=K_t):
            ci, c, wlc, dd, mk = args

            def live(_):
                rows = jnp.clip(c[:, None] + _o[None, :], 0, L - 1)
                fm_win, am_win = engine_mod.dead_overlay_windows(
                    fm_k[:, :_Kt], am_k[:, :_Kt], rows, dead_center, dd,
                    _o, _Kt)
                a, _sl, fmi = eaqhm_batch(s[rows], fm_win, am_win, _o, wlc,
                                          mk[:, :_Kt], fs, dtype=dtype)
                return (jnp.pad(a, ((0, 0), (Kc - _Kt, Kc - _Kt))),
                        jnp.pad(fmi, ((0, 0), (0, Kc - _Kt))))

            def empty(_):
                return (jnp.zeros((c.shape[0], 2 * Kc + 1), cdtype),
                        jnp.zeros((c.shape[0], Kc), dtype))

            return jax.lax.cond(ci == _t, live, empty, 0)

        a_t, f_t = jax.lax.map(do_chunk, (ct_l, c_ch, wl_ch, dead_ch, mk_ch))
        amps = amps + a_t
        fmis = fmis + f_t
    amps = amps.reshape(-1, 2 * Kc + 1)[:Nl]
    fmis = fmis.reshape(-1, Kc)[:Nl]
    # shared acceptance core (engine.eaqhm_accept), sorted rows -> unsort
    out = engine_mod.eaqhm_accept(amps, fmis, fmc_s, dead_s, h, do_update,
                                  vo_s, Kc)
    out = _unsort(order_l, out)
    return tuple(_pad_k(x, geom.Kc_pad) if x.ndim == 2 else x for x in out)


def _pad_k(x, Kp: int):
    return jnp.pad(x, ((0, 0), (0, Kp - x.shape[1])))


def _interp_and_synth(a0_val, am, fm, ph, acc, geom: BatchGeometry):
    """Track interpolation + partial synthesis for one harmonic shard.

    a0_val [No]; am/fm/ph/acc [No, Kc_loc] (this shard's harmonics).
    Returns (a0_interp [L], s_partial [L] — harmonics only, DC excluded so
    model-shard psums don't multiply it, am_f, fm_f, ph_f, fm_cur
    [L, Kc_loc]).  The a0 spline is computed redundantly on every shard
    (one [No] spline — negligible)."""
    L, step, fs = geom.length, geom.step, geom.fs
    a0_interp = interp.notaknot_interp_uniform(a0_val, step, L)
    am_f, fm_f, ph_f, fm_cur = interpolate_tracks_anchors(
        jnp.where(acc, am, 0.0), jnp.where(acc, fm, 0.0),
        jnp.where(acc, ph, 0.0), step, fs, L)
    s_partial = 2.0 * jnp.sum(am_f * jnp.cos(ph_f), axis=1)
    return a0_interp, s_partial, am_f, fm_f, ph_f, fm_cur


# --------------------------------------------------------------------------
# sharded batched adaptation step
# --------------------------------------------------------------------------

def make_batch_step(mesh: Optional[Mesh], geom: BatchGeometry, adapt0: bool):
    """Build the jitted sharded step for one adaptation over a batch.

    Inputs (global views):
      s_b [B, L]; det_b [B, L]; len_b [B] (true lengths, for masked SRER);
      vo_b [B, No]; wl_b [B, No]; order_b [B, No]; ct_b [B, mp*n_chunks_loc]
      (the make_tier_plan outputs); and
      adapt0: f0_b [B, No], K_b [B, No]
      else:   fm_b, am_b [B, L, Kc_pad]; h_b [B]; do_update_b [B]
    Returns (s_rec [B, L], fm_cur, am_f [B, L, Kc_pad], srer_b [B],
             srer_mean scalar).
    """
    No, No_loc = geom.No, geom.No_loc
    Kp, Kc_loc = geom.Kc_pad, geom.Kc_loc
    n_ch = geom.n_chunks_loc
    L = geom.length
    centers_full = np.minimum(
        np.arange(No) * geom.step, L - 1).astype(np.int32)  # ti-1 grid

    def local_step(midx, s, det, ulen, vo, wl, order, ct, *state):
        """Everything for one utterance on one model shard."""
        centers = jnp.asarray(centers_full)
        c_l = jax.lax.dynamic_slice(centers, (midx * No_loc,), (No_loc,))
        vo_l = jax.lax.dynamic_slice(vo, (midx * No_loc,), (No_loc,))
        wl_l = jax.lax.dynamic_slice(wl, (midx * No_loc,), (No_loc,))
        or_l = jax.lax.dynamic_slice(order, (midx * No_loc,), (No_loc,))
        ct_l = jax.lax.dynamic_slice(ct, (midx * n_ch,), (n_ch,))
        if adapt0:
            f0, K = state
            f0_l = jax.lax.dynamic_slice(f0, (midx * No_loc,), (No_loc,))
            K_l = jax.lax.dynamic_slice(K, (midx * No_loc,), (No_loc,))
            parts = _local_iqhm(s, c_l, f0_l, K_l, wl_l, vo_l, or_l, ct_l,
                                geom)
        else:
            fm_cur, am_cur, h, do_update = state
            fmc_all = fm_cur[centers][:, :geom.Kc]
            dead_all = vo & ~jnp.any((fmc_all != 0) & vo[:, None], axis=1)
            dead_center = jnp.zeros(L, bool).at[centers].set(dead_all)
            parts = _local_eaqhm(s, fm_cur, am_cur, c_l, wl_l, vo_l,
                                 dead_center, h, do_update, or_l, ct_l,
                                 geom)
        return parts

    dspec = P("data")

    def step_global(s_b, det_b, len_b, vo_b, wl_b, order_b, ct_b, *state_b):
        def shard_fn(s_s, det_s, len_s, vo_s, wl_s, or_s, ct_s, *state_s):
            midx = jax.lax.axis_index("model") if geom.mp > 1 else 0
            # per-utterance local solves (vmap over the local batch)
            with jax.default_matmul_precision("highest"):
                solves = jax.vmap(
                    lambda *a: local_step(midx, *a))(
                    s_s, det_s, len_s, vo_s, wl_s, or_s, ct_s, *state_s)
                # anchor tensors are small: gather every shard's frames
                if geom.mp > 1:
                    solves = tuple(
                        jax.lax.all_gather(x, "model", axis=1, tiled=True)
                        for x in solves)
                a0_val, am_a, fm_a, ph_a, acc_a = solves  # [B_loc, No(, Kp)]
                # re-shard over harmonics for interpolation
                k_lo = midx * Kc_loc
                am_k = jax.lax.dynamic_slice_in_dim(am_a, k_lo, Kc_loc, 2)
                fm_k = jax.lax.dynamic_slice_in_dim(fm_a, k_lo, Kc_loc, 2)
                ph_k = jax.lax.dynamic_slice_in_dim(ph_a, k_lo, Kc_loc, 2)
                ac_k = jax.lax.dynamic_slice_in_dim(acc_a, k_lo, Kc_loc, 2)

                outs = jax.vmap(
                    lambda a0v, am, fm, ph, ac: _interp_and_synth(
                        a0v, am, fm, ph, ac, geom))(
                    a0_val, am_k, fm_k, ph_k, ac_k)
            a0_i, s_part, am_f, fm_f, ph_f, fm_cur = outs
            if geom.mp > 1:
                s_sum = jax.lax.psum(s_part, "model")
                am_full = jax.lax.all_gather(am_f, "model", axis=2,
                                             tiled=True)
                fm_full = jax.lax.all_gather(fm_cur, "model", axis=2,
                                             tiled=True)
            else:
                s_sum, am_full, fm_full = s_part, am_f, fm_cur
            s_rec = s_sum + a0_i                     # a0 redundant per shard
            # masked SRER over each utterance's true length
            samp = jnp.arange(L)[None, :]
            m = (samp < len_s[:, None]).astype(s_rec.dtype)
            n = jnp.maximum(jnp.sum(m, axis=1), 1.0)

            def mstd(x):
                mu = jnp.sum(x * m, axis=1) / n
                return jnp.sqrt(jnp.sum(m * (x - mu[:, None]) ** 2, axis=1)
                                / n)

            resid = det_s - s_rec
            srer_b = 20.0 * jnp.log10(mstd(det_s) / mstd(resid))
            # corpus statistic: mean SRER over the data axis (psum over ICI)
            if mesh is not None:
                tot = jax.lax.psum(jnp.sum(srer_b), "data")
                cnt = jax.lax.psum(jnp.asarray(srer_b.shape[0], s_rec.dtype),
                                   "data")
                srer_mean = (tot / cnt).reshape(1)
            else:
                srer_mean = jnp.mean(srer_b).reshape(1)
            return s_rec, fm_full, am_full, srer_b, srer_mean

        if mesh is None:
            return shard_fn(s_b, det_b, len_b, vo_b, wl_b, order_b, ct_b,
                            *state_b)
        base = (P("data", None), P("data", None), dspec,
                P("data", None), P("data", None),
                P("data", None), P("data", None))
        if adapt0:
            # state = (f0 [B, No], K [B, No])
            in_specs = base + (P("data", None), P("data", None))
        else:
            # state = (fm [B, L, Kp], am [B, L, Kp], h [B], do_update [B])
            in_specs = base + (P("data", None, None), P("data", None, None),
                               dspec, dspec)
        out_specs = (P("data", None), P("data", None, None),
                     P("data", None, None), dspec, P())
        return shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)(
            s_b, det_b, len_b, vo_b, wl_b, order_b, ct_b, *state_b)

    return jax.jit(step_global)


# --------------------------------------------------------------------------
# batched analysis driver (full pipeline)
# --------------------------------------------------------------------------

@dataclass
class BatchResult:
    srer: np.ndarray            # [B, n_adapt] per-utterance trajectories
    final_srer: np.ndarray      # [B]
    s_recon: np.ndarray         # [B, L]
    n_adaptations: int
    srer_mean: float


def analyze_batch(signals: Sequence[np.ndarray], fs: int,
                  config: EaqhmConfig = EaqhmConfig(),
                  mesh: Optional[Mesh] = None,
                  geom: Optional[BatchGeometry] = None,
                  verbose: bool = False) -> BatchResult:
    """Full-pipeline batched analysis of equal-or-padded utterances.

    Pipeline per utterance (all device work batched): SWIPE' pitch
    (vmapped), 5 ms f0 grid, host VAD (f64 elliptic filters — see
    vad.voiced_unvoiced_frames_host), adaptation 0, eaQHM loop with the
    per-utterance keep-previous-on-decline rule (functions.py:394-402).
    """
    from eaqhm_tpu import ensure_compile_cache
    from eaqhm_tpu.parallel.corpus import pad_batch

    ensure_compile_cache()      # persistent cache, non-CPU backends only
    dtype = jnp.float32 if not jax.config.jax_enable_x64 else jnp.float64
    if config.dtype == "float64":
        dtype = jnp.float64
    elif config.dtype == "float32":
        dtype = jnp.float32
    sig_np, lens = pad_batch([np.asarray(s, np.float64) for s in signals])
    B, L = sig_np.shape
    fs = int(fs)
    if geom is None:
        geom = make_batch_geometry(fs, L, config, mesh)
    if geom.length > L:   # anchor-grid fit may extend the padded length
        sig_np = np.pad(sig_np, ((0, 0), (0, geom.length - L)))
    L = geom.length
    step = geom.step

    f0min, f0max = config.pitch_limits
    plan = swipe_mod.make_plan(float(fs), float(f0min), float(f0max), L)
    grid_step = int(round(fs * 5 / 1000))
    t_grid = np.arange(0, L - 1, grid_step) / fs

    @jax.jit
    def pitch_all(x_b):
        def one(x):
            f0s = swipe_mod.swipep(plan, x, dtype=dtype)
            return engine_mod.resample_f0_grid(
                f0s, jnp.asarray(t_grid, dtype), dtype=dtype)
        return jax.vmap(one)(x_b)

    s_b = jnp.asarray(sig_np, dtype)
    if mesh is not None:
        s_b = jax.device_put(s_b, NamedSharding(mesh, P("data", None)))
    f0_grid = np.asarray(pitch_all(s_b))                 # [B, Ng, 3ish]

    # ---- host prologue per utterance: VAD + frame geometry ----
    margin = config.margin_samples
    ti = np.arange(1, L, step)[:geom.No]
    No_real = len(ti)
    vo_np = np.zeros((B, geom.No), bool)
    wl_np = np.zeros((B, geom.No), np.int32)
    f0f_np = np.zeros((B, geom.No), np.float64)
    Kf_np = np.zeros((B, geom.No), np.int32)
    h0_np = np.zeros(B)
    det_np = np.array(sig_np)
    Fmax = int(fs / 2 - 200)
    for b in range(B):
        ulen = int(lens[b])
        vti, v_sp, v_vo, frame_step = vad_mod.voiced_unvoiced_frames_host(
            sig_np[b, :ulen], fs, config.is_male,
            replicate_quirks=config.replicate_quirks)
        if config.full_waveform:
            v_sp, v_vo = vad_mod.full_waveform_fixup(
                vti, jnp.asarray(v_sp), jnp.asarray(v_vo), margin, ulen)
            v_vo = np.asarray(v_vo)
        else:
            mask = vad_mod.deterministic_part_mask(
                vti, np.asarray(v_sp), np.asarray(v_vo), frame_step, ulen)
            det_np[b, :ulen] = sig_np[b, :ulen] * mask
            v_vo = np.asarray(v_vo)
        framei = ti / frame_step
        fi = framei.astype(int)
        in_margin = (ti > margin) & (ti < ulen - margin)
        fi_prev = np.clip(fi - 1, 0, len(v_vo) - 1)
        fi_c = np.clip(fi, 0, len(v_vo) - 1)
        voiced = in_margin & v_vo[fi_prev] & v_vo[fi_c]
        dec = framei - fi
        g = f0_grid[b]
        f0_frame = (1 - dec) * g[fi_prev, 1] + dec * g[fi_c, 1]
        K_frame = np.minimum(geom.Kc, (Fmax / np.maximum(f0_frame, 1.0))
                             .astype(int))
        wl_frame = np.maximum(120, np.round(
            (config.pitch_periods / 2) * fs / np.maximum(f0_frame, 1.0))
        ).astype(np.int32)
        wl_frame = np.minimum(wl_frame, geom.W)
        vo_np[b, :No_real] = voiced
        wl_np[b, :No_real] = np.where(voiced, wl_frame, 0)
        f0f_np[b, :No_real] = f0_frame
        Kf_np[b, :No_real] = K_frame
        vidx = np.nonzero(voiced)[0]
        h0_np[b] = f0_frame[vidx[-1]] if len(vidx) else 0.0   # stale-f0 quirk

    # host tier plan (fixed across adaptations: membership derives from the
    # adaptation-0 per-frame bounds, like the per-utterance engine's buckets)
    order_np = np.zeros((B, geom.No), np.int32)
    ct_np = np.zeros((B, geom.mp * geom.n_chunks_loc), np.int32)
    for b in range(B):
        order_np[b], ct_np[b] = make_tier_plan(
            geom, vo_np[b], wl_np[b], Kf_np[b])

    det_b = jnp.asarray(det_np, dtype)
    len_b = jnp.asarray(lens, jnp.int32)
    vo_b = jnp.asarray(vo_np)
    wl_b = jnp.asarray(wl_np)
    order_b = jnp.asarray(order_np)
    ct_b = jnp.asarray(ct_np)

    step0 = make_batch_step(mesh, geom, adapt0=True)
    stepN = make_batch_step(mesh, geom, adapt0=False)

    srer_hist: List[np.ndarray] = []
    best_srer = np.full(B, -np.inf)
    active = np.ones(B, bool)
    best_srec = None
    fm_cur = am_cur = None
    for a in range(config.max_adaptations + 1):
        if a == 0:
            out = step0(s_b, det_b, len_b, vo_b, wl_b, order_b, ct_b,
                        jnp.asarray(f0f_np, dtype), jnp.asarray(Kf_np))
        else:
            h_b = jnp.asarray(h0_np / (a + 1), dtype)
            # per-utterance do_update mask folded into h via fm update rule:
            # reference gates the fm update on f0_stale > f0min (global per
            # utterance); utterances failing it keep fm (do_update False)
            do_upd = jnp.asarray((h0_np > f0min))
            out = stepN(s_b, det_b, len_b, vo_b, wl_b, order_b, ct_b,
                        fm_cur, am_cur, h_b, do_upd)
        s_rec, fm_new, am_new, srer_b, srer_mean = out
        srer_np = np.asarray(srer_b, np.float64)
        srer_hist.append(srer_np)
        improved = active & (srer_np > best_srer)
        if a == 0:
            improved = np.ones(B, bool)
        active = improved.copy()
        imp_j = jnp.asarray(improved)
        if best_srec is None:
            best_srec = s_rec
        else:
            best_srec = jnp.where(imp_j[:, None], s_rec, best_srec)
        best_srer = np.where(improved, srer_np, best_srer)
        fm_cur, am_cur = fm_new, am_new
        if verbose:
            print(f"[batch] adaptation {a}: mean SRER "
                  f"{float(np.mean(srer_np)):.4f} dB, active "
                  f"{int(active.sum())}/{B}")
        if a > 0 and not active.any():
            break

    return BatchResult(
        srer=np.stack(srer_hist, axis=1),
        final_srer=best_srer,
        s_recon=np.asarray(best_srec),
        n_adaptations=len(srer_hist),
        srer_mean=float(np.mean(best_srer)),
    )
