"""Sharded batched adaptation step: utterances x frames over a device mesh.

The per-utterance adaptation step (eaQHM fits + acceptance + track
interpolation + synthesis + SRER) vmapped over a batch of equal-length
utterances, with sharding constraints that put the utterance axis on mesh
axis 'data' and the frame axis of the batched LS solves on 'model'.  XLA
inserts the collectives; corpus SRER statistics are reduced with an explicit
shard_map psum to demonstrate the ICI path (SURVEY.md §5 "distributed
communication backend").
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from eaqhm_tpu.ops import interp
from eaqhm_tpu.ops.solver import eaqhm_batch
from eaqhm_tpu.models.tracks import interpolate_tracks
from eaqhm_tpu.models.engine import DEAD_TRACK_F0, DEAD_TRACK_AM


def _utt_eaqhm_step(s, fm_current, am_current, centers, wl, voiced, h,
                    do_update, W: int, Kc: int, fs: float, step: int,
                    length: int):
    """One full eaQHM adaptation for one utterance, unchunked (vmappable).

    Semantics identical to engine._eaqhm_stage + engine._scatter_and_interp
    (reference functions.py:198-402) minus frame chunking — the frame axis
    stays whole so it can shard over mesh axis 'model'.
    """
    dtype = s.dtype
    L = length
    o = jnp.arange(-W, W + 1)

    fmc = fm_current[centers]
    mask_k = (fmc != 0) & voiced[:, None]
    dead = voiced & ~jnp.any(mask_k, axis=1)
    mask_k = jnp.where(dead[:, None], jnp.arange(Kc)[None, :] == 0, mask_k)
    dead_center = jnp.zeros(L, bool).at[centers].set(dead)

    rows = jnp.clip(centers[:, None] + o[None, :], 0, L - 1)
    s_win = s[rows]
    fm_win = fm_current[rows]
    am_win = am_current[rows]
    use = dead_center[rows] & ((o[None, :] < 0)
                               | ((o[None, :] == 0) & dead[:, None]))
    k0 = (jnp.arange(Kc) == 0)[None, None, :]
    fm_win = jnp.where(use[..., None] & k0, DEAD_TRACK_F0, fm_win)
    am_win = jnp.where(use[..., None] & k0, DEAD_TRACK_AM, am_win)

    amps, slopes, fmis = eaqhm_batch(
        s_win, fm_win, am_win, o, jnp.maximum(wl, 1), mask_k, fs, dtype=dtype)

    a0_val = jnp.real(amps[:, Kc])
    pos = amps[:, Kc + 1:]
    absp = jnp.abs(pos)
    logamp = jnp.where(absp > 0,
                       20.0 * jnp.log10(jnp.where(absp > 0, absp, 1.0)),
                       -jnp.inf)
    maxlog = jnp.max(logamp, axis=1, keepdims=True)
    acc = voiced[:, None] & (logamp > maxlog - 150.0) & (jnp.abs(fmis) < h)
    fmc_eff = jnp.where(dead[:, None] & (jnp.arange(Kc)[None, :] == 0),
                        DEAD_TRACK_F0, fmc)
    fm = jnp.where(do_update, fmc_eff + fmis, fmc_eff)

    n_ti = centers.shape[0]
    a0_dense = jnp.zeros(L, dtype).at[centers].set(
        jnp.where(voiced, a0_val, 0.0))
    am_d = jnp.zeros((L, Kc), dtype).at[centers].set(
        jnp.where(acc, jnp.abs(pos), 0.0))
    fm_d = jnp.zeros((L, Kc), dtype).at[centers].set(jnp.where(acc, fm, 0.0))
    ph_d = jnp.zeros((L, Kc), dtype).at[centers].set(
        jnp.where(acc, jnp.angle(pos), 0.0))

    x = centers.astype(dtype)
    yv = a0_dense[centers]
    Mc = interp.notaknot_M(x, yv)
    a0_interp = interp.spline_eval(x, yv, Mc, jnp.arange(L, dtype=dtype))

    am_f, fm_f, ph_f, fm_cur = interpolate_tracks(
        am_d, fm_d, ph_d, step, fs, n_ti, L)
    s_rec = a0_interp + 2.0 * jnp.sum(am_f * jnp.cos(ph_f), axis=1)
    return s_rec, am_f, fm_f, ph_f, fm_cur


def make_sharded_step(mesh: Mesh, W: int, Kc: int, fs: float, step: int,
                      length: int):
    """Build the jitted sharded batched step for a fixed geometry.

    Batched inputs: s [B, L]; fm/am_current [B, L, Kc]; centers [No];
    wl/voiced [B, No]; h scalar.  Returns (s_rec [B, L], new track state,
    (srer_mean, srer_min) reduced with a shard_map psum over 'data').
    """
    dspec = P("data")

    @partial(jax.jit,
             out_shardings=None)
    def stepfn(s_b, fm_b, am_b, centers, wl_b, voiced_b, h, do_update,
               det_std_b):
        s_b = jax.lax.with_sharding_constraint(
            s_b, jax.sharding.NamedSharding(mesh, P("data", None)))
        fm_b = jax.lax.with_sharding_constraint(
            fm_b, jax.sharding.NamedSharding(mesh, P("data", None, None)))
        am_b = jax.lax.with_sharding_constraint(
            am_b, jax.sharding.NamedSharding(mesh, P("data", None, None)))

        utt = partial(_utt_eaqhm_step, W=W, Kc=Kc, fs=fs, step=step,
                      length=length)
        s_rec, am_f, fm_f, ph_f, fm_cur = jax.vmap(
            utt, in_axes=(0, 0, 0, None, 0, 0, None, None))(
            s_b, fm_b, am_b, centers, wl_b, voiced_b, h, do_update)

        resid = s_b - s_rec
        srer_b = 20.0 * jnp.log10(
            det_std_b / jnp.std(resid, axis=1))

        # explicit collective reduction over the data axis (ICI psum)
        @partial(shard_map, mesh=mesh, in_specs=dspec,
                 out_specs=(P(), P()), check_rep=False)
        def reduce_stats(x):
            local_sum = jnp.sum(x)
            local_min = jnp.min(x)
            total = jax.lax.psum(local_sum, "data")
            mn = jax.lax.pmin(local_min, "data")
            return (total / x.shape[0] / jax.lax.psum(
                jnp.ones(()), "data")).reshape(()), mn.reshape(())

        srer_mean, srer_min = reduce_stats(srer_b)
        return s_rec, am_f, fm_f, ph_f, fm_cur, srer_b, srer_mean, srer_min

    return stepfn
