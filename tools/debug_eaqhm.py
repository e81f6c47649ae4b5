"""Compare eaQHM stage internals (adaptation 1) against golden per-call data."""
import os
import sys

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")

from eaqhm_tpu.utils.io import read_wav
from eaqhm_tpu.config import EaqhmConfig
from eaqhm_tpu.models import engine

g = np.load("/root/repo/tests/golden/local_sa19_full.npz")
fs, s = read_wav("/root/reference/SA19.WAV")

# ---- rebuild engine state up to end of adaptation 0 (verified correct) ----
cfg = EaqhmConfig(gender="female")
dtype = jnp.float64
sj = jnp.asarray(s, dtype)
length = len(s)
step = cfg.step

plan = engine.swipe_mod.make_plan(float(fs), 160.0, 300.0, length)
f0s = engine.swipe_mod.swipep(plan, sj, dtype=dtype)
t_grid = np.arange(0, length - 1, 80) / fs
f0_grid = np.asarray(engine.resample_f0_grid(f0s, t_grid, dtype=dtype))
Fmax = int(fs / 2 - 200)
Kmax = int(round(Fmax / f0_grid[:, 1].min()) + 10)

vti, v_sp, v_vo, frame_step = engine.vad_mod.voiced_unvoiced_frames(
    sj, fs, False, dtype=dtype)
margin = cfg.margin_samples
v_sp, v_vo = engine.vad_mod.full_waveform_fixup(
    jnp.asarray(vti), v_sp, v_vo, margin, length)
v_vo_np = np.asarray(v_vo)

ti = np.arange(1, length, step)
centers = ti - 1
framei = ti / frame_step
fi = framei.astype(int)
in_margin = (ti > margin) & (ti < length - margin)
voiced = in_margin & v_vo_np[np.clip(fi - 1, 0, len(v_vo_np) - 1)] \
    & v_vo_np[np.clip(fi, 0, len(v_vo_np) - 1)]
dec = framei - fi
f0_frame = (1 - dec) * f0_grid[np.clip(fi - 1, 0, len(f0_grid) - 1), 1] \
    + dec * f0_grid[np.clip(fi, 0, len(f0_grid) - 1), 1]
K_frame = np.minimum(Kmax, (Fmax / f0_frame).astype(int))
wl_frame = np.where(voiced, np.maximum(120, np.round(1.5 * fs / f0_frame)).astype(int), 0)
W = int(wl_frame.max())
Kc = int(K_frame[voiced].max())
print("No voiced:", voiced.sum(), "W:", W, "Kc:", Kc, "Kmax:", Kmax)
print("golden n_iqhm:", int(g["n_iqhm_calls"]), "n_eaqhm:", int(g["n_eaqhm_calls"]))

cj = jnp.asarray(centers)
vj = jnp.asarray(voiced)
a0_v, am_v, fm_v, ph_v, acc_v = engine._iqhm_stage(
    sj, cj, jnp.asarray(f0_frame, dtype), jnp.asarray(K_frame),
    jnp.asarray(wl_frame), vj, W=W, Kc=Kc, fs=float(fs), chunk=128)

# compare iqhm amps against golden for a few voiced frames
vidx = np.nonzero(voiced)[0]
iq_amps = g["iq_amps"]; iq_K = g["iq_K"]
for t in [0, 1, 1000]:
    i = vidx[t]
    K = int(K_frame[i])
    gk = int(iq_K[t])
    ga = iq_amps[t][:2 * gk + 1]
    mine = np.asarray(am_v[i]) * np.exp(1j * np.asarray(ph_v[i]))
    gpos = np.abs(ga[gk + 1:2 * gk + 1])
    print(f"frame {t}: K {K} vs {gk}; pos amp maxreldiff:",
          np.max(np.abs(np.abs(mine[:gk]) - gpos) / (gpos + 1e-12)))

a0_i, am_f, fm_f, ph_f, fm_cur, s_rec = engine._scatter_and_interp(
    a0_v, am_v, fm_v, ph_v, acc_v, cj, length, step, float(fs), vj)
srer0 = 20 * np.log10(s.std() / np.asarray(s - np.asarray(s_rec)).std())
print("SRER0:", srer0)

# ---- adaptation 1 stage ----
f0_stale = float(f0_frame[vidx[-1]])
h = f0_stale / 2
a1 = engine._eaqhm_stage(sj, fm_cur, am_f, cj, jnp.asarray(wl_frame), vj,
                         jnp.asarray(h, dtype), True,
                         W=W, Kc=Kc, fs=float(fs), chunk=128)
a0_v1, am_v1, fm_v1, ph_v1, acc_v1 = a1

# golden adaptation-1 calls = first nvoiced of ea_*
nv = int(voiced.sum())
ea_K = g["ea_K"]; ea_amps = g["ea_amps"]; ea_fm = g["ea_fm_mid"]; ea_am = g["ea_am_mid"]
fm_cur_np = np.asarray(fm_cur)
am_cur_np = np.asarray(am_f)
bad = 0
for t in [0, 1, 2, 100, 2000]:
    i = vidx[t]
    c = centers[i]
    K2 = int(ea_K[t])            # = 2*Kend+1 of reference basis
    Kend = (K2 - 1) // 2
    gfm = ea_fm[t][:K2]          # center row of [neg, dc, pos] tracks
    gpos_fm = gfm[Kend + 1:]
    mine_fm = fm_cur_np[c][fm_cur_np[c] != 0]
    print(f"frame {t}: ref Kend {Kend}, my nsel {len(mine_fm)}")
    print("  ref pos fm center:", np.round(gpos_fm[:6], 3))
    print("  my sel fm center: ", np.round(mine_fm[:6], 3))
    ga = ea_amps[t][:2 * K2]
    gpos_a = ga[Kend + 1:2 * Kend + 1]
    sel = np.nonzero(fm_cur_np[c])[0]
    mine_a = (np.asarray(am_v1[i]) * np.exp(1j * np.asarray(ph_v1[i])))[sel]
    if len(gpos_a) == len(mine_a):
        rd = np.abs(np.abs(mine_a) - np.abs(gpos_a)) / (np.abs(gpos_a) + 1e-12)
        print("  amp maxreldiff:", rd.max())
print("SRER1 would be:", end=" ")
a0_i1, am_f1, fm_f1, ph_f1, fm_cur1, s_rec1 = engine._scatter_and_interp(
    a0_v1, am_v1, fm_v1, ph_v1, acc_v1, cj, length, step, float(fs), vj)
print(20 * np.log10(s.std() / np.asarray(s - np.asarray(s_rec1)).std()))
