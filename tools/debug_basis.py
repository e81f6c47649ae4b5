"""Isolated eaqhm_batch vs reference eaqhmLS_complexamps on identical inputs."""
import sys

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

np.round_ = np.round
np.NAN = np.nan
import matplotlib
matplotlib.use("Agg")
sys.path.insert(0, "/root/reference")
import functions as reffn  # reference

sys.path.insert(0, "/root/repo")
from eaqhm_tpu.ops.solver import eaqhm_batch

rng = np.random.default_rng(0)
fs = 16000
wl = 130
N = 2 * wl + 1
Kend = 3

# synthetic smooth tracks (all nonzero -> no repair path)
o = np.arange(-wl, wl + 1)
fm_pos = np.stack([(k + 1) * 200.0 + 5 * np.sin(2 * np.pi * o / N + k)
                   for k in range(Kend)], axis=1)          # [N, Kend]
am_pos = np.stack([0.1 / (k + 1) + 0.01 * np.cos(2 * np.pi * o / N + k)
                   for k in range(Kend)], axis=1)
s = rng.normal(size=N) * 0.05
window = np.hamming(N)

# ---- reference path ----
fm_full = np.concatenate([-np.flipud(fm_pos), np.zeros((N, 1)), fm_pos], axis=1)
am_full = np.concatenate([np.flipud(am_pos), np.zeros((N, 1)), am_pos], axis=1)
amps_ref, slopes_ref = reffn.eaqhmLS_complexamps(
    s[:, None], am_full, fm_full, window, fs)
amps_ref = amps_ref.ravel()
K2 = 2 * Kend + 1
print("ref amps pos:", np.round(np.abs(amps_ref[Kend + 1:2 * Kend + 1]), 6))
print("ref amp dc:", amps_ref[Kend])

# ---- ours ----
Kc = Kend
oj = jnp.arange(-wl, wl + 1)
amps, slopes, fmis = eaqhm_batch(
    jnp.asarray(s)[None], jnp.asarray(fm_pos)[None], jnp.asarray(am_pos)[None],
    oj, jnp.asarray([wl]), jnp.ones((1, Kc), bool), fs)
amps = np.asarray(amps[0])
print("our amps pos:", np.round(np.abs(amps[Kc + 1:]), 6))
print("our amp dc:", amps[Kc])
print("pos rel diff:", np.abs(amps[Kc + 1:] - amps_ref[Kend + 1:2 * Kend + 1])
      / np.abs(amps_ref[Kend + 1:2 * Kend + 1]))
print("neg ref:", np.round(np.abs(amps_ref[:Kend]), 6),
      " ours:", np.round(np.abs(amps[:Kc]), 6))
