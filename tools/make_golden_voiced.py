"""Golden data for fullWaveform=False (voiced-only deterministic part).

Runs the untouched reference (/root/reference, sys.path import, never
modified) on SA19.WAV with fullWaveform=False (reference
functions.py:127-138: only voiced runs +-frame_step form the deterministic
part) and records the SRER trajectory + final reconstruction.

Output: tests/golden/sa19_voiced_golden.npz (committed).
"""
import sys
import os
import time

import numpy as np

if not hasattr(np, "round_"):
    np.round_ = np.round
if not hasattr(np, "NAN"):
    np.NAN = np.nan

import matplotlib
matplotlib.use("Agg")

sys.path.insert(0, "/root/reference")

import functions  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUTDIR = os.path.join(REPO, "tests", "golden")
os.makedirs(OUTDIR, exist_ok=True)

t0 = time.time()
s_recon, SRER, Det, endTime = functions.eaQHMAnalysisAndSynthesis(
    "/root/reference/SA19.WAV", "female", fullWaveform=False,
    printPrompts=True, loadingScreen=False)
wall = time.time() - t0
print("reference fullWaveform=False run done in %.1f s, SRER=%s"
      % (wall, SRER))

np.savez_compressed(
    os.path.join(OUTDIR, "sa19_voiced_golden.npz"),
    srer=np.asarray(SRER, dtype=np.float64),
    s_recon=np.asarray(s_recon, dtype=np.float64),
    ref_wall_seconds=np.float64(wall),
)
print("written tests/golden/sa19_voiced_golden.npz")
