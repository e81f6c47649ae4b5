"""Generate golden oracle data by running the *reference* implementation.

Runs the untouched reference at /root/reference (added to sys.path, never
modified) on its bundled SA19.WAV with lightweight instrumentation wrappers
around module-level functions, and records:

  - swipep output (T,3) [t, f0, strength]            (SWIPE.py:14 return)
  - f0 5ms grid after getLinear                       (functions.py:113)
  - VAD frame flags + frame_step                      (functions.py:125)
  - per-call LS solver outputs (amplitudes, slopes)   (functions.py:196,295)
  - per-adaptation reconstruction + SRER              (functions.py:385-388)
  - final s_recon + DetComponents arrays              (functions.py:418)

Outputs:
  tests/golden/sa19_golden.npz        small, committed  (subsampled LS calls)
  tests/golden/local_sa19_full.npz    large, gitignored (every LS call)

Requires numpy-2.x compat shims for the reference's imports (np.round_,
np.NAN, numpy.matlib); these patch *this process's* numpy view only.
"""
import sys
import os
import time

import numpy as np

# ---- numpy 2.x compat shims needed by the reference sources ----
if not hasattr(np, "round_"):
    np.round_ = np.round
if not hasattr(np, "NAN"):
    np.NAN = np.nan

import matplotlib
matplotlib.use("Agg")

sys.path.insert(0, "/root/reference")

import functions  # noqa: E402  (reference module)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUTDIR = os.path.join(REPO, "tests", "golden")
os.makedirs(OUTDIR, exist_ok=True)

REC = {
    "swipep_out": None,
    "f0_grid": None,
    "vad_ti": None,
    "vad_isSpeech": None,
    "vad_isVoiced": None,
    "vad_frame_step": None,
    "iqhm_calls": [],   # (N, f0, K, amps[c64], slopes[c64])
    "eaqhm_calls": [],  # (N, K2, fm_mid[f32], am_mid[f32], amps, slopes)
    "recon_per_adapt": [],  # s_recon_tmp per adaptation (from std() args)
    "phase_calls": [],  # (k?, indices, out) subsampled
}

_orig_swipep = functions.swipep
def swipep_rec(x, fs, speechFile, plim):
    out = _orig_swipep(x, fs, speechFile, plim)
    REC["swipep_out"] = np.asarray(out)
    return out
functions.swipep = swipep_rec

_orig_getLinear = functions.getLinear
def getLinear_rec(v, t):
    out = _orig_getLinear(v, t)
    # only record the top-level (array t) call
    if not isinstance(t, float):
        REC["f0_grid"] = np.asarray(out)
    return out
functions.getLinear = getLinear_rec

_orig_vad = functions.voicedUnvoicedFrames
def vad_rec(s, fs, gender):
    frames, frame_step = _orig_vad(s, fs, gender)
    REC["vad_ti"] = np.array([f.ti for f in frames])
    REC["vad_isSpeech"] = np.array([bool(f.isSpeech) for f in frames])
    REC["vad_isVoiced"] = np.array([bool(f.isVoiced) for f in frames])
    REC["vad_frame_step"] = frame_step
    return frames, frame_step
functions.voicedUnvoicedFrames = vad_rec

_orig_iqhm = functions.iqhmLS_complexamps
def iqhm_rec(s, f0range, window, fs):
    amps, slopes = _orig_iqhm(s, f0range, window, fs)
    K = (len(f0range) - 1) // 2
    f0 = float(f0range[-1]) / K if K else 0.0
    REC["iqhm_calls"].append((len(window), f0, K,
                              np.asarray(amps).ravel().astype(np.complex64),
                              np.asarray(slopes).ravel().astype(np.complex64)))
    return amps, slopes
functions.iqhmLS_complexamps = iqhm_rec

_orig_eaqhm = functions.eaqhmLS_complexamps
def eaqhm_rec(s, am, fm, window, fs):
    amps, slopes = _orig_eaqhm(s, am, fm, window, fs)
    mid = (len(fm) - 1) // 2
    REC["eaqhm_calls"].append((len(window), fm.shape[1],
                               np.asarray(fm[mid]).astype(np.float32),
                               np.asarray(am[mid]).astype(np.float32),
                               np.asarray(amps).ravel().astype(np.complex64),
                               np.asarray(slopes).ravel().astype(np.complex64)))
    return amps, slopes
functions.eaqhmLS_complexamps = eaqhm_rec

_orig_phase = functions.phase_integr_interpolation
_phase_n = [0]
def phase_rec(fm_recon, ph_recon, indices):
    out = _orig_phase(fm_recon, ph_recon, indices)
    if _phase_n[0] % 199 == 0:
        REC["phase_calls"].append((np.asarray(indices).astype(np.int32),
                                   np.asarray(fm_recon).astype(np.float64),
                                   np.asarray(ph_recon).astype(np.float64),
                                   np.asarray(out).astype(np.float64)))
    _phase_n[0] += 1
    return out
functions.phase_integr_interpolation = phase_rec

# std() is called once for std_det (1-d? deterministic_part is (L,1)) and once
# per adaptation on (deterministic_part - s_recon_tmpT); record the latter's arg
_orig_std = functions.std
_det_holder = {}
def std_rec(x, *a, **k):
    arr = np.asarray(x)
    if arr.ndim == 2 and arr.shape[1] == 1 and arr.shape[0] > 1000:
        if "det" not in _det_holder:
            _det_holder["det"] = arr.copy()  # first big call: deterministic_part
        else:
            # residual = deterministic_part - s_recon_tmpT
            REC["recon_per_adapt"].append(
                (_det_holder["det"] - arr).ravel().astype(np.float64))
    return _orig_std(x, *a, **k)
functions.std = std_rec

# Gender preset knob (GOLDEN_GENDER=male produces the male-preset oracle the
# big-M robustness configs are checked against; default female matches the
# README screenshot).  Output files are suffixed for non-female presets.
GENDER = os.environ.get("GOLDEN_GENDER", "female")
SUFFIX = "" if GENDER == "female" else "_" + GENDER

t0 = time.time()
s_recon, SRER, Det, endTime = functions.eaQHMAnalysisAndSynthesis(
    "/root/reference/SA19.WAV", GENDER, printPrompts=True, loadingScreen=False)
wall = time.time() - t0
print("reference run done in %.1f s, SRER=%s" % (wall, SRER))

# ---- package DetComponents into dense arrays ----
No_ti = len(Det)
def _flat(x):
    # reference arrayByIndex can yield dtype=object arrays whose elements are
    # length-1 ndarrays (misc.py:84-93); flatten to float64
    x = np.asarray(x)
    if x.dtype == object:
        return np.array([float(np.ravel(v)[0]) if np.size(v) else 0.0
                         for v in x.ravel()])
    return np.ravel(x).astype(np.float64)
def _amps(d):
    # the reference engine assigns `DetComponents[i].amplitudes`
    # (functions.py:409) — a NEW attribute; the constructor-initialized
    # `.ak` alias (structs.py "self.ak = amplitudes") stays at its empty
    # default forever.  Read the attribute the engine actually writes.
    return getattr(d, "amplitudes", d.ak)
def _lens(attr):
    return max((len(_flat(_amps(d) if attr == "ak" else getattr(d, attr)))
                for d in Det if d.isVoiced), default=0)
Kmax_seen = max(_lens("ak"), _lens("frange"), _lens("pk"))
det_ti = np.array([d.ti if np.ndim(d.ti) == 0 else -1 for d in Det], dtype=np.int64)
det_sp = np.array([bool(d.isSpeech) for d in Det])
det_vo = np.array([bool(d.isVoiced) for d in Det])
det_a0 = np.zeros(No_ti)
det_ak = np.zeros((No_ti, Kmax_seen))
det_fr = np.zeros((No_ti, Kmax_seen))
det_pk = np.zeros((No_ti, Kmax_seen))
for i, d in enumerate(Det):
    if d.isVoiced:
        det_a0[i] = np.ravel(d.a0)[0] if np.size(d.a0) else 0.0
        ak = _flat(_amps(d)); fr = _flat(d.frange); pk = _flat(d.pk)
        det_ak[i, :len(ak)] = ak
        det_fr[i, :len(fr)] = fr
        det_pk[i, :len(pk)] = pk

def pack_calls(calls, with_mid):
    n = len(calls)
    Ns = np.array([c[0] for c in calls], dtype=np.int32)
    Ks = np.array([c[2] if not with_mid else c[1] for c in calls], dtype=np.int32)
    maxlen = max(len(c[-2]) for c in calls)
    amps = np.zeros((n, maxlen), dtype=np.complex64)
    slopes = np.zeros((n, maxlen), dtype=np.complex64)
    lens = np.zeros(n, dtype=np.int32)
    for i, c in enumerate(calls):
        a, sl = c[-2], c[-1]
        lens[i] = len(a)
        amps[i, :len(a)] = a
        slopes[i, :len(sl)] = sl
    out = dict(N=Ns, K=Ks, lens=lens, amps=amps, slopes=slopes)
    if with_mid:
        maxk = max(len(c[2]) for c in calls)
        fm_mid = np.zeros((n, maxk), dtype=np.float32)
        am_mid = np.zeros((n, maxk), dtype=np.float32)
        for i, c in enumerate(calls):
            fm_mid[i, :len(c[2])] = c[2]
            am_mid[i, :len(c[3])] = c[3]
        out["fm_mid"] = fm_mid
        out["am_mid"] = am_mid
    else:
        f0s = np.array([c[1] for c in calls], dtype=np.float64)
        out["f0"] = f0s
    return out

iq = pack_calls(REC["iqhm_calls"], with_mid=False)
ea = pack_calls(REC["eaqhm_calls"], with_mid=True) if REC["eaqhm_calls"] else None

recons = np.stack(REC["recon_per_adapt"]) if REC["recon_per_adapt"] else np.zeros((0, 0))

common = dict(
    srer=np.asarray(SRER, dtype=np.float64),
    s_recon=np.asarray(s_recon, dtype=np.float64),
    recon_per_adapt=recons,
    swipep_out=REC["swipep_out"],
    f0_grid=REC["f0_grid"],
    vad_ti=REC["vad_ti"],
    vad_isSpeech=REC["vad_isSpeech"],
    vad_isVoiced=REC["vad_isVoiced"],
    vad_frame_step=np.int64(REC["vad_frame_step"]),
    det_ti=det_ti, det_isSpeech=det_sp, det_isVoiced=det_vo,
    det_a0=det_a0, det_ak=det_ak, det_frange=det_fr, det_pk=det_pk,
    n_iqhm_calls=np.int64(len(REC["iqhm_calls"])),
    n_eaqhm_calls=np.int64(len(REC["eaqhm_calls"])),
    ref_wall_seconds=np.float64(wall),
)

# full record (gitignored, for in-session debugging)
full = dict(common)
for k, v in iq.items():
    full["iq_" + k] = v
if ea:
    for k, v in ea.items():
        full["ea_" + k] = v
for j, (idx, fmr, phr, out) in enumerate(REC["phase_calls"][:40]):
    full[f"ph{j}_idx"] = idx
    full[f"ph{j}_fm"] = fmr
    full[f"ph{j}_ph"] = phr
    full[f"ph{j}_out"] = out
np.savez_compressed(os.path.join(OUTDIR, "local_sa19_full%s.npz" % SUFFIX), **full)

# committed record: subsample LS calls 1/10
small = dict(common)
for k, v in iq.items():
    small["iq_" + k] = v[::10] if v.ndim else v
if ea:
    for k, v in ea.items():
        small["ea_" + k] = v[::10] if v.ndim else v
for j, (idx, fmr, phr, out) in enumerate(REC["phase_calls"][:8]):
    small[f"ph{j}_idx"] = idx
    small[f"ph{j}_fm"] = fmr.astype(np.float32)
    small[f"ph{j}_ph"] = phr.astype(np.float32)
    small[f"ph{j}_out"] = out
np.savez_compressed(os.path.join(OUTDIR, "sa19_golden%s.npz" % SUFFIX), **small)

print("golden written:",
      os.path.getsize(os.path.join(OUTDIR, "sa19_golden%s.npz" % SUFFIX)) // 1024, "KB small,",
      os.path.getsize(os.path.join(OUTDIR, "local_sa19_full%s.npz" % SUFFIX)) // 1024, "KB full")
print("SRER trajectory:", [float(x) for x in SRER])
