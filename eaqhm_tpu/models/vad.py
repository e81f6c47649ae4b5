"""Voiced/unvoiced & speech/nonspeech classification (VAD).

Reference: functions.py:577-642 `voicedUnvoicedFrames`.  30 ms window on a
5 ms grid; a 30 Hz elliptic high-pass feeds the full-band energy, a
1000 Hz (male) / 1500 Hz (other) low-pass feeds the "smooth" energy; frames
are speech if full-band energy > -60 dB, voiced if (full - smooth) < 10 dB
and smooth > -50 dB; both flag tracks are order-5 median filtered.

The reference's per-frame Python loop (794 iterations of two windowed stds)
becomes one gather + two fused reductions.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from eaqhm_tpu.ops import filters, medfilt


def _windowed_std_db(x, ti, window_range, valid, dtype):
    idx = ti[:, None] + window_range[None, :]
    idx = np.clip(idx, 0, x.shape[-1] - 1)
    win = x[..., idx]                                  # [No_ti, wlen]
    m = jnp.mean(win, axis=-1, keepdims=True)
    std = jnp.sqrt(jnp.mean((win - m) ** 2, axis=-1))
    db = 20.0 * jnp.log10(std)
    return jnp.where(valid, db, -jnp.inf)


def _flag_smooth_idx(L: int, p: int, ad: int):
    i = np.arange(L)[:, None]
    j = np.arange(p - 1)[None, :]
    idx = np.where(j <= i, L - 1 - i + j, L + (j - i))
    return np.clip(idx, 0, L + 2 * ad - 1)


def reference_flag_smooth(flags, p: int = 5):
    """Bit-faithful replica of the reference's flag "median filter".

    ``misc.medfilt`` (misc.py:184-206) builds ``toeplitz(flipud(x[0:L]),
    x[L:L+p-1])`` — an L x (p-1) matrix — so the intended order-5 median is
    actually a **time-reversed median of 4**: row i covers padded samples
    ``xp[L-1-i+j]`` (j<=i) / ``xp[L+j-i]`` (j>i).  ``statistics.median`` of an
    even-length boolean window returns 0.0/0.5/1.0, and downstream truthiness
    (``if f.isVoiced``) makes 0.5 True, so the effective rule is
    ">= (p-1)/2 of the p-1 reversed-window samples are True".  Load-bearing
    for fullWaveform=False parity; the corrected behavior lives in
    ops.medfilt.medfilt.
    """
    x = jnp.asarray(flags)
    L = x.shape[-1]
    ad = (p - 1) // 2
    xp = jnp.concatenate([jnp.repeat(x[..., :1], ad, axis=-1), x,
                          jnp.repeat(x[..., -1:], ad, axis=-1)], axis=-1)
    win = xp[..., _flag_smooth_idx(L, p, ad)]           # [..., L, p-1]
    count = jnp.sum(win.astype(jnp.int32), axis=-1)
    return count >= (p - 1) // 2


def reference_flag_smooth_np(flags, p: int = 5):
    """Pure-numpy reference_flag_smooth: the host VAD path must not touch
    jnp — on the TPU backend every jnp op here would be a device dispatch
    through the remote tunnel (~30 ms each) on per-utterance preprocessing
    that takes microseconds on the host."""
    x = np.asarray(flags)
    L = x.shape[-1]
    ad = (p - 1) // 2
    xp = np.concatenate([np.repeat(x[..., :1], ad, axis=-1), x,
                         np.repeat(x[..., -1:], ad, axis=-1)], axis=-1)
    win = xp[..., _flag_smooth_idx(L, p, ad)]
    return win.astype(np.int32).sum(axis=-1) >= (p - 1) // 2


def voiced_unvoiced_frames_host(s, fs: int, is_male: bool,
                                replicate_quirks: bool = True):
    """Host (numpy float64) VAD — the production path.

    The 30 Hz elliptic high-pass has poles at radius 0.99939: its recursion
    *diverges in float32* (measured NaN on TPU), and even in f64 the output
    is arithmetic-order sensitive (see tests/test_ops.py).  VAD is
    I/O-adjacent per-utterance preprocessing (microseconds of work), so the
    production engine runs it host-side in f64 with scipy's filtfilt —
    which also gives bit-exact flag parity with the reference.  The JAX
    implementation below remains for device-resident corpus pipelines.
    """
    from scipy.signal import filtfilt as _filtfilt
    s = np.asarray(s, np.float64).ravel()
    length = len(s)
    b, a, _ = filters.design_ellip(fs, 30, "highpass")
    sf = _filtfilt(b, a, s)
    b, a, _ = filters.design_ellip(fs, 1000 if is_male else 1500, "lowpass")
    sm = _filtfilt(b, a, sf)

    window_len = int(round(0.03 * fs))
    if window_len % 2 == 0:
        window_len += 1
    step = int(round(0.005 * fs))
    midlen = (window_len - 1) // 2
    wr = np.arange(-midlen - 1, midlen)
    ti = np.arange(1, length, step)
    valid = (ti > midlen) & (ti < length - midlen)
    idx = np.clip(ti[:, None] + wr[None, :], 0, length - 1)

    def db(x):
        w = x[idx]
        sd = w.std(axis=-1)
        with np.errstate(divide="ignore"):
            return np.where(valid, 20.0 * np.log10(sd), -np.inf)

    sp_en = db(sf)
    sm_en = db(sm)
    is_speech = valid & (sp_en > -60.0)
    with np.errstate(invalid="ignore"):
        is_voiced = is_speech & ((sp_en - sm_en) < 10.0) & (sm_en > -50.0)

    if replicate_quirks:
        is_speech = reference_flag_smooth_np(is_speech, 5)
        is_voiced = reference_flag_smooth_np(is_voiced, 5)
    else:
        from scipy.ndimage import median_filter
        is_speech = median_filter(is_speech.astype(float), size=5,
                                  mode="nearest") > 0.5
        is_voiced = median_filter(is_voiced.astype(float), size=5,
                                  mode="nearest") > 0.5
    return ti, is_speech, is_voiced, int(ti[1] - ti[0])


def voiced_unvoiced_frames(s, fs: int, is_male: bool, dtype=jnp.float64,
                           replicate_quirks: bool = True):
    """Device (JAX) VAD for device-resident pipelines.

    Returns (ti [No], is_speech [No], is_voiced [No], frame_step).
    ti are 1-based sample instants (reference keeps MATLAB-style 1-based
    frame instants; the engine subtracts 1 where it indexes).
    NOTE: requires f64 for the 30 Hz high-pass (see
    voiced_unvoiced_frames_host) — use the host path when f64 is
    unavailable.
    """
    s = jnp.asarray(s, dtype)
    length = s.shape[-1]
    sf = filters.ellip_filter(s, fs, 30, "highpass", dtype=dtype)
    s_smooth = filters.ellip_filter(sf, fs, 1000 if is_male else 1500,
                                    "lowpass", dtype=dtype)

    window_len = int(round(0.03 * fs))
    if window_len % 2 == 0:
        window_len += 1
    step = int(round(0.005 * fs))
    midlen = (window_len - 1) // 2
    window_range = np.arange(-midlen - 1, midlen)      # functions.py:619
    ti = np.arange(1, length, step)
    valid = (ti > midlen) & (ti < length - midlen)

    sp_en = _windowed_std_db(sf, ti, window_range, valid, dtype)
    sm_en = _windowed_std_db(s_smooth, ti, window_range, valid, dtype)

    is_speech = valid & (sp_en > -60.0)
    # `sp_en < sm_en + 10` == `(sp_en - sm_en) < 10` (functions.py:626-633)
    # but never forms the -inf - -inf NaN on silent frames (jax_debug_nans
    # CI tier would trip on the transient NaN even though the comparison
    # result is unaffected)
    is_voiced = is_speech & (sp_en < sm_en + 10.0) & (sm_en > -50.0)

    if replicate_quirks:
        is_speech = reference_flag_smooth(is_speech, 5)
        is_voiced = reference_flag_smooth(is_voiced, 5)
    else:
        is_speech = medfilt.medfilt(is_speech.astype(dtype), 5) > 0.5
        is_voiced = medfilt.medfilt(is_voiced.astype(dtype), 5) > 0.5
    return ti, is_speech, is_voiced, int(ti[1] - ti[0])


def full_waveform_fixup(ti, is_speech, is_voiced, margin: float, length: int):
    """fullWaveform=True flag override (reference functions.py:140-146).

    Every frame with margin/2 < ti < length - margin/2 ends up voiced (and
    non-speech frames also become speech).  Works on numpy or jnp inputs
    (the host engine path passes numpy; device pipelines pass jnp).
    """
    xp = jnp if isinstance(is_speech, jnp.ndarray) else np
    inside = (ti > margin / 2) & (ti < length - margin / 2)
    sp = xp.where(inside & ~is_voiced & ~is_speech, True, is_speech)
    vo = xp.where(inside, True, is_voiced)
    return sp, vo


def deterministic_part_mask(ti, is_speech, is_voiced, frame_step: int,
                            length: int):
    """fullWaveform=False: sample mask of voiced runs +-frame_step
    (reference functions.py:127-138).

    Each maximal run of (speech & voiced) frames [first..last] contributes
    samples [ti_first - frame_step, ti_last + frame_step] (inclusive).
    """
    sv = np.asarray(is_speech & is_voiced)
    ti = np.asarray(ti)
    prev = np.concatenate(([False], sv[:-1]))
    starts = np.nonzero(sv & ~prev)[0]          # first frame of each run
    ends = np.nonzero(~sv & prev)[0]            # first non-voiced after a run
    # a run still open at the final frame is dropped by the reference
    # (indices are only flushed when a non-voiced frame is met); replicated
    # by pairing each flush with its start and discarding the unflushed tail.
    n = len(ends)
    lo = np.maximum(0, ti[starts[:n]] - frame_step)
    hi = np.minimum(length - 1, ti[ends - 1] + frame_step)
    # interval union via +1/-1 difference array + prefix sum
    d = np.zeros(length + 1, np.int64)
    np.add.at(d, lo, 1)
    np.add.at(d, hi + 1, -1)
    return np.cumsum(d[:length]) > 0
