"""Batched STFT with matplotlib-`specgram` PSD semantics.

SWIPE' in the reference computes its spectra via ``matplotlib.pyplot.specgram``
(reference SWIPE.py:64-66), whose default mode is a one-sided *PSD*, not
magnitude: ``Pxx = |rfft(w*frame)|^2``, all bins except DC and Nyquist doubled,
then divided by ``fs * sum(w^2)`` (scale_by_freq=True).  The per-column
normalization downstream cancels constant scaling but NOT the
frequency-dependent one-sided doubling, so these semantics are load-bearing
for bit-comparable pitch strengths (SURVEY.md §2.5 #6).

Frames start at sample 0 with hop ``NFFT - noverlap``; frame count is
``(len(x) - NFFT) // hop + 1``; times are frame centers ``(k*hop + NFFT/2)/fs``.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def frame_count(n: int, nfft: int, hop: int) -> int:
    return (n - nfft) // hop + 1


def frame_starts(n: int, nfft: int, hop: int) -> np.ndarray:
    return np.arange(frame_count(n, nfft, hop)) * hop


def frame_times(n: int, nfft: int, hop: int, fs: float) -> np.ndarray:
    """Frame-center times as returned by matplotlib specgram."""
    return (frame_starts(n, nfft, hop) + nfft / 2.0) / fs


def specgram_psd(x, nfft: int, hop: int, window, fs: float, dtype=jnp.float64):
    """One-sided PSD spectrogram, matplotlib semantics.

    Parameters
    ----------
    x : [..., n] signal (will be framed along the last axis)
    window : [nfft] analysis window (e.g. np.hanning(nfft))

    Returns
    -------
    Pxx : [..., nfft//2 + 1, n_frames]
    """
    x = jnp.asarray(x, dtype)
    n = x.shape[-1]
    nf = frame_count(n, nfft, hop)
    starts = frame_starts(n, nfft, hop)
    idx = starts[:, None] + np.arange(nfft)[None, :]          # [nf, nfft]
    frames = x[..., idx]                                       # [..., nf, nfft]
    w = jnp.asarray(window, dtype)
    spec = jnp.fft.rfft(frames * w, axis=-1)                   # [..., nf, nfft//2+1]
    p = jnp.abs(spec) ** 2
    # one-sided doubling: all bins except DC; Nyquist excluded only if nfft even
    nbins = nfft // 2 + 1
    scale = np.full(nbins, 2.0)
    scale[0] = 1.0
    if nfft % 2 == 0:
        scale[-1] = 1.0
    p = p * jnp.asarray(scale, dtype)
    p = p / (fs * float(np.sum(np.asarray(window) ** 2)))
    return jnp.moveaxis(p, -1, -2)                             # [..., freq, time]
