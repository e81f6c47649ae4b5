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
import jax
import jax.numpy as jnp


import functools


@functools.lru_cache(maxsize=8)
def _dft_bases(nfft: int, dtype):
    """Host-precomputed one-sided DFT bases: cos / -sin [nfft, nfft//2+1]."""
    n = np.arange(nfft)[:, None]
    k = np.arange(nfft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / nfft
    return (np.cos(ang).astype(dtype), (-np.sin(ang)).astype(dtype))


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
    # DFT as two real matmuls against precomputed cos/-sin bases instead of
    # jnp.fft.rfft: (a) at these sizes (nfft <= ~2048, nf ~ 100-300) the
    # [nf, nfft] @ [nfft, nbins] contraction is sub-millisecond MXU work;
    # (b) the FFT custom-call's FIRST execution through the axon TPU
    # tunnel measured 0.6-424 s (a retry lottery, tools/out/
    # bench_history.jsonl round 4) while plain matmul programs load
    # reliably.  f64 matmul-DFT matches rfft to ~1e-12 relative (unit
    # tests), f32 to ~1e-6 — inside every downstream tolerance.
    cosb, sinb = _dft_bases(nfft, np.dtype(jnp.dtype(dtype).name))
    xw = frames * w
    hp = jax.lax.Precision.HIGHEST
    re = jnp.matmul(xw, jnp.asarray(cosb), precision=hp)
    im = jnp.matmul(xw, jnp.asarray(sinb), precision=hp)
    p = re * re + im * im                                      # |rfft|^2
    # one-sided doubling: all bins except DC; Nyquist excluded only if nfft even
    nbins = nfft // 2 + 1
    scale = np.full(nbins, 2.0)
    scale[0] = 1.0
    if nfft % 2 == 0:
        scale[-1] = 1.0
    p = p * jnp.asarray(scale, dtype)
    p = p / (fs * float(np.sum(np.asarray(window) ** 2)))
    return jnp.moveaxis(p, -1, -2)                             # [..., freq, time]
