"""Wav I/O with the reference's int16 scaling convention.

The reference divides by a hardcoded 32768 (misc.py:13, functions.py:87,
main.py:65) regardless of sample format; we honor that for int16 (the only
format it handles correctly) and scale other formats properly.
"""
from __future__ import annotations

import numpy as np
from scipy.io import wavfile

NORMALIZE = 32768.0  # reference misc.py:13


def read_wav(path: str):
    """Returns (fs, signal float64 in [-1, 1), mono)."""
    fs, s = wavfile.read(path)
    if s.ndim > 1:
        s = s[:, 0]
    if s.dtype == np.int16:
        s = s.astype(np.float64) / NORMALIZE
    elif s.dtype == np.int32:
        s = s.astype(np.float64) / 2147483648.0
    elif s.dtype == np.uint8:
        s = (s.astype(np.float64) - 128.0) / 128.0
    else:
        s = s.astype(np.float64)
    return fs, s


def write_wav(path: str, fs: int, s):
    wavfile.write(path, int(fs), np.asarray(s, dtype=np.float32))
