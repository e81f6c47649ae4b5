"""Compile-cliff measurement: analyze SA19, then distinct-geometry wavs.

Geometry quantization (EaqhmConfig.quantize_geometry) pads jit-visible
shapes to lattices so utterances with different lengths/voicing reuse
compiled kernels.  This prints per-utterance wall time; the 2nd+ runs at a
new true length inside the same 4096-page should be compile-free.
"""
import time

import numpy as np
from scipy.io import wavfile

from eaqhm_tpu.config import EaqhmConfig
from eaqhm_tpu.models import engine


def main():
    fs, s16 = wavfile.read("/root/reference/SA19.WAV")
    sig = s16.astype(np.float64) / 32768.0
    cfg = EaqhmConfig(gender="female")

    cases = [
        ("sa19 full (63488)", sig),
        ("sa19[:62000] same page", sig[:62000]),
        ("sa19[2000:versch] same page", sig[2000:63000]),
        ("sa19[:50000] new page", sig[:50000]),
        ("sa19[:49000] same new page", sig[:49000]),
    ]
    for name, x in cases:
        t0 = time.time()
        res = engine.analyze(x, fs, cfg)
        dt = time.time() - t0
        print(f"{name:30s} len={len(x):6d} {dt:7.1f}s "
              f"srer={max(res.srer):.3f} dB n_adapt={len(res.srer)}")


if __name__ == "__main__":
    main()
