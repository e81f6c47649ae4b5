"""Find which jitted function recompiles between same-page utterances."""
import logging
import time

import numpy as np
from scipy.io import wavfile

import jax
jax.config.update("jax_log_compiles", True)
logging.getLogger("jax._src.dispatch").setLevel(logging.WARNING)

from eaqhm_tpu.config import EaqhmConfig
from eaqhm_tpu.models import engine


def run(name, x, fs, cfg):
    t0 = time.time()
    res = engine.analyze(x, fs, cfg)
    print(f"### {name}: {time.time() - t0:.1f}s n_adapt={len(res.srer)}",
          flush=True)


def main():
    fs, s16 = wavfile.read("/root/reference/SA19.WAV")
    sig = s16.astype(np.float64) / 32768.0
    cfg = EaqhmConfig(gender="female")
    run("A sa19[:62000]", sig[:62000], fs, cfg)
    run("B sa19[2000:63000]", sig[2000:63000], fs, cfg)


if __name__ == "__main__":
    main()
