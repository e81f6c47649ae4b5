"""Debug harness: run the engine on SA19 and compare stages vs golden."""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
sys.path.insert(0, "/root/repo")

from eaqhm_tpu.utils.io import read_wav
from eaqhm_tpu.config import EaqhmConfig
from eaqhm_tpu.models import engine

g = np.load("/root/repo/tests/golden/local_sa19_full.npz")
fs, s = read_wav("/root/reference/SA19.WAV")

t0 = time.time()
res = engine.analyze(s, fs, EaqhmConfig(gender="female"), verbose=True)
print("total wall:", time.time() - t0)
print("SRER ours:  ", [round(x, 6) for x in res.srer])
print("SRER golden:", [round(float(x), 6) for x in g["srer"]])

# f0 grid comparison
fg = g["f0_grid"]
ours = res.f0_grid
print("f0 grid maxdiff:", np.abs(ours - fg).max())

# per-adaptation reconstruction comparison
rec = g["recon_per_adapt"]
for a in range(min(len(rec), len(res.srer))):
    pass
print("final recon maxdiff vs golden:",
      np.abs(res.s_recon - g["s_recon"].ravel()).max(),
      "signal std:", s.std())
