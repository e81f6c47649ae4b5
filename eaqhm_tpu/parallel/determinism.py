"""Deterministic-reduction policy for reproducible multi-host statistics.

SURVEY.md §5 (race detection / sanitizers row): the reference is
single-threaded NumPy, so every SRER sum is trivially reproducible; the
TPU-native framework reduces SRER and convergence statistics with XLA
collectives over a device mesh, where reproducibility has to be a stated
policy rather than an accident:

- **Within a fixed mesh shape, XLA TPU/CPU reductions are deterministic**:
  `psum`/`all_gather` lower to fixed-topology collectives with a fixed
  combining order, and jit-compiled reductions use a static schedule (no
  atomics, no nondeterministic work stealing).  Two runs of the same
  compiled program on the same mesh produce bit-identical SRER sums.
- **Across different mesh shapes** (2 vs 8 devices) float addition order
  differs; bitwise equality is NOT claimed across shapes — parity there is
  the dryrun's numerical bound (MULTICHIP artifacts, |Δ| ≤ 1e-5 dB).
- The remaining nondeterminism sources XLA *can* introduce are matmul
  precision autotuning and fast-math rewrites; the flags below pin both.

`apply()` sets the process-wide flags; the CI sanitizer tier exports the
same set (see .github/workflows/ci.yml) so every test run is covered.
"""
from __future__ import annotations

import os

import jax

# XLA flags that remove value-changing rewrites from reductions/matmuls.
# CPU: disable fast-math reassociation (changes float summation order);
# TPU: reductions are deterministic by construction, flag is a no-op.
XLA_DETERMINISM_FLAGS = "--xla_cpu_enable_fast_math=false"


def apply(matmul_precision: str = "highest") -> dict:
    """Pin deterministic-reduction policy for this process.

    Returns the applied settings (for logging).  Must run before the first
    jit compilation to affect XLA flags; matmul precision applies to
    subsequently traced computations.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_enable_fast_math" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + XLA_DETERMINISM_FLAGS).strip()
    jax.config.update("jax_default_matmul_precision", matmul_precision)
    return {
        "xla_flags": os.environ["XLA_FLAGS"],
        "matmul_precision": matmul_precision,
    }
