"""eaqhm_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework for extended adaptive
Quasi-Harmonic Model (eaQHM) analysis and synthesis of speech.

A from-scratch, array-native re-design with the capabilities of the reference
NumPy/SciPy implementation (Antibas/eaQHM-analysis-and-synthesis-in-Python):
SWIPE' pitch estimation, voiced/unvoiced classification, per-frame
quasi-harmonic least-squares fits with adaptive frequency correction,
per-harmonic AM/FM/phase track interpolation, resynthesis, and SRER-driven
adaptation until convergence (reference entry point: functions.py:35-418).

Public API
----------
eaqhm_analysis_and_synthesis(path_or_signal, ...)   full pipeline (reference
    parity with functions.py:35 `eaQHMAnalysisAndSynthesis`)
EaqhmConfig                                         frozen config dataclass
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: TPU compiles in this deployment go
# through a remote tunnel (~5-60 s each); caching them on disk makes every
# process after the first start hot.  Opt out with EAQHM_JAX_CACHE=0.
_cache_dir = _os.environ.get(
    "EAQHM_JAX_CACHE",
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(
        __file__))), ".jax_cache"))
if _cache_dir and _cache_dir != "0":
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # older jax without these flags
        pass

from eaqhm_tpu.config import EaqhmConfig, gender_pitch_limits
from eaqhm_tpu.models.engine import eaqhm_analysis_and_synthesis, analyze
from eaqhm_tpu.structs import Deterministic, Frame

__all__ = [
    "EaqhmConfig",
    "gender_pitch_limits",
    "eaqhm_analysis_and_synthesis",
    "analyze",
    "Deterministic",
    "Frame",
]

__version__ = "0.1.0"
