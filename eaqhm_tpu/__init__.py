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
#
# Policy (r5, after MULTICHIP_r04's poisoned-cache failure tail):
#  - The cache is enabled LAZILY, once the backend is known
#    (`ensure_compile_cache()`, called by the engines before their first
#    big compile), and ONLY for non-CPU backends.  XLA:CPU cache entries
#    embed AOT code specialized to the compiling machine's CPU features
#    and always re-verify them on load — foreign-machine entries threaten
#    SIGILL, and even same-machine entries warn (XLA records
#    +prefer-no-scatter/gather pseudo-features the host probe lacks).
#    CPU compiles are local and fast; the persistent cache only pays for
#    itself on the remote-tunnel TPU backend.
#  - The directory is QUARANTINED per (backend, machine fingerprint), so
#    processes on different machines or backends can never deserialize
#    each other's entries.


def _machine_fingerprint() -> str:
    import hashlib
    import platform as _platform
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.sha256((_platform.machine() + "|" + feats).encode())
    return h.hexdigest()[:10]


_cache_state = {"configured": False}


def ensure_compile_cache() -> bool:
    """Enable the persistent compilation cache iff the active backend is
    not CPU.  Idempotent; returns True when a cache dir is active."""
    if _cache_state["configured"]:
        return bool(_cache_state.get("dir"))
    _cache_state["configured"] = True
    root = _os.environ.get(
        "EAQHM_JAX_CACHE",
        _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(
            __file__))), ".jax_cache"))
    if not root or root == "0":
        return False
    try:
        backend = _jax.default_backend()
    except Exception:
        return False
    if backend == "cpu":
        return False
    cache_dir = _os.path.join(
        root, "%s-%s" % (backend, _machine_fingerprint()))
    try:
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # older jax without these flags
        return False
    _cache_state["dir"] = cache_dir
    return True

from eaqhm_tpu.config import EaqhmConfig, gender_pitch_limits
from eaqhm_tpu.models.engine import eaqhm_analysis_and_synthesis, analyze
from eaqhm_tpu.structs import Deterministic, Frame

__all__ = [
    "ensure_compile_cache",
    "EaqhmConfig",
    "gender_pitch_limits",
    "eaqhm_analysis_and_synthesis",
    "analyze",
    "Deterministic",
    "Frame",
]

__version__ = "0.1.0"
