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
