"""eaQHM engine: adaptation loop + public entry point (stub, filled in below).

Reference parity target: functions.py:35-418 `eaQHMAnalysisAndSynthesis`.
"""
from __future__ import annotations


def analyze(*args, **kwargs):
    raise NotImplementedError("engine under construction")


def eaqhm_analysis_and_synthesis(*args, **kwargs):
    raise NotImplementedError("engine under construction")
