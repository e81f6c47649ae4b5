"""Configuration for the eaQHM TPU pipeline.

The reference exposes its full parameter surface as keyword arguments on a
single entry point (reference functions.py:35-37); gender presets map to SWIPE'
pitch limits (functions.py:95-109 — note the code, not the docstring, is
authoritative: female is [160, 300]).  Here the same surface is a frozen
dataclass, extended with TPU-specific knobs (dtype policy, bucketing, mesh).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

# Gender presets, reference functions.py:95-109.
_GENDER_LIMITS = {
    "male": (70.0, 180.0),
    "female": (160.0, 300.0),
    "child": (300.0, 600.0),
    "other": (70.0, 500.0),
}


def gender_pitch_limits(gender) -> Tuple[float, float]:
    """Pitch search limits [Hz] for a gender preset or explicit tuple.

    Mirrors reference functions.py:95-109: unknown strings fall back to
    the 'other' preset [70, 500]; tuples pass through.
    """
    if isinstance(gender, (tuple, list)):
        return float(gender[0]), float(gender[1])
    return _GENDER_LIMITS.get(gender, _GENDER_LIMITS["other"])


@dataclasses.dataclass(frozen=True)
class EaqhmConfig:
    """Full parameter surface (reference functions.py:35-37) + TPU knobs."""

    # ---- reference-parity parameters ----
    gender: object = "other"        # preset name or (f0min, f0max) tuple
    step: int = 15                  # analysis grid step in samples
    max_adaptations: int = 10       # `maxAdpt`
    pitch_periods: int = 3          # window half-length factor (functions.py:191)
    analysis_window: int = 32       # edge margin = analysis_window*step samples
    full_waveform: bool = True      # model the entire signal (functions.py:140-146)
    fc: float = 0.0                 # optional elliptic high-pass cutoff [Hz]
    partials: int = 0               # manual Kmax override (<=0: derived)

    # ---- numerics / TPU knobs ----
    # "auto": float64 when x64 is enabled (CPU parity tests), else float32
    # (TPU path; measured SRER delta vs the f64 reference <= 0.04 dB per
    # adaptation on SA19, final SRER delta 6e-4 dB)
    dtype: str = "auto"             # "auto" | "float32" | "float64"
    # LS solve algorithm: "auto" picks the dtype default (f64 -> XLA
    # cholesky for bit-stable parity, f32 -> block_inverse GEMM recursion);
    # "pallas" opts into the ops.pallas_chol blocked VMEM kernel (f32 only)
    solve_method: str = "auto"      # "auto"|"block_inverse"|"cholesky"|"pallas"
    # replicate reference quirks needed for bit-comparable SRER (SURVEY §2.5)
    replicate_quirks: bool = True
    # keep-previous-on-decline convergence rule (reference
    # functions.py:394-402); False runs all max_adaptations regardless
    # (diagnostic: exposes the full SRER trajectory)
    stop_on_decline: bool = True
    # collect per-adaptation accepted-harmonic counts (adds one small
    # device->host transfer per adaptation; off for max throughput)
    collect_metrics: bool = False
    # run the WHOLE adaptation loop (adaptation 0 + eaQHM iterations +
    # keep-previous-on-decline + DetComponents packaging) as ONE device
    # dispatch via lax.while_loop — zero host round trips per adaptation.
    # Measured on the r5 chip (tools/out/bench_history.jsonl): throughput
    # parity with the host-driven loop (the per-step host sync is only a
    # few ms on this backend) but ~4x slower first compile (184 s vs 40 s
    # for the two split programs), so the host loop stays the default;
    # the fused program remains available for deployments where host
    # involvement must be zero (e.g. queueing many utterances back to
    # back from one thread).
    fused_adapt_loop: bool = False
    # quantize jit-visible shapes (signal length to 4096-sample pages,
    # tier capacities to the frame grid, window half-widths to multiples
    # of 8, harmonic tiers to a fixed lattice) so distinct utterances share
    # compiled kernels; numerically exact (masks/dump rows absorb padding)
    quantize_geometry: bool = True
    # frames per lax.map chunk in the batched LS stages (VMEM/HBM working
    # set vs scan-iteration latency trade-off)
    chunk: int = 128
    # progress-bar UX: the reference's `loadingScreen` tqdm bars over the
    # frame/interpolation loops (functions.py:173-181,343-381).  Those loops
    # are single device dispatches here, so the analogue is a live bar over
    # the adaptation loop (analyze) and over utterances (corpus drivers),
    # with SRER shown as it lands.  Falls back to plain prints without tqdm.
    loading_screen: bool = False

    @property
    def pitch_limits(self) -> Tuple[float, float]:
        return gender_pitch_limits(self.gender)

    @property
    def is_male(self) -> bool:
        # VAD low-pass cutoff branch (reference functions.py:606-609) keys on
        # the literal string 'male'; tuple genders use the non-male branch.
        return self.gender == "male"

    @property
    def margin_samples(self) -> int:
        return self.analysis_window * self.step
