"""Benchmark entry points for the BASELINE.json configs.

Usage:
    python -m eaqhm_tpu.benchmarks --config 1      # SA19 default (== bench.py)
    python -m eaqhm_tpu.benchmarks --config 2      # high-pass + gender presets
    python -m eaqhm_tpu.benchmarks --config 3      # batch of 64 utterances
    python -m eaqhm_tpu.benchmarks --config 4      # 60 s / f0=80 Hz stress
    python -m eaqhm_tpu.benchmarks --config 5      # sharded corpus step

Each prints one JSON line {"metric", "value", "unit", ...}.  The baseline
audio-s/s is the reference's single-core rate measured in this container
(BASELINE.md: 221.07 s for 3.968 s of audio).
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

BASELINE_AUDIO_S_PER_S = 0.01795


def _emit(metric, value, unit="audio-s/s", **extra):
    line = {"metric": metric, "value": round(float(value), 4), "unit": unit,
            "vs_baseline": round(float(value) / BASELINE_AUDIO_S_PER_S, 2)}
    line.update(extra)
    print(json.dumps(line))


def _sa19():
    from eaqhm_tpu.utils.io import read_wav
    return read_wav("/root/reference/SA19.WAV")


def _timed_analyze(s, fs, cfg, repeats=3):
    from eaqhm_tpu.models import engine
    res = engine.analyze(s, fs, cfg)            # warmup/compile
    times = []
    for _ in range(repeats):
        t0 = time.time()
        res = engine.analyze(s, fs, cfg)
        times.append(time.time() - t0)
    return res, min(times)


def bench_config1(repeats=3):
    """SA19, default female params, full adaptation loop to convergence."""
    from eaqhm_tpu.config import EaqhmConfig
    fs, s = _sa19()
    res, el = _timed_analyze(s, fs, EaqhmConfig(gender="female"), repeats)
    _emit("sa19_default", (len(s) / fs) / el,
          final_srer_db=round(float(np.max(res.srer)), 6), elapsed_s=round(el, 3))


def bench_config2(repeats=3):
    """SA19 full-waveform with 30 Hz high-pass + per-preset pitch limits."""
    from eaqhm_tpu.config import EaqhmConfig
    fs, s = _sa19()
    out = {}
    total_audio = total_time = 0.0
    for gender in ("female", "male", "child"):
        cfg = EaqhmConfig(gender=gender, fc=30.0, full_waveform=True)
        res, el = _timed_analyze(s, fs, cfg, repeats=max(1, repeats - 1))
        out[gender] = round(float(np.max(res.srer)), 4)
        total_audio += len(s) / fs
        total_time += el
    _emit("sa19_highpass_presets", total_audio / total_time,
          final_srer_db=out)


def bench_config3(batch=64, repeats=3, seconds=2.0):
    """Batch of 64 mono 16 kHz utterances, one chip, frame-vectorized fits.

    Uses the sharded batched adaptation step (all utterances' LS fits in one
    batched solve) over however many local devices exist (1 on the bench
    chip) — the per-chip throughput number for corpus mode.
    """
    import jax
    import jax.numpy as jnp
    from eaqhm_tpu.parallel.mesh import make_mesh, data_sharding
    from eaqhm_tpu.parallel.sharded import make_sharded_step

    fs = 16000
    length = int(seconds * fs)
    step, W, Kc = 15, 150, 40
    margin = 480
    rng = np.random.default_rng(0)
    t = np.arange(length) / fs
    f0s = rng.uniform(150.0, 260.0, size=batch)
    sigs = np.stack([
        sum((0.3 / k) * np.sin(2 * np.pi * k * f0 * t) for k in range(1, 6))
        for f0 in f0s]).astype(np.float32)

    ti = np.arange(1, length, step)
    centers = ti - 1
    voiced = (ti > margin) & (ti < length - margin)
    wl = np.where(voiced, 120, 0)
    fm = np.zeros((batch, length, Kc), np.float32)
    am = np.zeros((batch, length, Kc), np.float32)
    for b in range(batch):
        for k in range(min(5, Kc)):
            fm[b, margin:-margin, k] = f0s[b] * (k + 1)
            am[b, margin:-margin, k] = 0.3 / (k + 1)

    mesh = make_mesh()
    stepfn = make_sharded_step(mesh, W=W, Kc=Kc, fs=float(fs), step=step,
                               length=length)
    s_b = jax.device_put(jnp.asarray(sigs), data_sharding(mesh, None))
    fm_b = jax.device_put(jnp.asarray(fm), data_sharding(mesh, None, None))
    am_b = jax.device_put(jnp.asarray(am), data_sharding(mesh, None, None))
    wl_b = jnp.tile(jnp.asarray(wl)[None], (batch, 1))
    vo_b = jnp.tile(jnp.asarray(voiced)[None], (batch, 1))
    det_std = jnp.std(s_b, axis=1)
    args = (s_b, fm_b, am_b, jnp.asarray(centers), wl_b, vo_b,
            jnp.asarray(50.0, jnp.float32), jnp.asarray(True), det_std)

    out = stepfn(*args)                        # warmup/compile
    jax.block_until_ready(out[0])
    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = stepfn(*args)
        jax.block_until_ready(out[0])
        times.append(time.time() - t0)
    el = min(times)
    audio = batch * seconds
    _emit("batch64_adaptation_step", audio / el, unit="audio-s/s/step",
          srer_mean_db=round(float(out[-2]), 3), batch=batch,
          n_devices=int(np.prod(mesh.devices.shape)), elapsed_s=round(el, 3))


def bench_config4(repeats=1):
    """Stress: 60 s utterance, low f0 (80 Hz) -> full-band harmonic count."""
    from eaqhm_tpu.config import EaqhmConfig
    fs = 16000
    seconds = 60.0
    t = np.arange(int(fs * seconds)) / fs
    f0 = 80.0 + 4.0 * np.sin(2 * np.pi * 0.3 * t)
    phase = 2 * np.pi * np.cumsum(f0) / fs
    s = sum((0.25 / k) * np.sin(k * phase) for k in range(1, 12))
    s += 0.01 * np.random.default_rng(1).normal(size=len(s))
    cfg = EaqhmConfig(gender="male", max_adaptations=10)
    res, el = _timed_analyze(s, fs, cfg, repeats)
    _emit("stress_60s_f080", seconds / el,
          final_srer_db=round(float(np.max(res.srer)), 4),
          n_adaptations=len(res.srer), elapsed_s=round(el, 3))


def bench_config5(n_utts=32, repeats=2):
    """Sharded corpus step across all local devices (multi-host stand-in).

    On a real pod this runs under jax.distributed with the corpus sharded
    per host; here it exercises the same mesh + psum path over the local
    device set (8 virtual CPU devices in CI, 1 chip on the bench runner)
    and reports scaling-relevant throughput.
    """
    bench_config3(batch=n_utts, repeats=repeats, seconds=1.0)


def main(argv=None):
    p = argparse.ArgumentParser(prog="eaqhm_tpu.benchmarks")
    p.add_argument("--config", type=int, default=1, choices=[1, 2, 3, 4, 5])
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args(argv)
    fn = {1: bench_config1, 2: bench_config2, 3: bench_config3,
          4: bench_config4, 5: bench_config5}[args.config]
    if args.config in (1, 2):
        fn(repeats=args.repeats)
    elif args.config == 4:
        fn(repeats=max(1, args.repeats - 2))
    else:
        fn(repeats=args.repeats)


if __name__ == "__main__":
    main()
