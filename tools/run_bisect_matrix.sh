#!/bin/bash
# Round-4 regression bisect: run bench_quick under each toggle set, serially.
# (The r4 EAQHM_LATTICE toggle was removed: nothing at HEAD reads it — the
# K lattice is fixed in engine.py after the r4 on-chip bisect; row E's
# artifact in tools/out/bench_history.jsonl predates the removal.)
cd /root/repo
run() {
  echo "=== $* ===" >&2
  env "$@" timeout 900 python tools/bench_quick.py "cfg: $*" 2>&1 | tail -2
}
run EAQHM_PLANAR=1 EAQHM_PHASE_SPLIT=1 EAQHM_FUSED=1  # A: HEAD
run EAQHM_PLANAR=0 EAQHM_PHASE_SPLIT=0 EAQHM_FUSED=1  # B: r42836bb-like
run EAQHM_PLANAR=1 EAQHM_PHASE_SPLIT=0 EAQHM_FUSED=1  # C: +planar
run EAQHM_PLANAR=0 EAQHM_PHASE_SPLIT=1 EAQHM_FUSED=1  # D: +split
echo "MATRIX DONE" >&2
