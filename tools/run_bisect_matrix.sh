#!/bin/bash
# Round-4 regression bisect: run bench_quick under each toggle set, serially.
cd /root/repo
run() {
  echo "=== $* ===" >&2
  env "$@" timeout 900 python tools/bench_quick.py "cfg: $*" 2>&1 | tail -2
}
run EAQHM_PLANAR=1 EAQHM_PHASE_SPLIT=1 EAQHM_FUSED=1 EAQHM_LATTICE=new  # A: HEAD
run EAQHM_PLANAR=0 EAQHM_PHASE_SPLIT=0 EAQHM_FUSED=1 EAQHM_LATTICE=old  # B: r42836bb-like
run EAQHM_PLANAR=1 EAQHM_PHASE_SPLIT=0 EAQHM_FUSED=1 EAQHM_LATTICE=old  # C: +planar
run EAQHM_PLANAR=0 EAQHM_PHASE_SPLIT=1 EAQHM_FUSED=1 EAQHM_LATTICE=old  # D: +split
run EAQHM_PLANAR=0 EAQHM_PHASE_SPLIT=0 EAQHM_FUSED=1 EAQHM_LATTICE=new  # E: +lattice
echo "MATRIX DONE" >&2
