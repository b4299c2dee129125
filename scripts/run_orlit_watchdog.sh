#!/bin/bash
# Watchdog loop for the helical XY over-relaxation literal
# (app/xy2d_gpu_over_relaxation.f90: 10001x10000, 1e4 MCS, 500 samples,
# kbt=0.890, OR every sweep) resuming the round-3 checkpoint at
# sample 92.  ~85-120 s/sample on the dense dual-color engine, so legs
# are small (24 samples, checkpoint every 4; compile-cache warm).
# Usage: sh scripts/run_orlit_watchdog.sh <deadline_epoch>
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
# Round-4 on-chip A/B (scripts/tpu_session_r4h.py, BENCHMARKS.md):
# the f32-ANGLE dense engine is 1.94x the component engine on this
# HBM-bound path (bitwise-on-chip stage green).  Same Markov chain,
# different state representation; runs.log records the engine per leg.
export SPINLAT_XY_DENSE_ANGLE=1
# persistent XLA compilation cache: leg N>1 skips the multi-minute
# per-process kernel compiles (the dominant leg overhead at 1 host CPU)
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_ccache
mkdir -p "$JAX_COMPILATION_CACHE_DIR" 2>/dev/null || true
deadline=${1:?deadline epoch}
ck=data/production/xy2d_or_literal.ck
out=data/production/xy2d_or_10001x10000_mcs10000_s500.dat

while [ "$(date +%s)" -lt "$deadline" ]; do
  left=$(( deadline - $(date +%s) ))
  legtime=$(( left < 3600 ? left : 3600 ))
  [ "$legtime" -lt 300 ] && break
  echo "=== $(date '+%H:%M:%S') leg start (timeout ${legtime}s) ===" >&2
  timeout "$legtime" python -m cuda_fortran_mc_simulation_spin_tpu.runs \
    --model xy2d --nx 10001 --ny 10000 --kbt 0.890 \
    --mcs 10000 --samples 500 --seed 42 \
    --n-over-relax 1 --mcs-over-relax 10000 \
    --max-samples-this-run 26 \
    --checkpoint "$ck" --checkpoint-every 2 \
    --output "$out" \
    --registry data/production/runs.log
  rc=$?
  echo "=== $(date '+%H:%M:%S') leg rc=$rc ===" >&2
  if [ "$rc" -eq 0 ]; then
    done_n=$(python - "$ck" <<'EOF'
import sys
import numpy as np
try:
    print(int(np.load(sys.argv[1], allow_pickle=True)["__samples_done__"]))
except Exception:
    print(0)
EOF
)
    echo "=== samples done: $done_n / 500 ===" >&2
    [ "$done_n" -ge 500 ] && break
  else
    sleep 30
  fi
done
echo "=== watchdog exit $(date '+%H:%M:%S') ===" >&2
