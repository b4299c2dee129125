#!/bin/bash
# Watchdog loop deepening the Ising3D relaxation literal ensemble
# (app/ising3d_gpu_relaxation.f90:6-12: 1001x1000x1000, 1e3 MCS,
# kbt near Tc) from the round-4 s=16 checkpoint toward s=500.
# The reference commits tot_sample=1,440,000 — infeasible on any
# single device (~130 days at 1.29e11 flips/s); s=500 gives a usable
# NER curve (see data/production/ANALYSIS.md).  ~30 s/sample on the
# block-halo streaming engine, so legs are 40 samples, checkpoint
# every 8.  tot_sample is a scheduling field (io/checkpoint.py:33) so
# extending 16 -> 500 resumes the same trajectory exactly.
# Usage: sh scripts/run_ising3d_depth_watchdog.sh <deadline_epoch>
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_ccache
mkdir -p "$JAX_COMPILATION_CACHE_DIR" 2>/dev/null || true
deadline=${1:?deadline epoch}
ck=data/production/ising3d_1001.ck.npz
out=data/production/ising3d_1001x1000x1000_mcs1000_s500.dat

while [ "$(date +%s)" -lt "$deadline" ]; do
  left=$(( deadline - $(date +%s) ))
  legtime=$(( left < 1800 ? left : 1800 ))
  [ "$legtime" -lt 300 ] && break
  echo "=== $(date '+%H:%M:%S') leg start (timeout ${legtime}s) ===" >&2
  timeout "$legtime" python -m cuda_fortran_mc_simulation_spin_tpu.runs \
    --model ising3d --nx 1001 --ny 1000 --nz 1000 \
    --kbt 4.511454583186711 --mcs 1000 --samples 500 --seed 42 \
    --max-samples-this-run 40 \
    --checkpoint "$ck" --checkpoint-every 8 \
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
