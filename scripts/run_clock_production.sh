#!/bin/bash
# 6-state clock production run — the reference's largest workload class
# (app/clock_dual_lattice_yhalf_tableall_gpu_relaxation.f90: 2000^2,
# kbt=0.91, mcs=1e5, 5000 samples; rounded to 2048^2).
# Usage: sh scripts/run_clock_production.sh [mcs] [samples]
set -u -e
mcs=${1:-100000}
samples=${2:-5000}
stamp=$(date +%Y%m%d_%H%M%S)
mkdir -p data/clock
python -m cuda_fortran_mc_simulation_spin_tpu.runs \
  --model clock --q 6 --nx 2048 --ny 2048 --kbt 0.91 \
  --mcs "$mcs" --samples "$samples" --replicas 8 --protocol relaxation \
  --output "data/clock/clock6_2048_mcs${mcs}_s${samples}_${stamp}.dat" \
  --registry runs_clock.log \
  --checkpoint "data/clock/clock6_${stamp}.ck" --checkpoint-every 64
