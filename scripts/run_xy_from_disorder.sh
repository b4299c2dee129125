#!/bin/bash
# XY quench from disorder near T_BKT with autocorrelation tracking
# (app/xy2d_periodic_gpu_relaxation_from_disorder.f90: 1500^2, kbt=0.890,
# mcs=1e5, 2222 samples; rounded to 1536^2).
# Usage: sh scripts/run_xy_from_disorder.sh [mcs] [samples] [--fix1mcs]
set -u -e
mcs=${1:-100000}
samples=${2:-2048}
extra=${3:-}
stamp=$(date +%Y%m%d_%H%M%S)
mkdir -p data/XY
python -m cuda_fortran_mc_simulation_spin_tpu.runs \
  --model xy2d --nx 1536 --ny 1536 --kbt 0.890 \
  --mcs "$mcs" --samples "$samples" --replicas 8 \
  --protocol from_disorder $extra \
  --output "data/XY/xy_disorder_1536_mcs${mcs}_s${samples}_${stamp}.dat" \
  --registry runs_xy.log \
  --checkpoint "data/XY/xy_disorder_${stamp}.ck" --checkpoint-every 64
