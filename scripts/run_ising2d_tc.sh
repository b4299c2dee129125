#!/bin/bash
# 2D Ising NER relaxation at Tc — the reference's flagship experiment
# (app/ising2d_gpu_relaxation.f90: 1001x1000, mcs=1000, kbt=Tc).  The
# odd-nx helical geometry is served by the flat even/odd bit-packed
# engine (ops/helical_multispin.py), so the defaults are the exact
# committed shape.
# Usage: sh scripts/run_ising2d_tc.sh [nx] [ny] [mcs] [samples]
set -u -e
nx=${1:-1001}
ny=${2:-1000}
mcs=${3:-1000}
samples=${4:-1024}
stamp=$(date +%Y%m%d_%H%M%S)
mkdir -p data/2D-Ising
python -m cuda_fortran_mc_simulation_spin_tpu.runs \
  --model ising2d --nx "$nx" --ny "$ny" --kbt 2.26918531421 \
  --mcs "$mcs" --samples "$samples" --replicas 16 --protocol relaxation \
  --output "data/2D-Ising/ising2d_${nx}x${ny}_mcs${mcs}_s${samples}_${stamp}.dat" \
  --registry runs_ising2d.log \
  --checkpoint "data/2D-Ising/ising2d_${nx}_${stamp}.ck" --checkpoint-every 128
