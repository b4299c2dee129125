#!/bin/bash
# The reference's committed helical (odd-nx) geometries, on the fused
# helical Pallas paths (ops/helical_pallas.py):
#   1001x1000 Ising2D @ Tc  (app/ising2d_gpu_relaxation.f90:6-12)
#   501x500 6-state clock @ kbt=0.80 (app/clock_gpu_relaxation.f90:6-13)
#   10001x10000 XY @ kbt=0.895 (app/xy2d_gpu_relaxation.f90:7-14)
# Usage: sh scripts/run_helical_geometries.sh [mcs] [samples] [outdir]
set -u -e
mcs=${1:-1000}
samples=${2:-16}
out=${3:-data/helical}
mkdir -p "$out"

python -m cuda_fortran_mc_simulation_spin_tpu.runs \
  --model ising2d --nx 1001 --ny 1000 --kbt 2.26918531421 \
  --mcs "$mcs" --samples "$samples" --replicas 8 \
  --output "$out/ising2d_1001x1000.dat" --registry "$out/runs.log"

python -m cuda_fortran_mc_simulation_spin_tpu.runs \
  --model clock --q 6 --nx 501 --ny 500 --kbt 0.80 \
  --mcs "$mcs" --samples "$samples" --replicas 8 \
  --output "$out/clock_501x500.dat" --registry "$out/runs.log"

# the 10001x10000 XY runs one history at a time (4x ~400MB planes)
python -m cuda_fortran_mc_simulation_spin_tpu.runs \
  --model xy2d --nx 10001 --ny 10000 --kbt 0.895 \
  --mcs "$mcs" --samples 1 \
  --output "$out/xy2d_10001x10000.dat" --registry "$out/runs.log"
