#!/bin/bash
# The reference's LARGEST committed production experiment, run literally:
# 6-state clock, 2000x2000, kbt=0.91, mcs=1e5, 5000 samples, seed 42
# (/root/reference/app/clock_dual_lattice_yhalf_tableall_gpu_relaxation.f90:8-9,
#  /root/reference/src/clock/clock_dual_lattice_yhalf_tableall_m.f90:13-15).
#
# Routed onto the padded bit-sliced packed q=6 engine (1.10e11 flips/s at
# R=40); R=40 divides 5000, so batches are exact.  Run in checkpoint-
# resumed legs via --max-samples-this-run (default 1000 samples/leg,
# ~1.05 h/leg); re-invoke until all 5000 samples are folded, then the
# final leg writes the full .dat table.
#
# Usage: sh scripts/run_clock_literal_production.sh [samples_this_leg]
set -u -e
leg=${1:-1000}
mkdir -p data/production
python -m cuda_fortran_mc_simulation_spin_tpu.runs \
  --model clock --q 6 --nx 2000 --ny 2000 --kbt 0.91 \
  --mcs 100000 --samples 5000 --replicas 40 --protocol relaxation \
  --output "data/production/clock_2000x2000_kbt0.91_mcs100000_s5000.dat" \
  --registry data/production/runs.log \
  --checkpoint "data/production/clock2000_literal.ck" \
  --checkpoint-every 200 \
  --max-samples-this-run "$leg"
