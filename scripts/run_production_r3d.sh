#!/bin/bash
# Round-3d production batch:
#  1. Cross-variant consistency run, mirroring the reference's own
#     methodology (scripts/fpm_run_clock_test_core.sh runs the same
#     physics through clock variants and compares the curves): the
#     literal 501x500 clock experiment re-run on the MASKED single-block
#     engine (SPINLAT_CLOCK_HELICAL_PACKED=0) to compare against the
#     packed-engine dataset clock_501x500_kbt0.80_mcs100000_s100.dat.
#  2. The literal XY over-relaxation experiment
#     (app/xy2d_gpu_over_relaxation.f90:7-17 — 10001x10000, kbt=0.890,
#     mcs=1e4, OR every sweep, 500 samples) in checkpoint-resumed legs
#     with a wall-clock guard (full run is ~14 h/chip; the guard stops
#     starting new legs so the chip frees before the session ends; a
#     final --samples <done> invocation against the same checkpoint
#     writes the dat for however many samples accumulated).
#
# Usage: sh scripts/run_production_r3d.sh [xy_deadline_epoch]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p data/production
deadline=${1:-$(($(date +%s) + 23400))}   # default: 6.5 h from now
run() {
  echo "=== $(date '+%H:%M:%S') START: $*" >&2
  python -m cuda_fortran_mc_simulation_spin_tpu.runs "$@" \
    || echo "=== STAGE FAILED (exit $?): $*" >&2
  echo "=== $(date '+%H:%M:%S') DONE: $*" >&2
}

SPINLAT_CLOCK_HELICAL_PACKED=0 \
run --model clock --q 6 --nx 501 --ny 500 --kbt 0.80 \
  --mcs 100000 --samples 100 --replicas 100 --protocol relaxation \
  --output data/production/clock_501x500_kbt0.80_mcs100000_s100_masked.dat \
  --registry data/production/runs.log

while [ "$(date +%s)" -lt "$deadline" ]; do
  echo "=== $(date '+%H:%M:%S') XY-OR LEG (20 samples)" >&2
  run --model xy2d --nx 10001 --ny 10000 --kbt 0.890 \
    --mcs 10000 --samples 500 --replicas 1 --protocol relaxation \
    --n-over-relax 1 --mcs-over-relax 10000 \
    --output data/production/xy2d_or_10001x10000_mcs10000_s500.dat \
    --registry data/production/runs.log \
    --checkpoint data/production/xy2d_or_literal.ck \
    --checkpoint-every 4 \
    --max-samples-this-run 20
done
echo "=== $(date '+%H:%M:%S') time guard reached, no more XY legs" >&2
echo "=== $(date '+%H:%M:%S') R3D BATCH COMPLETE" >&2
