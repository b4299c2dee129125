#!/bin/bash
# Round-3c production batch: the remaining committed clock experiments, run
# literally, back to back on the one real chip.
#
#  1. app/clock_gpu_relaxation.f90:6-13 — 501x500, q=6, kbt=0.80,
#     mcs=1e5, 100 samples (helical masked VMEM engine, ~3 min).
#  2. app/clock_gpu_multi_relaxation.f90:7-15 — same geometry/kbt,
#     150 samples x n_multi=2 = 300 histories (~9 min).
#  3. The clock cross-variant test geometry (scripts/fpm_run_clock_test_core.sh:
#     1000x1000, kbt=0.91, mcs=1e4, 100 samples, seed 42) on the padded
#     packed engine (~1 min).
#  4. The reference's LARGEST production experiment
#     (app/clock_dual_lattice_yhalf_tableall_gpu_relaxation.f90:8-9 +
#     src/clock/clock_dual_lattice_yhalf_tableall_m.f90:13-15):
#     2000x2000, kbt=0.91, mcs=1e5, 5000 samples — five checkpoint-resumed
#     legs of 1000 samples (~1.05 h/leg on the padded packed q=6 engine).
#
# Each stage is its own bounded python process (clean exits release the
# chip); failures are logged and the batch continues.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p data/production
run() {
  echo "=== $(date '+%H:%M:%S') START: $*" >&2
  python -m cuda_fortran_mc_simulation_spin_tpu.runs "$@" \
    || echo "=== STAGE FAILED (exit $?): $*" >&2
  echo "=== $(date '+%H:%M:%S') DONE: $*" >&2
}

run --model clock --q 6 --nx 501 --ny 500 --kbt 0.80 \
  --mcs 100000 --samples 100 --replicas 100 --protocol relaxation \
  --output data/production/clock_501x500_kbt0.80_mcs100000_s100.dat \
  --registry data/production/runs.log

run --model clock --q 6 --nx 501 --ny 500 --kbt 0.80 \
  --mcs 100000 --samples 300 --replicas 100 --protocol relaxation \
  --output data/production/clock_multi_501x500_kbt0.80_mcs100000_s300.dat \
  --registry data/production/runs.log

run --model clock --q 6 --nx 1000 --ny 1000 --kbt 0.91 \
  --mcs 10000 --samples 100 --replicas 20 --protocol relaxation \
  --output data/production/clock_1000x1000_kbt0.91_mcs10000_s100.dat \
  --registry data/production/runs.log

for leg in 1 2 3 4 5; do
  echo "=== $(date '+%H:%M:%S') FLAGSHIP LEG $leg/5" >&2
  run --model clock --q 6 --nx 2000 --ny 2000 --kbt 0.91 \
    --mcs 100000 --samples 5000 --replicas 40 --protocol relaxation \
    --output data/production/clock_2000x2000_kbt0.91_mcs100000_s5000.dat \
    --registry data/production/runs.log \
    --checkpoint data/production/clock2000_literal.ck \
    --checkpoint-every 200 \
    --max-samples-this-run 1000
done
echo "=== $(date '+%H:%M:%S') BATCH COMPLETE" >&2
