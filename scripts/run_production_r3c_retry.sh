#!/bin/bash
# Retry of the two 501x500 clock literals that crashed the device worker
# when the helical runner issued the whole 1e5-MCS history as ONE
# dispatch (fixed: engine/sweep.py _invocation_chunked splits helical
# dispatches to fit the execution budget), plus a small literal slice of
# the committed XY over-relaxation experiment
# (app/xy2d_gpu_over_relaxation.f90:7-17 — full 500-sample run is ~14 h,
# the slice demonstrates the protocol at the literal geometry).
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

# NOTE: the OR schedule rides the relaxation protocol (there is no
# separate --protocol value; the reference's *_over_relaxation apps are
# relaxation + an OR schedule, matching RunConfig)
run --model xy2d --nx 10001 --ny 10000 --kbt 0.890 \
  --mcs 10000 --samples 4 --replicas 1 --protocol relaxation \
  --n-over-relax 1 --mcs-over-relax 10000 \
  --output data/production/xy2d_or_10001x10000_mcs10000_s4_slice.dat \
  --registry data/production/runs.log
echo "=== $(date '+%H:%M:%S') RETRY BATCH COMPLETE" >&2
