#!/bin/bash
# Round-3e completeness batch: the remaining committed XY-periodic
# experiments run LITERALLY, then a checkpointed slice of the
# from-disorder flagship.
#
#  1. finite_magne literal (app/xy2d_periodic_gpu_relaxation_from_
#     disorder_finite_magne.f90:8-16): 1000^2, mcs=100, 500 samples,
#     kbt=0.890, m0=0.02.
#  2. finite_magne_samples literal (..._finite_magne_samples.f90):
#     same prep, raw per-sample time series.
#  3. The samples-engine analog (app/xy2d_periodic_samples_gpu_
#     relaxation.f90:7-14 + src/xy2d_periodic_samples_gpu_m.f90:11):
#     2000^2, mcs=100, kbt=0.895, 32 replicas folded into one
#     accumulator (the reference runs tot_sample=1 x NUM_THREADS=32
#     histories; here each replica IS a history: samples=32,
#     replicas=32).
#  4. xy2d_periodic relaxation literal (app/xy2d_periodic_gpu_
#     relaxation.f90:7-13): 10000^2, mcs=1e4, tot_sample=1, kbt=0.895.
#  5. from-disorder flagship (app/xy2d_periodic_gpu_relaxation_from_
#     disorder.f90:9-15): 1500^2, mcs=1e5, kbt=0.890, target 2222
#     samples in checkpoint-resumed legs with a wall-clock guard.
#
# Usage: sh scripts/run_production_r3e.sh [fd_deadline_epoch]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p data/production
deadline=${1:-$(($(date +%s) + 7200))}   # default: 2 h from now
run() {
  echo "=== $(date '+%H:%M:%S') START: $*" >&2
  python -m cuda_fortran_mc_simulation_spin_tpu.runs "$@" \
    || echo "=== STAGE FAILED (exit $?): $*" >&2
  echo "=== $(date '+%H:%M:%S') DONE: $*" >&2
}

# Cross-variant consistency (the reference's own test methodology,
# scripts/fpm_run_clock_test_core.sh): the literal 501x500 clock
# experiment on the bit-sliced PACKED helical engine, to compare
# against the masked-engine datasets (clock_501x500_..._s100.dat and
# ..._s100_masked.dat are both masked-engine data — bitwise identical;
# the `# engine:` stamp now records provenance in every .dat).
run --model clock --q 6 --nx 501 --ny 500 --kbt 0.80 \
  --mcs 100000 --samples 100 --replicas 100 --protocol relaxation \
  --output data/production/clock_501x500_kbt0.80_mcs100000_s100_packed.dat \
  --registry data/production/runs.log

run --model xy2d --nx 1000 --ny 1000 --kbt 0.890 \
  --mcs 100 --samples 500 --replicas 20 --protocol finite_magne \
  --init-magne 0.02 \
  --output data/production/xy2d_finite_magne_1000x1000_mcs100_s500.dat \
  --registry data/production/runs.log

run --model xy2d --nx 1000 --ny 1000 --kbt 0.890 \
  --mcs 100 --samples 500 --replicas 20 --protocol finite_magne_samples \
  --init-magne 0.02 \
  --output data/production/xy2d_finite_magne_samples_1000x1000_mcs100_s500.dat \
  --registry data/production/runs.log

run --model xy2d --nx 2000 --ny 2000 --kbt 0.895 \
  --mcs 100 --samples 32 --replicas 32 --protocol relaxation \
  --output data/production/xy2d_samples32_2000x2000_mcs100.dat \
  --registry data/production/runs.log

run --model xy2d --nx 10000 --ny 10000 --kbt 0.895 \
  --mcs 10000 --samples 1 --replicas 1 --protocol relaxation \
  --output data/production/xy2d_periodic_10000x10000_mcs10000_s1.dat \
  --registry data/production/runs.log

# The scripts-only specific-times ("bin") protocol as a committed
# artifact (scripts/fpm_run_ising3d_relaxations_specific_times.sh:7-11):
# 512^3 Ising at the scripts' Tc with log-spaced measurement times.
times=$(python - <<'EOF'
ts, t = [], 1
while t <= 10000:
    ts.append(int(t))
    t = max(t + 1, int(t * 1.25))
print(" ".join(str(t) for t in sorted(set(ts))))
EOF
)
run --model ising3d --nx 512 --ny 512 --nz 512 --kbt 4.511454583186711 \
  --mcs 10000 --samples 64 --replicas 8 --protocol relaxation \
  --measure-times $times \
  --output data/production/ising3d_512_specific_times_mcs10000_s64.dat \
  --registry data/production/runs.log

while [ "$(date +%s)" -lt "$deadline" ]; do
  echo "=== $(date '+%H:%M:%S') FROM-DISORDER LEG (100 samples)" >&2
  legerr=$(mktemp)
  run --model xy2d --nx 1500 --ny 1500 --kbt 0.890 \
    --mcs 100000 --samples 2222 --replicas 2 --protocol from_disorder \
    --output data/production/xy2d_fd_1500x1500_mcs100000_s2222.dat \
    --registry data/production/runs.log \
    --checkpoint data/production/xy2d_fd_literal.ck \
    --checkpoint-every 10 \
    --max-samples-this-run 100 2>"$legerr"
  cat "$legerr" >&2
  # a completed run prints no budget-stop marker: stop re-invoking
  if ! grep -q "stopping after" "$legerr"; then
    rm -f "$legerr"
    echo "=== $(date '+%H:%M:%S') FROM-DISORDER RUN COMPLETE" >&2
    break
  fi
  rm -f "$legerr"
done
echo "=== $(date '+%H:%M:%S') FD loop done (deadline or completion)" >&2
echo "=== $(date '+%H:%M:%S') R3E BATCH COMPLETE" >&2
