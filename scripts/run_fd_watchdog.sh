#!/bin/bash
# Watchdog loop for the from-disorder 1500^2 literal (2222 samples):
# short checkpointed legs with a hard per-leg timeout, so a hung device
# RPC (the axon worker has been flaky this session — claim waits and
# mid-run stalls) costs at most checkpoint-every samples instead of a
# whole leg.  Checkpoint resume is bitwise-exact (tests/test_protocols,
# tests/test_host_chunk), so the assembled dataset is identical to an
# uninterrupted run.
#
# Usage: sh scripts/run_fd_watchdog.sh <deadline_epoch> [fix1mcs]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
deadline=${1:?deadline epoch}
variant=${2:-}

ck=data/production/xy_fd_1500.ck.npz
out=data/production/xy2d_from_disorder_1500x1500_mcs100000_s2222.dat
samples=2222
extra=""
if [ "$variant" = "fix1mcs" ]; then
  ck=data/production/xy_fd1mcs_1500.ck.npz
  out=data/production/xy2d_from_disorder_fix1mcs_1500x1500_mcs100000_s2000.dat
  samples=2000
  extra="--fix1mcs"
fi

while [ "$(date +%s)" -lt "$deadline" ]; do
  left=$(( deadline - $(date +%s) ))
  # per-leg budget: up to 20 min of compute, capped by the deadline
  legtime=$(( left < 1500 ? left : 1500 ))
  [ "$legtime" -lt 180 ] && break
  echo "=== $(date '+%H:%M:%S') leg start (timeout ${legtime}s) ===" >&2
  timeout "$legtime" python -m cuda_fortran_mc_simulation_spin_tpu.runs \
    --model xy2d --nx 1500 --ny 1500 --kbt 0.890 \
    --protocol from_disorder --init-state random $extra \
    --mcs 100000 --samples "$samples" --seed 42 \
    --max-samples-this-run 160 \
    --checkpoint "$ck" --checkpoint-every 20 \
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
    echo "=== samples done: $done_n / $samples ===" >&2
    [ "$done_n" -ge "$samples" ] && break
  else
    sleep 30   # let a crashed worker recover before reclaiming
  fi
done
echo "=== watchdog exit $(date '+%H:%M:%S') ===" >&2
