#!/bin/bash
# Watchdog loop for the 4000^2 periodic over-relaxation script workload
# (3125 samples; /root/reference/scripts/
# fpm_run_xy2d_periodic_over_relaxation.sh) — same per-leg timeout
# pattern as run_fd_watchdog.sh (checkpoint resume is bitwise-exact).
# Usage: sh scripts/run_or4000_watchdog.sh <deadline_epoch>
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
deadline=${1:?deadline epoch}
ck=data/production/xy_or4000.ck.npz
out=data/production/xy2d_periodic_or_4000x4000_mcs10000_s3125.dat

while [ "$(date +%s)" -lt "$deadline" ]; do
  left=$(( deadline - $(date +%s) ))
  legtime=$(( left < 1500 ? left : 1500 ))
  [ "$legtime" -lt 180 ] && break
  echo "=== $(date '+%H:%M:%S') leg start (timeout ${legtime}s) ===" >&2
  timeout "$legtime" python -m cuda_fortran_mc_simulation_spin_tpu.runs \
    --model xy2d --nx 4000 --ny 4000 --kbt 0.890 \
    --mcs 10000 --samples 3125 --seed 42 \
    --n-over-relax 1 --mcs-over-relax 10000 \
    --max-samples-this-run 125 \
    --checkpoint "$ck" --checkpoint-every 25 \
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
    echo "=== samples done: $done_n / 3125 ===" >&2
    [ "$done_n" -ge 3125 ] && break
  else
    sleep 30
  fi
done
echo "=== watchdog exit $(date '+%H:%M:%S') ===" >&2
