#!/bin/bash
# 3D Ising relaxation at Tc with a logarithmic observable schedule
# (scripts/fpm_run_ising3d_relaxations_specific_times.sh: 501^2x500,
# kbt=4.511454583186711, specific-times dumps; rounded to 512^3).
# Usage: sh scripts/run_ising3d_specific_times.sh [mcs] [samples]
set -u -e
mcs=${1:-10000}
samples=${2:-100}
stamp=$(date +%Y%m%d_%H%M%S)
# log-spaced measurement times (the reference's `bin` protocol)
times=$(python - "$mcs" <<'EOF'
import sys
mcs = int(sys.argv[1])
ts, t = [], 1
while t <= mcs:
    ts.append(int(t))
    t = max(t + 1, int(t * 1.25))
print(" ".join(str(t) for t in sorted(set(ts))))
EOF
)
mkdir -p data/3D-Ising
python -m cuda_fortran_mc_simulation_spin_tpu.runs \
  --model ising3d --nx 512 --ny 512 --nz 512 --kbt 4.511454583186711 \
  --mcs "$mcs" --samples "$samples" --protocol relaxation \
  --measure-times $times \
  --output "data/3D-Ising/ising3d_512_mcs${mcs}_s${samples}_${stamp}.dat" \
  --registry runs_ising3d.log
