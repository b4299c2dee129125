#!/bin/bash
# Cross-backend consistency check — the analog of the reference's
# cross-variant clock test harness (scripts/fpm_run_clock_test*.sh),
# which runs identical physics through different engine variants and
# compares the m(t)/e(t) curves.  Here the "variants" are the jnp and
# Pallas backends of one model.
# Usage: sh scripts/run_backend_consistency.sh [model] [nx] [mcs] [samples]
set -u -e
model=${1:-clock}
nx=${2:-256}
mcs=${3:-50}
samples=${4:-64}
tmp=$(mktemp -d)
for backend in jnp pallas; do
  python -m cuda_fortran_mc_simulation_spin_tpu.runs \
    --model "$model" --nx "$nx" --ny "$nx" --mcs "$mcs" \
    --samples "$samples" --replicas 8 --backend "$backend" \
    --protocol relaxation --output "$tmp/$backend.dat" 2>/dev/null
done
python - "$tmp" "$samples" <<'EOF'
import sys
import numpy as np

tmp, nsamp = sys.argv[1], int(sys.argv[2])
def load(p):
    return np.array([
        [float(x) for x in line.split()]
        for line in open(p) if not line.startswith("#")
    ])
a, b = load(f"{tmp}/jnp.dat"), load(f"{tmp}/pallas.dat")
# column 3 = <m>, column 7 = N*Var[m]
sem = np.sqrt(np.maximum(a[:, 7], 1e-12) / a[0, 0] / nsamp)
diff = np.abs(a[:, 3] - b[:, 3])
worst = float((diff / (6 * sem + 5e-3)).max())
print(f"max |<m>_jnp - <m>_pallas| = {diff.max():.5f}; "
      f"worst diff / gate = {worst:.2f}")
if worst >= 1.0:
    sys.exit("BACKEND CURVES DISAGREE")
print("backends consistent")
EOF
