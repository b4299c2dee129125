#!/bin/bash
# Round-5 finalization (run after production legs stop):
#  1. render the ising3d depth checkpoint into the .dat via a tiny
#     2-sample leg (the mid-leg kill left the .dat at the previous
#     leg's count);
#  2. refresh the NER fit numbers used by ANALYSIS/STATUS;
#  3. print final production counts for STATUS.md.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_ccache

echo "=== ising3d render leg ===" >&2
timeout 1500 python -m cuda_fortran_mc_simulation_spin_tpu.runs \
  --model ising3d --nx 1001 --ny 1000 --nz 1000 \
  --kbt 4.511454583186711 --mcs 1000 --samples 500 --seed 42 \
  --max-samples-this-run 2 \
  --checkpoint data/production/ising3d_1001.ck.npz --checkpoint-every 2 \
  --output data/production/ising3d_1001x1000x1000_mcs1000_s500.dat \
  --registry data/production/runs.log || echo "render leg rc=$?" >&2

echo "=== final counts ===" >&2
python - <<'EOF'
import numpy as np
for name, f in [("orlit", "data/production/xy2d_or_literal.ck"),
                ("ising3d", "data/production/ising3d_1001.ck.npz")]:
    try:
        d = np.load(f, allow_pickle=True)
        print(name, int(d["__samples_done__"]))
    except Exception as exc:
        print(name, "ERR", exc)
EOF

echo "=== NER fits ===" >&2
JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/analyze_ner.py \
  data/production/ising3d_1001x1000x1000_mcs1000_s500.dat | tail -7
