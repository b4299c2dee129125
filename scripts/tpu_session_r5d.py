"""One-process TPU batch, round 5d: aligned-width periodic XY angle A/B.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_session_r5d.py
     > /tmp/tpu_r5d.log 2>&1

r5b measured the f32-angle engine 1.49x on the lane-PADDED OR-free
schedule (10000^2).  ALIGNED widths (nx/2 % 128 == 0) currently route
the component fused phase kernels via make_batch_runner; this A/B
decides whether OR-free aligned relaxation should route the angle
engine too (same make_xy_padded_runner machinery — with halfp == half
it runs unpadded, valid_half=0).

Stage: 8192^2 Metropolis + per-sweep (m, my, e), batch=1, 48 MCS:
  A. current route: make_batch_runner (model.sweep_batched fused)
  B. angle: make_xy_padded_runner with SPINLAT_XY_PERIODIC_ANGLE=1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def log(msg):
    print(msg, flush=True)


def _time_runner(runner, key):
    if not getattr(runner, "host_chunked", False):
        runner = jax.jit(runner)

    def force(out):
        # block the WHOLE tree and materialize on host — some runners
        # return trees whose first leaf is already host-side, so
        # blocking one leaf measures enqueue only
        return {k: np.asarray(v) for k, v in out.items()}

    out = force(runner(key))
    t0 = time.perf_counter()
    out = force(runner(key))
    dt = time.perf_counter() - t0
    assert np.isfinite(out["m"]).all()
    return dt


def main():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        sweep as sweep_mod,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    log(f"devices: {jax.devices()}")
    n, mcs = 8192, 48
    model = XY2D(nx=n, ny=n, kbt=0.890)
    key = rng.sample_key(rng.base_key(42), 0)

    runner_a = sweep_mod.make_batch_runner(model, mcs, 1, "random")
    dt_a = _time_runner(runner_a, key)
    rate_a = model.nsites * mcs / dt_a
    log(f"aligned 8192^2 Metropolis: component batch runner "
        f"{rate_a:.3e} MCS-site/s ({dt_a:.2f}s)")

    os.environ["SPINLAT_XY_PERIODIC_ANGLE"] = "1"
    jax.clear_caches()
    runner_b = sweep_mod.make_xy_padded_runner(model, mcs, 1, "random")
    dt_b = _time_runner(runner_b, key)
    rate_b = model.nsites * mcs / dt_b
    log(f"aligned 8192^2 Metropolis: f32-angle runner "
        f"{rate_b:.3e} MCS-site/s ({dt_b:.2f}s)")
    log(f"aligned 8192^2 Metropolis: angle/component = "
        f"{rate_b / rate_a:.3f}")
    log("\nDONE")


if __name__ == "__main__":
    main()
