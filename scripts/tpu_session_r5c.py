"""One-process TPU batch, round 5c: angle-storage DISORDER path.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_session_r5c.py
     > /tmp/tpu_r5c.log 2>&1

The padded disorder runner (VERDICT item 4) is Metropolis-only, where
angle storage measured 1.49x (r5b S3); with the snapshot in angle
storage the fused A(t) is one cos polynomial on the angle difference
and the measuring phase reads 4 planes + writes 1 vs the component
engine's 8 + 2.  Stages:
  1. On-chip correctness: sweep_measure_snap_angle at 4000^2
     from-disorder — A(1..3) vs the jnp ground truth (0.438, 0.272,
     0.199 at kbt=0.89) and finiteness.
  2. A/B: component vs angle through _xy_disorder_padded_runner
     (same schedule, same contention).
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


def guarded(name, fn):
    log(f"\n=== {name} === {time.strftime('%H:%M:%S')}")
    try:
        fn()
    except Exception as exc:  # noqa: BLE001
        log(f"STAGE FAILED {name}: {exc!r}")


def _run_disorder(n, mcs, env_angle):
    from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        protocols as proto,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    os.environ["SPINLAT_XY_PERIODIC_ANGLE"] = "1" if env_angle else "0"
    jax.clear_caches()
    model = XY2D(nx=n, ny=n, kbt=0.890)
    cfg = RunConfig(model="xy2d", nx=n, ny=n, kbt=0.890, mcs=mcs,
                    tot_sample=1)
    assert proto._xy_disorder_padded_eligible(cfg, model,
                                              "rotate_first")
    runner = proto._xy_disorder_padded_runner(model, cfg,
                                              "rotate_first", 1)
    if not getattr(runner, "host_chunked", False):
        runner = jax.jit(runner)
    key = rng.sample_key(rng.base_key(42), 0)
    out = runner(key)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = runner(key)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = time.perf_counter() - t0
    a = np.asarray(out["A"])
    return model.nsites * mcs / dt, dt, a


def s1_correctness():
    rate, dt, a = _run_disorder(4000, 128, True)
    log(f"angle disorder 4000^2: {rate:.3e} MCS-site/s ({dt:.2f}s); "
        f"A[0,:3]={a[0, :3]}, finite={np.isfinite(a).all()}")
    # jnp ground truth from disorder at kbt=0.89: (0.4387, 0.2703,
    # 0.1959) at 128^2 — size-independent to ~1e-3
    assert np.isfinite(a).all()
    assert abs(a[0, 0] - 0.4387) < 0.01
    assert abs(a[0, 1] - 0.2703) < 0.01
    assert abs(a[0, 2] - 0.1959) < 0.01
    log("S1 OK")


def s2_ab():
    comp, dtc, _ = _run_disorder(4000, 128, False)
    log(f"4000^2 from-disorder: component {comp:.3e} MCS-site/s "
        f"({dtc:.2f}s)")
    ang, dta, _ = _run_disorder(4000, 128, True)
    log(f"4000^2 from-disorder: f32-angle {ang:.3e} MCS-site/s "
        f"({dta:.2f}s)")
    log(f"4000^2 from-disorder: angle/component = {ang / comp:.3f}")


def main():
    log(f"devices: {jax.devices()}")
    guarded("S1 angle disorder correctness", s1_correctness)
    guarded("S2 disorder A/B", s2_ab)
    log("\nDONE")


if __name__ == "__main__":
    main()
