"""One-process TPU batch, round 5b: f32-angle periodic XY A/B.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_session_r5b.py
     > /tmp/tpu_r5b.log 2>&1

VERDICT r4 item 8: the 10000²/4000² padded periodic engines are
HBM-bound like the helical OR path where angle storage measured 1.94×;
a same-session A/B (component vs f32-angle, ops/xy2d_pallas vs
ops/xy2d_pallas_angle through the same make_xy_padded_runner schedule)
decides the default routing.  Runs concurrently with the production
watchdogs — RATIOS are the honest numbers.

Stages:
  1. Chip-gated angle-engine checks: padded M+OR at a small unaligned
     geometry, Mosaic vs interpret bitwise-free sanity (finite obs,
     |S|=1, energy conservation under OR).
  2. A/B 4000² Metropolis+OR (the or4000 script workload schedule,
     /root/reference/app/xy2d_periodic_gpu_over_relaxation.f90:7-17).
  3. A/B 10000² pure Metropolis (the relaxation literal geometry,
     /root/reference/app/xy2d_periodic_gpu_relaxation.f90:7-13).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, flush=True)


def guarded(name, fn):
    log(f"\n=== {name} === {time.strftime('%H:%M:%S')}")
    try:
        fn()
    except Exception as exc:  # noqa: BLE001
        log(f"STAGE FAILED {name}: {exc!r}")


def s1_checks():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        xy2d_pallas_angle as xa,
    )

    model = XY2D(nx=1000, ny=512, kbt=0.890)
    _, half = model.color_shape
    st = jax.vmap(lambda k: model.init_state("random", k))(
        jax.random.split(jax.random.PRNGKey(0), 1))
    planes = xa.pack_angles(st, half)
    key = rng.base_key(11)
    planes = xa.sweep_angle(model, planes, rng.sweep_key(key, 1))
    stf = xa.unpack_angles(planes, half)
    e0 = float(model.energy_sum(
        type(stf)(*(p[0] for p in stf)))) / model.nsites
    for _ in range(3):
        planes = xa.or_sweep_angle(model, planes)
    planes, obs = xa.or_sweep_measure_angle(model, planes)
    stf = xa.unpack_angles(planes, half)
    e1 = float(model.energy_sum(
        type(stf)(*(p[0] for p in stf)))) / model.nsites
    norm = np.asarray(stf.ax) ** 2 + np.asarray(stf.ay) ** 2
    log(f"OR energy drift: {abs(e1 - e0):.2e} (e0={e0:.6f}); "
        f"|S|-1 max {np.abs(norm - 1).max():.2e}; "
        f"fused e={float(obs['e'][0]):.6f} (vs {e1:.6f})")
    assert abs(e1 - e0) < 5e-4
    assert np.abs(norm - 1).max() < 3e-7
    assert abs(float(obs["e"][0]) - e1) < 5e-5
    log("S1 OK")


def _rate(n, mcs, n_or, env_angle):
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        sweep as sweep_mod,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    os.environ["SPINLAT_XY_PERIODIC_ANGLE"] = "1" if env_angle else "0"
    jax.clear_caches()
    model = XY2D(nx=n, ny=n, kbt=0.890)
    runner = sweep_mod.make_xy_padded_runner(
        model, mcs, 1, "random", n_over_relax=n_or,
        mcs_over_relax=mcs)
    if not getattr(runner, "host_chunked", False):
        runner = jax.jit(runner)
    key = rng.sample_key(rng.base_key(42), 0)
    out = runner(key)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = runner(key)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = time.perf_counter() - t0
    m = np.asarray(out["m"])
    assert np.isfinite(m).all()
    return model.nsites * mcs / dt, dt, float(m[0, -1])


def _ab(label, n, mcs, n_or):
    comp, dtc, mc = _rate(n, mcs, n_or, False)
    log(f"{label}: component {comp:.3e} MCS-site/s ({dtc:.2f}s), "
        f"m_last={mc:.4f}")
    ang, dta, ma = _rate(n, mcs, n_or, True)
    log(f"{label}: f32-angle {ang:.3e} MCS-site/s ({dta:.2f}s), "
        f"m_last={ma:.4f}")
    log(f"{label}: angle/component = {ang / comp:.3f}")


def s2_or4000_ab():
    _ab("4000^2 M+1OR", 4000, 192, 1)


def s3_relax10000_ab():
    _ab("10000^2 Metropolis", 10000, 64, 0)


def main():
    log(f"devices: {jax.devices()}")
    guarded("S1 angle engine on-chip checks", s1_checks)
    guarded("S2 4000^2 M+OR A/B", s2_or4000_ab)
    guarded("S3 10000^2 Metropolis A/B", s3_relax10000_ab)
    log("\nDONE")


if __name__ == "__main__":
    main()
