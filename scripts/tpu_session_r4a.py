"""One-process TPU batch, round 4a: dense-XY tile-size A/B + helical
3-D Ising engine benchmarks at the reference's literal geometries.

Run: python scripts/tpu_session_r4a.py > /tmp/tpu_r4a.log 2>&1
(one long-lived process: the device claim is minutes; never kill it).

Stages (each guarded — a failure logs and continues):
  1. Dense helical XY Metropolis+OR at the committed 10001x10000 OR
     workload (/root/reference/app/xy2d_gpu_over_relaxation.f90:7-17)
     for ty in {16 (current picker), 40, 80} — the 16-row tiles fetch
     2x the other-color planes in halos; bigger tiles cut that.
  2. Helical 3-D Ising at the committed literal geometries
     (151x151x150 resident, 501x501x500 + 1001x1000x1000 streaming).
  3. XY periodic 1500^2 from-disorder baseline (the literal
     from_disorder geometry has nx/2=750 % 128 != 0, so it routes to
     the jnp phase engine today — the number the VMEM-resident
     multisweep must beat).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPINLAT_TEST_ON_TPU"] = "1"

import jax
import jax.numpy as jnp


def log(msg):
    print(msg, flush=True)


def stage(name):
    log(f"\n=== {name} === {time.strftime('%H:%M:%S')}")


def guarded(name, fn):
    stage(name)
    try:
        fn()
    except Exception as exc:  # noqa: BLE001 - keep the session alive
        log(f"STAGE FAILED {name}: {exc!r}")


results = {}


def _time_best(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def s0_devices():
    t0 = time.time()
    log(f"devices: {jax.devices()} (claim {time.time() - t0:.1f}s)")
    log(f"sum: {float(jnp.arange(8.0).sum())}")


def _dense_or_rate(ty: int | None, mcs: int = 32):
    """MCS-site/s of the dense M+OR schedule at 10001x10000, R=1."""
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d_helical import (
        XY2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        xy2d_helical_dense as xhd,
    )

    if ty is None:
        os.environ.pop("SPINLAT_XY_DENSE_TY", None)
    else:
        os.environ["SPINLAT_XY_DENSE_TY"] = str(ty)
    xhd._dense_phase.clear_cache()
    xhd._dense_or_phase.clear_cache()
    model = XY2DHelical(nx=10001, ny=10000, kbt=0.89)
    R = 1
    one = jnp.ones((R, model.nsites), jnp.float32)
    planes = xhd.pack_state((one, jnp.zeros_like(one)), model.ny,
                            model.nx)

    @jax.jit
    def chunk(planes, key):
        def body(planes, t):
            planes = xhd.sweep(model, planes,
                               jax.random.fold_in(key, t))
            planes, obs = xhd.over_relax_sweep_measure(model, planes)
            return planes, obs["m"]

        return jax.lax.scan(body, planes, jnp.arange(mcs))

    best = _time_best(lambda p, k: chunk(p, k)[1], planes,
                      rng.base_key(7))
    os.environ.pop("SPINLAT_XY_DENSE_TY", None)
    return model.nsites * R * mcs / best


def s1_dense_ty_ab():
    for ty in (None, 40, 80):
        label = "picker16" if ty is None else f"ty{ty}"
        v = _dense_or_rate(ty)
        results[f"xy_dense_or_{label}"] = v
        log(f"dense M+OR 10001x10000 {label}: {v:.3e} MCS-site/s "
            f"({1e12 / v:.1f}s per 1e4-MCS sample)")


def _h3_rate(nx, ny, nz, nrep, mcs, kbt):
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        sweep as sweep_mod,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.ising3d_helical import (
        Ising3DHelical,
    )

    model = Ising3DHelical(nx=nx, ny=ny, nz=nz, kbt=kbt)
    runner = sweep_mod.make_helical_runner(model, mcs, nrep, "allup")
    engine = getattr(runner, "engine", "?")
    if not getattr(runner, "host_chunked", False):
        runner = jax.jit(runner)
    best = _time_best(lambda k: runner(k)["m"], rng.base_key(42))
    return model.nsites * nrep * mcs / best, engine


def s2_h3_literals():
    v, eng = _h3_rate(151, 151, 150, nrep=16, mcs=256,
                      kbt=4.511454583186711)
    results["ising3d_151_packed"] = v
    log(f"ising3d 151x151x150 R=16 [{eng}]: {v:.3e} flips/s")
    v, eng = _h3_rate(151, 151, 150, nrep=64, mcs=256,
                      kbt=4.511454583186711)
    results["ising3d_151_packed_R64"] = v
    log(f"ising3d 151x151x150 R=64 [{eng}]: {v:.3e} flips/s")
    v, eng = _h3_rate(501, 501, 500, nrep=1, mcs=16,
                      kbt=4.51152174982078)
    results["ising3d_501_stream"] = v
    log(f"ising3d 501x501x500 R=1 [{eng}]: {v:.3e} flips/s")
    v, eng = _h3_rate(501, 501, 500, nrep=4, mcs=16,
                      kbt=4.51152174982078)
    results["ising3d_501_stream_R4"] = v
    log(f"ising3d 501x501x500 R=4 [{eng}]: {v:.3e} flips/s")
    v, eng = _h3_rate(1001, 1000, 1000, nrep=1, mcs=4, kbt=4.51152)
    results["ising3d_1001_stream"] = v
    log(f"ising3d 1001x1000x1000 R=1 [{eng}]: {v:.3e} flips/s")


def s3_from_disorder_baseline():
    """Current rate of the literal 1500^2 from-disorder schedule
    (jnp phase engine + separate obs/A passes)."""
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import protocols
    from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig

    cfg = RunConfig(model="xy2d", nx=1500, ny=1500, kbt=0.890,
                    mcs=256, tot_sample=1, init_state="random",
                    seed=42)
    model = protocols.build_model(cfg)
    log(f"resolved backend: {model.resolved_backend}")
    runner = jax.jit(protocols._xy_disorder_runner(model, cfg,
                                                   "rotate_first"))
    best = _time_best(lambda k: runner(k)["mx"], rng.base_key(3))
    v = model.nsites * cfg.mcs / best
    results["xy_from_disorder_1500_baseline"] = v
    log(f"from-disorder 1500^2 (current path): {v:.3e} MCS-site/s "
        f"({2.25e11 / v:.1f}s per 1e5-MCS sample)")


def main():
    guarded("devices", s0_devices)
    guarded("dense XY ty A/B", s1_dense_ty_ab)
    guarded("helical 3-D literals", s2_h3_literals)
    guarded("from-disorder 1500^2 baseline", s3_from_disorder_baseline)
    stage("summary")
    log(json.dumps(results))


if __name__ == "__main__":
    main()
