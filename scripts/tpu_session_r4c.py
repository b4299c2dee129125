"""One-process TPU batch, round 4c: 501³ resident validation + first
production runs at the reference's literal 3-D geometries.

Run: python scripts/tpu_session_r4c.py > /tmp/tpu_r4c.log 2>&1

Stages:
  1. 501x501x500 resident multisweep: compile + rate (the r4b streaming
     measurement was 8.8e8 flips/s; the lifted 16K-row resident gate
     should put it at the 1e11 class).  On OOM this logs and the
     production stage skips the geometry.
  2. dense-XY default tile: assert the picker now lands on ty=80.
  3. PRODUCTION ising3d 151x151x150 relaxation — the literal
     fpm_run_ising3d.sh workload (mcs=1000, sample=10000,
     kbt=4.511454583186711, iseed 42).
  4. PRODUCTION ising3d 501x501x500 specific-times (sample=1 literal +
     a 16-sample companion, log schedule ~10 points/decade).
  5. PRODUCTION xy2d periodic 10000^2 relaxation (kbt=0.895, 1 sample,
     mcs=1e4 — the header-only round-3 artifact, redone atomically).
  6. PRODUCTION from-disorder literal 1500^2 leg 1 (checkpointed;
     later legs resume).
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
    except Exception as exc:  # noqa: BLE001
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


def s1_resident_501():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        sweep as sweep_mod,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.ising3d_helical import (
        Ising3DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        helical3d_multispin as h3,
    )

    model = Ising3DHelical(nx=501, ny=501, nz=500,
                           kbt=4.51152174982078)
    assert h3.fits(model), "501^3 resident gate did not engage"
    runner = sweep_mod.make_helical_runner(model, 32, 1, "allup")
    log(f"engine: {getattr(runner, 'engine', '?')}")
    if not getattr(runner, "host_chunked", False):
        runner = jax.jit(runner)
    best = _time_best(lambda k: runner(k)["m"], rng.base_key(42))
    v = model.nsites * 32 / best
    results["ising3d_501_resident"] = v
    log(f"ising3d 501x501x500 R=1 resident: {v:.3e} flips/s")


def s2_dense_ty_default():
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        xy2d_helical_dense as xhd,
    )

    ty = xhd._pick_ty(10000, 5120)
    log(f"dense picker ty(10000, 5120) = {ty}")
    assert ty == 80, ty
    results["dense_ty_default"] = ty


def _cli(args):
    from cuda_fortran_mc_simulation_spin_tpu.runs.__main__ import main
    t0 = time.time()
    rc = main(args)
    log(f"cli rc={rc} elapsed={time.time() - t0:.1f}s: {' '.join(args)}")
    return rc


def s3_prod_151():
    _cli(["--model", "ising3d", "--nx", "151", "--ny", "151",
          "--nz", "150", "--kbt", "4.511454583186711",
          "--mcs", "1000", "--samples", "10000", "--replicas", "40",
          "--seed", "42",
          "--checkpoint", "data/production/ising3d_151.ck.npz",
          "--checkpoint-every", "2000",
          "--output",
          "data/production/ising3d_151x151x150_mcs1000_s10000.dat",
          "--registry", "data/production/runs.log"])


def _log_times(mcs, per_decade=10):
    ts, k = [], 0
    while True:
        t = int(round(10 ** (k / per_decade)))
        if t > mcs:
            break
        ts.append(t)
        k += 1
    return sorted(set(ts))


def s4_prod_501():
    times = [str(t) for t in _log_times(10000)]
    _cli(["--model", "ising3d", "--nx", "501", "--ny", "501",
          "--nz", "500", "--kbt", "4.51152174982078",
          "--mcs", "10000", "--samples", "1", "--seed", "42",
          "--measure-times"] + times + [
          "--output",
          "data/production/"
          "ising3d_501x501x500_specific_times_mcs10000_s1.dat",
          "--registry", "data/production/runs.log"])
    _cli(["--model", "ising3d", "--nx", "501", "--ny", "501",
          "--nz", "500", "--kbt", "4.51152174982078",
          "--mcs", "10000", "--samples", "16", "--seed", "42",
          "--measure-times"] + times + [
          "--output",
          "data/production/"
          "ising3d_501x501x500_specific_times_mcs10000_s16.dat",
          "--registry", "data/production/runs.log"])


def s5_prod_xy_periodic_10000():
    _cli(["--model", "xy2d", "--nx", "10000", "--ny", "10000",
          "--kbt", "0.895", "--mcs", "10000", "--samples", "1",
          "--seed", "42",
          "--output",
          "data/production/xy2d_periodic_10000x10000_mcs10000_s1.dat",
          "--registry", "data/production/runs.log"])


def s6_prod_from_disorder_leg1():
    _cli(["--model", "xy2d", "--nx", "1500", "--ny", "1500",
          "--kbt", "0.890", "--protocol", "from_disorder",
          "--init-state", "random", "--mcs", "100000",
          "--samples", "2222", "--seed", "42",
          "--max-samples-this-run", "120",
          "--checkpoint", "data/production/xy_fd_1500.ck.npz",
          "--checkpoint-every", "40",
          "--output",
          "data/production/"
          "xy2d_from_disorder_1500x1500_mcs100000_s2222.dat",
          "--registry", "data/production/runs.log"])


def main():
    guarded("501^3 resident", s1_resident_501)
    guarded("dense ty default", s2_dense_ty_default)
    guarded("PROD ising3d 151^3 relaxation", s3_prod_151)
    guarded("PROD ising3d 501^3 specific-times", s4_prod_501)
    guarded("PROD xy periodic 10000^2", s5_prod_xy_periodic_10000)
    guarded("PROD from-disorder 1500^2 leg 1", s6_prod_from_disorder_leg1)
    stage("summary")
    log(json.dumps(results))


if __name__ == "__main__":
    main()
