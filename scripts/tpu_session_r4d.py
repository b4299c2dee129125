"""One-process TPU batch, round 4d: block-halo 3-D validation + the
production stages the r4c TPU-worker crash took down.

Run: python scripts/tpu_session_r4d.py > /tmp/tpu_r4d.log 2>&1

Background (r4c log): lifting the resident-plane budget to 16K rows
made 501^3 take the resident multisweep, which spilled 137M of
registers against the 128M scoped-vmem cap; the 36-minute failing
compile then crashed the TPU worker and killed the xy-periodic and
from-disorder stages.  The resident budget is back at 1024 rows and
big geometries now route to the block-halo streaming engine
(ops/helical3d_multispin.py multisweep_stream_halo).

Stages:
  1. 501x501x500 block-halo: compile + rate (bar: >= 1e10 flips/s).
  2. 1001x1000x1000 app geometry block-halo: compile + rate (the
     funnel-shift streaming path measured 2.1e8 in r4b).
  3. xy2d_resident 1500^2 from-disorder rate probe (engine stamp must
     say xy2d_resident; r4b measured ~2.5x the per-phase path).
  4. PROD ising3d 501^3 specific-times (sample=1 literal + 16-sample
     companion, ~10 points/decade log schedule).
  5. PROD xy2d periodic 10000^2 relaxation (kbt=0.895, 1 sample).
  6. PROD from-disorder literal 1500^2 leg 1 (120 samples,
     checkpointed; later legs resume).
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


def s0_tests():
    # in-process (one device claim); remote compiles make a separate
    # pytest process pathologically slow, and killing one mid-compile
    # risks wedging the chip claim
    import pytest

    rc = pytest.main([
        "-q", "--no-header", "-p", "no:cacheprovider",
        "tests/test_helical3d_multispin.py", "-k", "halo",
    ])
    log(f"pytest halo rc={rc}")
    results["tests_halo_rc"] = rc
    assert rc == 0


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


def _halo_rate(dims, kbt, sweeps=16, tag=""):
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

    nx, ny, nz = dims
    model = Ising3DHelical(nx=nx, ny=ny, nz=nz, kbt=kbt)
    assert not h3.fits(model), "resident gate must NOT engage"
    assert h3.fits_stream_halo(model), "halo gate must engage"
    runner = sweep_mod.make_helical_runner(model, sweeps, 1, "allup")
    log(f"engine: {getattr(runner, 'engine', '?')}")
    if not getattr(runner, "host_chunked", False):
        runner = jax.jit(runner)
    t0 = time.perf_counter()
    out = runner(rng.base_key(42))["m"]
    jax.block_until_ready(out)
    log(f"first call (compile+run): {time.perf_counter() - t0:.1f}s")
    best = _time_best(lambda k: runner(k)["m"], rng.base_key(42),
                      reps=2)
    v = model.nsites * sweeps / best
    results[f"ising3d_halo_{tag}"] = v
    log(f"ising3d {nx}x{ny}x{nz} block-halo: {v:.3e} flips/s "
        f"({best:.2f}s / {sweeps} MCS)")


def s1_halo_501():
    _halo_rate((501, 501, 500), 4.51152174982078, tag="501")


def s2_halo_1001():
    _halo_rate((1001, 1000, 1000), 4.51152, sweeps=8, tag="1001")


def s3_resident_xy_rate():
    from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import protocols

    cfg = RunConfig(model="xy2d", nx=1500, ny=1500, kbt=0.890,
                    mcs=256, tot_sample=1, init_state="random",
                    seed=42)
    model = protocols.build_model(cfg)
    assert protocols._xy_resident_eligible(cfg, model, "rotate_first")
    runner = jax.jit(protocols._xy_disorder_resident_runner(
        model, cfg, "rotate_first", 1))
    best = _time_best(lambda k: runner(k)["mx"], rng.base_key(11),
                      reps=2)
    v = model.nsites * 256 / best
    results["xy_resident_1500_mcs_sites"] = v
    log(f"xy2d_resident 1500^2 from-disorder: {v:.3e} MCS-site/s")


def _cli(args):
    from cuda_fortran_mc_simulation_spin_tpu.runs.__main__ import main
    t0 = time.time()
    rc = main(args)
    log(f"cli rc={rc} elapsed={time.time() - t0:.1f}s: {' '.join(args)}")
    return rc


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
    guarded("on-chip halo tests", s0_tests)
    guarded("501^3 block-halo rate", s1_halo_501)
    guarded("1001x1000x1000 block-halo rate", s2_halo_1001)
    guarded("xy2d_resident 1500^2 rate", s3_resident_xy_rate)
    guarded("PROD ising3d 501^3 specific-times", s4_prod_501)
    guarded("PROD xy periodic 10000^2", s5_prod_xy_periodic_10000)
    guarded("PROD from-disorder 1500^2 leg 1", s6_prod_from_disorder_leg1)
    stage("summary")
    log(json.dumps(results))


if __name__ == "__main__":
    main()
