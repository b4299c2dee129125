"""One-process TPU batch for the round-3b additions.

Run: python scripts/tpu_session_r3b.py > /tmp/tpu_r3b.log 2>&1
(one long-lived process: the device claim is minutes; never kill it).

Stages (each guarded — a failure logs and continues):
  1. TPU-gated pytest for the new engines (packed q=4/q=3 Mosaic
     oracles, dense-XY fused OR, periodic fused OR).
  2. Benchmarks: packed q=4/q=3 routed ensembles (A/B vs int8), the
     dense helical XY Metropolis+OR workload (fused obs — the
     committed app/xy2d_gpu_over_relaxation.f90 geometry), and the
     periodic 4096^2 OR protocol via make_batch_runner.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


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


def s1_tests():
    import pytest

    rc = pytest.main([
        "-q", "-x", "--no-header", "-p", "no:cacheprovider",
        "tests/test_clock3_multispin.py",
        "tests/test_clock4_multispin.py",
        "tests/test_xy2d_pallas.py",
        "tests/test_xy2d_helical_dense.py",
    ])
    log(f"pytest rc={rc}")
    results["tests_rc"] = rc


def _clock_ensemble(q, n=2048, mcs=256, nrep=16, packed=True):
    import os

    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        sweep as sweep_mod,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D

    kbt = {6: 0.80, 4: 0.85, 3: 0.85}[q]
    model = Clock2D(nx=n, ny=n, kbt=kbt, q=q)
    if packed:
        os.environ.pop("SPINLAT_CLOCK_PACKED", None)
        runner = sweep_mod.make_clock_multispin_runner(
            model, mcs, nrep, "allup")
    else:
        runner = sweep_mod.make_multisweep_runner(
            model, mcs, nrep, "allup")
    if not getattr(runner, "host_chunked", False):
        runner = jax.jit(runner)
    from cuda_fortran_mc_simulation_spin_tpu.core import rng

    best = _time_best(lambda k: runner(k)["m"], rng.base_key(42))
    return model.nsites * nrep * mcs / best


def s2_clock4():
    v = _clock_ensemble(4)
    results["clock4_packed_flips"] = v
    log(f"clock q=4 packed routed ensemble 2048^2x16: {v:.3e} flips/s")
    v2 = _clock_ensemble(4, packed=False)
    results["clock4_int8_flips"] = v2
    log(f"clock q=4 int8 multisweep same harness:    {v2:.3e} flips/s")


def s3_clock3():
    v = _clock_ensemble(3)
    results["clock3_packed_flips"] = v
    log(f"clock q=3 packed routed ensemble 2048^2x16: {v:.3e} flips/s")
    v2 = _clock_ensemble(3, packed=False)
    results["clock3_int8_flips"] = v2
    log(f"clock q=3 int8 multisweep same harness:    {v2:.3e} flips/s")


def s4_xy_dense_or():
    """The committed OR workload: 10001x10000, Metropolis + 1 OR/MCS,
    per-sweep (m, my, e) — fused vs the separate-observables path."""
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d_helical import (
        XY2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        xy2d_helical_dense as xhd,
    )

    model = XY2DHelical(nx=10001, ny=10000, kbt=0.890)
    mcs = 48
    st = jax.vmap(lambda k: model.init_state("allup", k))(
        jax.random.split(rng.base_key(0), 1))
    planes0 = xhd.pack_state(st, model.ny, model.nx)

    @jax.jit
    def run_fused(planes, key):
        def body(p, t):
            p = xhd.sweep(model, p, rng.sweep_key(key, t))
            return xhd.over_relax_sweep_measure(model, p)

        planes, series = lax.scan(body, planes,
                                  jnp.arange(1, mcs + 1))
        return planes, series["m"]

    @jax.jit
    def run_sep(planes, key):
        def body(p, t):
            p = xhd.sweep(model, p, rng.sweep_key(key, t))
            p = xhd.over_relax_sweep(model, p)
            return p, xhd.observables(model, p)

        planes, series = lax.scan(body, planes,
                                  jnp.arange(1, mcs + 1))
        return planes, series["m"]

    best_f = _time_best(run_fused, planes0, rng.base_key(7))
    v_f = model.nsites * mcs / best_f
    results["xy_dense_or_fused_mcs_sites"] = v_f
    log(f"XY 10001x10000 M+OR fused obs:    {v_f:.3e} MCS-site/s")
    best_s = _time_best(run_sep, planes0, rng.base_key(7))
    v_s = model.nsites * mcs / best_s
    results["xy_dense_or_separate_mcs_sites"] = v_s
    log(f"XY 10001x10000 M+OR separate obs: {v_s:.3e} MCS-site/s "
        f"(fused is {v_f / v_s:.2f}x)")


def s5_xy_periodic_or():
    """Periodic 4096^2 OR protocol through make_batch_runner (now takes
    the fused over_relax_sweep_measure_batched hook)."""
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        sweep as sweep_mod,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    model = XY2D(nx=4096, ny=4096, kbt=0.890)
    mcs, nrep = 64, 4
    runner = jax.jit(sweep_mod.make_batch_runner(
        model, mcs, nrep, "allup", 1, mcs))
    best = _time_best(lambda k: runner(k)["m"], rng.base_key(5))
    v = model.nsites * nrep * mcs / best
    results["xy_periodic_or_protocol_mcs_sites"] = v
    log(f"XY 4096^2x4 OR protocol (fused): {v:.3e} MCS-site/s "
        f"(round-2 separate-measure: 1.05e10)")


def main():
    guarded("devices", s0_devices)
    guarded("tpu-gated tests", s1_tests)
    guarded("clock q=4 packed bench", s2_clock4)
    guarded("clock q=3 packed bench", s3_clock3)
    guarded("XY dense OR fused bench", s4_xy_dense_or)
    guarded("XY periodic OR protocol bench", s5_xy_periodic_or)
    stage("summary")
    log(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
