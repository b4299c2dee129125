"""One-process TPU batch for the packed helical clock engine
(ops/clock_helical_multispin.py) and the helical host-chunking.

Run: python scripts/tpu_session_r3d.py > /tmp/tpu_r3d.log 2>&1
(one long-lived process: the device claim is minutes; never kill it).

Stages (each guarded — a failure logs and continues):
  1. TPU-gated pytest: the packed helical clock validation ladder
     (Mosaic phase vs jnp oracle, absorbing + fused obs, equilibrium
     energy vs the masked engine, runner routing) and the Ising
     packed-runner host-chunk bitwise tests.
  2. Benchmarks: the committed 501x500 clock geometry
     (/root/reference/app/clock_gpu_relaxation.f90:6-13) through
     make_helical_runner — packed engine vs the masked single-block
     kernel, replica scaling R in {40, 100, 160, 256}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPINLAT_TEST_ON_TPU"] = "1"

import jax


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
    import jax.numpy as jnp

    t0 = time.time()
    log(f"devices: {jax.devices()} (claim {time.time() - t0:.1f}s)")
    log(f"sum: {float(jnp.arange(8.0).sum())}")


def s1_tests():
    import pytest

    rc = pytest.main([
        "-q", "-x", "--no-header", "-p", "no:cacheprovider",
        "tests/test_clock_helical_multispin.py",
        "tests/test_host_chunk.py",
    ])
    log(f"pytest rc={rc}")
    results["tests_rc"] = rc


def _clock_helical(nrep, mcs=1024, packed=True):
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        sweep as sweep_mod,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.clock_helical import (
        Clock2DHelical,
    )

    if packed:
        os.environ.pop("SPINLAT_CLOCK_HELICAL_PACKED", None)
    else:
        os.environ["SPINLAT_CLOCK_HELICAL_PACKED"] = "0"
    model = Clock2DHelical(nx=501, ny=500, kbt=0.80, q=6)
    runner = sweep_mod.make_helical_runner(model, mcs, nrep, "allup")
    if not getattr(runner, "host_chunked", False):
        runner = jax.jit(runner)
    best = _time_best(lambda k: runner(k)["m"], rng.base_key(42))
    os.environ.pop("SPINLAT_CLOCK_HELICAL_PACKED", None)
    return model.nsites * nrep * mcs / best


def s2_packed_scaling():
    for nrep in (40, 100, 160, 256):
        v = _clock_helical(nrep)
        results[f"clock_helical_packed_R{nrep}"] = v
        log(f"clock 501x500 packed helical R={nrep}: {v:.3e} flips/s")


def s3_masked_ab():
    v = _clock_helical(100, packed=False)
    results["clock_helical_masked_R100"] = v
    log(f"clock 501x500 masked helical R=100: {v:.3e} flips/s")


def main():
    guarded("devices", s0_devices)
    guarded("tpu-gated tests", s1_tests)
    guarded("packed helical clock scaling", s2_packed_scaling)
    guarded("masked helical clock A/B", s3_masked_ab)
    stage("summary")
    log(json.dumps(results))


if __name__ == "__main__":
    main()
