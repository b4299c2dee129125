"""One-process TPU batch, round 4b: resident-XY validation + rates,
helical 3-D streaming validation + rates, dense-XY ty=80 retry.

Run: python scripts/tpu_session_r4b.py > /tmp/tpu_r4b.log 2>&1
(one long-lived process; never kill it mid-execution).
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


def s0_devices():
    t0 = time.time()
    log(f"devices: {jax.devices()} (claim {time.time() - t0:.1f}s)")
    log(f"sum: {float(jnp.arange(8.0).sum())}")


def s1_tests():
    import pytest

    rc = pytest.main([
        "-q", "--no-header", "-p", "no:cacheprovider",
        "tests/test_xy2d_resident.py",
        "tests/test_helical3d_multispin.py",
    ])
    log(f"pytest rc={rc}")
    results["tests_rc"] = rc


def _resident_rate(nrep, mcs=256):
    """From-disorder schedule on the resident engine at the literal
    1500^2 geometry."""
    from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import protocols

    cfg = RunConfig(model="xy2d", nx=1500, ny=1500, kbt=0.890,
                    mcs=mcs, tot_sample=nrep, init_state="random",
                    seed=42, replicas=nrep)
    model = protocols.build_model(cfg)
    assert protocols._xy_resident_eligible(cfg, model, "rotate_first")
    runner = jax.jit(protocols._xy_disorder_resident_runner(
        model, cfg, "rotate_first", nrep))
    best = _time_best(lambda k: runner(k)["mx"], rng.base_key(11))
    return model.nsites * nrep * mcs / best


def s2_resident_rates():
    for nrep in (1, 2, 4):
        v = _resident_rate(nrep)
        results[f"xy_resident_1500_R{nrep}"] = v
        log(f"resident from-disorder 1500^2 R={nrep}: {v:.3e} "
            f"MCS-site/s ({2.25e11 / (v / nrep):.1f}s per "
            f"{nrep}-sample batch of 1e5 MCS)")


def s3_dense_ty80():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d_helical import (
        XY2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        xy2d_helical_dense as xhd,
    )

    for ty in (80, 200):
        os.environ["SPINLAT_XY_DENSE_TY"] = str(ty)
        xhd._dense_phase.clear_cache()
        xhd._dense_or_phase.clear_cache()
        model = XY2DHelical(nx=10001, ny=10000, kbt=0.89)
        one = jnp.ones((1, model.nsites), jnp.float32)
        planes = xhd.pack_state((one, jnp.zeros_like(one)), model.ny,
                                model.nx)

        @jax.jit
        def chunk(planes, key):
            def body(planes, t):
                planes = xhd.sweep(model, planes,
                                   jax.random.fold_in(key, t))
                planes, obs = xhd.over_relax_sweep_measure(model,
                                                           planes)
                return planes, obs["m"]

            return jax.lax.scan(body, planes, jnp.arange(32))

        try:
            best = _time_best(lambda p, k: chunk(p, k)[1], planes,
                              rng.base_key(7))
            v = model.nsites * 32 / best
            results[f"xy_dense_or_ty{ty}"] = v
            log(f"dense M+OR 10001x10000 ty{ty}: {v:.3e} MCS-site/s "
                f"({1e12 / v:.1f}s per 1e4-MCS sample)")
        except Exception as exc:  # noqa: BLE001
            log(f"ty{ty} failed: {exc!r}")
        finally:
            os.environ.pop("SPINLAT_XY_DENSE_TY", None)
            xhd._dense_phase.clear_cache()
            xhd._dense_or_phase.clear_cache()


def s4_h3_stream_rates():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        sweep as sweep_mod,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.ising3d_helical import (
        Ising3DHelical,
    )

    def rate(nx, ny, nz, nrep, mcs, kbt):
        model = Ising3DHelical(nx=nx, ny=ny, nz=nz, kbt=kbt)
        runner = sweep_mod.make_helical_runner(model, mcs, nrep,
                                               "allup")
        eng = getattr(runner, "engine", "?")
        if not getattr(runner, "host_chunked", False):
            runner = jax.jit(runner)
        best = _time_best(lambda k: runner(k)["m"], rng.base_key(42))
        return model.nsites * nrep * mcs / best, eng

    v, eng = rate(501, 501, 500, 1, 16, 4.51152174982078)
    results["ising3d_501_stream"] = v
    log(f"ising3d 501x501x500 R=1 [{eng}]: {v:.3e} flips/s")
    v, eng = rate(501, 501, 500, 4, 16, 4.51152174982078)
    results["ising3d_501_stream_R4"] = v
    log(f"ising3d 501x501x500 R=4 [{eng}]: {v:.3e} flips/s")
    v, eng = rate(1001, 1000, 1000, 1, 4, 4.51152)
    results["ising3d_1001_stream"] = v
    log(f"ising3d 1001x1000x1000 R=1 [{eng}]: {v:.3e} flips/s")


def main():
    guarded("devices", s0_devices)
    guarded("chip-gated tests (resident XY + helical 3-D)", s1_tests)
    guarded("resident from-disorder rates", s2_resident_rates)
    guarded("dense XY ty=80/200 (lifted vmem cap)", s3_dense_ty80)
    guarded("helical 3-D streaming rates", s4_h3_stream_rates)
    stage("summary")
    log(json.dumps(results))


if __name__ == "__main__":
    main()
