"""One-process TPU batch, round 4g: lane-padded periodic XY engine
on-chip validation + the two periodic-XY literal productions it
unblocks.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_session_r4g.py
     > /tmp/tpu_r4g.log 2>&1

Stages:
  1. Padded kernels Mosaic vs interpret BITWISE (shared uniforms) on an
     unaligned width; padded OR fused obs exactness.
  2. Rate probes: 4000^2 M+OR and 10000^2 Metropolis on the padded
     runner (the previous jnp fallback was ~1.5e9 site/s and its
     monolithic dispatch crashed the worker).
  3. PROD xy2d periodic 10000^2 relaxation s=1
     (/root/reference/app/xy2d_periodic_gpu_relaxation.f90:7-13).
  4. PROD xy2d periodic 4000^2 over-relaxation leg 1 of the 3125-sample
     script workload (/root/reference/scripts/
     fpm_run_xy2d_periodic_over_relaxation.sh: kbt=0.890, mcs=1e4,
     n_over_relax=1, mcs_over_relax=mcs), checkpointed.
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
import numpy as np


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


def _cli(args):
    from cuda_fortran_mc_simulation_spin_tpu.runs.__main__ import main
    t0 = time.time()
    rc = main(args)
    log(f"cli rc={rc} elapsed={time.time() - t0:.1f}s: {' '.join(args)}")
    return rc


def s1_padded_bitwise():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas as xp

    model = XY2D(nx=522, ny=256, kbt=0.89, backend="jnp")
    ny, half = model.color_shape
    w = xp.pad_width(half)
    st = jax.vmap(lambda k: model.init_state("random", k))(
        jax.random.split(rng.base_key(0), 2))
    stp = xp.pad_planes(st, half)
    ku = jax.random.PRNGKey(5)
    u_c = jax.random.uniform(ku, (2, ny, w), jnp.float32)
    u_a = jax.random.uniform(jax.random.fold_in(ku, 1), (2, ny, w),
                             jnp.float32)
    kw = dict(beta=float(model.beta), nrep=2, ny=ny, half=w,
              valid_half=half, u_cand=u_c, u_acc=u_a)
    got = xp._metropolis_phase(stp.ax, stp.ay, stp.bx, stp.by,
                               jnp.zeros(2, jnp.int32), color=0, **kw)
    want = xp._metropolis_phase(stp.ax, stp.ay, stp.bx, stp.by,
                                jnp.zeros(2, jnp.int32), color=0,
                                interpret=True, **kw)
    for g, wv in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(wv))
    log("padded Metropolis Mosaic == interpret bitwise (522 wide)")

    kwo = dict(nrep=2, ny=ny, half=w, valid_half=half, measuring=True)
    g = xp._over_relax_phase(stp.bx, stp.by, got[0], got[1], color=1,
                             **kwo)
    wv = xp._over_relax_phase(stp.bx, stp.by, got[0], got[1], color=1,
                              interpret=True, **kwo)
    for a, b in zip(g[:2], wv[:2]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # obs rows are f32 tree reductions — Mosaic's lane-reduction order
    # differs from interpret's (measured 1.3e-6 rel on the first run of
    # this session); states must stay bitwise, obs to f32 sum accuracy
    np.testing.assert_allclose(np.asarray(g[2]), np.asarray(wv[2]),
                               rtol=3e-6, atol=0)
    log("padded OR Mosaic == interpret bitwise (obs to 3e-6 rel)")
    np.testing.assert_array_equal(np.asarray(g[0][..., half:]), 0.0)
    results["padded_bitwise"] = True


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


def _runner_rate(nx, mcs, n_or, tag):
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    model = XY2D(nx=nx, ny=nx, kbt=0.89)
    assert sw.xy_padded_eligible(model), "padded gate must engage"
    runner = sw.make_xy_padded_runner(model, mcs, 1, "allup",
                                      n_over_relax=n_or,
                                      mcs_over_relax=mcs if n_or else 0)
    if not getattr(runner, "host_chunked", False):
        runner = jax.jit(runner)
    t0 = time.perf_counter()
    out = runner(rng.base_key(7))["m"]
    jax.block_until_ready(out)
    log(f"first call (compile+run): {time.perf_counter() - t0:.1f}s")
    best = _time_best(lambda k: runner(k)["m"], rng.base_key(7), reps=2)
    v = model.nsites * mcs / best
    results[tag] = v
    log(f"{tag}: {v:.3e} MCS-site/s ({best:.2f}s / {mcs} MCS)")


def s2_rates():
    _runner_rate(4000, 64, 1, "xy_padded_4000_mor")
    _runner_rate(10000, 32, 0, "xy_padded_10000_metropolis")


def s3_prod_xy_periodic_10000():
    _cli(["--model", "xy2d", "--nx", "10000", "--ny", "10000",
          "--kbt", "0.895", "--mcs", "10000", "--samples", "1",
          "--seed", "42",
          "--output",
          "data/production/xy2d_periodic_10000x10000_mcs10000_s1.dat",
          "--registry", "data/production/runs.log"])


def s4_prod_xy_periodic_or_4000_leg1():
    _cli(["--model", "xy2d", "--nx", "4000", "--ny", "4000",
          "--kbt", "0.890", "--mcs", "10000", "--samples", "3125",
          "--seed", "42", "--n-over-relax", "1",
          "--mcs-over-relax", "10000",
          "--max-samples-this-run", "125",
          "--checkpoint", "data/production/xy_or4000.ck.npz",
          "--checkpoint-every", "25",
          "--output",
          "data/production/"
          "xy2d_periodic_or_4000x4000_mcs10000_s3125.dat",
          "--registry", "data/production/runs.log"])


def main():
    guarded("padded kernels bitwise on chip", s1_padded_bitwise)
    guarded("padded rate probes", s2_rates)
    guarded("PROD xy periodic 10000^2", s3_prod_xy_periodic_10000)
    guarded("PROD xy periodic OR 4000^2 leg 1",
            s4_prod_xy_periodic_or_4000_leg1)
    stage("summary")
    log(json.dumps(results))


if __name__ == "__main__":
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
