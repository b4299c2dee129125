"""One-process TPU batch, round 4h: f32-angle dense XY engine A/B.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_session_r4h.py
     > /tmp/tpu_r4h.log 2>&1

Stages:
  1. Angle kernels Mosaic vs interpret (Metropolis bitwise with shared
     uniforms; OR state to FMA ulp; obs close).
  2. Same-session A/B at the committed OR-literal geometry
     (10001x10000, M+OR, n_over_relax=1): component engine vs angle
     engine, MCS-site/s.  NOTE: runs concurrently with the production
     watchdogs — both sides see the same contention, so the RATIO is
     the honest number.
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


def guarded(name, fn):
    log(f"\n=== {name} === {time.strftime('%H:%M:%S')}")
    try:
        fn()
    except Exception as exc:  # noqa: BLE001
        log(f"STAGE FAILED {name}: {exc!r}")


results = {}


def s1_bitwise():
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d_helical import (
        XY2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        xy2d_helical_dense_angle as xha,
    )

    model = XY2DHelical(nx=257, ny=256, kbt=0.89)
    nc = xha.dense_nc(model.nx)
    kt = jax.random.PRNGKey(3)
    turns = jax.random.uniform(kt, (2, model.nsites), jnp.float32,
                               minval=-0.5, maxval=0.5)
    ang = xha.dense_pack(turns, model.ny, model.nx)
    w = ang[0].shape[-1]
    ku = jax.random.PRNGKey(11)
    u_c = jax.random.uniform(ku, (2, model.ny, w), jnp.float32)
    u_a = jax.random.uniform(jax.random.fold_in(ku, 1),
                             (2, model.ny, w), jnp.float32)
    kw = dict(color=0, beta=float(model.beta), nrep=2, ny=model.ny,
              nc=nc)
    got = xha._angle_phase(tuple(p + 0 for p in ang),
                           jnp.zeros(2, jnp.int32), u_c, u_a, **kw)
    want = xha._angle_phase(tuple(p + 0 for p in ang),
                            jnp.zeros(2, jnp.int32), u_c, u_a,
                            interpret=True, **kw)
    for g, wv in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(wv))
    log("angle Metropolis Mosaic == interpret bitwise")
    g2 = xha._angle_or_phase(got, color=1, nrep=2, ny=model.ny, nc=nc)
    w2 = xha._angle_or_phase(got, color=1, nrep=2, ny=model.ny, nc=nc,
                             interpret=True)
    for g, wv in zip(g2, w2):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                   rtol=0, atol=2.4e-7)
    log("angle OR Mosaic == interpret (FMA ulp)")
    results["angle_bitwise"] = True


def _rate(env_angle, tag, mcs=16):
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        sweep as sweep_mod,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d_helical import (
        XY2DHelical,
    )

    if env_angle:
        os.environ["SPINLAT_XY_DENSE_ANGLE"] = "1"
    else:
        os.environ.pop("SPINLAT_XY_DENSE_ANGLE", None)
    model = XY2DHelical(nx=10001, ny=10000, kbt=0.890)
    runner = sweep_mod.make_helical_runner(
        model, mcs, 1, "allup", n_over_relax=1, mcs_over_relax=mcs)
    log(f"engine: {getattr(runner, 'engine', '?')}")
    t0 = time.perf_counter()
    out = runner(rng.base_key(7))["m"]
    jax.block_until_ready(out)
    log(f"first call (compile+run): {time.perf_counter() - t0:.1f}s")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = runner(rng.base_key(7))["m"]
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    v = model.nsites * mcs / best
    results[tag] = v
    log(f"{tag}: {v:.3e} MCS-site/s ({best:.2f}s / {mcs} M+OR MCS)")
    return v


def s2_ab():
    vc = _rate(False, "xy_dense_component_mor")
    va = _rate(True, "xy_dense_angle_mor")
    results["angle_speedup"] = va / vc
    log(f"angle/component speedup: {va / vc:.2f}x")


def main():
    guarded("angle kernels bitwise on chip", s1_bitwise)
    guarded("OR-literal A/B component vs angle", s2_ab)
    log("\n=== summary ===")
    log(json.dumps(results))


if __name__ == "__main__":
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
