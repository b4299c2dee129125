"""One-process TPU batch, round 5a: unified PRNG keying on-chip.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_session_r5a.py
     > /tmp/tpu_r5a.log 2>&1

Stages:
  1. Chip-gated test files for the unified granule keying + the
     f32-angle default routing (in-process pytest).
  2. Same-session A/B: headline sweep_packed at 8192^2 — unified
     granule keying vs a tile-keyed stand-in (one reseed per tile,
     the round-4 cost structure).  Runs concurrently with the
     production watchdogs, so the RATIO is the honest number.
  3. Same A/B on the routed ensemble path (2048^2 x 16 resident
     multisweep) and the clock ensemble path.
  4. Padded DISORDER runner rate at the 4000^2 class (new path this
     round; previously the jnp fallback at ~1.5e9 site/s).
"""

from __future__ import annotations

import functools
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


def s1_tests():
    import pytest

    rc = pytest.main([
        "-q", "-p", "no:cacheprovider", "-x",
        "tests/test_ising2d_multispin.py",
        "tests/test_clock_multispin.py::"
        "test_sharded_packed6_x_split_parts_match_full_on_tpu",
        "tests/test_xy2d_dense_angle.py",
        "tests/test_ising3d_multispin.py",
        "-m", "not slow",
    ])
    log(f"pytest rc={rc}")
    if rc != 0:
        raise RuntimeError("chip-gated tests failed")


def _time_scan(fn, carry, reps=2):
    carry, out = fn(carry)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        carry, out = fn(carry)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _tile_keyed(s0, s1, rep_g, wrow0, nrows, w, w_total, col0, draw):
    """Round-4 cost structure: ONE reseed per tile, full-tile gens."""
    from jax.experimental.pallas import tpu as pltpu

    tag = (wrow0 * jnp.int32(-1640531527)
           + rep_g * jnp.int32(0x3C6EF35F))
    pltpu.prng_seed(s0, s1 ^ tag)

    def gen():
        return pltpu.bitcast(
            pltpu.prng_random_bits((nrows, w_total)), jnp.uint32)

    return draw((nrows, w_total), gen)


def _headline_rate(n=8192, sweeps=512):
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        ising2d_multispin as msb,
    )

    model = Ising2D(nx=n, ny=n, kbt=2.26918531421)
    state = model.init_state("allup")
    wa = msb.pack_color(state.a[None])
    wb = msb.pack_color(state.b[None])
    key = rng.base_key(42)

    @jax.jit
    def run(carry):
        wa, wb = carry

        def body(c, t):
            return msb.sweep_packed(model, c[0], c[1],
                                    rng.sweep_key(key, t)), ()

        (wa, wb), _ = jax.lax.scan(body, (wa, wb), jnp.arange(sweeps))
        return (wa, wb), msb.popcount_sum(wa) + msb.popcount_sum(wb)

    best = _time_scan(run, (wa, wb))
    return model.nsites * sweeps / best


def _ensemble_rate(n=2048, nrep=16, chunk=64, n_chunks=4):
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        ising2d_multispin as msb,
    )

    model = Ising2D(nx=n, ny=n, kbt=2.26918531421)
    state = model.init_state("allup")
    wa = jnp.broadcast_to(msb.pack_color(state.a[None]),
                          (nrep, n // 32, n // 2)).copy()
    wb = jnp.broadcast_to(msb.pack_color(state.b[None]),
                          (nrep, n // 32, n // 2)).copy()
    key = rng.base_key(42)

    @jax.jit
    def run(carry):
        def body(c, ci):
            wa, wb, obs = msb.multisweep_packed(
                model, c[0], c[1], key, chunk, t0=ci * chunk)
            return (wa, wb), obs["m"][:, -1]

        carry, ms = jax.lax.scan(body, carry, jnp.arange(n_chunks))
        return carry, jnp.sum(ms)

    best = _time_scan(run, (wa, wb))
    return model.nsites * nrep * chunk * n_chunks / best


def _clock_rate(n=2048, nrep=16, mcs=128):
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        sweep as sweep_mod,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D

    model = Clock2D(nx=n, ny=n, kbt=0.80, q=6)
    runner = jax.jit(sweep_mod.make_clock_multispin_runner(
        model, mcs, nrep, "allup"))

    def run(_c):
        out = runner(rng.base_key(42))
        return None, out["m"][:, -1].sum()

    best = _time_scan(run, None)
    return model.nsites * nrep * mcs / best


def _ab(label, fn):
    from cuda_fortran_mc_simulation_spin_tpu.ops import multispin_rng

    jax.clear_caches()
    granule = fn()
    log(f"{label}: granule-keyed  {granule:.3e}")
    orig = multispin_rng.granule_planes
    multispin_rng.granule_planes = _tile_keyed
    try:
        jax.clear_caches()
        tile = fn()
    finally:
        multispin_rng.granule_planes = orig
        jax.clear_caches()
    log(f"{label}: tile-keyed     {tile:.3e}")
    log(f"{label}: granule/tile = {granule / tile:.3f}")
    return granule, tile


def s2_headline_ab():
    _ab("headline 8192^2 sweep_packed flips/s", _headline_rate)


def s3_ensemble_ab():
    _ab("ensemble 2048^2x16 multisweep flips/s", _ensemble_rate)
    _ab("clock 2048^2x16 ensemble flips/s", _clock_rate)


def s4_padded_disorder_rate():
    from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        protocols as proto,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    n, mcs = 4000, 128
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
    rate = model.nsites * mcs / dt
    a = np.asarray(out["A"])
    log(f"padded disorder 4000^2 from-disorder: {rate:.3e} "
        f"MCS-site/s ({dt:.2f}s / {mcs} MCS); A[0,:3]={a[0, :3]}, "
        f"finite={np.isfinite(a).all()}")
    # sanity: A(1) ≈ P(reject) ≈ 0.44 from disorder at kbt=0.89 (the
    # committed 1500² literal's col-10 value is 0.43798)
    assert 0.3 < a[0, 0] <= 1.0


def main():
    log(f"devices: {jax.devices()}")
    guarded("S1 chip-gated tests", s1_tests)
    guarded("S2 headline keying A/B", s2_headline_ab)
    guarded("S3 ensemble keying A/Bs", s3_ensemble_ab)
    guarded("S4 padded disorder rate", s4_padded_disorder_rate)
    log("\nDONE")


if __name__ == "__main__":
    main()
