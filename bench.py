"""Headline benchmark: Ising2D spin-flip attempts/sec/chip.

Target (BASELINE.md): >= 1e10 flip attempts/s/chip on an 8192x8192
lattice with seeded, reproducible sweeps.  The reference publishes no
numbers (BASELINE.md), so vs_baseline is measured against that 1e10
target.

The headline engine is the bit-packed multispin kernel
(ops/ising2d_multispin.py, 32 spins/int32 word, boolean-algebra
Metropolis) measured on the no-measurement sweep loop (sweep_packed) —
physics-validated against Onsager equilibrium magnetization and the
bitwise packed oracle (tests/test_ising2d_multispin.py).  On CPU it
falls back to the jnp engine at toy size (the Pallas/PRNG path is
TPU-only).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "engine": <which kernel/protocol class the headline measured>,
   "secondary": {<BASELINE.md secondary metrics, each with engine,
                  value, unit>}}

Secondary metrics (TPU only — each a committed-workload class):
  - ising2d_ensemble_flips_per_sec: the *routed* ensemble path
    (VMEM-resident packed multisweep, per-sweep fused (m, e)) at
    2048^2 x 16 replicas — the reference's 1.44M-sample class
    (/root/reference/app/ising2d_gpu_relaxation.f90:6-8).
  - xy2d_or_mcs_sites_per_sec: XY Metropolis + over-relaxation at
    4096^2, per-MCS counting (1 Metropolis + 1 OR pass per MCS) —
    BASELINE.md's named secondary
    (/root/reference/app/xy2d_gpu_over_relaxation.f90:7-17).
  - clock_ensemble_flips_per_sec: the routed q=6 clock ensemble path
    with per-sweep m — the reference's largest production workload
    class (2000^2 x 1e5 MCS x 5000 samples,
    /root/reference/app/clock_dual_lattice_yhalf_tableall_gpu_relaxation
    .f90:8-9).
  - clock_literal2000_flips_per_sec: same routing at the LITERAL
    2000x2000 committed geometry — exercises the padded packed engine
    (word/lane-padded planes on the unchanged kernel).
  - clock_helical501_flips_per_sec: the LITERAL 501x500 committed
    geometry (/root/reference/app/clock_gpu_relaxation.f90:6-13)
    through the routed helical runner — the bit-sliced packed helical
    engine (ops/clock_helical_multispin.py) at R=100.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
from jax import lax

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D

BASELINE_FLIPS_PER_SEC = 1e10


def _time_best(fn, carry, key, reps=3):
    carry, m = fn(carry, key)  # compile + warmup
    jax.device_get(m)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        carry, m = fn(carry, key)
        jax.device_get(m)
        best = min(best, time.perf_counter() - t0)
    return best


def _headline(on_accel: bool):
    n = 8192 if on_accel else 256
    # long scan amortizes the per-dispatch host→device latency (~30ms
    # through the axon tunnel) so the kernel throughput dominates
    # (measured: 256 sweeps reports 2.9e11, 4096 sweeps 5.0e11 — the
    # fixed dispatch cost halves short runs)
    sweeps = 4096 if on_accel else 4

    model = Ising2D(nx=n, ny=n, kbt=2.26918531421)
    state = model.init_state("allup")

    if on_accel:
        from cuda_fortran_mc_simulation_spin_tpu.ops import (
            ising2d_multispin as msb,
        )

        wa = msb.pack_color(state.a[None])
        wb = msb.pack_color(state.b[None])

        @jax.jit
        def run(carry, key):
            wa, wb = carry

            def body(c, t):
                return msb.sweep_packed(model, c[0], c[1],
                                        rng.sweep_key(key, t)), ()

            (wa, wb), _ = lax.scan(body, (wa, wb), jnp.arange(sweeps))
            # fold in a reduction so the whole chain is live
            return (wa, wb), msb.popcount_sum(wa) + msb.popcount_sum(wb)

        carry = (wa, wb)
        engine = "ising2d_multispin.sweep_packed (bit-packed, no per-sweep measurement)"
    else:

        @jax.jit
        def run(state, key):
            def body(s, t):
                return model.sweep(s, rng.sweep_key(key, t)), ()

            s, _ = lax.scan(body, state, jnp.arange(sweeps))
            return s, model.magne_sum(s)

        carry = state
        engine = "jnp fallback (CPU)"

    best = _time_best(run, carry, rng.base_key(42))
    return model.nsites * sweeps / best, engine


def _ising_ensemble():
    """Routed ensemble path: VMEM-resident packed multisweep with fused
    per-sweep (m, e) at 2048^2 x 16 replicas."""
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        ising2d_multispin as msb,
    )

    nrep, n, chunk, n_chunks = 16, 2048, 64, 8
    model = Ising2D(nx=n, ny=n, kbt=2.26918531421)
    state = model.init_state("allup")
    wa = jnp.broadcast_to(msb.pack_color(state.a[None]),
                          (nrep, n // 32, n // 2)).copy()
    wb = jnp.broadcast_to(msb.pack_color(state.b[None]),
                          (nrep, n // 32, n // 2)).copy()

    @jax.jit
    def run(carry, key):
        def body(c, ci):
            wa, wb, obs = msb.multisweep_packed(
                model, c[0], c[1], key, chunk, t0=ci * chunk)
            return (wa, wb), obs["m"][:, -1]

        carry, ms = lax.scan(body, carry, jnp.arange(n_chunks))
        return carry, jnp.sum(ms)

    best = _time_best(run, (wa, wb), rng.base_key(42))
    return model.nsites * nrep * chunk * n_chunks / best


def _xy_or():
    """XY Metropolis + over-relaxation, per-MCS counting."""
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    n, mcs = 4096, 128
    model = XY2D(nx=n, ny=n, kbt=0.890)
    state = model.init_state("allup")

    @jax.jit
    def run(state, key):
        def body(s, t):
            s = model.sweep(s, rng.sweep_key(key, t))
            s = model.over_relax_sweep(s)
            return s, ()

        s, _ = lax.scan(body, state, jnp.arange(mcs))
        return s, model.magne_sums(s)[0]

    best = _time_best(run, state, rng.base_key(42))
    return model.nsites * mcs / best


def _clock_ensemble(n: int = 2048, mcs: int = 256, nrep: int = 16):
    """Routed q=6 clock ensemble path with per-sweep measurement at the
    2048^2 class (the reference's largest production workload).  At
    n=2000 the same routing engages the PADDED packed engine — the
    reference's literal committed geometry
    (/root/reference/src/clock/clock_dual_lattice_yhalf_tableall_m
    .f90:13); there R=40 replicas amortize the ~4.6% pad overhead
    (measured 1.10e11 vs 0.99e11 at R=16 — and 40 divides the committed
    5000-sample count, so it is also the production batch)."""
    from cuda_fortran_mc_simulation_spin_tpu.engine import protocols
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sweep_mod
    from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D

    model = Clock2D(nx=n, ny=n, kbt=0.80, q=6)
    cfg = RunConfig(model="clock", nx=n, ny=n, q=6, kbt=0.80, mcs=mcs,
                    tot_sample=nrep, replicas=nrep)
    if protocols._clock_multispin_eligible(cfg, model, {}):
        runner = jax.jit(sweep_mod.make_clock_multispin_runner(
            model, mcs, nrep, "allup"))
        engine = "clock_multispin (bit-sliced packed, fused per-sweep m/e)"
    elif protocols._multisweep_eligible(cfg, model, {}):
        runner = jax.jit(sweep_mod.make_multisweep_runner(
            model, mcs, nrep, "allup"))
        engine = "clock_multisweep (int8 VMEM multisweep, fused m/e)"
    else:
        return None, "no fast path"

    def timed(_carry, key):
        out = runner(key)
        return None, out["m"][:, -1].sum()

    best = _time_best(timed, None, rng.base_key(42))
    return model.nsites * nrep * mcs / best, engine


def _clock_helical():
    """The committed 501x500 clock geometry
    (/root/reference/app/clock_gpu_relaxation.f90:6-13) through the
    routed helical runner — the bit-sliced packed helical engine
    (ops/clock_helical_multispin.py) at the production batch R=100."""
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        sweep as sweep_mod,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.clock_helical import (
        Clock2DHelical,
    )

    nrep, mcs = 100, 1024
    model = Clock2DHelical(nx=501, ny=500, kbt=0.80, q=6)
    runner = sweep_mod.make_helical_runner(model, mcs, nrep, "allup")
    engine = getattr(runner, "engine", "helical runner")
    if not getattr(runner, "host_chunked", False):
        runner = jax.jit(runner)

    def timed(_carry, key):
        return None, runner(key)["m"][:, -1].sum()

    best = _time_best(timed, None, rng.base_key(42))
    return model.nsites * nrep * mcs / best, engine


def _xy_padded_or():
    """The 4000^2 periodic OR script workload's routed engine — the
    lane-PADDED kernels (nx/2 = 2000 is no lane multiple; previously
    the jnp fallback, ~1.5e9 site/s) at the literal parameters
    (/root/reference/scripts/fpm_run_xy2d_periodic_over_relaxation.sh:
    kbt=0.890, n_over_relax=1)."""
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        sweep as sweep_mod,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    n, mcs = 4000, 64
    model = XY2D(nx=n, ny=n, kbt=0.890)
    if not sweep_mod.xy_padded_eligible(model):
        return None, "padded gate did not engage"
    runner = sweep_mod.make_xy_padded_runner(
        model, mcs, 1, "allup", n_over_relax=1, mcs_over_relax=mcs)
    engine = getattr(runner, "engine", "padded runner")
    if not getattr(runner, "host_chunked", False):
        runner = jax.jit(runner)

    def timed(_carry, key):
        return None, runner(key)["m"][:, -1].sum()

    best = _time_best(timed, None, rng.base_key(42))
    return model.nsites * mcs / best, engine


def _xy_padded_metro():
    """The 10000^2 periodic relaxation literal's routed engine — the
    f32-ANGLE lane-padded kernels on the OR-free schedule (r5b A/B:
    1.49x the component engine; /root/reference/app/
    xy2d_periodic_gpu_relaxation.f90:7-13 geometry)."""
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        sweep as sweep_mod,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    n, mcs = 10000, 48
    model = XY2D(nx=n, ny=n, kbt=0.895)
    if not sweep_mod.xy_padded_eligible(model):
        return None, "padded gate did not engage"
    runner = sweep_mod.make_xy_padded_runner(model, mcs, 1, "allup")
    engine = getattr(runner, "engine", "padded runner")
    if not getattr(runner, "host_chunked", False):
        runner = jax.jit(runner)

    def timed(_carry, key):
        return None, runner(key)["m"][:, -1].sum()

    best = _time_best(timed, None, rng.base_key(42))
    return model.nsites * mcs / best, engine


def main() -> None:
    on_accel = jax.default_backend() not in ("cpu",)
    flips_per_sec, engine = _headline(on_accel)

    secondary = {}
    if on_accel:
        try:
            v = _ising_ensemble()
            secondary["ising2d_ensemble_flips_per_sec"] = {
                "value": v, "unit": "flip-attempts/s",
                "engine": "ising2d_multispin.multisweep_packed "
                          "(routed ensemble path, per-sweep m/e)",
            }
        except Exception as exc:  # pragma: no cover - bench resilience
            secondary["ising2d_ensemble_flips_per_sec"] = {
                "error": repr(exc)}
        try:
            v = _xy_or()
            secondary["xy2d_or_mcs_sites_per_sec"] = {
                "value": v, "unit": "MCS-site/s",
                "engine": "xy2d_pallas phase kernels + poly trig "
                          "(1 Metropolis + 1 OR pass per MCS)",
            }
        except Exception as exc:  # pragma: no cover - bench resilience
            secondary["xy2d_or_mcs_sites_per_sec"] = {"error": repr(exc)}
        try:
            v, eng = _clock_ensemble()
            if v is not None:
                secondary["clock_ensemble_flips_per_sec"] = {
                    "value": v, "unit": "flip-attempts/s", "engine": eng,
                }
        except Exception as exc:  # pragma: no cover - bench resilience
            secondary["clock_ensemble_flips_per_sec"] = {"error": repr(exc)}
        try:
            v, eng = _clock_ensemble(n=2000, nrep=40)
            if v is not None:
                secondary["clock_literal2000_flips_per_sec"] = {
                    "value": v, "unit": "flip-attempts/s",
                    "engine": eng + " [padded, literal 2000x2000]",
                }
        except Exception as exc:  # pragma: no cover - bench resilience
            secondary["clock_literal2000_flips_per_sec"] = {
                "error": repr(exc)}
        try:
            v, eng = _clock_helical()
            secondary["clock_helical501_flips_per_sec"] = {
                "value": v, "unit": "flip-attempts/s",
                "engine": eng + " [literal 501x500, R=100]",
            }
        except Exception as exc:  # pragma: no cover - bench resilience
            secondary["clock_helical501_flips_per_sec"] = {
                "error": repr(exc)}
        try:
            v, eng = _xy_padded_or()
            if v is not None:
                secondary["xy2d_padded4000_or_mcs_sites_per_sec"] = {
                    "value": v, "unit": "MCS-site/s",
                    "engine": eng + " [literal 4000x4000, M+OR]",
                }
        except Exception as exc:  # pragma: no cover - bench resilience
            secondary["xy2d_padded4000_or_mcs_sites_per_sec"] = {
                "error": repr(exc)}
        try:
            v, eng = _xy_padded_metro()
            if v is not None:
                secondary["xy2d_padded10000_metro_mcs_sites_per_sec"] = {
                    "value": v, "unit": "MCS-site/s",
                    "engine": eng + " [literal 10000x10000, Metropolis]",
                }
        except Exception as exc:  # pragma: no cover - bench resilience
            secondary["xy2d_padded10000_metro_mcs_sites_per_sec"] = {
                "error": repr(exc)}

    print(
        json.dumps(
            {
                "metric": "ising2d_flip_attempts_per_sec_per_chip",
                "value": flips_per_sec,
                "unit": "flip-attempts/s",
                "vs_baseline": flips_per_sec / BASELINE_FLIPS_PER_SEC,
                "engine": engine,
                "secondary": secondary,
            }
        )
    )


if __name__ == "__main__":
    main()
