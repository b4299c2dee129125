"""Headline benchmark: Ising2D spin-flip attempts/sec/chip.

Target (BASELINE.md): >= 1e10 flip attempts/s/chip on an 8192x8192
lattice with seeded, reproducible sweeps.  The reference publishes no
numbers (BASELINE.md), so vs_baseline is measured against that 1e10
target.

The measured engine is the bit-packed multispin kernel
(ops/ising2d_multispin.py, 32 spins/int32 word, boolean-algebra
Metropolis) — ~2.6x the fused int8 phase kernels, physics-validated
against Onsager equilibrium magnetization and the bitwise packed
oracle (tests/test_ising2d_multispin.py).  On CPU it falls back to the
jnp engine at toy size (the Pallas/PRNG path is TPU-only).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
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


def main() -> None:
    on_accel = jax.default_backend() not in ("cpu",)
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
    else:

        @jax.jit
        def run(state, key):
            def body(s, t):
                return model.sweep(s, rng.sweep_key(key, t)), ()

            s, _ = lax.scan(body, state, jnp.arange(sweeps))
            return s, model.magne_sum(s)

        carry = state

    key = rng.base_key(42)
    carry, m = run(carry, key)  # compile + warmup
    jax.device_get(m)

    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        carry, m = run(carry, key)
        jax.device_get(m)
        best = min(best, time.perf_counter() - t0)

    flips_per_sec = model.nsites * sweeps / best
    print(
        json.dumps(
            {
                "metric": "ising2d_flip_attempts_per_sec_per_chip",
                "value": flips_per_sec,
                "unit": "flip-attempts/s",
                "vs_baseline": flips_per_sec / BASELINE_FLIPS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
