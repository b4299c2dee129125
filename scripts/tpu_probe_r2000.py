"""Quick probe: routed clock 2000x2000 kbt=0.91 throughput vs replica
count, to pick the replica batch for the literal 5000-sample production
run (5000 % R == 0 required by the sample batching).

Run: python scripts/tpu_probe_r2000.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sweep_mod
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D

    print(f"devices: {jax.devices()}", flush=True)
    mcs = 256
    for nrep in (8, 16, 20, 40):
        model = Clock2D(nx=2000, ny=2000, kbt=0.91, q=6)
        try:
            runner = sweep_mod.make_clock_multispin_runner(
                model, mcs, nrep, "allup")
            if not getattr(runner, "host_chunked", False):
                runner = jax.jit(runner)
            out = runner(rng.base_key(42))["m"]
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = runner(rng.base_key(42))["m"]
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            rate = model.nsites * nrep * mcs / best
            print(f"R={nrep:3d}: {rate:.3e} flips/s "
                  f"({best:.2f}s for {mcs} MCS)", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"R={nrep:3d}: FAILED {exc!r}", flush=True)


if __name__ == "__main__":
    main()
