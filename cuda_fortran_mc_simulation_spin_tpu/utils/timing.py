"""Throughput metrics and profiling hooks.

The reference's only performance instrumentation is wall-clock seconds in
shell scripts (/root/reference/scripts/fpm_run_ising3d.sh:41-60, SURVEY.md
§5.1).  Here throughput is a first-class report: sweeps/s and
flip-attempts/s measured around jitted runs, plus an optional JAX
profiler trace for kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax


@dataclasses.dataclass
class Throughput:
    seconds: float
    sweeps: int
    sites: int
    replicas: int = 1

    @property
    def sweeps_per_sec(self) -> float:
        return self.sweeps * self.replicas / self.seconds

    @property
    def flips_per_sec(self) -> float:
        return self.sweeps_per_sec * self.sites

    def report(self) -> str:
        return (
            f"{self.sweeps_per_sec:.1f} sweeps/s, "
            f"{self.flips_per_sec:.3e} flip-attempts/s "
            f"({self.sites} sites x {self.replicas} replicas)"
        )


def measure(fn, *args, sweeps: int, sites: int, replicas: int = 1,
            warmup: int = 1, reps: int = 3) -> Throughput:
    """Best-of-reps wall time of ``fn(*args)``; forces completion via
    device_get of the result tree (block_until_ready alone can return
    early through remote-device tunnels)."""
    for _ in range(warmup):
        jax.device_get(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return Throughput(best, sweeps, sites, replicas)


@contextlib.contextmanager
def profile(log_dir: str | None):
    """JAX profiler trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
