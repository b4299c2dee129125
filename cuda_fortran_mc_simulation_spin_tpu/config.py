"""Run configuration.

Replaces the reference's configuration mechanism — compile-time Fortran
`parameter ::` constants rewritten by `sed` from bash scripts before every
build (/root/reference/scripts/fpm_run.sh:11-16,
/root/reference/scripts/fpm_run_clock_test_core.sh:36-46,
/root/reference/app/ising2d_gpu_relaxation.f90:6-12) — with one runtime
dataclass covering the union of all tunables found in the reference's
apps, modules and scripts.
"""

from __future__ import annotations

import dataclasses
from typing import Literal, Sequence

ModelName = Literal["ising2d", "ising3d", "clock", "xy2d"]
InitState = Literal[
    "allup",        # set_allup_spin (ordered start)
    "random",       # set_random_spin (disorder start)
    "finite_magne",  # set_finite_magne_spin(m0) + rotate toward x-axis
    "small_magne",   # set_random_small_spin (drive |m| below threshold)
    "near_magne",    # set_random_near_spin (drive |m| near threshold)
]


@dataclasses.dataclass(frozen=True)
class RunConfig:
    model: ModelName = "ising2d"
    nx: int = 128
    ny: int = 128
    nz: int = 1                     # ising3d only
    q: int = 6                      # clock only (reference: state<=50)
    kbt: float = 2.26918531421      # 2D Ising Tc, app/ising2d_gpu_relaxation.f90:11
    mcs: int = 100                  # sweeps per sample
    tot_sample: int = 10            # independent MC histories
    seed: int = 42                  # reference's constant seed
    stream: int = 0                 # ensemble-split slot (≅ n_skip, §5.4)

    init_state: InitState = "allup"
    init_magne: float = 0.02        # finite_magne / small / near target
    near_magne_tol: float = 0.01    # near_magne relative tolerance

    # over-relaxation schedule (xy2d): after each Metropolis sweep while
    # t <= mcs_over_relax, run n_over_relax reflection sweeps
    # (app/xy2d_gpu_over_relaxation.f90:45-47).
    n_over_relax: int = 0
    mcs_over_relax: int = 0

    # protocol switches
    rotate_after_first_mcs: bool = False   # from_disorder_fix1mcs variant
    track_correlation: bool = False        # two-point C at (nx/2-1, ny/2-1)
    per_sample_output: bool = False        # *_samples apps: raw time series

    # observable schedule: None = every sweep; else measure only at these
    # 1-based times (the reference's *_specific_times "bin" protocol,
    # scripts/fpm_run_ising3d_relaxations_specific_times.sh:11,36).
    measure_times: Sequence[int] | None = None

    # replica axis (clock_gpu_multi n_multi / xy2d_periodic_samples
    # NUM_THREADS): vmapped independent histories per device step.
    replicas: int = 1

    # execution knobs
    use_pallas: bool | None = None   # None = auto (True on TPU)
    samples_per_call: int = 1        # batch of samples folded per dispatch
    # stop this invocation after folding this many samples (checkpoint
    # and exit cleanly) — time-sliced production runs; the next
    # invocation with the same config resumes where this one stopped.
    # Excluded from the checkpoint fingerprint (scheduling, not physics).
    max_samples_this_run: int | None = None

    # multi-chip mesh (parallel/): replicas shard over `dp`, the lattice's
    # leading spatial dim over `y`, and optionally the color-array
    # columns over `x` (the (dx, dy) decomposition, SURVEY.md §5.7).
    # (1, 1, 1) = single-device execution.
    mesh_dp: int = 1
    mesh_y: int = 1
    mesh_x: int = 1

    def __post_init__(self):
        if self.measure_times is not None:
            times = tuple(int(t) for t in self.measure_times)
            bad = [t for t in times if not (1 <= t <= self.mcs)]
            if bad:
                raise ValueError(
                    f"measure_times {bad} outside [1, mcs={self.mcs}]"
                )
            object.__setattr__(self, "measure_times", times)

    @property
    def nsites(self) -> int:
        n = self.nx * self.ny
        if self.model == "ising3d":
            n *= self.nz
        return n
