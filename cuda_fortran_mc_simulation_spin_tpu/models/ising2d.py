"""2-D Ising model (±1 spins, ferromagnetic, J=1).

Capability parity with /root/reference/src/ising2d_gpu_m.f90:
checkerboard Metropolis with ΔE = 2·s·Σ_nbr (:191-196), exp-LUT
acceptance (:120-131), all-up / random initial states (:63-84),
magnetization and bond-energy reductions (:198-228).

TPU-native design (not a translation):

- spins stored int8 in dual checkerboard color arrays (ny, nx//2)
  (core/lattice.py) — every VPU lane updates a real site each phase;
- the exp LUT collapses to two scalars: ΔE ∈ {-8,-4,0,4,8}, only
  ΔE ∈ {4, 8} have acceptance < 1, so acceptance is two f32 selects
  instead of a gather (gathers are slow on TPU, selects are free);
- acceptance uniforms come from counter-based keys (core/rng.py);
- the hot path has a fused Pallas kernel (ops/ising2d_pallas.py); this
  module's jnp implementation is the semantic reference, the multi-chip
  shard_map body, and the CPU test oracle.

Boundary conditions: periodic (canonical).  The reference's helical
("norishiro") BC (:52-54,95-106) is available for cross-checks via the
models/ising2d_helical.py engine.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cuda_fortran_mc_simulation_spin_tpu.core import lattice, rng
from cuda_fortran_mc_simulation_spin_tpu.models.base import CheckerboardState


@dataclasses.dataclass(frozen=True)
class Ising2D:
    nx: int
    ny: int
    kbt: float
    spin_dtype: jnp.dtype = jnp.int8
    backend: str = "auto"  # "jnp" | "pallas" | "auto"

    def __post_init__(self):
        lattice.LatticeSpec(self.nx, self.ny)  # validates even dims

    def _pallas_ok(self) -> bool:
        return (self.nx // 2) % 128 == 0 and self.ny % 32 == 0

    @property
    def resolved_backend(self) -> str:
        if self.backend == "auto":
            on_tpu = jax.default_backend() not in ("cpu", "gpu")
            return "pallas" if (on_tpu and self._pallas_ok()) else "jnp"
        if self.backend == "pallas" and not self._pallas_ok():
            raise ValueError(
                "pallas backend needs nx/2 % 128 == 0 and ny % 32 == 0, "
                f"got nx={self.nx}, ny={self.ny}"
            )
        return self.backend

    @property
    def beta(self) -> float:
        return 1.0 / self.kbt

    @property
    def nsites(self) -> int:
        return self.nx * self.ny

    @property
    def color_shape(self) -> tuple[int, int]:
        return (self.ny, self.nx // 2)

    # -- acceptance thresholds: exp(-β·ΔE) for ΔE = 4, 8 -------------------
    # (update_exparr, /root/reference/src/ising2d_gpu_m.f90:122-131; the
    # ΔE ≤ 0 entries are 1.0 so they never reject.)
    @property
    def accept_table(self) -> tuple[float, float]:
        b = self.beta
        return (float(np.exp(-4.0 * b)), float(np.exp(-8.0 * b)))

    # -- initial states -----------------------------------------------------
    def init_state(self, kind: str, key: jax.Array | None = None
                   ) -> CheckerboardState:
        shape = self.color_shape
        if kind == "allup":
            # set_allup_spin (/root/reference/src/ising2d_gpu_m.f90:63-66)
            one = jnp.ones(shape, dtype=self.spin_dtype)
            return CheckerboardState(one, one)
        if kind == "random":
            # set_random_spin: +1 iff u < 0.5 (:75-84)
            ka, kb = jax.random.split(rng.phase_key(key, 0))
            a = jnp.where(rng.uniform(ka, shape) < 0.5, 1, -1)
            b = jnp.where(rng.uniform(kb, shape) < 0.5, 1, -1)
            return CheckerboardState(
                a.astype(self.spin_dtype), b.astype(self.spin_dtype)
            )
        raise ValueError(f"unknown init state {kind!r}")

    # -- one checkerboard phase ---------------------------------------------
    def _phase(self, spins, other, color, u, halos=None):
        """Metropolis update of one color array given the other.

        flip iff u ≤ exp(-β·ΔE), ΔE = 2·s·Σnbr
        (/root/reference/src/ising2d_gpu_m.f90:148-162,191-196).

        ``halos=(up, dn)`` switches to the y-sharded local-block stencil;
        ``halos=(up, dn, left, right)`` to the (dx, dy)-sharded one
        (multi-chip domain decomposition, parallel/domain.py).
        """
        p4, p8 = self.accept_table
        if halos is None:
            nsum = lattice.neighbor_sums(other, color)      # int8, |·| ≤ 4
        elif len(halos) == 2:
            nsum = lattice.neighbor_sums_halo(other, *halos, color)
        else:
            nsum = lattice.neighbor_sums_halo2d(other, *halos, color)
        de = (2 * spins * nsum).astype(jnp.int8)            # ∈ {-8,-4,0,4,8}
        thresh = jnp.where(de == 4, jnp.float32(p4), jnp.float32(p8))
        accept = (de <= 0) | (u < thresh)
        return jnp.where(accept, -spins, spins).astype(self.spin_dtype)

    def sweep(self, state: CheckerboardState, key: jax.Array
              ) -> CheckerboardState:
        """One MCS: update color 0 then color 1 (two phases, as
        /root/reference/src/ising2d_gpu_m.f90:133-147).

        Dispatches to the fused Pallas kernel on TPU (hardware PRNG,
        int-threshold acceptance) or the jnp path elsewhere; both
        implement the same physics, with independent random streams.
        """
        if self.resolved_backend == "pallas":
            from cuda_fortran_mc_simulation_spin_tpu.ops import (
                ising2d_pallas,
            )
            return ising2d_pallas.sweep(self, state, key)
        return self.sweep_jnp(state, key)

    def sweep_batched(self, state: CheckerboardState, key: jax.Array
                      ) -> CheckerboardState:
        """One MCS for a replica batch — state arrays (R, ny, nx//2).

        The TPU-native form of the reference's replica engines
        (/root/reference/src/clock_gpu_multi_m.f90:200-236 2-D site×replica
        grid; /root/reference/src/xy2d_periodic_samples_gpu_m.f90:181-201
        thread-per-replica): Pallas uses a replica grid axis, the jnp path
        vmaps with per-replica keys.
        """
        if self.resolved_backend == "pallas":
            from cuda_fortran_mc_simulation_spin_tpu.ops import (
                ising2d_pallas,
            )
            return ising2d_pallas.sweep(self, state, key)
        nrep = state.a.shape[0]
        keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(
            jnp.arange(nrep)
        )
        return jax.vmap(self.sweep_jnp)(state, keys)

    def sweep_jnp(self, state: CheckerboardState, key: jax.Array
                  ) -> CheckerboardState:
        a, b = state
        u0 = rng.uniform(rng.phase_key(key, 0), a.shape)
        a = self._phase(a, b, 0, u0)
        u1 = rng.uniform(rng.phase_key(key, 1), b.shape)
        b = self._phase(b, a, 1, u1)
        return CheckerboardState(a, b)

    # -- observables ----------------------------------------------------------
    def magne_sum(self, state: CheckerboardState) -> jax.Array:
        """Σ s_i (calc_magne_sum, :214-228). int32-exact."""
        a, b = state
        return (jnp.sum(a, dtype=jnp.int32)
                + jnp.sum(b, dtype=jnp.int32))

    def energy_sum(self, state: CheckerboardState) -> jax.Array:
        """-Σ_i s_i (s_right + s_down) (calc_energy_sum, :198-212)."""
        a, b = state
        ra, da, rb, db = lattice.right_down_neighbors(a, b)
        ea = jnp.sum(a.astype(jnp.int32) * (ra + da).astype(jnp.int32),
                     dtype=jnp.int32)
        eb = jnp.sum(b.astype(jnp.int32) * (rb + db).astype(jnp.int32),
                     dtype=jnp.int32)
        return -(ea + eb)

    def observables(self, state: CheckerboardState) -> dict[str, jax.Array]:
        n_inv = jnp.float32(1.0 / self.nsites)
        return {
            "m": self.magne_sum(state).astype(jnp.float32) * n_inv,
            "e": self.energy_sum(state).astype(jnp.float32) * n_inv,
        }

    def observables_batched(self, state: CheckerboardState
                            ) -> dict[str, jax.Array]:
        """{m, e} for a replica batch; fused single-pass Pallas reduction
        on TPU (ops/ising2d_measure_pallas.py), vmapped jnp elsewhere."""
        if self.resolved_backend == "pallas":
            from cuda_fortran_mc_simulation_spin_tpu.ops import (
                ising2d_measure_pallas,
            )
            return ising2d_measure_pallas.measure(self, state)
        return jax.vmap(self.observables)(state)

    # -- exact references for tests -------------------------------------------
    def full_lattice(self, state: CheckerboardState) -> np.ndarray:
        return np.asarray(
            lattice.merge_checkerboard(state.a, state.b), dtype=np.int64
        )

    @staticmethod
    def energy_sum_numpy(full: np.ndarray) -> int:
        """Brute-force periodic bond energy, the test oracle."""
        right = np.roll(full, -1, axis=1)
        down = np.roll(full, -1, axis=0)
        return int(-(full * (right + down)).sum())
