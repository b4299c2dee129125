"""3-D Ising model (±1 spins, ferromagnetic, J=1).

Capability parity with /root/reference/src/ising3d_gpu_m.f90: 3-D
checkerboard Metropolis with ΔE = 2·s·Σ₆nbr, precomputed `ws(0:6,0:1)`
acceptance table in CUDA constant memory (:136-172), `skip_curand` RNG
fast-forward (:72-77 → core/rng.py stream keying), energy via
`energy_table` lookups (:239-276).

TPU-native design:

- spins int8 (not the reference's 0/1 `spin_map` encoding — ±1 keeps
  ΔE = 2·s·Σnbr pure arithmetic; the 0/1 encoding existed to index the
  constant-memory ws table, which dissolves into three uint32 threshold
  selects here, core/tables.py);
- dual checkerboard color arrays (nz, ny, nx//2), color = (x+y+z) & 1;
- Pallas kernel grids over (replica, z-slice); each z-plane holds full
  (ny, nx//2) in VMEM so y/x neighbors wrap locally and only z±1 planes
  are fetched (ops/ising3d_pallas.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cuda_fortran_mc_simulation_spin_tpu.core import lattice, rng
from cuda_fortran_mc_simulation_spin_tpu.models.base import CheckerboardState


@dataclasses.dataclass(frozen=True)
class Ising3D:
    nx: int
    ny: int
    nz: int
    kbt: float
    backend: str = "auto"

    def __post_init__(self):
        if self.nx % 2 or self.ny % 2 or self.nz % 2:
            raise ValueError(
                "periodic 3-D checkerboard storage requires even dims, got "
                f"({self.nx}, {self.ny}, {self.nz})"
            )

    @property
    def beta(self) -> float:
        return 1.0 / self.kbt

    @property
    def nsites(self) -> int:
        return self.nx * self.ny * self.nz

    @property
    def color_shape(self) -> tuple[int, int, int]:
        return (self.nz, self.ny, self.nx // 2)

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

    # -- initial states ------------------------------------------------------
    def init_state(self, kind: str, key: jax.Array | None = None
                   ) -> CheckerboardState:
        shape = self.color_shape
        if kind == "allup":
            one = jnp.ones(shape, dtype=jnp.int8)
            return CheckerboardState(one, one)
        if kind == "random":
            ka, kb = jax.random.split(rng.phase_key(key, 0))
            a = jnp.where(rng.uniform(ka, shape) < 0.5, 1, -1)
            b = jnp.where(rng.uniform(kb, shape) < 0.5, 1, -1)
            return CheckerboardState(
                a.astype(jnp.int8), b.astype(jnp.int8)
            )
        raise ValueError(f"unknown init state {kind!r}")

    # -- sweep -----------------------------------------------------------------
    def _phase(self, spins, other, color, u, halos=None):
        """flip iff u ≤ exp(-β·ΔE), ΔE = 2·s·Σ₆nbr ∈ {0, ±4, ±8, ±12}
        (/root/reference/src/ising3d_gpu_m.f90:174-206).

        ``halos=(zm, zp)`` switches to the z-sharded local-block stencil
        (multi-chip domain decomposition, parallel/domain.py)."""
        if halos is None:
            nsum = lattice.neighbor_sums3d(other, color)  # |·| ≤ 6
        else:
            nsum = lattice.neighbor_sums3d_halo(other, *halos, color)
        k = spins * nsum  # ΔE/2 ∈ {-6..6 even}; rejecting levels 2,4,6
        b = self.beta
        thresh = jnp.where(
            k == 2, jnp.float32(np.exp(-4.0 * b)),
            jnp.where(k == 4, jnp.float32(np.exp(-8.0 * b)),
                      jnp.float32(np.exp(-12.0 * b))),
        )
        accept = (k <= 0) | (u < thresh)
        return jnp.where(accept, -spins, spins).astype(jnp.int8)

    def sweep(self, state: CheckerboardState, key: jax.Array
              ) -> CheckerboardState:
        if self.resolved_backend == "pallas":
            from cuda_fortran_mc_simulation_spin_tpu.ops import (
                ising3d_pallas,
            )
            return ising3d_pallas.sweep(self, state, key)
        return self.sweep_jnp(state, key)

    def sweep_jnp(self, state: CheckerboardState, key: jax.Array
                  ) -> CheckerboardState:
        a, b = state
        u0 = rng.uniform(rng.phase_key(key, 0), a.shape)
        a = self._phase(a, b, 0, u0)
        u1 = rng.uniform(rng.phase_key(key, 1), b.shape)
        b = self._phase(b, a, 1, u1)
        return CheckerboardState(a, b)

    def sweep_batched(self, state: CheckerboardState, key: jax.Array
                      ) -> CheckerboardState:
        if self.resolved_backend == "pallas":
            from cuda_fortran_mc_simulation_spin_tpu.ops import (
                ising3d_pallas,
            )
            return ising3d_pallas.sweep(self, state, key)
        nrep = state.a.shape[0]
        keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(
            jnp.arange(nrep)
        )
        return jax.vmap(self.sweep_jnp)(state, keys)

    # -- observables -------------------------------------------------------------
    def magne_sum(self, state: CheckerboardState) -> jax.Array:
        return (jnp.sum(state.a, dtype=jnp.int32)
                + jnp.sum(state.b, dtype=jnp.int32))

    def energy_sum(self, state: CheckerboardState) -> jax.Array:
        """-Σ s·(s_x+ + s_y+ + s_z+)
        (calc_energy_sum, /root/reference/src/ising3d_gpu_m.f90:239-259)."""
        a, b = state
        (ra, ya, za), (rb, yb, zb) = lattice.right_down_back_neighbors3d(
            a, b
        )
        ea = jnp.sum(
            a.astype(jnp.int32) * (ra + ya + za).astype(jnp.int32),
            dtype=jnp.int32,
        )
        eb = jnp.sum(
            b.astype(jnp.int32) * (rb + yb + zb).astype(jnp.int32),
            dtype=jnp.int32,
        )
        return -(ea + eb)

    def observables(self, state: CheckerboardState) -> dict[str, jax.Array]:
        n_inv = jnp.float32(1.0 / self.nsites)
        return {
            "m": self.magne_sum(state).astype(jnp.float32) * n_inv,
            "e": self.energy_sum(state).astype(jnp.float32) * n_inv,
        }

    # -- test oracles ---------------------------------------------------------------
    def full_lattice(self, state: CheckerboardState) -> np.ndarray:
        return np.asarray(
            lattice.merge_checkerboard3d(state.a, state.b), dtype=np.int64
        )

    @staticmethod
    def energy_sum_numpy(full: np.ndarray) -> int:
        e = 0
        for ax in (0, 1, 2):
            e -= int((full * np.roll(full, -1, axis=ax)).sum())
        return e
