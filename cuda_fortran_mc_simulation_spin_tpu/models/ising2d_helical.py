"""2-D Ising with helical (skew-periodic) boundary conditions.

Layout-parity engine for cross-checking against the reference's flat
"norishiro" array layout (/root/reference/src/ising2d_gpu_m.f90:52-54,
95-106): site ``idx`` on a flat (nall,) array neighbors ``idx±1`` and
``idx±nx`` modulo nall, and the checkerboard phases update
``idx % 2 == offset`` exactly as the reference's stride-2 indexing
(:155-157).  Supports the reference's odd nx (e.g. 1001×1000) which the
canonical dual-color periodic engine excludes.

This is deliberately the *jnp masked* formulation (half the lanes idle
per phase) — it exists for validation and for reproducing reference
geometries, not for speed; production runs use models/ising2d.py.
With odd nx the flat 2-coloring is a valid partition: idx and idx±1,
idx±nx always have opposite parity when nx is odd... which requires nx
odd for idx±nx; the reference's helical engines indeed commit nx = 1001
(odd) with ny = 1000 (/root/reference/app/ising2d_gpu_relaxation.f90:
8-9).  For even nx the ±nx neighbor has equal parity and parallel
updates would race — we refuse that combination (the reference silently
permits it; its committed sizes avoid it).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cuda_fortran_mc_simulation_spin_tpu.core import lattice, rng


@dataclasses.dataclass(frozen=True)
class Ising2DHelical:
    nx: int
    ny: int
    kbt: float

    def __post_init__(self):
        if self.nx % 2 == 0:
            raise ValueError(
                "helical checkerboard updates require odd nx (idx and "
                "idx±nx must differ in parity); the reference's committed "
                "helical sizes are odd×even, e.g. 1001×1000"
            )

    @property
    def beta(self) -> float:
        return 1.0 / self.kbt

    @property
    def nsites(self) -> int:
        return self.nx * self.ny

    def init_state(self, kind: str, key: jax.Array | None = None
                   ) -> jax.Array:
        if kind == "allup":
            return jnp.ones((self.nsites,), jnp.int8)
        if kind == "random":
            u = rng.uniform(rng.phase_key(key, 0), (self.nsites,))
            return jnp.where(u < 0.5, 1, -1).astype(jnp.int8)
        raise ValueError(f"unknown init state {kind!r}")

    def _phase(self, flat: jax.Array, offset: int, u: jax.Array
               ) -> jax.Array:
        nsum = lattice.helical_neighbor_sums(flat, self.nx)
        de = 2 * flat.astype(jnp.int32) * nsum.astype(jnp.int32)
        b = self.beta
        thresh = jnp.where(
            de == 4, jnp.float32(np.exp(-4.0 * b)),
            jnp.float32(np.exp(-8.0 * b)),
        )
        accept = (de <= 0) | (u < thresh)
        mask = lattice.helical_parity_mask(self.nsites, offset)
        return jnp.where(mask & accept, -flat, flat).astype(jnp.int8)

    def sweep(self, flat: jax.Array, key: jax.Array) -> jax.Array:
        """Offset-0 phase then offset-1 phase; the reference draws ONE
        random batch per MCS used by both phases
        (/root/reference/src/ising2d_gpu_m.f90:138-146) — mirrored here.
        """
        u = rng.uniform(rng.phase_key(key, 0), flat.shape)
        flat = self._phase(flat, 0, u)
        flat = self._phase(flat, 1, u)
        return flat

    def sweep_batched(self, flat: jax.Array, key: jax.Array) -> jax.Array:
        nrep = flat.shape[0]
        keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(
            jnp.arange(nrep)
        )
        return jax.vmap(self.sweep)(flat, keys)

    def magne_sum(self, flat: jax.Array) -> jax.Array:
        return jnp.sum(flat, dtype=jnp.int32)

    def energy_sum(self, flat: jax.Array) -> jax.Array:
        """-Σ s(idx)·(s(idx+1) + s(idx+nx))
        (/root/reference/src/ising2d_gpu_m.f90:202-211)."""
        f = flat.astype(jnp.int32)
        return -jnp.sum(
            f * (jnp.roll(f, -1) + jnp.roll(f, -self.nx)),
            dtype=jnp.int32,
        )

    def observables(self, flat: jax.Array) -> dict[str, jax.Array]:
        n_inv = jnp.float32(1.0 / self.nsites)
        return {
            "m": self.magne_sum(flat).astype(jnp.float32) * n_inv,
            "e": self.energy_sum(flat).astype(jnp.float32) * n_inv,
        }
