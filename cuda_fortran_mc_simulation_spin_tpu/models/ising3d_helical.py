"""3-D Ising with the reference's helical (skew-periodic) layout.

The reference stores the 3-D lattice as ONE flat array with plane
halos: site ``idx`` neighbors ``idx±1``, ``idx±nx`` and ``idx±nx·ny``
modulo nall (/root/reference/src/ising3d_gpu_m.f90:50-71 allocates
``spins_(1-nxy : nall+nxy)`` and :104-120 mirrors the wrap planes;
:190-206 reads the six flat-offset neighbors), and checkerboards by
flat-index parity (offset-1/offset-2 stride-2 launches, :180-187).

Parity algebra (mirrors models/ising2d_helical.py):

- ``±1`` always flips parity;
- ``±nx`` flips parity iff nx is odd — required (as in 2-D);
- ``±nx·ny`` flips parity iff nx·ny is odd.

The committed script geometries 151×151×150 and 501×501×500
(/root/reference/scripts/fpm_run_ising3d.sh:7-9,
scripts/fpm_run_ising3d_relaxations_specific_times.sh:7-9) have odd
nx·ny: all six neighbors are cross-parity and the two-coloring is
exact.  The committed app geometry 1001×1000×1000
(/root/reference/app/ising3d_gpu_relaxation.f90:8-10) has EVEN nx·ny,
so the z-neighbors of a site share its parity — the reference's own
stride-2 CUDA kernel updates z-neighbor pairs concurrently there
(reads may observe pre- or post-flip values nondeterministically).
That race is not benign: simultaneous Metropolis co-updates of coupled
z-pairs (each reading the other's OLD spin) are the classic parallel-
update pathology — a round-4 production run of the deterministic
"read-old" realization at the literal app geometry drove e(t) to +0.95
(impossible for any equilibrium of this Hamiltonian).  The lattice
graph is non-bipartite under {±1, ±nx, ±nxy} when nx·ny is even (the
+1-chain/+nxy cycle has odd length nxy+1), so no 2-phase schedule can
be exact.  The EXACT schedule used here: within one flat-parity color
the only couplings are the z-offsets, whose rings have length nz (even
for every committed geometry) — each color phase therefore splits into
two z-plane-parity sub-phases, 4 masked sub-phases per MCS, every
neighbor fully settled when read.  Even nx·ny with ODD nz (odd
z-rings, non-bipartite per-color) is rejected at construction; the
reference has no such geometry.

This class is the jnp masked formulation (validation grade, CPU-
friendly); production throughput comes from the packed flat engine
(ops/helical3d_multispin.py) routed in engine/sweep.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cuda_fortran_mc_simulation_spin_tpu.core import lattice, rng


@dataclasses.dataclass(frozen=True)
class Ising3DHelical:
    nx: int
    ny: int
    nz: int
    kbt: float

    def __post_init__(self):
        if self.nx % 2 == 0:
            raise ValueError(
                "helical 3-D checkerboard updates require odd nx (idx "
                "and idx±nx must differ in parity); the reference's "
                "committed helical sizes are odd, e.g. 151/501/1001"
            )
        if self.nsites % 2:
            raise ValueError(
                "helical parity split requires an even site count "
                f"(got {self.nx}x{self.ny}x{self.nz})"
            )
        if self.nx * self.ny % 2 == 0 and self.nz % 2:
            raise ValueError(
                "even nx*ny with odd nz has odd z-rings: no exact "
                "checkerboard schedule exists (non-bipartite even "
                "within a parity color); no reference geometry is of "
                f"this shape (got {self.nx}x{self.ny}x{self.nz})"
            )

    @property
    def beta(self) -> float:
        return 1.0 / self.kbt

    @property
    def nxy(self) -> int:
        return self.nx * self.ny

    @property
    def nsites(self) -> int:
        return self.nx * self.ny * self.nz

    @property
    def z_cross_parity(self) -> bool:
        """True when ±nx·ny flips parity (exact two-coloring)."""
        return self.nxy % 2 == 1

    def init_state(self, kind: str, key: jax.Array | None = None
                   ) -> jax.Array:
        if kind == "allup":
            return jnp.ones((self.nsites,), jnp.int8)
        if kind == "random":
            u = rng.uniform(rng.phase_key(key, 0), (self.nsites,))
            return jnp.where(u < 0.5, 1, -1).astype(jnp.int8)
        raise ValueError(f"unknown init state {kind!r}")

    def _neighbor_sums(self, flat: jax.Array) -> jax.Array:
        f = flat.astype(jnp.int32)
        return sum(
            jnp.roll(f, -d) + jnp.roll(f, d)
            for d in (1, self.nx, self.nxy)
        )

    def _phase(self, flat: jax.Array, offset: int, u: jax.Array,
               zsub: int | None = None) -> jax.Array:
        """Metropolis on sites with idx % 2 == offset (and, when
        ``zsub`` is given, z-plane parity == zsub — the exact even
        nx·ny sub-phase schedule, see module docstring)."""
        nsum = self._neighbor_sums(flat)
        half_de = flat.astype(jnp.int32) * nsum  # ΔE/2 ∈ {0,±2,±4,±6}
        b = self.beta
        thresh = jnp.where(
            half_de == 2, jnp.float32(np.exp(-4.0 * b)),
            jnp.where(half_de == 4, jnp.float32(np.exp(-8.0 * b)),
                      jnp.float32(np.exp(-12.0 * b))),
        )
        accept = (half_de <= 0) | (u < thresh)
        mask = lattice.helical_parity_mask(self.nsites, offset)
        if zsub is not None:
            zpar = (jnp.arange(self.nsites) // self.nxy) % 2
            mask = mask & (zpar == zsub)
        return jnp.where(mask & accept, -flat, flat).astype(jnp.int8)

    def sweep(self, flat: jax.Array, key: jax.Array) -> jax.Array:
        """Cross-parity: offset-0 phase then offset-1 phase; the
        reference draws ONE random batch per MCS shared by both phases
        (/root/reference/src/ising3d_gpu_m.f90:179-187) — mirrored.
        Even nx·ny: each color phase splits into two z-plane-parity
        sub-phases (4 masked sub-phases, every site still consumes its
        one uniform)."""
        u = rng.uniform(rng.phase_key(key, 0), flat.shape)
        zsubs = (None,) if self.z_cross_parity else (0, 1)
        for offset in (0, 1):
            for zsub in zsubs:
                flat = self._phase(flat, offset, u, zsub)
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
        """-Σ s(idx)·(s(idx+1) + s(idx+nx) + s(idx+nx·ny))
        (calc_energy_sum, /root/reference/src/ising3d_gpu_m.f90:239-259
        sums the three forward helical bonds per site)."""
        f = flat.astype(jnp.int32)
        return -jnp.sum(
            f * (jnp.roll(f, -1) + jnp.roll(f, -self.nx)
                 + jnp.roll(f, -self.nxy)),
            dtype=jnp.int32,
        )

    def observables(self, flat: jax.Array) -> dict[str, jax.Array]:
        n_inv = jnp.float32(1.0 / self.nsites)
        return {
            "m": self.magne_sum(flat).astype(jnp.float32) * n_inv,
            "e": self.energy_sum(flat).astype(jnp.float32) * n_inv,
        }
