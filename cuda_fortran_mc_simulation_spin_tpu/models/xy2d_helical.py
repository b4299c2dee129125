"""2-D XY with helical (skew-periodic) BC on a flat layout.

Layout-parity engine for the reference's flat-array XY variants
(/root/reference/src/xy2d_gpu_m.f90 SoA and
/root/reference/src/xy2d_gpu_flip_spin_index_m.f90 AoS — both helical,
committed at 10001×10000): site ``idx`` neighbors ``idx±1, idx±nx`` mod
nall; checkerboard phases update ``idx % 2 == offset``; candidate angle
Metropolis plus over-relaxation reflection
(/root/reference/src/xy2d_gpu_m.f90:139-213).

The reference's SoA-vs-AoS pair is a memory-layout experiment; on TPU
the spin components are separate flat planes (always "SoA"), so the AoS
variant has no meaningful analog — documented here rather than
re-created.  Like models/ising2d_helical.py this masked engine exists
for validation and reference-geometry runs; production XY uses
models/xy2d.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cuda_fortran_mc_simulation_spin_tpu.core import lattice, rng

_TWO_PI = 2.0 * np.pi


@dataclasses.dataclass(frozen=True)
class XY2DHelical:
    nx: int
    ny: int
    kbt: float

    def __post_init__(self):
        if self.nx % 2 == 0:
            raise ValueError(
                "helical checkerboard updates require odd nx "
                "(the reference commits 10001×10000)"
            )

    @property
    def beta(self) -> float:
        return 1.0 / self.kbt

    @property
    def nsites(self) -> int:
        return self.nx * self.ny

    def init_state(self, kind: str, key: jax.Array | None = None):
        n = self.nsites
        if kind == "allup":
            return (jnp.ones((n,), jnp.float32), jnp.zeros((n,), jnp.float32))
        if kind == "random":
            th = _TWO_PI * rng.uniform(rng.phase_key(key, 0), (n,))
            return (jnp.cos(th).astype(jnp.float32),
                    jnp.sin(th).astype(jnp.float32))
        raise ValueError(f"unknown init state {kind!r}")

    def _fields(self, sx, sy):
        return (lattice.helical_neighbor_sums(sx, self.nx),
                lattice.helical_neighbor_sums(sy, self.nx))

    def _phase(self, sx, sy, offset, u_cand, u_acc):
        hx, hy = self._fields(sx, sy)
        ang = (_TWO_PI * u_cand).astype(jnp.float32)
        cx, cy = jnp.cos(ang), jnp.sin(ang)
        de = -((cx - sx) * hx + (cy - sy) * hy)
        p = jnp.exp(-self.beta * jnp.maximum(de, 0.0))
        mask = lattice.helical_parity_mask(self.nsites, offset)
        accept = mask & (u_acc < p)
        return jnp.where(accept, cx, sx), jnp.where(accept, cy, sy)

    def sweep(self, state, key):
        """Two checkerboard phases; the reference draws the random
        batches once per MCS, shared by both phases
        (/root/reference/src/xy2d_gpu_m.f90:139-156)."""
        sx, sy = state
        u_cand = rng.uniform(rng.phase_key(key, 0), sx.shape)
        u_acc = rng.uniform(rng.phase_key(key, 1), sx.shape)
        sx, sy = self._phase(sx, sy, 0, u_cand, u_acc)
        sx, sy = self._phase(sx, sy, 1, u_cand, u_acc)
        return (sx, sy)

    def over_relax_sweep(self, state):
        """Reflection with renormalization
        (/root/reference/src/xy2d_gpu_m.f90:177-213)."""
        sx, sy = state
        for offset in (0, 1):
            hx, hy = self._fields(sx, sy)
            inv = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy,
                                            jnp.float32(1e-30)))
            nxh, nyh = hx * inv, hy * inv
            d = 2.0 * (sx * nxh + sy * nyh)
            rx, ry = d * nxh - sx, d * nyh - sy
            rinv = jax.lax.rsqrt(jnp.maximum(rx * rx + ry * ry,
                                             jnp.float32(1e-30)))
            mask = lattice.helical_parity_mask(self.nsites, offset)
            sx = jnp.where(mask, rx * rinv, sx)
            sy = jnp.where(mask, ry * rinv, sy)
        return (sx, sy)

    def sweep_batched(self, state, key):
        nrep = state[0].shape[0]
        keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(
            jnp.arange(nrep)
        )
        return jax.vmap(self.sweep)(state, keys)

    def over_relax_sweep_batched(self, state):
        return jax.vmap(self.over_relax_sweep)(state)

    def magne_sums(self, state):
        return jnp.sum(state[0]), jnp.sum(state[1])

    def energy_sum(self, state):
        sx, sy = state
        rx = jnp.roll(sx, -1) + jnp.roll(sx, -self.nx)
        ry = jnp.roll(sy, -1) + jnp.roll(sy, -self.nx)
        return -jnp.sum(sx * rx + sy * ry)

    def observables(self, state):
        n_inv = jnp.float32(1.0 / self.nsites)
        mx, my = self.magne_sums(state)
        return {"m": mx * n_inv, "my": my * n_inv,
                "e": self.energy_sum(state) * n_inv}
