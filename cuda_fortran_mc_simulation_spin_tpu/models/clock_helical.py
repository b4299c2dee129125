"""q-state clock with helical (skew-periodic) BC on a flat layout.

Layout-parity engine for /root/reference/src/clock_gpu_m.f90 (runtime-q
clock on the flat "norishiro" array, committed at 501×500) and
/root/reference/src/clock_gpu_multi_m.f90 (its replica variant): site
``idx`` neighbors ``idx±1, idx±nx`` mod nall; checkerboard phases update
``idx % 2 == offset``; candidate ``c + ceil(u·(q-1)) mod q``; acceptance
``u ≤ exp(-βΔE)`` (the reference precomputes this in its q⁶ `ws_` table,
:105-146 — here it is the same gather-free arithmetic as
models/clock.py).

Masked validation engine; production clock runs use models/clock.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cuda_fortran_mc_simulation_spin_tpu.core import lattice, rng, tables


@dataclasses.dataclass(frozen=True)
class Clock2DHelical:
    nx: int
    ny: int
    kbt: float
    q: int = 6

    def __post_init__(self):
        if self.nx % 2 == 0:
            raise ValueError(
                "helical checkerboard updates require odd nx "
                "(the reference commits 501×500)"
            )
        if not (2 <= self.q <= 127):
            raise ValueError(f"q={self.q} out of supported range [2, 127]")

    @property
    def beta(self) -> float:
        return 1.0 / self.kbt

    @property
    def nsites(self) -> int:
        return self.nx * self.ny

    def init_state(self, kind: str, key: jax.Array | None = None
                   ) -> jax.Array:
        n = self.nsites
        if kind == "allup":
            return jnp.zeros((n,), jnp.int8)
        if kind == "random":
            return jax.random.randint(
                rng.phase_key(key, 0), (n,), 0, self.q, dtype=jnp.int32
            ).astype(jnp.int8)
        raise ValueError(f"unknown init state {kind!r}")

    def _phase(self, flat, offset, u_cand, u_acc):
        q = self.q
        co, so = tables.state_cos_sin(flat, q)
        hx = lattice.helical_neighbor_sums(co, self.nx)
        hy = lattice.helical_neighbor_sums(so, self.nx)
        xi = flat.astype(jnp.int32)
        off = (u_cand * (q - 1)).astype(jnp.int32) + 1
        new = xi + off
        new = jnp.where(new >= q, new - q, new)
        cx, sx = tables.state_cos_sin(flat, q)
        cn, sn = tables.state_cos_sin(new, q)
        de = -((cn - cx) * hx + (sn - sx) * hy)
        p = jnp.exp(-self.beta * jnp.maximum(de, 0.0))
        mask = lattice.helical_parity_mask(self.nsites, offset)
        accept = mask & (u_acc < p)
        return jnp.where(accept, new, xi).astype(jnp.int8)

    def sweep(self, flat: jax.Array, key: jax.Array) -> jax.Array:
        """Both phases; the reference draws 2N uniforms once per MCS,
        shared across phases (/root/reference/src/clock_gpu_m.f90:
        180-196 analog)."""
        u_cand = rng.uniform(rng.phase_key(key, 0), flat.shape)
        u_acc = rng.uniform(rng.phase_key(key, 1), flat.shape)
        flat = self._phase(flat, 0, u_cand, u_acc)
        flat = self._phase(flat, 1, u_cand, u_acc)
        return flat

    def sweep_batched(self, flat: jax.Array, key: jax.Array) -> jax.Array:
        """Replica axis — clock_gpu_multi_m's n_multi
        (/root/reference/src/clock_gpu_multi_m.f90:66)."""
        nrep = flat.shape[0]
        keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(
            jnp.arange(nrep)
        )
        return jax.vmap(self.sweep)(flat, keys)

    def magne_sums(self, flat):
        c, s = tables.state_cos_sin(flat, self.q)
        return jnp.sum(c), jnp.sum(s)

    def energy_sum(self, flat):
        c, s = tables.state_cos_sin(flat, self.q)
        rx = jnp.roll(c, -1) + jnp.roll(c, -self.nx)
        ry = jnp.roll(s, -1) + jnp.roll(s, -self.nx)
        return -jnp.sum(c * rx + s * ry)

    def observables(self, flat):
        n_inv = jnp.float32(1.0 / self.nsites)
        mx, my = self.magne_sums(flat)
        return {"m": mx * n_inv, "my": my * n_inv,
                "e": self.energy_sum(flat) * n_inv}
