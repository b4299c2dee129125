"""q-state clock model (planar Potts), ferromagnetic, J=1.

Capability parity with the reference's clock family — runtime-q engine
/root/reference/src/clock_gpu_m.f90 (q = `state` ≤ 50), replica engine
/root/reference/src/clock_gpu_multi_m.f90, and the compile-time q=6
optimization ladder /root/reference/src/clock/*.f90 (simple → energy
table → probability tableall → dual-lattice → dual-lattice-yhalf).

TPU-native design (one engine instead of six variants):

- dual checkerboard color arrays (the ladder's dual-lattice endpoint is
  the canonical layout here, core/lattice.py), int8 states;
- the q⁶ probability table (/root/reference/src/clock/
  clock_tableall_gpu_m.f90:61-88, ~46k-entry gather per site) is replaced
  by gather-free arithmetic: per-state (cos, sin) via q-way select chains
  (core/tables.py), ΔE = -(S_new - S_c)·h with h the local vector field —
  same discrete energies to f32 rounding, no table memory, no gathers;
- candidate state `c + ceil(u·(q-1)) mod q` excludes the current state
  exactly as /root/reference/src/clock/clock_tableall_gpu_m.f90:142-143;
- two uniforms per site per phase, as the reference's rnds(2, nx, ny)
  (:63,95);
- Pallas fused kernel in ops/clock_pallas.py; this jnp path is the
  semantic reference and the CPU oracle.

q=2 degenerates to the Ising model exactly (cos ∈ {±1}), which the tests
exploit for cross-model validation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cuda_fortran_mc_simulation_spin_tpu.core import lattice, rng, tables
from cuda_fortran_mc_simulation_spin_tpu.models.base import CheckerboardState


@dataclasses.dataclass(frozen=True)
class Clock2D:
    nx: int
    ny: int
    kbt: float
    q: int = 6
    backend: str = "auto"  # "jnp" | "pallas" | "auto"

    def __post_init__(self):
        lattice.LatticeSpec(self.nx, self.ny)
        # int8 state storage bounds q; the reference caps at 50
        # (/root/reference/src/clock_gpu_m.f90:10).  q > 16 switches from
        # select-chain (cos, sin) to direct transcendentals
        # (core/tables.py), so the evaluation cost is q-independent.
        if not (2 <= self.q <= 127):
            raise ValueError(f"q={self.q} out of supported range [2, 127]")

    @property
    def beta(self) -> float:
        return 1.0 / self.kbt

    @property
    def nsites(self) -> int:
        return self.nx * self.ny

    @property
    def color_shape(self) -> tuple[int, int]:
        return (self.ny, self.nx // 2)

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
            # init_sixclock_order: all state 0
            # (/root/reference/src/clock/clock_tableall_gpu_m.f90:90-92)
            zero = jnp.zeros(shape, dtype=jnp.int8)
            return CheckerboardState(zero, zero)
        if kind == "random":
            ka, kb = jax.random.split(rng.phase_key(key, 0))
            a = jax.random.randint(ka, shape, 0, self.q, dtype=jnp.int32)
            b = jax.random.randint(kb, shape, 0, self.q, dtype=jnp.int32)
            return CheckerboardState(
                a.astype(jnp.int8), b.astype(jnp.int8)
            )
        raise ValueError(f"unknown init state {kind!r}")

    # -- one checkerboard phase ----------------------------------------------
    def _phase(self, x, o, color, u_cand, u_acc, halos=None):
        """Metropolis update of one color given the other.

        ΔE = E(new; nbrs) - E(c; nbrs) = -(S_new - S_c)·h,
        h = Σ_nbr (cos θ, sin θ); accept iff u ≤ exp(-β ΔE)
        (/root/reference/src/clock/clock_tableall_gpu_m.f90:107-151).
        """
        q = self.q
        co, so = tables.state_cos_sin(o, q)
        if halos is None:
            hx = lattice.neighbor_sums(co, color)
            hy = lattice.neighbor_sums(so, color)
        elif len(halos[0]) == 2:
            (hu_c, hd_c), (hu_s, hd_s) = halos
            hx = lattice.neighbor_sums_halo(co, hu_c, hd_c, color)
            hy = lattice.neighbor_sums_halo(so, hu_s, hd_s, color)
        else:
            hx = lattice.neighbor_sums_halo2d(co, *halos[0], color)
            hy = lattice.neighbor_sums_halo2d(so, *halos[1], color)

        xi = x.astype(jnp.int32)
        off = (u_cand * (q - 1)).astype(jnp.int32) + 1  # ∈ [1, q-1]
        new = xi + off
        new = jnp.where(new >= q, new - q, new)

        cx, sx = tables.state_cos_sin(x, q)
        cn, sn = tables.state_cos_sin(new, q)
        de = -((cn - cx) * hx + (sn - sx) * hy)
        p = jnp.exp(-self.beta * jnp.maximum(de, 0.0))
        accept = u_acc < p
        return jnp.where(accept, new, xi).astype(jnp.int8)

    def sweep(self, state: CheckerboardState, key: jax.Array
              ) -> CheckerboardState:
        """One MCS: both colors (update_metropolis,
        /root/reference/src/clock/clock_tableall_gpu_m.f90:94-102)."""
        if self.resolved_backend == "pallas":
            from cuda_fortran_mc_simulation_spin_tpu.ops import clock_pallas
            return clock_pallas.sweep(self, state, key)
        return self.sweep_jnp(state, key)

    def sweep_jnp(self, state: CheckerboardState, key: jax.Array
                  ) -> CheckerboardState:
        a, b = state
        k0 = rng.phase_key(key, 0)
        u_cand = rng.uniform(jax.random.fold_in(k0, 0), a.shape)
        u_acc = rng.uniform(jax.random.fold_in(k0, 1), a.shape)
        a = self._phase(a, b, 0, u_cand, u_acc)
        k1 = rng.phase_key(key, 1)
        u_cand = rng.uniform(jax.random.fold_in(k1, 0), b.shape)
        u_acc = rng.uniform(jax.random.fold_in(k1, 1), b.shape)
        b = self._phase(b, a, 1, u_cand, u_acc)
        return CheckerboardState(a, b)

    def sweep_batched(self, state: CheckerboardState, key: jax.Array
                      ) -> CheckerboardState:
        """Replica-batched MCS — state arrays (R, ny, nx//2)."""
        if self.resolved_backend == "pallas":
            from cuda_fortran_mc_simulation_spin_tpu.ops import clock_pallas
            return clock_pallas.sweep(self, state, key)
        nrep = state.a.shape[0]
        keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(
            jnp.arange(nrep)
        )
        return jax.vmap(self.sweep_jnp)(state, keys)

    # -- observables -----------------------------------------------------------
    def magne_sums(self, state: CheckerboardState
                   ) -> tuple[jax.Array, jax.Array]:
        """(Σ cos θ, Σ sin θ) — x is the reference's calc_magne
        (/root/reference/src/clock/clock_tableall_gpu_m.f90:155-165)."""
        a, b = state
        ca, sa = tables.state_cos_sin(a, self.q)
        cb, sb = tables.state_cos_sin(b, self.q)
        return (jnp.sum(ca) + jnp.sum(cb), jnp.sum(sa) + jnp.sum(sb))

    def energy_sum(self, state: CheckerboardState) -> jax.Array:
        """Σ_sites E(c, right) + E(c, down), E = -cos(θ1-θ2)
        (/root/reference/src/clock/clock_tableall_gpu_m.f90:167-181;
        up-bonds there, down-bonds here — identical total under PBC)."""
        a, b = state
        ca, sa = tables.state_cos_sin(a, self.q)
        cb, sb = tables.state_cos_sin(b, self.q)
        ra_c, da_c, rb_c, db_c = lattice.right_down_neighbors(ca, cb)
        ra_s, da_s, rb_s, db_s = lattice.right_down_neighbors(sa, sb)
        ea = jnp.sum(ca * (ra_c + da_c) + sa * (ra_s + da_s))
        eb = jnp.sum(cb * (rb_c + db_c) + sb * (rb_s + db_s))
        return -(ea + eb)

    def observables(self, state: CheckerboardState) -> dict[str, jax.Array]:
        n_inv = jnp.float32(1.0 / self.nsites)
        mx, my = self.magne_sums(state)
        return {
            "m": mx * n_inv,
            "my": my * n_inv,
            "e": self.energy_sum(state) * n_inv,
        }

    def observables_batched(self, state: CheckerboardState
                            ) -> dict[str, jax.Array]:
        """{m, my, e} for a replica batch; fused single-pass Pallas
        reduction on TPU, vmapped jnp elsewhere."""
        if self.resolved_backend == "pallas":
            from cuda_fortran_mc_simulation_spin_tpu.ops import (
                clock_measure_pallas,
            )
            return clock_measure_pallas.measure(self, state)
        return jax.vmap(self.observables)(state)

    # -- test oracles -----------------------------------------------------------
    def full_lattice(self, state: CheckerboardState) -> np.ndarray:
        return np.asarray(
            lattice.merge_checkerboard(state.a, state.b), dtype=np.int64
        )

    def energy_sum_numpy(self, full: np.ndarray) -> float:
        ang = 2.0 * np.pi * full / self.q
        c, s = np.cos(ang), np.sin(ang)
        e = 0.0
        for axis in (0, 1):
            cr, sr = np.roll(c, -1, axis), np.roll(s, -1, axis)
            e -= float((c * cr + s * sr).sum())
        return e
