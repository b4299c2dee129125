"""2-D XY (planar rotor) model, ferromagnetic, J=1.

Capability parity with the reference's XY family:
- /root/reference/src/xy2d_gpu_m.f90 + xy2d_gpu_flip_spin_index_m.f90
  (helical BC, SoA/AoS layout experiments),
- /root/reference/src/xy2d_periodic_gpu_m.f90 (the richest engine:
  periodic BC, over-relaxation, finite-magnetization preparation, global
  rotation, autocorrelation, two-point correlation),
- /root/reference/src/xy2d_periodic_yhalf*_m.f90 (dual-lattice layouts),
- /root/reference/src/xy2d_periodic_samples_gpu_m.f90 (replica engine).

TPU-native design — one engine, canonical layout:

- spins stored as two f32 planes (cos θ, sin θ) per checkerboard color
  (XYState: ax, ay, bx, by, each (ny, nx//2)); the reference's SoA/AoS
  and yhalf variants are layout experiments this plane-separated dual-
  color form subsumes;
- Metropolis candidate = (cos 2πu, sin 2πu)
  (/root/reference/src/xy2d_periodic_gpu_m.f90:368-387), ΔE = -(S'-S)·h;
- over-relaxation reflection S' = 2(S·n̂)n̂ - S with |S'| renormalized
  (:418-439);
- replica batching via vmap / Pallas replica grid axis
  (ops/xy2d_pallas.py);
- protocol preparation (finite-magne bisection, rotate-to-x-axis) as
  jitted `lax.while_loop`s — the reference's data-dependent host loops
  (:126-152, :219-232) moved fully on-device.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cuda_fortran_mc_simulation_spin_tpu.core import lattice, rng
from cuda_fortran_mc_simulation_spin_tpu.ops import trig


class XYState(NamedTuple):
    """Dual-color XY state: x/y spin components per color, (ny, nx//2)."""

    ax: jax.Array
    ay: jax.Array
    bx: jax.Array
    by: jax.Array


_TWO_PI = 2.0 * np.pi


@dataclasses.dataclass(frozen=True)
class XY2D:
    nx: int
    ny: int
    kbt: float
    backend: str = "auto"  # "jnp" | "pallas" | "auto"

    def __post_init__(self):
        lattice.LatticeSpec(self.nx, self.ny)

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
        return (self.nx // 2) % 128 == 0 and self.ny % 8 == 0

    @property
    def resolved_backend(self) -> str:
        if self.backend == "auto":
            on_tpu = jax.default_backend() not in ("cpu", "gpu")
            return "pallas" if (on_tpu and self._pallas_ok()) else "jnp"
        if self.backend == "pallas" and not self._pallas_ok():
            raise ValueError(
                "pallas backend needs nx/2 % 128 == 0 and ny % 8 == 0, "
                f"got nx={self.nx}, ny={self.ny}"
            )
        return self.backend

    # -- initial states ------------------------------------------------------
    def init_state(self, kind: str, key: jax.Array | None = None) -> XYState:
        shape = self.color_shape
        if kind == "allup":
            # all spins along +x (set_allup_spin,
            # /root/reference/src/xy2d_periodic_gpu_m.f90:81-101)
            one = jnp.ones(shape, jnp.float32)
            zero = jnp.zeros(shape, jnp.float32)
            return XYState(one, zero, one, zero)
        if kind == "random":
            # θ = 2πu (set_random_spin, :105-122)
            ka, kb = jax.random.split(rng.phase_key(key, 0))
            ta = _TWO_PI * rng.uniform(ka, shape)
            tb = _TWO_PI * rng.uniform(kb, shape)
            return XYState(
                jnp.cos(ta).astype(jnp.float32),
                jnp.sin(ta).astype(jnp.float32),
                jnp.cos(tb).astype(jnp.float32),
                jnp.sin(tb).astype(jnp.float32),
            )
        raise ValueError(f"unknown init state {kind!r}")

    # -- local fields ----------------------------------------------------------
    def _field(self, ox, oy, color, halos=None):
        """h = Σ_nbr S for every site of ``color`` (other-color planes).

        ``halos``: per-component halo tuples — (up, dn) for y-sharded
        blocks, (up, dn, left, right) for (dx, dy)-sharded ones."""
        if halos is None:
            hx = lattice.neighbor_sums(ox, color)
            hy = lattice.neighbor_sums(oy, color)
        elif len(halos[0]) == 2:
            (hux, hdx), (huy, hdy) = halos
            hx = lattice.neighbor_sums_halo(ox, hux, hdx, color)
            hy = lattice.neighbor_sums_halo(oy, huy, hdy, color)
        else:
            hx = lattice.neighbor_sums_halo2d(ox, *halos[0], color)
            hy = lattice.neighbor_sums_halo2d(oy, *halos[1], color)
        return hx, hy

    # -- Metropolis phase -------------------------------------------------------
    def _phase(self, sx, sy, ox, oy, color, u_cand, u_acc, halos=None):
        """candidate (cos 2πu, sin 2πu); accept iff u ≤ exp(-β ΔE),
        ΔE = -(S'-S)·Σnbr (/root/reference/src/xy2d_periodic_gpu_m.f90:
        368-397)."""
        hx, hy = self._field(ox, oy, color, halos)
        cx, cy = trig.cos_sin_2pi(u_cand)
        de = -((cx - sx) * hx + (cy - sy) * hy)
        p = jnp.exp(-self.beta * jnp.maximum(de, 0.0))
        accept = u_acc < p
        return jnp.where(accept, cx, sx), jnp.where(accept, cy, sy)

    def sweep_jnp(self, state: XYState, key: jax.Array) -> XYState:
        ax, ay, bx, by = state
        k0 = rng.phase_key(key, 0)
        u_c = rng.uniform(jax.random.fold_in(k0, 0), ax.shape)
        u_a = rng.uniform(jax.random.fold_in(k0, 1), ax.shape)
        ax, ay = self._phase(ax, ay, bx, by, 0, u_c, u_a)
        k1 = rng.phase_key(key, 1)
        u_c = rng.uniform(jax.random.fold_in(k1, 0), bx.shape)
        u_a = rng.uniform(jax.random.fold_in(k1, 1), bx.shape)
        bx, by = self._phase(bx, by, ax, ay, 1, u_c, u_a)
        return XYState(ax, ay, bx, by)

    def sweep(self, state: XYState, key: jax.Array) -> XYState:
        """One MCS: both colors (update,
        /root/reference/src/xy2d_periodic_gpu_m.f90:353-367)."""
        if self.resolved_backend == "pallas":
            from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas
            return xy2d_pallas.sweep(self, state, key)
        return self.sweep_jnp(state, key)

    def sweep_batched(self, state: XYState, key: jax.Array) -> XYState:
        if self.resolved_backend == "pallas":
            from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas
            return xy2d_pallas.sweep(self, state, key)
        nrep = state.ax.shape[0]
        keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(
            jnp.arange(nrep)
        )
        return jax.vmap(self.sweep_jnp)(state, keys)

    # -- over-relaxation ----------------------------------------------------------
    def _or_phase(self, sx, sy, ox, oy, color, halos=None):
        """Microcanonical reflection about the local field direction,
        with |S| renormalization (/root/reference/src/
        xy2d_periodic_gpu_m.f90:418-439)."""
        hx, hy = self._field(ox, oy, color, halos)
        h2 = hx * hx + hy * hy
        inv = jax.lax.rsqrt(jnp.maximum(h2, jnp.float32(1e-30)))
        nxh = hx * inv
        nyh = hy * inv
        d = 2.0 * (sx * nxh + sy * nyh)
        rx = d * nxh - sx
        ry = d * nyh - sy
        rinv = jax.lax.rsqrt(jnp.maximum(rx * rx + ry * ry,
                                         jnp.float32(1e-30)))
        return rx * rinv, ry * rinv

    def over_relax_sweep(self, state: XYState) -> XYState:
        """One over-relaxation sweep (both colors, deterministic)."""
        if self.resolved_backend == "pallas":
            from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas
            return xy2d_pallas.over_relax_sweep(self, state)
        return self.over_relax_sweep_jnp(state)

    def over_relax_sweep_jnp(self, state: XYState) -> XYState:
        ax, ay, bx, by = state
        ax, ay = self._or_phase(ax, ay, bx, by, 0)
        bx, by = self._or_phase(bx, by, ax, ay, 1)
        return XYState(ax, ay, bx, by)

    def over_relax_sweep_batched(self, state: XYState) -> XYState:
        """Replica-batched OR sweep — (R, ny, nx//2) planes."""
        if self.resolved_backend == "pallas":
            from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas
            return xy2d_pallas.over_relax_sweep(self, state)
        return jax.vmap(self.over_relax_sweep_jnp)(state)

    # -- field-only Metropolis (init-state preparation) ---------------------------
    def field_sweep(self, state: XYState, key: jax.Array, hx, hy) -> XYState:
        """One sweep coupling ONLY to an external field (hx, hy) — the
        preparation dynamics of metropolis_by_field_sub
        (/root/reference/src/xy2d_periodic_gpu_m.f90:198-216).  Faithful
        to the reference's (non-Metropolis) acceptance
        `u ≤ 1 - exp(ΔE)`, ΔE = -h·(S'-S), applied to ALL sites at once
        (the kernel there has no checkerboard mask — field coupling has
        no neighbor dependence, so this is race-free)."""
        def upd(sx, sy, u_cand, u_acc):
            ang = (_TWO_PI * u_cand).astype(jnp.float32)
            cx, cy = jnp.cos(ang), jnp.sin(ang)
            de = -(hx * (cx - sx) + hy * (cy - sy))
            accept = u_acc <= 1.0 - jnp.exp(de)
            return jnp.where(accept, cx, sx), jnp.where(accept, cy, sy)

        ax, ay, bx, by = state
        k0, k1 = jax.random.split(key)
        u_c = rng.uniform(jax.random.fold_in(k0, 0), ax.shape)
        u_a = rng.uniform(jax.random.fold_in(k0, 1), ax.shape)
        ax, ay = upd(ax, ay, u_c, u_a)
        u_c = rng.uniform(jax.random.fold_in(k1, 0), bx.shape)
        u_a = rng.uniform(jax.random.fold_in(k1, 1), bx.shape)
        bx, by = upd(bx, by, u_c, u_a)
        return XYState(ax, ay, bx, by)

    # -- global rotation ------------------------------------------------------------
    def rotate(self, state: XYState, theta) -> XYState:
        """Rotate every spin by theta (rotate_whole_spin_theta_sub,
        /root/reference/src/xy2d_periodic_gpu_m.f90:281-293).  Exact
        2-D rotation instead of the reference's atan2+cos/sin round trip.
        """
        c = jnp.cos(theta).astype(jnp.float32)
        s = jnp.sin(theta).astype(jnp.float32)
        ax, ay, bx, by = state
        return XYState(
            c * ax - s * ay, s * ax + c * ay,
            c * bx - s * by, s * bx + c * by,
        )

    def rotate_magne_toward_xaxis(self, state: XYState) -> XYState:
        """Rotate all spins so Σ S_y = 0, Σ S_x ≥ 0
        (/root/reference/src/xy2d_periodic_gpu_m.f90:219-232)."""
        mx, my = self.magne_sums(state)
        return self.rotate(state, -jnp.arctan2(my, mx))

    def rotate_magne_toward_xaxis_updown_randomly(
        self, state: XYState, key: jax.Array
    ) -> XYState:
        """As above, but align m with +x or -x with probability 1/2
        (the ..._updown_randomly variant,
        /root/reference/src/xy2d_periodic_gpu_m.f90:253-279)."""
        mx, my = self.magne_sums(state)
        theta = jnp.arctan2(my, mx)
        flip = rng.uniform(key, ()) < 0.5
        theta = jnp.where(flip, theta + jnp.float32(np.pi), theta)
        return self.rotate(state, -theta)

    # -- preparation protocols (lax.while_loop ports of §3.3) ----------------------
    def prep_finite_magne(self, key: jax.Array, m0: float,
                          eps: float = 1e-2, max_iter: int = 64
                          ) -> XYState:
        """set_finite_magne_spin: prepare a disordered state with
        |m| ≈ m0 (relative tolerance eps), rotated so m ∥ +x
        (/root/reference/src/xy2d_periodic_gpu_m.f90:126-152).

        Deliberate redesign of the search (same prepared ensemble): the
        reference doubles the field on undershoot and halves-with-sign-
        flip on overshoot, which empirically limit-cycles through field
        magnitudes {1, 2} and only converges by luck; here stage 1
        *bisects* the field magnitude against the one-field-sweep
        response from the fixed random base state (monotone in the
        field, guaranteed ~log2 convergence), and stage 2 — only when
        the target exceeds the single-sweep response (saturation ≈0.6)
        — iterates damped field sweeps on the evolving state, the
        reference's own loop structure
        (/root/reference/src/xy2d_periodic_gpu_m.f90:134-150), until
        |m| is within eps of m0.  The prepared state has the same
        structure as the reference's (independent sites tilted toward
        the field by `u ≤ 1 - exp(ΔE)` acceptance sweeps); the
        reference's committed use is m0 = 0.02
        (/root/reference/app/..._finite_magne.f90:16).
        """
        base = self.init_state("random", key)
        n_inv = 1.0 / self.nsites

        def mabs_after(f, k):
            st = self.field_sweep(base, k, f, 0.0)
            mx, my = self.magne_sums(st)
            return jnp.hypot(mx * n_inv, my * n_inv), st

        k0 = rng.phase_key(key, 1)

        # grow hi until the response overshoots m0 (cap 2^16)
        def grow_cond(carry):
            hi, it = carry
            m, _ = mabs_after(hi, jax.random.fold_in(k0, 0))
            return (m < m0) & (hi < 65536.0) & (it < 24)

        def grow_body(carry):
            hi, it = carry
            return (hi * 2.0, it + 1)

        hi, _ = jax.lax.while_loop(
            grow_cond, grow_body, (jnp.float32(1.0), jnp.int32(0))
        )

        def cond(carry):
            lo, hi, it = carry
            f = 0.5 * (lo + hi)
            m, _ = mabs_after(f, jax.random.fold_in(k0, it))
            return (jnp.abs(m - m0) / m0 >= eps) & (it < max_iter)

        def body(carry):
            lo, hi, it = carry
            f = 0.5 * (lo + hi)
            m, _ = mabs_after(f, jax.random.fold_in(k0, it))
            lo = jnp.where(m < m0, f, lo)
            hi = jnp.where(m < m0, hi, f)
            return (lo, hi, it + 1)

        lo, hi, it = jax.lax.while_loop(
            cond, body, (jnp.float32(0.0), hi, jnp.int32(0))
        )
        _, state = mabs_after(0.5 * (lo + hi), jax.random.fold_in(k0, it))

        # stage 2: iterated field sweeps on the evolving state for
        # targets beyond the single-sweep saturation; field along the
        # current magnetization, strength damped on overshoot
        k2 = rng.phase_key(key, 2)

        def mabs_of(st):
            mx, my = self.magne_sums(st)
            return mx * n_inv, my * n_inv

        def cond2(carry):
            st, f, it = carry
            mx, my = mabs_of(st)
            mabs = jnp.hypot(mx, my)
            return (jnp.abs(mabs - m0) / m0 >= eps) & (it < 512)

        def body2(carry):
            st, f, it = carry
            mx, my = mabs_of(st)
            mabs = jnp.maximum(jnp.hypot(mx, my), jnp.float32(1e-9))
            under = mabs < m0
            s = jnp.where(under, f, -0.5 * f)
            st = self.field_sweep(
                st, jax.random.fold_in(k2, it),
                s * mx / mabs, s * my / mabs,
            )
            f = jnp.maximum(jnp.where(under, f, 0.5 * f),
                            jnp.float32(1e-3))
            return st, f, it + 1

        state, _, _ = jax.lax.while_loop(
            cond2, body2, (state, jnp.float32(1.0), jnp.int32(0))
        )
        return self.rotate_magne_toward_xaxis(state)

    def prep_small_magne(self, key: jax.Array, near_magne: float,
                         tol: float | None = None, max_iter: int = 10_000
                         ) -> XYState:
        """set_random_small_spin (tol=None: drive |m| strictly below
        near_magne) / set_random_near_spin (tol: stop when the relative
        gap ≤ tol), with field (-mx, -my)
        (/root/reference/src/xy2d_periodic_gpu_m.f90:156-196)."""
        state = self.init_state("random", key)
        n_inv = 1.0 / self.nsites

        def mabs_of(state):
            mx, my = self.magne_sums(state)
            return mx * n_inv, my * n_inv

        def cond(carry):
            state, k, it = carry
            mx, my = mabs_of(state)
            mabs = jnp.hypot(mx, my)
            if tol is None:
                unmet = mabs >= near_magne
            else:
                unmet = jnp.abs(mabs - near_magne) / near_magne > tol
            return unmet & (it < max_iter)

        def body(carry):
            state, k, it = carry
            mx, my = mabs_of(state)
            k = jax.random.fold_in(k, 1)
            state = self.field_sweep(state, k, -mx, -my)
            return (state, k, it + 1)

        state, _, _ = jax.lax.while_loop(
            cond, body, (state, rng.phase_key(key, 1), jnp.int32(0))
        )
        return self.rotate_magne_toward_xaxis(state)

    # -- observables -----------------------------------------------------------------
    def magne_sums(self, state: XYState) -> tuple[jax.Array, jax.Array]:
        """(Σ S_x, Σ S_y) (calc_magne_sum / calc_magne_y_sum,
        /root/reference/src/xy2d_periodic_gpu_m.f90:510-534)."""
        return (
            jnp.sum(state.ax) + jnp.sum(state.bx),
            jnp.sum(state.ay) + jnp.sum(state.by),
        )

    def energy_sum(self, state: XYState) -> jax.Array:
        """-Σ S·(S_right + S_down) (calc_energy_sum, :496-508)."""
        ax, ay, bx, by = state
        rax, dax, rbx, dbx = lattice.right_down_neighbors(ax, bx)
        ray, day, rby, dby = lattice.right_down_neighbors(ay, by)
        ea = jnp.sum(ax * (rax + dax) + ay * (ray + day))
        eb = jnp.sum(bx * (rbx + dbx) + by * (rby + dby))
        return -(ea + eb)

    def autocorrelation_sum(self, state: XYState, snap: XYState
                            ) -> jax.Array:
        """A = Σ S_i(t0)·S_i(t) (calc_autocorrelation_sum, :536-549)."""
        return (
            jnp.sum(state.ax * snap.ax) + jnp.sum(state.ay * snap.ay)
            + jnp.sum(state.bx * snap.bx) + jnp.sum(state.by * snap.by)
        )

    def correlation_sum(self, state: XYState) -> jax.Array:
        """Two-point Σ S(x,y)·S(x+nx/2-1, y+ny/2-1)
        (calc_correlation_sum, :551-567)."""
        full_x = lattice.merge_checkerboard(state.ax, state.bx)
        full_y = lattice.merge_checkerboard(state.ay, state.by)
        dx, dy = self.nx // 2 - 1, self.ny // 2 - 1
        sh_x = jnp.roll(jnp.roll(full_x, -dy, axis=0), -dx, axis=1)
        sh_y = jnp.roll(jnp.roll(full_y, -dy, axis=0), -dx, axis=1)
        return jnp.sum(full_x * sh_x + full_y * sh_y)

    def observables(self, state: XYState) -> dict[str, jax.Array]:
        n_inv = jnp.float32(1.0 / self.nsites)
        mx, my = self.magne_sums(state)
        return {
            "m": mx * n_inv,
            "my": my * n_inv,
            "e": self.energy_sum(state) * n_inv,
        }

    def observables_batched(self, state: XYState) -> dict[str, jax.Array]:
        """{m, my, e} for a replica batch; fused single-pass Pallas
        reduction on TPU (ops/xy2d_measure_pallas.measure_plain),
        vmapped jnp elsewhere."""
        if self.resolved_backend == "pallas":
            from cuda_fortran_mc_simulation_spin_tpu.ops import (
                xy2d_measure_pallas,
            )
            obs = xy2d_measure_pallas.measure_plain(self, state)
            return {"m": obs["mx"], "my": obs["my"], "e": obs["e"]}
        return jax.vmap(self.observables)(state)

    def over_relax_sweep_measure_batched(
            self, state: XYState) -> tuple[XYState, dict[str, jax.Array]]:
        """One OR sweep + {m, my, e} densities, with the measurement
        fused into the color-1 reflection kernel on TPU (saves the
        separate measure_plain pass the OR schedule otherwise needs —
        /root/reference/app/xy2d_periodic_gpu_over_relaxation.f90:42-45
        measures after the OR sweeps)."""
        if self.resolved_backend == "pallas":
            from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas

            return xy2d_pallas.over_relax_sweep_measure(self, state)
        state = self.over_relax_sweep_batched(state)
        return state, self.observables_batched(state)

    # -- test oracles -------------------------------------------------------------------
    def full_vectors(self, state: XYState) -> np.ndarray:
        fx = np.asarray(lattice.merge_checkerboard(state.ax, state.bx))
        fy = np.asarray(lattice.merge_checkerboard(state.ay, state.by))
        return np.stack([fx, fy], axis=-1).astype(np.float64)

    @staticmethod
    def energy_sum_numpy(full: np.ndarray) -> float:
        e = 0.0
        for ax in (0, 1):
            e -= (full * np.roll(full, -1, axis=ax)).sum()
        return float(e)
