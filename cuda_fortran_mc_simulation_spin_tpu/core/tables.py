"""Acceptance / energy table builders and gather-free state evaluation.

The reference's discrete models precompute acceptance in lookup tables —
Ising2D exp-array (/root/reference/src/ising2d_gpu_m.f90:120-131), Ising3D
ws(0:6,0:1) in CUDA constant memory (/root/reference/src/
ising3d_gpu_m.f90:136-172), and the clock family's 3-D energy and 6-D
probability tables (/root/reference/src/clock/clock_tableall_gpu_m.f90:
26-33,56-88).  Table *lookups* are gathers, which TPUs do badly; the
TPU-native equivalent keeps the "precompute everything discrete on the
host" idea but materializes lookups as select chains / fused arithmetic:

- Ising: two scalar uint32 thresholds (ops/ising2d_pallas.py);
- clock: per-state cos/sin evaluated by a q-way select chain
  (:func:`state_cos_sin`), turning the bond-energy table into a dot
  product with the local vector field;
- Ising3D: 7-level threshold select (ops/ising3d_pallas.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def clock_unit_vectors(q: int) -> np.ndarray:
    """(q, 2) f64 table of (cos, sin)(2π s / q) — the host-side analog of
    `state_to_magne` (/root/reference/src/clock/clock_tableall_gpu_m.f90:26)
    extended with the y component."""
    ang = 2.0 * np.pi * np.arange(q) / q
    return np.stack([np.cos(ang), np.sin(ang)], axis=1)


def state_select(state: jnp.ndarray, values: np.ndarray,
                 dtype=jnp.float32) -> jnp.ndarray:
    """values[state] via a static select chain (no gather).

    ``values`` is a small host-side table (len q); ``state`` any int array.
    Cost: q fused compare+selects on the VPU — cheap for q ≤ ~16, and
    exactly the capability of the reference's LUT indexing without
    touching the (TPU-slow) gather path.
    """
    out = jnp.full(state.shape, np.float64(values[0]), dtype=dtype)
    for s in range(1, len(values)):
        out = jnp.where(state == s, dtype(np.float64(values[s])), out)
    return out


# select chains beat direct cos/sin evaluation only while the chain is
# short; past this depth two transcendentals win (and impose no cap on q)
_SELECT_CHAIN_MAX_Q = 16


def state_cos_sin(state: jnp.ndarray, q: int,
                  dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(cos θ, sin θ) for clock states θ = 2π·state/q.

    Small q uses the gather-free select chain (the tableall capability);
    large q evaluates the transcendentals directly — this is what lifts
    the reference's q ≤ 50 cap (/root/reference/src/clock_gpu_m.f90:10)
    to arbitrary q."""
    if q <= _SELECT_CHAIN_MAX_Q:
        tab = clock_unit_vectors(q)
        return (
            state_select(state, tab[:, 0], dtype),
            state_select(state, tab[:, 1], dtype),
        )
    from cuda_fortran_mc_simulation_spin_tpu.ops import trig

    c, s = trig.cos_sin_2pi(state.astype(jnp.float32) * jnp.float32(1.0 / q))
    return c.astype(dtype), s.astype(dtype)


def clock_bond_energy_table(q: int) -> np.ndarray:
    """(q, q) f64: E(c1, c2) = -cos(2π (c1-c2)/q) — the pairwise bond
    energy underlying `state_center_right_up_to_energy`
    (/root/reference/src/clock/clock_tableall_gpu_m.f90:27-33)."""
    d = np.arange(q)[:, None] - np.arange(q)[None, :]
    return -np.cos(2.0 * np.pi * d / q)


def ising3d_accept_thresholds_u32(beta: float) -> list[int]:
    """uint32 cutoffs for 3D Ising ΔE = 2·s·Σ₆nbr.

    Σ₆nbr of six ±1 spins is even, so ΔE ∈ {0, ±4, ±8, ±12}; the three
    positive levels 4k (k=1..3) are the only rejecting entries of the
    reference's ws table (/root/reference/src/ising3d_gpu_m.f90:136-172).
    """
    outs = []
    for k in range(1, 4):
        p = np.exp(-beta * 4.0 * k)
        outs.append(int(min(0xFFFFFFFF, round(float(p) * 4294967296.0))))
    return outs
