"""Fused Ising2D observable kernel: (Σm, E) in one pass.

Counterpart of ops/xy2d_measure_pallas.py for the int8 dual-color
lattice: reads each color array once per sweep and emits the
magnetization and bond-energy sums, accumulating across row-block grid
steps (sequential on TPU) into one output block.  Used by the batched
relaxation runner for lattices too large for the VMEM multisweep kernel
(ops/ising2d_multisweep.py computes the same sums in-kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.models.base import CheckerboardState
from cuda_fortran_mc_simulation_spin_tpu.ops import stencil
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    _pick_tile_rows,
)


def _kernel(a_ref, b_ref, ad_ref, bd_ref, out_ref, *, ty: int):
    i = pl.program_id(1)
    parity = stencil.row_parity_mask(ty, i * ty)
    a = a_ref[0].astype(jnp.int32)
    b = b_ref[0].astype(jnp.int32)
    a_dn_row = bd_ref[0, 0:1, :].astype(jnp.int32)
    b_dn_row = ad_ref[0, 0:1, :].astype(jnp.int32)

    right_a = jnp.where(parity, pltpu.roll(b, b.shape[1] - 1, axis=1), b)
    right_b = jnp.where(parity, a, pltpu.roll(a, a.shape[1] - 1, axis=1))
    down_a = stencil.shift_down(b, a_dn_row)
    down_b = stencil.shift_down(a, b_dn_row)

    m = jnp.sum(a + b)
    e = -jnp.sum(a * (right_a + down_a) + b * (right_b + down_b))

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0
    vals = jnp.where(
        lane == 0, m.astype(jnp.float32),
        jnp.where(lane == 1, e.astype(jnp.float32), 0.0),
    )
    vals = jnp.where(row0, vals, 0.0)

    @pl.when(i == 0)
    def _():
        out_ref[0] = vals

    @pl.when(i > 0)
    def _():
        out_ref[0] = out_ref[0] + vals


@functools.partial(jax.jit, static_argnames=("nrep", "ny", "half"))
def _measure(a, b, *, nrep, ny, half):
    ty = _pick_tile_rows(ny, half, budget_bytes=256 << 10)
    n = ny // ty
    nb8 = ny // 8
    kernel = functools.partial(_kernel, ty=ty)
    center = pl.BlockSpec((1, ty, half), lambda r, i: (r, i, 0),
                          memory_space=pltpu.VMEM)
    dn = pl.BlockSpec(
        (1, 8, half), lambda r, i: (r, ((i + 1) * ty // 8) % nb8, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.BlockSpec((1, 8, 128), lambda r, i: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nrep, 8, 128), jnp.float32),
        grid=(nrep, n),
        in_specs=[center, center, dn, dn],
        out_specs=out,
    )(a, b, a, b)


def measure(model, state: CheckerboardState) -> dict[str, jax.Array]:
    """{m, e} densities for (R, ny, half) or (ny, half) color arrays."""
    ny, half = model.color_shape
    a, b = state
    batched = a.ndim == 3
    if not batched:
        a, b = a[None], b[None]
    out = _measure(a, b, nrep=a.shape[0], ny=ny, half=half)
    n_inv = jnp.float32(1.0 / model.nsites)
    obs = {"m": out[:, 0, 0] * n_inv, "e": out[:, 0, 1] * n_inv}
    if not batched:
        obs = {k: v[0] for k, v in obs.items()}
    return obs
