"""Fused clock observable kernel: (Σcos, Σsin, E) in one pass.

Clock counterpart of ops/ising2d_measure_pallas.py: per block the int8
states are mapped to (cos, sin) by select chains once, then reused for
both the magnetization components and the bond energy — a single read
of each color array per sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.models.base import CheckerboardState
from cuda_fortran_mc_simulation_spin_tpu.ops import stencil
from cuda_fortran_mc_simulation_spin_tpu.ops.clock_pallas import (
    _cos_sin_chain,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    _pick_tile_rows,
)


def _kernel(a_ref, b_ref, ad_ref, bd_ref, out_ref, *, ty: int, q: int):
    i = pl.program_id(1)
    parity = stencil.row_parity_mask(ty, i * ty)
    a = a_ref[0].astype(jnp.int32)
    b = b_ref[0].astype(jnp.int32)
    ca, sa = _cos_sin_chain(a, q)
    cb, sb = _cos_sin_chain(b, q)
    cad, sad = _cos_sin_chain(ad_ref[0, 0:1, :].astype(jnp.int32), q)
    cbd, sbd = _cos_sin_chain(bd_ref[0, 0:1, :].astype(jnp.int32), q)

    def bonds(pa, pb, pad, pbd):
        right_a = jnp.where(
            parity, pltpu.roll(pb, pb.shape[1] - 1, axis=1), pb
        )
        right_b = jnp.where(
            parity, pa, pltpu.roll(pa, pa.shape[1] - 1, axis=1)
        )
        down_a = stencil.shift_down(pb, pbd)
        down_b = stencil.shift_down(pa, pad)
        return (jnp.sum(pa * (right_a + down_a))
                + jnp.sum(pb * (right_b + down_b)))

    mx = jnp.sum(ca) + jnp.sum(cb)
    my = jnp.sum(sa) + jnp.sum(sb)
    e = -(bonds(ca, cb, cad, cbd) + bonds(sa, sb, sad, sbd))

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0
    vals = jnp.where(
        lane == 0, mx,
        jnp.where(lane == 1, my, jnp.where(lane == 2, e, 0.0)),
    )
    vals = jnp.where(row0, vals, 0.0)

    @pl.when(i == 0)
    def _():
        out_ref[0] = vals

    @pl.when(i > 0)
    def _():
        out_ref[0] = out_ref[0] + vals


@functools.partial(jax.jit, static_argnames=("q", "nrep", "ny", "half"))
def _measure(a, b, *, q, nrep, ny, half):
    ty = _pick_tile_rows(ny, half, budget_bytes=128 << 10)
    n = ny // ty
    nb8 = ny // 8
    kernel = functools.partial(_kernel, ty=ty, q=q)
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
    """{m, my, e} densities; (R, ny, half) or (ny, half) states."""
    ny, half = model.color_shape
    a, b = state
    batched = a.ndim == 3
    if not batched:
        a, b = a[None], b[None]
    out = _measure(a, b, q=model.q, nrep=a.shape[0], ny=ny, half=half)
    n_inv = jnp.float32(1.0 / model.nsites)
    obs = {
        "m": out[:, 0, 0] * n_inv,
        "my": out[:, 0, 1] * n_inv,
        "e": out[:, 0, 2] * n_inv,
    }
    if not batched:
        obs = {k: v[0] for k, v in obs.items()}
    return obs
