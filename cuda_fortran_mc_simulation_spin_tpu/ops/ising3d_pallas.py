"""Fused Pallas TPU kernel: 3-D Ising checkerboard Metropolis phase.

TPU-native counterpart of /root/reference/src/ising3d_gpu_m.f90:174-206.
The constant-memory ws(0:6,0:1) acceptance table (:136-172) becomes three
uint32 threshold selects (core/tables.py); RNG is the in-kernel hardware
PRNG.

Tiling: grid (replica, z-slice) over (R, nz, ny, nx//2) int8 color
arrays.  Each kernel invocation holds one full z-plane in VMEM, so x and
y neighbors wrap *locally* (lane roll / sublane roll) and only the z±1
planes are fetched through extra BlockSpecs — no halo splicing at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.core import tables
from cuda_fortran_mc_simulation_spin_tpu.models.base import CheckerboardState
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    seeds_from_key,
)


def _phase_kernel(seed_ref, x_ref, oc_ref, ozm_ref, ozp_ref, out_ref,
                  *, color: int, t_levels: tuple[int, int, int]):
    r = pl.program_id(0)
    z = pl.program_id(1)
    tile_tag = z * jnp.int32(-1640531527) + r * jnp.int32(0x3C6EF35F)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)

    x = x_ref[0, 0].astype(jnp.int32)        # (ny, half)
    o = oc_ref[0, 0].astype(jnp.int32)
    zm = ozm_ref[0, 0].astype(jnp.int32)
    zp = ozp_ref[0, 0].astype(jnp.int32)

    ny = o.shape[0]
    yp = pltpu.roll(o, ny - 1, axis=0)        # value from y+1
    ym = pltpu.roll(o, 1, axis=0)             # value from y-1
    minus = pltpu.roll(o, 1, axis=1)
    plus = pltpu.roll(o, o.shape[1] - 1, axis=1)
    # x-offset parity is (y + z) & 1
    parity = (
        (jax.lax.broadcasted_iota(jnp.int32, (ny, 1), 0) + z) & 1
    ) == 1
    if color == 0:
        lr = o + jnp.where(parity, plus, minus)
    else:
        lr = o + jnp.where(parity, minus, plus)

    k = x * (zm + zp + yp + ym + lr)          # ΔE/2 ∈ {-6..6}
    bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
    t4, t8, t12 = t_levels
    thresh = jnp.where(
        k == 2, jnp.uint32(t4),
        jnp.where(k == 4, jnp.uint32(t8), jnp.uint32(t12)),
    )
    accept = (k <= 0) | (bits < thresh)
    out_ref[0, 0] = jnp.where(accept, -x, x).astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("color", "beta", "nrep", "nz", "ny", "half")
)
def _metropolis_phase(x, other, seeds, *, color, beta, nrep, nz, ny, half):
    t_levels = tuple(tables.ising3d_accept_thresholds_u32(beta))
    kernel = functools.partial(
        _phase_kernel, color=color, t_levels=t_levels
    )
    plane = pl.BlockSpec((1, 1, ny, half), lambda r, z: (r, z, 0, 0),
                         memory_space=pltpu.VMEM)
    zm = pl.BlockSpec(
        (1, 1, ny, half), lambda r, z: (r, (z - 1 + nz) % nz, 0, 0),
        memory_space=pltpu.VMEM,
    )
    zp = pl.BlockSpec(
        (1, 1, ny, half), lambda r, z: (r, (z + 1) % nz, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nrep, nz, ny, half), jnp.int8),
        grid=(nrep, nz),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            plane, plane, zm, zp,
        ],
        out_specs=plane,
        input_output_aliases={1: 0},
    )(seeds, x, other, other, other)


def sweep(model, state: CheckerboardState, key: jax.Array
          ) -> CheckerboardState:
    """One full 3-D MCS; (nz, ny, half) or replica-batched arrays."""
    nz, ny, half = model.color_shape
    a, b = state
    batched = a.ndim == 4
    if not batched:
        a, b = a[None], b[None]
    kw = dict(beta=float(model.beta), nrep=a.shape[0], nz=nz, ny=ny,
              half=half)
    a = _metropolis_phase(a, b, seeds_from_key(key, 0), color=0, **kw)
    b = _metropolis_phase(b, a, seeds_from_key(key, 1), color=1, **kw)
    if not batched:
        a, b = a[0], b[0]
    return CheckerboardState(a, b)
