"""Fused Pallas TPU kernels for the 2-D XY model.

TPU-native counterparts of the reference's XY CUDA kernels:

- Metropolis phase (`update_sub`,
  /root/reference/src/xy2d_periodic_gpu_m.f90:368-387): candidate angle
  from in-kernel hardware PRNG, ΔE = -(S'-S)·Σnbr, acceptance compare —
  all fused, no HBM random arrays;
- over-relaxation phase (`over_relaxation_sub`, :418-439): reflection
  about the normalized local field with |S| renormalization — pure VPU
  arithmetic, deterministic.

Layout: spin components as separate f32 planes per checkerboard color
(R, ny, nx//2); grid (replicas, row-blocks); periodic y-halos via 8-row
BlockSpecs as in ops/ising2d_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XYState
from cuda_fortran_mc_simulation_spin_tpu.ops import stencil
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    _pick_tile_rows,
    seeds_from_key,
)

_TWO_PI = np.float32(2.0 * np.pi)


def _field(ox_ref, oxu_ref, oxd_ref, oy_ref, oyu_ref, oyd_ref,
           color, parity):
    ox = ox_ref[0]
    oy = oy_ref[0]
    hx = stencil.nbr_sum(ox, oxu_ref[0, 7:8, :], oxd_ref[0, 0:1, :],
                         color, parity)
    hy = stencil.nbr_sum(oy, oyu_ref[0, 7:8, :], oyd_ref[0, 0:1, :],
                         color, parity)
    return hx, hy


def _metropolis_kernel(seed_ref, sx_ref, sy_ref,
                       ox_ref, oxu_ref, oxd_ref,
                       oy_ref, oyu_ref, oyd_ref,
                       outx_ref, outy_ref,
                       *, color: int, ty: int, beta: float):
    r = pl.program_id(0)
    i = pl.program_id(1)
    tile_tag = i * jnp.int32(-1640531527) + r * jnp.int32(0x3C6EF35F)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)

    parity = stencil.row_parity_mask(ty, i * ty)
    hx, hy = _field(ox_ref, oxu_ref, oxd_ref, oy_ref, oyu_ref, oyd_ref,
                    color, parity)
    sx = sx_ref[0]
    sy = sy_ref[0]

    u_cand = stencil.bits_to_uniform(
        pltpu.bitcast(pltpu.prng_random_bits(sx.shape), jnp.uint32)
    )
    ang = _TWO_PI * u_cand
    cx = jnp.cos(ang)
    cy = jnp.sin(ang)
    de = -((cx - sx) * hx + (cy - sy) * hy)
    p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))
    u_acc = stencil.bits_to_uniform(
        pltpu.bitcast(pltpu.prng_random_bits(sx.shape), jnp.uint32)
    )
    accept = u_acc < p
    outx_ref[0] = jnp.where(accept, cx, sx)
    outy_ref[0] = jnp.where(accept, cy, sy)


def _over_relax_kernel(sx_ref, sy_ref,
                       ox_ref, oxu_ref, oxd_ref,
                       oy_ref, oyu_ref, oyd_ref,
                       outx_ref, outy_ref,
                       *, color: int, ty: int):
    i = pl.program_id(1)
    parity = stencil.row_parity_mask(ty, i * ty)
    hx, hy = _field(ox_ref, oxu_ref, oxd_ref, oy_ref, oyu_ref, oyd_ref,
                    color, parity)
    sx = sx_ref[0]
    sy = sy_ref[0]
    inv = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy, jnp.float32(1e-30)))
    nxh = hx * inv
    nyh = hy * inv
    d = 2.0 * (sx * nxh + sy * nyh)
    rx = d * nxh - sx
    ry = d * nyh - sy
    rinv = jax.lax.rsqrt(
        jnp.maximum(rx * rx + ry * ry, jnp.float32(1e-30))
    )
    outx_ref[0] = rx * rinv
    outy_ref[0] = ry * rinv


def _specs(ty: int, ny: int, half: int):
    nb8 = ny // 8
    center = pl.BlockSpec((1, ty, half), lambda r, i: (r, i, 0),
                          memory_space=pltpu.VMEM)
    up = pl.BlockSpec(
        (1, 8, half), lambda r, i: (r, (i * ty // 8 - 1 + nb8) % nb8, 0),
        memory_space=pltpu.VMEM,
    )
    dn = pl.BlockSpec(
        (1, 8, half), lambda r, i: (r, ((i + 1) * ty // 8) % nb8, 0),
        memory_space=pltpu.VMEM,
    )
    return center, up, dn


@functools.partial(
    jax.jit, static_argnames=("color", "beta", "nrep", "ny", "half")
)
def _metropolis_phase(sx, sy, ox, oy, seeds, *, color, beta, nrep, ny,
                      half):
    ty = _pick_tile_rows(ny, half, budget_bytes=64 << 10, gran=8)
    n = ny // ty
    center, up, dn = _specs(ty, ny, half)
    kernel = functools.partial(
        _metropolis_kernel, color=color, ty=ty, beta=beta
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nrep, ny, half), jnp.float32),
            jax.ShapeDtypeStruct((nrep, ny, half), jnp.float32),
        ),
        grid=(nrep, n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            center, center,               # sx, sy
            center, up, dn,               # ox + halos
            center, up, dn,               # oy + halos
        ],
        out_specs=(center, center),
        input_output_aliases={1: 0, 2: 1},
    )(seeds, sx, sy, ox, ox, ox, oy, oy, oy)


@functools.partial(
    jax.jit, static_argnames=("color", "nrep", "ny", "half")
)
def _over_relax_phase(sx, sy, ox, oy, *, color, nrep, ny, half):
    ty = _pick_tile_rows(ny, half, budget_bytes=64 << 10, gran=8)
    n = ny // ty
    center, up, dn = _specs(ty, ny, half)
    kernel = functools.partial(_over_relax_kernel, color=color, ty=ty)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nrep, ny, half), jnp.float32),
            jax.ShapeDtypeStruct((nrep, ny, half), jnp.float32),
        ),
        grid=(nrep, n),
        in_specs=[
            center, center,
            center, up, dn,
            center, up, dn,
        ],
        out_specs=(center, center),
        input_output_aliases={0: 0, 1: 1},
    )(sx, sy, ox, ox, ox, oy, oy, oy)


def _maybe_batch(state: XYState):
    batched = state.ax.ndim == 3
    if batched:
        return state, True
    return XYState(*(p[None] for p in state)), False


def sweep(model, state: XYState, key: jax.Array) -> XYState:
    """One Metropolis MCS (both colors); (ny, half) or (R, ny, half)."""
    ny, half = model.color_shape
    st, batched = _maybe_batch(state)
    ax, ay, bx, by = st
    kw = dict(beta=float(model.beta), nrep=ax.shape[0], ny=ny, half=half)
    ax, ay = _metropolis_phase(ax, ay, bx, by, seeds_from_key(key, 0),
                               color=0, **kw)
    bx, by = _metropolis_phase(bx, by, ax, ay, seeds_from_key(key, 1),
                               color=1, **kw)
    out = XYState(ax, ay, bx, by)
    return out if batched else XYState(*(p[0] for p in out))


def over_relax_sweep(model, state: XYState) -> XYState:
    """One over-relaxation sweep (both colors, deterministic)."""
    ny, half = model.color_shape
    st, batched = _maybe_batch(state)
    ax, ay, bx, by = st
    kw = dict(nrep=ax.shape[0], ny=ny, half=half)
    ax, ay = _over_relax_phase(ax, ay, bx, by, color=0, **kw)
    bx, by = _over_relax_phase(bx, by, ax, ay, color=1, **kw)
    out = XYState(ax, ay, bx, by)
    return out if batched else XYState(*(p[0] for p in out))
