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


# ---------------------------------------------------------------------------
# halo-aware phase for the domain-sharded (shard_map) path
# ---------------------------------------------------------------------------

def _halo_phase_kernel(seed_ref, offs_ref, x_ref, oc_ref, ozm_ref,
                       ozp_ref, hzm_ref, hzp_ref, *rest,
                       color: int, nblk: int,
                       t_levels: tuple[int, int, int],
                       has_bits: bool, measuring: bool = False):
    """_phase_kernel for a z-sharded local block: the first/last z-slices
    take their z-neighbor plane from explicitly exchanged operands
    (ppermute over ICI) instead of the periodic wrap — the 3-D instance
    of the multi-chip promotion of the reference's halo maintenance
    (/root/reference/src/ising3d_gpu_m.f90:86-135).  ``measuring``
    (phase 1): emit per-shard (m, e) partial sums."""
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    if has_bits:
        bits_ref, out_ref = refs
    else:
        (out_ref,) = refs
    r = pl.program_id(0)
    z = pl.program_id(1)
    z_g = offs_ref[1] + z

    x = x_ref[0, 0].astype(jnp.int32)
    o = oc_ref[0, 0].astype(jnp.int32)
    zm = jnp.where(z == 0, hzm_ref[0, 0], ozm_ref[0, 0]).astype(jnp.int32)
    zp = jnp.where(z == nblk - 1, hzp_ref[0, 0],
                   ozp_ref[0, 0]).astype(jnp.int32)

    ny = o.shape[0]
    yp = pltpu.roll(o, ny - 1, axis=0)
    ym = pltpu.roll(o, 1, axis=0)
    minus = pltpu.roll(o, 1, axis=1)
    plus = pltpu.roll(o, o.shape[1] - 1, axis=1)
    parity = (
        (jax.lax.broadcasted_iota(jnp.int32, (ny, 1), 0) + z_g) & 1
    ) == 1
    if color == 0:
        lr = o + jnp.where(parity, plus, minus)
    else:
        lr = o + jnp.where(parity, minus, plus)

    nsum = zm + zp + yp + ym + lr
    k = x * nsum
    if has_bits:
        bits = bits_ref[0, 0]
    else:
        rep_g = offs_ref[0] + r
        tile_tag = (z_g * jnp.int32(-1640531527)
                    + rep_g * jnp.int32(0x3C6EF35F))
        pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)
        bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
    t4, t8, t12 = t_levels
    thresh = jnp.where(
        k == 2, jnp.uint32(t4),
        jnp.where(k == 4, jnp.uint32(t8), jnp.uint32(t12)),
    )
    accept = (k <= 0) | (bits < thresh)
    out = jnp.where(accept, -x, x)
    out_ref[0, 0] = out.astype(jnp.int8)
    if measuring:
        # phase-1 nsum is built from final other-color values; each bond
        # appears exactly once in Σ_x s_new·nsum.  int32 partials are
        # exact (f32 would round past 2^24 on large shards), matching
        # the packed engines' bitwise shard-invariance guarantee.
        m = jnp.sum(out) + jnp.sum(o)
        e = -jnp.sum(out * nsum)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, m, jnp.where(lane == 1, e, 0))

        @pl.when(z == 0)
        def _():
            obs_ref[0, 0] = jnp.zeros_like(obs_ref[0, 0])

        obs_ref[0, 0] = obs_ref[0, 0] + row


def sharded_phase(x, other, halo_zm, halo_zp, seeds, offs, *,
                  color: int, beta: float, bits=None,
                  interpret: bool = False, measuring: bool = False):
    """One 3-D checkerboard phase of a z-sharded local block.

    x, other: (R, L, ny, half) int8 local color blocks; halo_zm/halo_zp:
    (R, 1, ny, half) exchanged boundary planes (zm = global plane above
    slice 0, zp = plane below slice L-1); offs: (2,) int32 (rep0, z0)
    global offsets.  Call inside shard_map.  ``measuring`` additionally
    returns per-shard (m, e) partial sums (R,) each (phase 1 only)."""
    nrep, L, ny, half = x.shape
    if measuring and L * ny * half * 2 > (2 ** 31 - 1) // 3:
        # |e partial| ≤ 3·N_local: int32 fused accumulators would wrap
        raise ValueError(
            f"local block of {L * ny * half * 2} sites overflows the "
            "int32 fused-observable accumulators; measure with a "
            "separate reduction pass"
        )
    t_levels = tuple(tables.ising3d_accept_thresholds_u32(beta))
    if interpret and bits is None:
        kb = jax.random.fold_in(
            jax.random.fold_in(
                jax.random.PRNGKey(seeds[0].astype(jnp.uint32)), seeds[1]
            ),
            offs[0] * jnp.int32(65537) + offs[1],
        )
        bits = jax.random.bits(kb, x.shape, dtype=jnp.uint32)
    kernel = functools.partial(
        _halo_phase_kernel, color=color, nblk=L, t_levels=t_levels,
        has_bits=bits is not None, measuring=measuring,
    )
    plane = pl.BlockSpec((1, 1, ny, half), lambda r, z: (r, z, 0, 0),
                         memory_space=pltpu.VMEM)
    zm = pl.BlockSpec(
        (1, 1, ny, half), lambda r, z: (r, (z - 1 + L) % L, 0, 0),
        memory_space=pltpu.VMEM,
    )
    zp = pl.BlockSpec(
        (1, 1, ny, half), lambda r, z: (r, (z + 1) % L, 0, 0),
        memory_space=pltpu.VMEM,
    )
    hplane = pl.BlockSpec((1, 1, ny, half), lambda r, z: (r, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        plane, plane, zm, zp, hplane, hplane,
    ]
    operands = [seeds, offs, x, other, other, other, halo_zm, halo_zp]
    if bits is not None:
        in_specs.append(plane)
        operands.append(bits)
    out_shape = [jax.ShapeDtypeStruct((nrep, L, ny, half), jnp.int8)]
    out_specs = [plane]
    if measuring:
        out_shape.append(
            jax.ShapeDtypeStruct((nrep, 1, 1, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 1, 1, 128),
                                      lambda r, z: (r, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape) if measuring else out_shape[0],
        grid=(nrep, L),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if measuring else out_specs[0],
        input_output_aliases={2: 0},
        interpret=interpret,
    )(*operands)
    if measuring:
        state_out, obs = res
        return state_out, obs[:, 0, 0, 0], obs[:, 0, 0, 1]
    return res


def shard_pallas_ok(local_shape: tuple[int, ...]) -> bool:
    """Local (R, L, ny, half) block shape suits the z-slice halo kernel."""
    if len(local_shape) != 4:
        return False
    _, L, ny, half = local_shape
    return half % 128 == 0 and ny % 8 == 0 and L >= 2


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
