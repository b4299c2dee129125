"""Bit-packed multispin Metropolis for the HELICAL 3-D Ising geometry
— the reference's committed odd workloads 151×151×150, 501×501×500 and
1001×1000×1000 (/root/reference/scripts/fpm_run_ising3d.sh:7-9,
scripts/fpm_run_ising3d_relaxations_specific_times.sh:7-9,
app/ising3d_gpu_relaxation.f90:8-10).

The reference's 3-D lattice is ONE flat array whose site ``idx``
neighbors ``idx±1``, ``idx±nx``, ``idx±nx·ny`` mod nall with mirrored
wrap planes (/root/reference/src/ising3d_gpu_m.f90:50-71,104-120) and
flat-index-parity checkerboarding (:180-206).  Exactly as in the 2-D
flat engine (ops/helical_multispin.py), splitting by parity gives two
DENSE color vectors a[j] = s[2j], b[j] = s[2j+1] of length M = nall/2
whose neighbor maps are SIX constant modular offsets (h = (nx-1)/2,
g = (nx·ny-1)/2, odd nx·ny):

    a[j] reads b[(j + d) mod M],  d ∈ {0, -1, h, -(h+1), g, -(g+1)}
    b[j] reads a[(j + d) mod M],  d ∈ {1,  0, h+1, -h, g+1, -g}

For EVEN nx·ny (the committed 1001×1000×1000 app geometry) the
z-offsets ±nx·ny preserve parity: z-neighbors live in a site's OWN
color at self-offsets ±nx·ny/2 — the lattice graph is NOT bipartite
under these offsets (the +1-chain/+nxy cycle has odd length nxy+1), so
flat-parity two-coloring cannot decouple the z-bonds.  The reference's
stride-2 kernel simply races on those pairs
(/root/reference/src/ising3d_gpu_m.f90:174-206 with even nx·ny updates
z-neighbor pairs in one launch); simultaneous co-updates of coupled
pairs are the classic parallel-Metropolis pathology and measurably
drive the system toward z-anti-alignment (e(t) → +0.95 at Tc — found
by the round-4 production slice at the literal app geometry).  The
EXACT scheme used here: within a color the only conflicts are the
z-offsets, and the z-rings have length nz (even for every committed
geometry), so each color phase splits into two z-plane-parity
sub-phases — 4 masked sub-phases per MCS, each reading fully-settled
neighbors.  A geometry with even nx·ny AND odd nz has odd z-rings
(non-bipartite even per-color) and is rejected at model construction.

Two execution paths share the packing and the jnp oracle:

- ``multisweep``: whole state VMEM-resident, S MCS per dispatch, fused
  per-sweep exact int32 (m, e) — for grids up to ~1024 word-rows
  (151³-class; the 2-D engine's budget).
- ``multisweep_stream``: any size.  Neighbor planes are produced by
  XLA modular funnel-shifts in HBM each phase; a streaming Pallas
  kernel grids over (replica, row-block) doing counter + Bernoulli
  chain + flip with in-kernel hardware PRNG, and the phase-b kernel
  fuses exact per-block int32 (m, e) partials, reduced in f64 outside
  (giant lattices exceed the int32 |e| ≤ 3N cap).

Acceptance reuses the bit-sliced 6-input counter and the 3-level
(exp(-4β), exp(-8β), exp(-12β)) Bernoulli chains of
ops/ising3d_multispin.py; shifts and packing come from
ops/helical_multispin.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.ops.helical_multispin import (
    LANES,
    _jnp_roll,
    _pltpu_roll,
    _shift_bits,
    _shift_mod_impl,
    grid_rows,
    pack_flat,
    split_flat,
    unpack_flat,
    valid_mask,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_multispin import (
    PACK,
    _bern_plane,
    _pc_plane,
    chain_digits,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    seeds_from_key,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.ising3d_multispin import (
    _count6,
    _flip_plane3d,
)

__all__ = [
    "helical3d_offsets", "fits", "fits_stream", "fits_stream_halo",
    "multisweep", "multisweep_stream", "multisweep_stream_halo",
    "pack_flat", "unpack_flat", "split_flat", "zmask_plane",
]


def helical3d_offsets(nx: int, nxy: int
                      ) -> tuple[tuple[int, ...], tuple[int, ...],
                                 tuple[int, ...]]:
    """(cross offsets for color a, cross offsets for color b, self
    offsets) in color-vector index space."""
    h = (nx - 1) // 2
    if nxy % 2 == 1:
        g = (nxy - 1) // 2
        return ((0, -1, h, -(h + 1), g, -(g + 1)),
                (1, 0, h + 1, -h, g + 1, -g), ())
    return ((0, -1, h, -(h + 1)), (1, 0, h + 1, -h),
            (nxy // 2, -(nxy // 2)))


def zmask_plane(nxy: int, rows: int) -> jax.Array:
    """(rows, 128) int32 word plane whose bit p is set iff color-index
    p lies in an EVEN z-plane (p // (nxy/2) even; nxy even).  The same
    mask serves both colors: flat 2j and 2j+1 share floor(·/nxy)."""
    zh = nxy // 2
    w = (jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
         + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
         ) * jnp.int32(PACK)
    out = jnp.zeros((rows, LANES), jnp.uint32)
    for b in range(PACK):
        zeven = ((w + jnp.int32(b)) // jnp.int32(zh)) % 2 == 0
        out = out | (zeven.astype(jnp.uint32) << jnp.uint32(b))
    return jax.lax.bitcast_convert_type(out, jnp.int32)


# -- oracles -----------------------------------------------------------------

def packed_phase_reference(xw, ow, offs_cross, offs_self, b4, b8, b12,
                           m: int, zmask=None, zsub: int = 0):
    """Pure-jnp packed phase on (rows, 128) planes — the bitwise oracle
    for both kernels.  With ``zmask`` (even-nx·ny geometries) only the
    z-sub-parity ``zsub`` sites flip (one of the four exact
    sub-phases)."""
    xw = xw.astype(jnp.uint32)
    ow = ow.astype(jnp.uint32)
    planes = [_shift_mod_impl(ow, d, m, _jnp_roll) for d in offs_cross]
    planes += [_shift_mod_impl(xw, d, m, _jnp_roll) for d in offs_self]
    b1, b2, b4c = _count6(*planes)
    flip = _flip_plane3d(xw, b1, b2, b4c,
                         b4.astype(jnp.uint32), b8.astype(jnp.uint32),
                         b12.astype(jnp.uint32))
    if zmask is not None:
        zm = jax.lax.bitcast_convert_type(zmask, jnp.uint32)
        flip = flip & (zm if zsub == 0 else ~zm)
    return (xw ^ flip).astype(jnp.int32)


def flat_phase_reference(x_flat, o_flat, offs_cross, offs_self,
                         b4u, b8u, b12u, zmask=None, zsub: int = 0):
    """Unpacked ±1 color-vector oracle given Bernoulli accept planes.
    ``zmask`` (bool, color-index space) gates flips to one z-sub-parity
    exactly as in packed_phase_reference."""
    o32 = o_flat.astype(jnp.int32)
    x32 = x_flat.astype(jnp.int32)
    nsum = sum(jnp.roll(o32, -d) for d in offs_cross)
    for d in offs_self:
        nsum = nsum + jnp.roll(x32, -d)
    half_de = x32 * nsum
    accept = (half_de <= 0) | jnp.where(
        half_de == 2, b4u, jnp.where(half_de == 4, b8u, b12u))
    if zmask is not None:
        accept = accept & (zmask if zsub == 0 else ~zmask)
    return jnp.where(accept, -x_flat, x_flat).astype(jnp.int8)


# -- single phase with injected planes (bitwise testable) ---------------------

def _phase_bits_kernel(x_ref, o_ref, b4_ref, b8_ref, b12_ref, out_ref,
                       *, offs_cross, offs_self, m: int):
    """Single phase with injected Bernoulli planes — exercises the
    in-kernel shift/blend path (_pltpu_roll) so interpret-mode CPU
    tests cover the Mosaic code, mirroring the sibling engines."""
    x = pltpu.bitcast(x_ref[0], jnp.uint32)
    o = pltpu.bitcast(o_ref[0], jnp.uint32)
    planes = [_shift_mod_impl(o, d, m, _pltpu_roll) for d in offs_cross]
    planes += [_shift_mod_impl(x, d, m, _pltpu_roll) for d in offs_self]
    b1, b2, b4c = _count6(*planes)
    flip = _flip_plane3d(x, b1, b2, b4c,
                         pltpu.bitcast(b4_ref[0], jnp.uint32),
                         pltpu.bitcast(b8_ref[0], jnp.uint32),
                         pltpu.bitcast(b12_ref[0], jnp.uint32))
    out_ref[0] = pltpu.bitcast(x ^ flip, jnp.int32)


def phase_packed_with_bits(xw, ow, b4, b8, b12, *, offs_cross,
                           offs_self, m: int, interpret: bool = False):
    """(R, rows, 128) packed phase with injected planes (bitwise
    testable against packed_phase_reference)."""
    nrep, rows, lanes = xw.shape
    kernel = functools.partial(
        _phase_bits_kernel, offs_cross=tuple(offs_cross),
        offs_self=tuple(offs_self), m=m,
    )
    blk = pl.BlockSpec((1, rows, lanes), lambda r: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nrep, rows, lanes), jnp.int32),
        grid=(nrep,),
        in_specs=[blk] * 5,
        out_specs=blk,
        input_output_aliases={0: 0},
        interpret=interpret,
    )(xw, ow, b4, b8, b12)


# -- VMEM-resident multisweep (cross-parity geometries) -----------------------

def _ms_kernel(seed_ref, wa_in, wb_in, wa_ref, wb_ref, obs_ref,
               *, sweeps: int, d4, d8, d12, offs_a, offs_b, offs_s,
               m: int, rows: int):
    """S helical 3-D MCS on resident packed color planes + fused
    per-sweep (m, e)."""
    r = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0],
                    seed_ref[1] ^ (r * jnp.int32(0x3C6EF35F)))
    wa_ref[0] = wa_in[0]
    wb_ref[0] = wb_in[0]
    shape = (rows, LANES)
    vmask = valid_mask(rows, m)

    def gen():
        return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)

    def counts(o, x, offs):
        planes = [_shift_mod_impl(o, d, m, _pltpu_roll) for d in offs]
        planes += [
            _shift_mod_impl(x, d, m, _pltpu_roll) for d in offs_s
        ]
        return _count6(*planes)

    def body(s, _):
        wa = pltpu.bitcast(wa_ref[0], jnp.uint32)
        wb = pltpu.bitcast(wb_ref[0], jnp.uint32)
        b1, b2, b4c = counts(wb, wa, offs_a)
        p4 = _bern_plane(shape, d4, gen)
        p8 = _bern_plane(shape, d8, gen)
        p12 = _bern_plane(shape, d12, gen)
        wa = wa ^ _flip_plane3d(wa, b1, b2, b4c, p4, p8, p12)
        wa_ref[0] = pltpu.bitcast(wa, jnp.int32)
        b1, b2, b4c = counts(wa, wb, offs_b)
        p4 = _bern_plane(shape, d4, gen)
        p8 = _bern_plane(shape, d8, gen)
        p12 = _bern_plane(shape, d12, gen)
        wb = wb ^ _flip_plane3d(wb, b1, b2, b4c, p4, p8, p12)
        wb_ref[0] = pltpu.bitcast(wb, jnp.int32)
        # fused (m, e): cross-parity only (offs_s empty), so the
        # phase-b counts are b-site neighbor counts in the FINAL a and
        # each bond has exactly one odd endpoint:
        # e = -Σ_b s_b·(2c-6) = -(4·Σxc - 12·Σx - 2·Σc + 6M).
        nsites = jnp.int32(m)
        bm = wb & vmask
        s_x = jnp.sum(_pc_plane(bm))
        s_c = (jnp.sum(_pc_plane(b1 & vmask))
               + 2 * jnp.sum(_pc_plane(b2 & vmask))
               + 4 * jnp.sum(_pc_plane(b4c & vmask)))
        s_xc = (jnp.sum(_pc_plane(bm & b1))
                + 2 * jnp.sum(_pc_plane(bm & b2))
                + 4 * jnp.sum(_pc_plane(bm & b4c)))
        mm = 2 * (s_x + jnp.sum(_pc_plane(wa & vmask))) - 2 * nsites
        e = -(4 * s_xc - 12 * s_x - 2 * s_c + 6 * nsites)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, mm, jnp.where(lane == 1, e, 0))
        obs_ref[0, pl.ds(s, 1), :] = row
        return 0

    jax.lax.fori_loop(0, sweeps, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("sweeps", "beta", "nx", "nxy", "m", "nrep",
                     "rows"),
)
def _multisweep(wa, wb, seeds, *, sweeps, beta, nx, nxy, m, nrep,
                rows):
    d4 = tuple(chain_digits(float(np.exp(-4.0 * beta))))
    d8 = tuple(chain_digits(float(np.exp(-8.0 * beta))))
    d12 = tuple(chain_digits(float(np.exp(-12.0 * beta))))
    offs_a, offs_b, offs_s = helical3d_offsets(nx, nxy)
    kernel = functools.partial(
        _ms_kernel, sweeps=sweeps, d4=d4, d8=d8, d12=d12,
        offs_a=offs_a, offs_b=offs_b, offs_s=offs_s, m=m, rows=rows,
    )
    plane = pl.BlockSpec((1, rows, LANES), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM)
    obs = pl.BlockSpec((1, sweeps, 128), lambda r: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nrep, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nrep, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nrep, sweeps, 128), jnp.int32),
        ),
        grid=(nrep,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), plane, plane],
        out_specs=(plane, plane, obs),
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(seeds, wa, wb)


# word-grid rows servable by the resident multisweep, matching
# ops/helical_multispin.py.  A 16K-row budget was tried for the
# committed 501x501x500 geometry (rows=15,320) but the whole-plane
# funnel shifts spill: XLA reported 137M of register-allocator spill
# slots against the 128M scoped-vmem cap (r4c log).  Large geometries
# route to the block-halo streaming engine below instead.
_VMEM_ROW_BUDGET = 1024


def fits(model) -> bool:
    """VMEM multisweep gate: cross-parity (odd nx·ny) and the word
    grid within the resident budget (151³-class)."""
    if model.nx % 2 == 0 or model.nsites % 2:
        return False
    if model.nxy % 2 == 0:
        return False
    if 3 * model.nsites > 2 ** 31 - 1:
        return False        # fused int32 (m, e) would wrap
    return grid_rows(model.nsites // 2) <= _VMEM_ROW_BUDGET


def multisweep(model, wa, wb, key, sweeps: int):
    """Advance ``sweeps`` helical 3-D MCS on packed color planes
    (R, rows, 128); returns (wa, wb, {m, e}) per-sweep densities."""
    m = model.nsites // 2
    if 3 * model.nsites > 2 ** 31 - 1:
        raise ValueError("lattice overflows int32 fused observables")
    nrep, rows, _ = wa.shape
    wa, wb, obs = _multisweep(
        wa, wb, seeds_from_key(key, 0), sweeps=sweeps,
        beta=float(model.beta), nx=model.nx, nxy=model.nxy, m=m,
        nrep=nrep, rows=rows,
    )
    n_inv = jnp.float32(1.0 / model.nsites)
    return wa, wb, {
        "m": obs[:, :, 0].astype(jnp.float32) * n_inv,
        "e": obs[:, :, 1].astype(jnp.float32) * n_inv,
    }


# -- streaming path (any size) -------------------------------------------------

_BLOCK_ROWS = 512  # streaming block: 512x128 words = 256 KB per plane


def _stream_kernel(seed_ref, x_ref, n1, n2, n3, n4, n5, n6, *rest,
                   d4, d8, d12, measuring: bool, has_bits: bool,
                   m: int, rows_blk: int):
    refs = list(rest)
    obs_ref = refs.pop()        # (1, nblk, 128) — whole per-replica
    out_ref = refs.pop()        # block, revisited across the g axis
    r = pl.program_id(0)
    g = pl.program_id(1)
    x = pltpu.bitcast(x_ref[0, 0], jnp.uint32)
    planes = [
        pltpu.bitcast(ref[0, 0], jnp.uint32)
        for ref in (n1, n2, n3, n4, n5, n6)
    ]
    b1, b2, b4c = _count6(*planes)
    shape = (rows_blk, LANES)
    if has_bits:
        p4, p8, p12 = (
            pltpu.bitcast(ref[0, 0], jnp.uint32) for ref in refs
        )
    else:
        pltpu.prng_seed(
            seed_ref[0],
            seed_ref[1] ^ (r * jnp.int32(0x3C6EF35F))
            ^ (g * jnp.int32(-1640531527)),
        )

        def gen():
            return pltpu.bitcast(pltpu.prng_random_bits(shape),
                                 jnp.uint32)

        p4 = _bern_plane(shape, d4, gen)
        p8 = _bern_plane(shape, d8, gen)
        p12 = _bern_plane(shape, d12, gen)
    new = x ^ _flip_plane3d(x, b1, b2, b4c, p4, p8, p12)
    out_ref[0, 0] = pltpu.bitcast(new, jnp.int32)
    if measuring:
        # per-block exact int32 partials; cross-parity phase-b counts
        # are vs the FINAL a (see _ms_kernel).  Valid-bit mask from the
        # block's global word offset.  pc(shift(a) & valid) == pc(a
        # valid bits): a modular shift permutes the m valid bits, so
        # plane n1 stands in for a in the magnetization term.
        gw = ((g * jnp.int32(rows_blk)
               + jax.lax.broadcasted_iota(jnp.int32, shape, 0))
              * jnp.int32(LANES)
              + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
        nbits = jnp.clip(jnp.int32(m) - gw * jnp.int32(PACK), 0,
                         jnp.int32(PACK))
        vmask = jnp.where(
            nbits == PACK, jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << nbits.astype(jnp.uint32))
            - jnp.uint32(1),
        )
        nvalid = jnp.sum(nbits)
        bm = new & vmask
        s_x = jnp.sum(_pc_plane(bm))
        s_a = jnp.sum(_pc_plane(planes[0] & vmask))
        s_c = (jnp.sum(_pc_plane(b1 & vmask))
               + 2 * jnp.sum(_pc_plane(b2 & vmask))
               + 4 * jnp.sum(_pc_plane(b4c & vmask)))
        s_xc = (jnp.sum(_pc_plane(bm & b1))
                + 2 * jnp.sum(_pc_plane(bm & b2))
                + 4 * jnp.sum(_pc_plane(bm & b4c)))
        mm = 2 * (s_x + s_a) - 2 * nvalid
        e = -(4 * s_xc - 12 * s_x - 2 * s_c + 6 * nvalid)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        obs_ref[0, pl.ds(g, 1), :] = jnp.where(
            lane == 0, mm, jnp.where(lane == 1, e, 0))


def _shift_mod_batched(w, d: int, m: int):
    """(R, rows, 128) modular funnel shift via the 2-D helper."""
    return jax.vmap(
        lambda p: _shift_mod_impl(p, d, m, _jnp_roll)
    )(w.astype(jnp.uint32))


def _stream_phase(xw, ow, seeds, *, offs_cross, offs_self, m, rows,
                  nrep, d4, d8, d12, measuring, bits=None,
                  interpret=False):
    planes = [_shift_mod_batched(ow, d, m) for d in offs_cross]
    planes += [_shift_mod_batched(xw, d, m) for d in offs_self]
    planes = [p.astype(jnp.int32) for p in planes]
    nblk = rows // _BLOCK_ROWS
    kernel = functools.partial(
        _stream_kernel, d4=d4, d8=d8, d12=d12, measuring=measuring,
        has_bits=bits is not None, m=m, rows_blk=_BLOCK_ROWS,
    )
    blk = pl.BlockSpec((1, 1, _BLOCK_ROWS, LANES),
                       lambda r, g: (r, 0, g, 0),
                       memory_space=pltpu.VMEM)
    # whole per-replica obs block, revisited across the g axis (a row
    # per block; Mosaic needs the trailing block dims (nblk, 128) to
    # match the array — a (1, 1, 128) row block fails lowering)
    obs_spec = pl.BlockSpec((1, nblk, 128), lambda r, g: (r, 0, 0),
                            memory_space=pltpu.VMEM)
    xw4 = xw.reshape(nrep, 1, rows, LANES)
    planes4 = [p.reshape(nrep, 1, rows, LANES) for p in planes]
    extra = []
    if bits is not None:
        extra = [b.reshape(nrep, 1, rows, LANES) for b in bits]
    out, obs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nrep, 1, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nrep, nblk, 128), jnp.int32),
        ),
        grid=(nrep, nblk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [blk] * (7 + len(extra)),
        out_specs=(blk, obs_spec),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(seeds, xw4, *planes4, *extra)
    return out.reshape(nrep, rows, LANES), obs


@functools.partial(
    jax.jit,
    static_argnames=("sweeps", "beta", "nx", "nxy", "m", "nrep",
                     "rows"),
)
def _multisweep_stream(wa, wb, key, *, sweeps, beta, nx, nxy, m, nrep,
                       rows):
    d4 = tuple(chain_digits(float(np.exp(-4.0 * beta))))
    d8 = tuple(chain_digits(float(np.exp(-8.0 * beta))))
    d12 = tuple(chain_digits(float(np.exp(-12.0 * beta))))
    offs_a, offs_b, offs_s = helical3d_offsets(nx, nxy)
    cross = nxy % 2 == 1
    vmask = valid_mask(rows, m)[None]
    hz = nxy // 2

    def body(carry, s):
        wa, wb = carry
        seeds = seeds_from_key(jax.random.fold_in(key, s), 0)
        wa, _ = _stream_phase(
            wa, wb, seeds, offs_cross=offs_a, offs_self=offs_s, m=m,
            rows=rows, nrep=nrep, d4=d4, d8=d8, d12=d12,
            measuring=False,
        )
        seeds_b = seeds_from_key(jax.random.fold_in(key, s), 1)
        wb, obs = _stream_phase(
            wb, wa, seeds_b, offs_cross=offs_b, offs_self=offs_s, m=m,
            rows=rows, nrep=nrep, d4=d4, d8=d8, d12=d12,
            measuring=True,
        )
        # reduce exact per-block int32 partials in f32 (giant lattices
        # exceed the int32 |e| ≤ 3N cap; partials ≤ 3·2²² per block are
        # exact and the f32 sum of ≤ 2¹⁵ of them holds ~1e-7 relative)
        mm = jnp.sum(obs[:, :, 0].astype(jnp.float32), axis=1)
        e = jnp.sum(obs[:, :, 1].astype(jnp.float32), axis=1)
        if not cross:
            # phase-b counts mix cross and read-old self planes, so the
            # fused e lacks... (cross-only identity); recompute the
            # z-bonds from the final planes and the fused sum covers
            # only the x/y cross bonds: counts there had 4 cross + 2
            # self planes — the fused identity does NOT decompose.
            # Instead compute ALL of e from final planes.
            e = _energy_all_packed(wa, wb, nx, nxy, m, vmask)
        return (wa, wb), (mm, e)

    (wa, wb), (mm, e) = jax.lax.scan(body, (wa, wb),
                                     jnp.arange(sweeps))
    return wa, wb, mm.T, e.T


def _energy_all_packed(wa, wb, nx: int, nxy: int, m: int, vmask):
    """Full helical 3-D energy from packed color planes (any parity):
    one forward bond per direction per site, disagreement popcounts."""
    h = (nx - 1) // 2
    e = jnp.zeros((wa.shape[0],), jnp.float32)
    au = wa.astype(jnp.uint32)
    bu = wb.astype(jnp.uint32)
    # direction +1: even i -> b[j+0]; odd i -> a[j+1]
    # direction +nx: even i -> b[j+h]; odd i -> a[j+h+1]
    pairs = [(au, bu, 0), (bu, au, 1), (au, bu, h), (bu, au, h + 1)]
    if nxy % 2 == 1:
        g = (nxy - 1) // 2
        pairs += [(au, bu, g), (bu, au, g + 1)]
    else:
        hz = nxy // 2
        pairs += [(au, au, hz), (bu, bu, hz)]
    for src, other, d in pairs:
        sh = jax.vmap(
            lambda p, dd=d: _shift_mod_impl(p, dd, m, _jnp_roll)
        )(other)
        dis = jnp.sum(_pc_plane((src ^ sh) & vmask), axis=(-2, -1),
                      dtype=jnp.int32)
        e = e - (jnp.float32(m) - 2.0 * dis.astype(jnp.float32))
    return e


def magne_sum_packed(wa, wb, m: int):
    """Σ s over both colors from packed planes (f32-exact partials)."""
    rows = wa.shape[-2]
    vmask = valid_mask(rows, m)[None]
    tot = jnp.zeros((wa.shape[0],), jnp.float32)
    for w in (wa, wb):
        up = jnp.sum(_pc_plane(w.astype(jnp.uint32) & vmask),
                     axis=(-2, -1), dtype=jnp.int32)
        tot = tot + 2.0 * up.astype(jnp.float32) - jnp.float32(m)
    return tot


def fits_stream(model) -> bool:
    """Streaming gate: odd nx, ODD nx·ny (cross-parity only — the
    even-nx·ny exact z-sub-phase schedule is implemented by the
    block-halo engine, whose gate covers every such committed
    geometry), even site count, grid a multiple of the block."""
    if model.nx % 2 == 0 or model.nsites % 2 or model.nxy % 2 == 0:
        return False
    return stream_rows(model.nsites // 2) % _BLOCK_ROWS == 0


def stream_rows(m: int) -> int:
    """Word-grid rows for the streaming path: grid_rows padded up to a
    whole number of blocks."""
    r = grid_rows(m)
    return -(-r // _BLOCK_ROWS) * _BLOCK_ROWS


def pack_flat_stream(flat, m: int):
    """pack_flat, zero-padded up to the streaming block multiple."""
    w = pack_flat(flat, m)
    pad = stream_rows(m) - w.shape[-2]
    if pad:
        w = jnp.pad(w, [(0, 0)] * (w.ndim - 2) + [(0, pad), (0, 0)])
    return w


def multisweep_stream(model, wa, wb, key, sweeps: int):
    """Advance ``sweeps`` helical 3-D MCS with the streaming kernel;
    returns (wa, wb, {m, e}) per-sweep densities (f32).  Cross-parity
    (odd nx·ny) only — even nx·ny needs the z-sub-phase schedule,
    served by multisweep_stream_halo."""
    if model.nxy % 2 == 0:
        raise ValueError(
            "multisweep_stream is cross-parity only; even nx·ny "
            "geometries route to multisweep_stream_halo"
        )
    m = model.nsites // 2
    nrep, rows, _ = wa.shape
    wa, wb, mm, e = _multisweep_stream(
        wa, wb, key, sweeps=sweeps, beta=float(model.beta),
        nx=model.nx, nxy=model.nxy, m=m, nrep=nrep, rows=rows,
    )
    n_inv = jnp.float32(1.0 / model.nsites)
    return wa, wb, {"m": mm * n_inv, "e": e * n_inv}


# -- block-halo streaming path ------------------------------------------------
#
# The funnel-shift streaming path above materializes every neighbor
# plane in HBM (~10 whole-plane elementwise ops per shift, 12 shifts
# per sweep) and measured 2.1e8 flips/s on the 1001x1000x1000 app
# geometry (r4b) — 500x below the committed perf bar.  Here the
# neighbor shifts move into VMEM: all six helical offsets are at most
# nxy/2 + nx bits (~122 word-rows on the 1001-geometry), so a kernel
# gridded over 512-row blocks sees every neighbor bit inside the
# [prev | cur | next] block window — three views of the SAME HBM plane
# with shifted index maps (the dense-XY up/dn-view pattern).  The
# modular wrap at bit m never needs an in-kernel blend because the
# planes keep a RING-PAD INVARIANT in HBM:
#
#   capacity C >= m + 2k bits;  positions [m, m+k)   hold bits [0, k)
#                               positions [C-k, C)   hold bits [m-k, m)
#
# so a plain funnel shift by |d| <= k in the capacity/block-ring
# domain reads exactly bit (f+d) mod m for every valid site f.  The
# invariant is restored after each phase by rewriting the ~k-bit pad
# regions (two tiny strided word blends, O(k/32) words).

def _halo_pad_k(nx: int, nxy: int) -> int:
    """Max |neighbor offset| in bits + one word of slack."""
    offs_a, offs_b, offs_s = helical3d_offsets(nx, nxy)
    return max(abs(d) for d in offs_a + offs_b + offs_s) + PACK


def halo_rows(m: int, k: int, block_rows: int = _BLOCK_ROWS) -> int:
    """Plane rows for the halo path: grid_rows(m) + ring pad (>= 2k
    bits + a row), rounded to whole blocks."""
    pad = -(-2 * k // (LANES * PACK)) + 1
    return -(-(grid_rows(m) + pad) // block_rows) * block_rows


def fits_stream_halo(model, block_rows: int = _BLOCK_ROWS) -> bool:
    """Gate: odd nx, even site count, every neighbor offset within one
    adjacent block (so the 3-block window suffices), and the wrap
    copies sourced from real data (k < m)."""
    if model.nx % 2 == 0 or model.nsites % 2:
        return False
    k = _halo_pad_k(model.nx, model.nxy)
    m = model.nsites // 2
    return k + PACK <= m and k <= (block_rows - 1) * LANES * PACK


def ring_fill(w: jax.Array, m: int, k: int) -> jax.Array:
    """Restore the ring-pad invariant on (..., rows, 128) packed
    planes: flat-bit positions [m, C-kt·32) := bits [0, ...) and
    positions [C-kt·32, C) := bits [m-kt·32, m); only the first/last k
    bits of each region are ever read by the kernels."""
    rows = w.shape[-2]
    wc = rows * LANES
    w_m, b = divmod(m, PACK)
    kt = -(-k // PACK) + 1
    flatw = w.astype(jnp.uint32).reshape(w.shape[:-2] + (wc,))
    hn = wc - kt - w_m
    src = flatw[..., :hn]
    if b:
        pad = [(0, 0)] * (src.ndim - 1) + [(1, 0)]
        srcm1 = jnp.pad(src[..., :-1], pad)
        head = (src << jnp.uint32(b)) | (srcm1 >> jnp.uint32(PACK - b))
        lowmask = jnp.uint32((1 << b) - 1)
        first = ((flatw[..., w_m] & lowmask)
                 | (head[..., 0] & ~lowmask))
        head = jnp.concatenate(
            [first[..., None], head[..., 1:]], axis=-1)
        tlo = flatw[..., w_m - kt: w_m]
        thi = flatw[..., w_m - kt + 1: w_m + 1]
        tail = ((tlo >> jnp.uint32(b))
                | (thi << jnp.uint32(PACK - b)))
    else:
        head = src
        tail = flatw[..., w_m - kt: w_m]
    out = jnp.concatenate([flatw[..., :w_m], head, tail], axis=-1)
    return out.reshape(w.shape).astype(jnp.int32)


def pack_flat_halo(flat: jax.Array, m: int, nx: int, nxy: int,
                   block_rows: int = _BLOCK_ROWS) -> jax.Array:
    """pack_flat, padded to the halo row count, invariant installed."""
    k = _halo_pad_k(nx, nxy)
    w = pack_flat(flat, m)
    pad = halo_rows(m, k, block_rows) - w.shape[-2]
    if pad:
        w = jnp.pad(w, [(0, 0)] * (w.ndim - 2) + [(0, pad), (0, 0)])
    return ring_fill(w, m, k)


def _win_shift(win, d: int, blk: int):
    """Central block of the 3-block window shifted by d bits (|d| <
    blk·4096; the plain funnel is modular by the ring-pad
    invariant)."""
    return _shift_bits(win, d, _pltpu_roll)[blk:2 * blk]


def _halo_kernel(seed_ref, *refs, d4, d8, d12, offs_cross, offs_self,
                 measuring: bool, has_bits: bool, self_read: bool,
                 has_zmask: bool, zsub: int, m: int, blk: int):
    refs = list(refs)
    obs_ref = refs.pop()
    out_ref = refs.pop()
    zm_ref = refs.pop() if has_zmask else None
    bits = ()
    if has_bits:
        bits = tuple(refs[-3:])
        refs = refs[:-3]
    it = iter(refs)
    xc_ref = next(it)
    if self_read:
        xp_ref, xn_ref = next(it), next(it)
    op_ref, oc_ref, on_ref = next(it), next(it), next(it)
    r = pl.program_id(0)
    g = pl.program_id(1)
    x = pltpu.bitcast(xc_ref[0, 0], jnp.uint32)
    o_win = pltpu.bitcast(
        jnp.concatenate([op_ref[0, 0], oc_ref[0, 0], on_ref[0, 0]],
                        axis=0), jnp.uint32)
    planes = [_win_shift(o_win, d, blk) for d in offs_cross]
    if self_read:
        x_win = pltpu.bitcast(
            jnp.concatenate([xp_ref[0, 0], xc_ref[0, 0], xn_ref[0, 0]],
                            axis=0), jnp.uint32)
        planes += [_win_shift(x_win, d, blk) for d in offs_self]
    b1, b2, b4c = _count6(*planes)
    shape = (blk, LANES)
    if has_bits:
        p4, p8, p12 = (
            pltpu.bitcast(ref[0, 0], jnp.uint32) for ref in bits
        )
    else:
        pltpu.prng_seed(
            seed_ref[0],
            seed_ref[1] ^ (r * jnp.int32(0x3C6EF35F))
            ^ (g * jnp.int32(-1640531527)),
        )

        def gen():
            return pltpu.bitcast(pltpu.prng_random_bits(shape),
                                 jnp.uint32)

        p4 = _bern_plane(shape, d4, gen)
        p8 = _bern_plane(shape, d8, gen)
        p12 = _bern_plane(shape, d12, gen)
    fl = _flip_plane3d(x, b1, b2, b4c, p4, p8, p12)
    if has_zmask:
        # exact even-nx·ny sub-phase: flips land only on one z-plane
        # parity, so same-color z-neighbor pairs never co-update
        zm = pltpu.bitcast(zm_ref[0, 0], jnp.uint32)
        fl = fl & (zm if zsub == 0 else ~zm)
    new = x ^ fl
    out_ref[0, 0] = pltpu.bitcast(new, jnp.int32)
    if measuring:
        gw = ((g * jnp.int32(blk)
               + jax.lax.broadcasted_iota(jnp.int32, shape, 0))
              * jnp.int32(LANES)
              + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
        nbits = jnp.clip(jnp.int32(m) - gw * jnp.int32(PACK), 0,
                         jnp.int32(PACK))
        vmask = jnp.where(
            nbits == PACK, jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << nbits.astype(jnp.uint32))
            - jnp.uint32(1),
        )
        nvalid = jnp.sum(nbits)
        bm = new & vmask
        oc = pltpu.bitcast(oc_ref[0, 0], jnp.uint32)
        s_x = jnp.sum(_pc_plane(bm))
        s_a = jnp.sum(_pc_plane(oc & vmask))
        mm = 2 * (s_x + s_a) - 2 * nvalid
        if not self_read:
            # cross-parity: phase-b counts are vs the FINAL a, so the
            # fused energy identity of _ms_kernel holds per block
            s_c = (jnp.sum(_pc_plane(b1 & vmask))
                   + 2 * jnp.sum(_pc_plane(b2 & vmask))
                   + 4 * jnp.sum(_pc_plane(b4c & vmask)))
            s_xc = (jnp.sum(_pc_plane(bm & b1))
                    + 2 * jnp.sum(_pc_plane(bm & b2))
                    + 4 * jnp.sum(_pc_plane(bm & b4c)))
            e = -(4 * s_xc - 12 * s_x - 2 * s_c + 6 * nvalid)
        else:
            e = jnp.int32(0)    # self-parity: _halo_energy pass
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        obs_ref[0, pl.ds(g, 1), :] = jnp.where(
            lane == 0, mm, jnp.where(lane == 1, e, 0))


def _halo_phase(xw, ow, seeds, *, offs_cross, offs_self, m, rows, nrep,
                d4, d8, d12, measuring, block_rows=_BLOCK_ROWS,
                bits=None, zmask=None, zsub=0, interpret=False):
    """One checkerboard (sub-)phase, block-halo kernel.  Both input
    planes must carry the ring-pad invariant; the OUTPUT plane does not
    (the caller ring_fills before the plane is next read).  ``zmask``
    (a (rows, 128) int32 word plane, zmask_plane) gates flips to
    z-plane parity ``zsub`` — the exact even-nx·ny schedule."""
    nblk = rows // block_rows
    self_read = len(offs_self) > 0
    kernel = functools.partial(
        _halo_kernel, d4=d4, d8=d8, d12=d12,
        offs_cross=tuple(offs_cross), offs_self=tuple(offs_self),
        measuring=measuring, has_bits=bits is not None,
        self_read=self_read, has_zmask=zmask is not None, zsub=zsub,
        m=m, blk=block_rows,
    )
    cur = pl.BlockSpec((1, 1, block_rows, LANES),
                       lambda r, g: (r, 0, g, 0),
                       memory_space=pltpu.VMEM)
    prv = pl.BlockSpec((1, 1, block_rows, LANES),
                       lambda r, g: (r, 0, (g + nblk - 1) % nblk, 0),
                       memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec((1, 1, block_rows, LANES),
                       lambda r, g: (r, 0, (g + 1) % nblk, 0),
                       memory_space=pltpu.VMEM)
    obs_spec = pl.BlockSpec((1, nblk, 128), lambda r, g: (r, 0, 0),
                            memory_space=pltpu.VMEM)
    xw4 = xw.reshape(nrep, 1, rows, LANES)
    ow4 = ow.reshape(nrep, 1, rows, LANES)
    operands = [seeds, xw4]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), cur]
    if self_read:
        operands += [xw4, xw4]
        in_specs += [prv, nxt]
    operands += [ow4, ow4, ow4]
    in_specs += [prv, cur, nxt]
    if bits is not None:
        operands += [b.reshape(nrep, 1, rows, LANES) for b in bits]
        in_specs += [cur] * len(bits)
    if zmask is not None:
        # one shared (rows, 128) plane for every replica
        operands += [zmask.reshape(1, 1, rows, LANES)]
        in_specs += [pl.BlockSpec((1, 1, block_rows, LANES),
                                  lambda r, g: (0, 0, g, 0),
                                  memory_space=pltpu.VMEM)]
    # self-parity reads neighbor views of x (read-old), so the output
    # must not alias x; cross-parity never reads x beyond the central
    # block being rewritten, so aliasing is safe there
    aliases = {} if self_read else {1: 0}
    out, obs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nrep, 1, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nrep, nblk, 128), jnp.int32),
        ),
        grid=(nrep, nblk),
        in_specs=in_specs,
        out_specs=(cur, obs_spec),
        input_output_aliases=aliases,
        interpret=interpret,
    )(*operands)
    return out.reshape(nrep, rows, LANES), obs


def halo_phase_with_bits(xw, ow, b4, b8, b12, *, offs_cross, offs_self,
                         m: int, block_rows: int = _BLOCK_ROWS,
                         zmask=None, zsub: int = 0,
                         interpret: bool = False):
    """(R, rows, 128) halo-kernel (sub-)phase with injected Bernoulli
    planes — bitwise testable against packed_phase_reference (pad the
    oracle's planes with zero rows up to halo_rows)."""
    nrep, rows, _ = xw.shape
    out, _ = _halo_phase(
        xw, ow, jnp.zeros((2,), jnp.int32),
        offs_cross=offs_cross, offs_self=offs_self, m=m, rows=rows,
        nrep=nrep, d4=(), d8=(), d12=(), measuring=False,
        block_rows=block_rows, bits=(b4, b8, b12), zmask=zmask,
        zsub=zsub, interpret=interpret)
    return out


def _halo_energy_kernel(ac_ref, ap_ref, an_ref, bc_ref, bp_ref, bn_ref,
                        obs_ref, *, pairs_ab, pairs_self, m: int,
                        blk: int):
    g = pl.program_id(1)
    a_win = pltpu.bitcast(
        jnp.concatenate([ap_ref[0, 0], ac_ref[0, 0], an_ref[0, 0]],
                        axis=0), jnp.uint32)
    b_win = pltpu.bitcast(
        jnp.concatenate([bp_ref[0, 0], bc_ref[0, 0], bn_ref[0, 0]],
                        axis=0), jnp.uint32)
    ac = pltpu.bitcast(ac_ref[0, 0], jnp.uint32)
    bc = pltpu.bitcast(bc_ref[0, 0], jnp.uint32)
    shape = (blk, LANES)
    gw = ((g * jnp.int32(blk)
           + jax.lax.broadcasted_iota(jnp.int32, shape, 0))
          * jnp.int32(LANES)
          + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    nbits = jnp.clip(jnp.int32(m) - gw * jnp.int32(PACK), 0,
                     jnp.int32(PACK))
    vmask = jnp.where(
        nbits == PACK, jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << nbits.astype(jnp.uint32)) - jnp.uint32(1),
    )
    nvalid = jnp.sum(nbits)
    e = jnp.int32(0)
    for src, win, d in (
        [(ac, b_win, d) for d in pairs_ab[0]]
        + [(bc, a_win, d) for d in pairs_ab[1]]
        + [(ac, a_win, d) for d in pairs_self]
        + [(bc, b_win, d) for d in pairs_self]
    ):
        sh = _win_shift(win, d, blk)
        dis = jnp.sum(_pc_plane((src ^ sh) & vmask))
        e = e + 2 * dis - nvalid
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    obs_ref[0, pl.ds(g, 1), :] = jnp.where(lane == 0, e, 0)


def _halo_energy(wa, wb, *, nx, nxy, m, rows, nrep,
                 block_rows=_BLOCK_ROWS, interpret=False):
    """Full helical 3-D energy from ring-pad planes (any parity) via
    per-block forward-bond disagreement popcounts; returns (R,) f32."""
    h = (nx - 1) // 2
    if nxy % 2 == 1:
        gz = (nxy - 1) // 2
        pairs_ab = ((0, h, gz), (1, h + 1, gz + 1))
        pairs_self = ()
    else:
        pairs_ab = ((0, h), (1, h + 1))
        pairs_self = (nxy // 2,)
    nblk = rows // block_rows
    kernel = functools.partial(
        _halo_energy_kernel, pairs_ab=pairs_ab,
        pairs_self=pairs_self, m=m, blk=block_rows,
    )
    cur = pl.BlockSpec((1, 1, block_rows, LANES),
                       lambda r, g: (r, 0, g, 0),
                       memory_space=pltpu.VMEM)
    prv = pl.BlockSpec((1, 1, block_rows, LANES),
                       lambda r, g: (r, 0, (g + nblk - 1) % nblk, 0),
                       memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec((1, 1, block_rows, LANES),
                       lambda r, g: (r, 0, (g + 1) % nblk, 0),
                       memory_space=pltpu.VMEM)
    obs_spec = pl.BlockSpec((1, nblk, 128), lambda r, g: (r, 0, 0),
                            memory_space=pltpu.VMEM)
    a4 = wa.reshape(nrep, 1, rows, LANES)
    b4_ = wb.reshape(nrep, 1, rows, LANES)
    obs = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nrep, nblk, 128), jnp.int32),
        grid=(nrep, nblk),
        in_specs=[cur, prv, nxt, cur, prv, nxt],
        out_specs=obs_spec,
        interpret=interpret,
    )(a4, a4, a4, b4_, b4_, b4_)
    return jnp.sum(obs[:, :, 0].astype(jnp.float32), axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("sweeps", "beta", "nx", "nxy", "m", "nrep",
                     "rows", "block_rows"),
)
def _multisweep_stream_halo(wa, wb, key, *, sweeps, beta, nx, nxy, m,
                            nrep, rows, block_rows=_BLOCK_ROWS):
    d4 = tuple(chain_digits(float(np.exp(-4.0 * beta))))
    d8 = tuple(chain_digits(float(np.exp(-8.0 * beta))))
    d12 = tuple(chain_digits(float(np.exp(-12.0 * beta))))
    offs_a, offs_b, offs_s = helical3d_offsets(nx, nxy)
    cross = nxy % 2 == 1
    k = _halo_pad_k(nx, nxy)
    # even nx·ny: 4 exact masked sub-phases (color × z-plane parity);
    # XLA hoists the static mask plane out of the scan
    zm = None if cross else zmask_plane(nxy, rows)

    def body(carry, s):
        wa, wb = carry
        ks = jax.random.fold_in(key, s)

        def phase(x, o, offs, p, *, measuring=False):
            subs = ((None, 0),) if cross else ((zm, 0), (zm, 1))
            obs = None
            for i, (zmask, zsub) in enumerate(subs):
                meas = measuring and i == len(subs) - 1
                x, ob = _halo_phase(
                    x, o, seeds_from_key(ks, p + i),
                    offs_cross=offs, offs_self=offs_s, m=m,
                    rows=rows, nrep=nrep, d4=d4, d8=d8, d12=d12,
                    measuring=meas, block_rows=block_rows,
                    zmask=zmask, zsub=zsub,
                )
                x = ring_fill(x, m, k)
                if meas:
                    obs = ob
            return x, obs

        nsub = 1 if cross else 2
        wa, _ = phase(wa, wb, offs_a, 0)
        wb, obs = phase(wb, wa, offs_b, nsub, measuring=True)
        mm = jnp.sum(obs[:, :, 0].astype(jnp.float32), axis=1)
        if cross:
            e = jnp.sum(obs[:, :, 1].astype(jnp.float32), axis=1)
        else:
            e = _halo_energy(wa, wb, nx=nx, nxy=nxy, m=m, rows=rows,
                             nrep=nrep, block_rows=block_rows)
        return (wa, wb), (mm, e)

    (wa, wb), (mm, e) = jax.lax.scan(body, (wa, wb),
                                     jnp.arange(sweeps))
    return wa, wb, mm.T, e.T


def multisweep_stream_halo(model, wa, wb, key, sweeps: int,
                           block_rows: int = _BLOCK_ROWS):
    """Advance ``sweeps`` helical 3-D MCS with the block-halo kernel;
    planes must carry the ring-pad invariant (pack_flat_halo).
    Returns (wa, wb, {m, e}) per-sweep densities (f32)."""
    m = model.nsites // 2
    nrep, rows, _ = wa.shape
    wa, wb, mm, e = _multisweep_stream_halo(
        wa, wb, key, sweeps=sweeps, beta=float(model.beta),
        nx=model.nx, nxy=model.nxy, m=m, nrep=nrep, rows=rows,
        block_rows=block_rows,
    )
    n_inv = jnp.float32(1.0 / model.nsites)
    return wa, wb, {"m": mm * n_inv, "e": e * n_inv}
