"""Bit-packed multispin Metropolis for the HELICAL (odd-nx) Ising
geometry — the reference's committed 1001×1000 workload
(/root/reference/app/ising2d_gpu_relaxation.f90:6-12).

The helical lattice (site idx neighbors idx±1, idx±nx mod nall,
/root/reference/src/ising2d_gpu_m.f90:191-196) with odd nx two-colors
by INDEX parity: all four neighbors of an even site are odd and vice
versa (±1 flips parity; ±nx flips parity because nx is odd; the wraps
preserve this because nall is even).  Splitting the flat array by
parity gives DENSE color vectors a[j] = s[2j], b[j] = s[2j+1] of
length M = nall/2 whose neighbor maps are four constant offsets:

    a[j] reads b[(j + d) mod M],  d ∈ {0, -1, +h, -(h+1)}
    b[j] reads a[(j + d) mod M],  d ∈ {0, +1, +(h+1), -h}

with h = (nx-1)/2 — no parity masking at all, unlike the full-width
masked kernels (ops/helical_pallas.py) that idle half the lanes.

Bit-packing: 32 consecutive color indices per int32 word, words in a
row-major (rows, 128) grid of capacity C = rows·128·32 ≥ M.  A
neighbor plane is one modular bit-shift: a funnel shift by d in the
capacity domain, a second funnel by d∓M for the wrapped range, and a
static blend at the single boundary word.  Padding bits [M, C) are
never a source for a valid site (proved by the blend ranges), so they
may hold garbage; measurement masks them.

Everything runs in one VMEM-resident multisweep kernel per replica:
the packed 1001×1000 state is 2×64KB.  Acceptance reuses the 4:3
bit-counter and Bernoulli chains of ops/ising2d_multispin.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_multispin import (
    PACK,
    _bern_plane,
    _check_obs_sites,
    _count_planes,
    _flip_plane,
    _pc_plane,
    chain_digits,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    seeds_from_key,
)

LANES = 128


def grid_rows(m: int) -> int:
    """Word-grid rows (multiple of 8) covering m sites."""
    words = -(-m // PACK)
    rows = -(-words // LANES)
    return -(-rows // 8) * 8


def pack_flat(flat: jax.Array, m: int) -> jax.Array:
    """(..., m) ±1 int8 color vector -> (..., rows, 128) int32 words
    (bit k of flat word g = site 32g + k; pad bits zero)."""
    rows = grid_rows(m)
    cap = rows * LANES * PACK
    bits = (flat > 0).astype(jnp.uint32)
    bits = jnp.pad(bits, [(0, 0)] * (flat.ndim - 1) + [(0, cap - m)])
    bits = bits.reshape(flat.shape[:-1] + (rows * LANES, PACK))
    w = jnp.zeros(flat.shape[:-1] + (rows * LANES,), jnp.uint32)
    for k in range(PACK):
        w = w | (bits[..., k] << np.uint32(k))
    return w.reshape(flat.shape[:-1] + (rows, LANES)).astype(jnp.int32)


def unpack_flat(w: jax.Array, m: int) -> jax.Array:
    """Inverse of :func:`pack_flat` (to ±1 int8, pad dropped)."""
    wu = w.astype(jnp.uint32).reshape(w.shape[:-2] + (-1,))
    cols = [
        (((wu >> np.uint32(k)) & jnp.uint32(1)).astype(jnp.int32) * 2
         - 1)
        for k in range(PACK)
    ]
    flat = jnp.stack(cols, axis=-1).reshape(w.shape[:-2] + (-1,))
    return flat[..., :m].astype(jnp.int8)


def valid_mask(rows: int, m: int) -> jax.Array:
    """(rows, 128) uint32 per-word mask of the bits that hold real
    sites (pads hold garbage) — shared by every flat-packed helical
    kernel's fused measurement."""
    shape = (rows, LANES)
    g = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
         + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    nbits = jnp.clip(jnp.int32(m) - g * PACK, 0, PACK)
    return jnp.where(
        nbits == PACK, jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << nbits.astype(jnp.uint32)) - jnp.uint32(1),
    )


def _roll_words(w: jax.Array, t: int, roll) -> jax.Array:
    """out word g = in word (g + t) mod (rows·128) in row-major flat
    order — one lane roll, two row rolls, one lane-position select.
    ``roll(x, k, axis)`` must satisfy out(i) = in((i + k) mod n)."""
    rows, lanes = w.shape
    t = t % (rows * lanes)
    ta, tl = t // lanes, t % lanes
    if tl == 0:
        return roll(w, ta, 0)
    c = roll(w, tl, 1)
    a = roll(c, ta, 0)
    b = roll(c, ta + 1, 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    return jnp.where(liota < lanes - tl, a, b)


def _shift_bits(w: jax.Array, d: int, roll) -> jax.Array:
    """out bit f = in bit (f + d) in the capacity domain (no modular
    wrap; out-of-range positions are garbage, blended away upstream)."""
    wu = w.astype(jnp.uint32)
    a0, b0 = d // PACK, d % PACK
    if b0 == 0:
        return _roll_words(wu, a0, roll)
    r0 = _roll_words(wu, a0, roll)
    r1 = _roll_words(wu, a0 + 1, roll)
    return (r0 >> jnp.uint32(b0)) | (r1 << jnp.uint32(PACK - b0))


def _jnp_roll(x, k, axis):
    """roll convention used here: out(i) = in((i + k) mod n)."""
    return jnp.roll(x, -k, axis=axis)


def _pltpu_roll(x, k, axis):
    """pltpu.roll(x, s, axis) gives out(i) = in(i - s); we need
    out(i) = in(i + k) = roll by -k."""
    n = x.shape[axis]
    return pltpu.roll(x, (-k) % n, axis=axis)


def _shift_mod_impl(w: jax.Array, d: int, m: int, roll) -> jax.Array:
    d = ((d % m) + m) % m
    if d == 0:
        return w.astype(jnp.uint32)
    main = _shift_bits(w, d, roll)          # valid for f < m - d
    wrap = _shift_bits(w, d - m, roll)      # valid for f >= m - d
    t = m - d                               # first wrapped bit index
    gb, kb = t // PACK, t % PACK
    rows, lanes = w.shape
    giota = (jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
             * lanes
             + jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1))
    mb = jnp.uint32((1 << kb) - 1)          # bits below t in word gb
    sel = jnp.where(
        giota < gb, jnp.uint32(0xFFFFFFFF),
        jnp.where(giota > gb, jnp.uint32(0), mb),
    )
    return (main & sel) | (wrap & ~sel)


def helical_offsets(nx: int) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """(offsets for color a, offsets for color b), h = (nx-1)//2."""
    h = (nx - 1) // 2
    return (0, -1, h, -(h + 1)), (0, 1, h + 1, -h)


def packed_helical_phase_reference(xw, ow, offs, b4, b8, m: int):
    """Pure-jnp packed phase (oracle): neighbor planes via shift_mod
    with jnp.roll."""
    xw = xw.astype(jnp.uint32)
    n1, n2, n3, n4 = (
        _shift_mod_impl(ow, d, m, _jnp_roll) for d in offs
    )
    ones, twos, fours = _count_planes(n1, n2, n3, n4)
    flip = _flip_plane(xw, ones, twos, fours,
                       b4.astype(jnp.uint32), b8.astype(jnp.uint32))
    return (xw ^ flip).astype(jnp.int32)


def flat_phase_reference(x_flat, o_flat, offs, b4u, b8u):
    """Unpacked flat oracle: the canonical helical Metropolis decision
    on ±1 color vectors given Bernoulli planes."""
    o32 = o_flat.astype(jnp.int32)
    nsum = sum(jnp.roll(o32, -d) for d in offs)
    half_de = x_flat.astype(jnp.int32) * nsum
    accept = (half_de <= 0) | jnp.where(half_de == 2, b4u, b8u)
    return jnp.where(accept, -x_flat, x_flat)


def _phase_bits_kernel(x_ref, o_ref, b4_ref, b8_ref, out_ref,
                       *, offs, m: int):
    """Single phase with injected Bernoulli planes — exercises the
    in-kernel shift/blend path (_pltpu_roll) so interpret-mode CPU
    tests cover the Mosaic code, mirroring the sibling engines."""
    x = pltpu.bitcast(x_ref[0], jnp.uint32)
    o = pltpu.bitcast(o_ref[0], jnp.uint32)
    n1, n2, n3, n4 = (
        _shift_mod_impl(o, d, m, _pltpu_roll) for d in offs
    )
    ones, twos, fours = _count_planes(n1, n2, n3, n4)
    flip = _flip_plane(x, ones, twos, fours,
                       pltpu.bitcast(b4_ref[0], jnp.uint32),
                       pltpu.bitcast(b8_ref[0], jnp.uint32))
    out_ref[0] = pltpu.bitcast(x ^ flip, jnp.int32)


def phase_packed_with_bits(xw, ow, b4, b8, *, offs, m: int,
                           interpret: bool = False):
    """(R, rows, 128) packed phase with injected planes (bitwise
    testable against packed_helical_phase_reference)."""
    nrep, rows, lanes = xw.shape
    kernel = functools.partial(_phase_bits_kernel, offs=tuple(offs),
                               m=m)
    blk = pl.BlockSpec((1, rows, lanes), lambda r: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nrep, rows, lanes), jnp.int32),
        grid=(nrep,),
        in_specs=[blk, blk, blk, blk],
        out_specs=blk,
        input_output_aliases={0: 0},
        interpret=interpret,
    )(xw, ow, b4, b8)


def _ms_kernel(seed_ref, wa_in, wb_in, wa_ref, wb_ref, obs_ref,
               *, sweeps: int, d4, d8, offs_a, offs_b, m: int,
               rows: int):
    """S helical MCS on resident packed flat color planes + fused
    per-sweep (m, e)."""
    r = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0],
                    seed_ref[1] ^ (r * jnp.int32(0x3C6EF35F)))
    wa_ref[0] = wa_in[0]
    wb_ref[0] = wb_in[0]
    shape = (rows, LANES)
    # valid-site mask for measurement (pads hold garbage)
    vmask = valid_mask(rows, m)

    def gen():
        return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)

    def counts(o, offs):
        n1, n2, n3, n4 = (
            _shift_mod_impl(o, d, m, _pltpu_roll) for d in offs
        )
        return _count_planes(n1, n2, n3, n4)

    def body(s, _):
        wa = pltpu.bitcast(wa_ref[0], jnp.uint32)
        wb = pltpu.bitcast(wb_ref[0], jnp.uint32)
        ones, twos, fours = counts(wb, offs_a)
        b4 = _bern_plane(shape, d4, gen)
        b8 = _bern_plane(shape, d8, gen)
        wa = wa ^ _flip_plane(wa, ones, twos, fours, b4, b8)
        wa_ref[0] = pltpu.bitcast(wa, jnp.int32)
        ones, twos, fours = counts(wa, offs_b)
        b4 = _bern_plane(shape, d4, gen)
        b8 = _bern_plane(shape, d8, gen)
        wb = wb ^ _flip_plane(wb, ones, twos, fours, b4, b8)
        wb_ref[0] = pltpu.bitcast(wb, jnp.int32)
        # fused (m, e): counts are vs the FINAL a values; each a-b bond
        # has exactly one odd endpoint, so Σ_b s_b·(2c-4) covers every
        # bond once.  Pads masked out of every popcount.
        nsites = jnp.int32(m)
        bm = wb & vmask
        s_x = jnp.sum(_pc_plane(bm))
        s_c = (jnp.sum(_pc_plane(ones & vmask))
               + 2 * jnp.sum(_pc_plane(twos & vmask))
               + 4 * jnp.sum(_pc_plane(fours & vmask)))
        s_xc = (jnp.sum(_pc_plane(bm & ones))
                + 2 * jnp.sum(_pc_plane(bm & twos))
                + 4 * jnp.sum(_pc_plane(bm & fours)))
        mm = 2 * (s_x + jnp.sum(_pc_plane(wa & vmask))) - 2 * nsites
        e = -(4 * s_xc - 8 * s_x - 2 * s_c + 4 * nsites)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, mm, jnp.where(lane == 1, e, 0))
        obs_ref[0, pl.ds(s, 1), :] = row
        return 0

    jax.lax.fori_loop(0, sweeps, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("sweeps", "beta", "nx", "m", "nrep", "rows"),
)
def _multisweep(wa, wb, seeds, *, sweeps, beta, nx, m, nrep, rows):
    d4 = tuple(chain_digits(float(np.exp(-4.0 * beta))))
    d8 = tuple(chain_digits(float(np.exp(-8.0 * beta))))
    offs_a, offs_b = helical_offsets(nx)
    kernel = functools.partial(
        _ms_kernel, sweeps=sweeps, d4=d4, d8=d8,
        offs_a=offs_a, offs_b=offs_b, m=m, rows=rows,
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
    )(seeds, wa, wb)


# resident packed planes + ~14 temporaries
_VMEM_ROW_BUDGET = 1024


def fits(model) -> bool:
    m = model.nsites // 2
    return (model.nx % 2 == 1
            and model.nsites % 2 == 0
            and grid_rows(m) <= _VMEM_ROW_BUDGET)


def multisweep(model, wa, wb, key, sweeps: int):
    """Advance ``sweeps`` helical MCS on packed flat color planes
    (R, rows, 128); returns (wa, wb, {m, e}) per-sweep densities."""
    _check_obs_sites(model.nsites)
    m = model.nsites // 2
    nrep, rows, _ = wa.shape
    wa, wb, obs = _multisweep(
        wa, wb, seeds_from_key(key, 0), sweeps=sweeps,
        beta=float(model.beta), nx=model.nx, m=m, nrep=nrep, rows=rows,
    )
    n_inv = jnp.float32(1.0 / model.nsites)
    return wa, wb, {
        "m": obs[:, :, 0].astype(jnp.float32) * n_inv,
        "e": obs[:, :, 1].astype(jnp.float32) * n_inv,
    }


def split_flat(flat: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., nall) ±1 spins -> (a, b) even/odd color vectors."""
    ev = flat[..., 0::2]
    od = flat[..., 1::2]
    return ev, od


def merge_flat(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.stack([a, b], axis=-1).reshape(a.shape[:-1] + (-1,))
