"""Bit-packed multispin checkerboard Metropolis for Ising3D.

The 2-D construction (ops/ising2d_multispin.py) lifted to the 3-D
stencil of /root/reference/src/ising3d_gpu_m.f90:174-206: 32 spins per
int32 word along y (bit k of word row Y = lattice row 32Y + k of one
color), grid (replica, z-plane) like the int8 kernel
(ops/ising3d_pallas.py) — each invocation updates one packed z-plane
(ny//32, nx//2) reading the z±1 planes whole (same bit positions, no
shifts), y±1 by funnel shifts with word-row carries, x±1 by lane rolls
with parity masks.  The (y+z) parity of the dual-color x-offset
(core/lattice.py split_checkerboard3d) makes the bit masks swap on odd
z — a scalar select per plane.

The 6-neighbor count needs a 6:3 bit-sliced counter (three half adders
→ a full adder for the ones, a 4:3 counter for the carry layer), and
acceptance needs three Bernoulli planes for ΔE ∈ {4, 8, 12} — the
packed analog of the reference's ws(0:6,0:1) constant-memory table
(/root/reference/src/ising3d_gpu_m.f90:136-172).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.models.base import CheckerboardState
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_multispin import (
    PACK,
    _bern_plane,
    _count_planes,
    _EVEN_BITS,
    _ODD_BITS,
    _pc_sum,
    chain_digits,
    pack_color,
    unpack_color,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    seeds_from_key,
)


def packable3d(ny: int, half: int) -> bool:
    return ny % (PACK * 8) == 0 and half % 128 == 0


def _half_adder(a, b):
    return a ^ b, a & b


def _count6(zm, zp, up, dn, ctr, side):
    """Bit-sliced 6-input counter -> (b1, b2, b4) planes of the
    neighbor-up count c = b1 + 2·b2 + 4·b4 ∈ [0, 6]."""
    s1, c1 = _half_adder(zm, zp)
    s2, c2 = _half_adder(up, dn)
    s3, c3 = _half_adder(ctr, side)
    b1 = s1 ^ s2 ^ s3
    t2 = (s1 & s2) | (s3 & (s1 ^ s2))      # carry of the ones layer
    w1, w2, _ = _count_planes(c1, c2, c3, t2)   # Σ ≤ 3: w4 unreachable
    return b1, w1, w2


def _flip_plane3d(x, b1, b2, b4, p4, p8, p12):
    nx_ = ~x
    nb1 = ~b1
    nb2 = ~b2
    nb4 = ~b4
    c4p = b4 & nb1 & nb2
    c5p = b4 & b1          # c = 7 is impossible, so b4&b1 ⇔ c == 5
    c6p = b4 & b2
    c2p = b2 & nb1 & nb4
    c1p = b1 & nb2 & nb4
    c0p = nb1 & nb2 & nb4
    need4 = (x & c4p) | (nx_ & c2p)
    need8 = (x & c5p) | (nx_ & c1p)
    need12 = (x & c6p) | (nx_ & c0p)
    return (~(need4 | need8 | need12)
            | (need4 & p4) | (need8 & p8) | (need12 & p12))


def _side_plane(o, color: int, z_odd):
    """x-neighbor one-bit plane: lane rolls masked by (y+z) parity.
    ``z_odd``: scalar bool (plane parity swaps the bit masks)."""
    minus = pltpu.roll(o, 1, axis=1)
    plus = pltpu.roll(o, o.shape[1] - 1, axis=1)
    modd = jnp.where(z_odd, jnp.uint32(_EVEN_BITS), jnp.uint32(_ODD_BITS))
    meven = jnp.where(z_odd, jnp.uint32(_ODD_BITS), jnp.uint32(_EVEN_BITS))
    if color == 0:
        return (plus & modd) | (minus & meven)
    return (minus & modd) | (plus & meven)


def _y_planes(o):
    """(up, dn) one-bit planes: funnel shifts with word-row carries;
    y wraps periodically inside the plane (full ny resident)."""
    nyp = o.shape[0]
    w_prev = pltpu.roll(o, 1, axis=0)
    w_next = pltpu.roll(o, nyp - 1, axis=0)
    one = jnp.uint32(1)
    up = (o << one) | (w_prev >> jnp.uint32(31))
    dn = (o >> one) | (w_next << jnp.uint32(31))
    return up, dn


def packed_phase3d_reference(xw, ow, color: int, b4, b8, b12):
    """Pure-jnp packed 3-D phase on full (nz, nyp, half) planes — the
    bitwise oracle."""
    xw = xw.astype(jnp.uint32)
    ow = ow.astype(jnp.uint32)
    zm = jnp.roll(ow, 1, axis=0)
    zp = jnp.roll(ow, -1, axis=0)
    w_prev = jnp.roll(ow, 1, axis=1)
    w_next = jnp.roll(ow, -1, axis=1)
    one = jnp.uint32(1)
    up = (ow << one) | (w_prev >> jnp.uint32(31))
    dn = (ow >> one) | (w_next << jnp.uint32(31))
    minus = jnp.roll(ow, 1, axis=2)
    plus = jnp.roll(ow, -1, axis=2)
    nz = ow.shape[0]
    z_odd = ((jnp.arange(nz) & 1) == 1)[:, None, None]
    modd = jnp.where(z_odd, jnp.uint32(_EVEN_BITS), jnp.uint32(_ODD_BITS))
    meven = jnp.where(z_odd, jnp.uint32(_ODD_BITS), jnp.uint32(_EVEN_BITS))
    if color == 0:
        side = (plus & modd) | (minus & meven)
    else:
        side = (minus & modd) | (plus & meven)
    b1, b2, b4c = _count6(zm, zp, up, dn, ow, side)
    flip = _flip_plane3d(xw, b1, b2, b4c,
                         b4.astype(jnp.uint32), b8.astype(jnp.uint32),
                         b12.astype(jnp.uint32))
    return (xw ^ flip).astype(jnp.int32)


def _phase_kernel(seed_ref, x_ref, oc_ref, ozm_ref, ozp_ref, *rest,
                  color: int, d4, d8, d12, has_bits: bool,
                  measuring: bool = False):
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    if has_bits:
        b4_ref, b8_ref, b12_ref, out_ref = refs
    else:
        (out_ref,) = refs
    r = pl.program_id(0)
    z = pl.program_id(1)
    x = pltpu.bitcast(x_ref[0, 0], jnp.uint32)
    o = pltpu.bitcast(oc_ref[0, 0], jnp.uint32)
    zm = pltpu.bitcast(ozm_ref[0, 0], jnp.uint32)
    zp = pltpu.bitcast(ozp_ref[0, 0], jnp.uint32)
    up, dn = _y_planes(o)
    side = _side_plane(o, color, (z & 1) == 1)
    b1, b2, b4c = _count6(zm, zp, up, dn, o, side)
    if has_bits:
        p4 = pltpu.bitcast(b4_ref[0, 0], jnp.uint32)
        p8 = pltpu.bitcast(b8_ref[0, 0], jnp.uint32)
        p12 = pltpu.bitcast(b12_ref[0, 0], jnp.uint32)
    else:
        tile_tag = z * jnp.int32(-1640531527) + r * jnp.int32(0x3C6EF35F)
        pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)

        def gen():
            return pltpu.bitcast(pltpu.prng_random_bits(x.shape),
                                 jnp.uint32)

        p4 = _bern_plane(x.shape, d4, gen)
        p8 = _bern_plane(x.shape, d8, gen)
        p12 = _bern_plane(x.shape, d12, gen)
    flip = _flip_plane3d(x, b1, b2, b4c, p4, p8, p12)
    new = x ^ flip
    out_ref[0, 0] = pltpu.bitcast(new, jnp.int32)
    if measuring:
        # phase-b fused (m, e): counts come from the FINAL other color;
        # e = -Σ_b s_b·(2c-6) covers each bond once;
        # Σ s·(2c-6) = 4·Σ(bit·c) - 12·Σbit - 2·Σc + 6N.
        nblk = jnp.int32(x.shape[0] * x.shape[1] * PACK)
        s_x = _pc_sum(new)
        s_c = _pc_sum(b1) + 2 * _pc_sum(b2) + 4 * _pc_sum(b4c)
        s_xc = (_pc_sum(new & b1) + 2 * _pc_sum(new & b2)
                + 4 * _pc_sum(new & b4c))
        m = 2 * (s_x + _pc_sum(o)) - 2 * nblk
        e = -(4 * s_xc - 12 * s_x - 2 * s_c + 6 * nblk)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, m, jnp.where(lane == 1, e, 0))

        @pl.when(z == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


@functools.partial(
    jax.jit,
    static_argnames=("color", "beta", "nrep", "nz", "nyp", "half",
                     "measuring"),
)
def _metropolis_phase3d(xw, ow, seeds, *, color, beta, nrep, nz, nyp,
                        half, measuring=False):
    d4 = tuple(chain_digits(float(np.exp(-4.0 * beta))))
    d8 = tuple(chain_digits(float(np.exp(-8.0 * beta))))
    d12 = tuple(chain_digits(float(np.exp(-12.0 * beta))))
    kernel = functools.partial(
        _phase_kernel, color=color, d4=d4, d8=d8, d12=d12,
        has_bits=False, measuring=measuring,
    )
    plane = pl.BlockSpec((1, 1, nyp, half), lambda r, z: (r, z, 0, 0),
                         memory_space=pltpu.VMEM)
    zmspec = pl.BlockSpec(
        (1, 1, nyp, half), lambda r, z: (r, (z - 1 + nz) % nz, 0, 0),
        memory_space=pltpu.VMEM,
    )
    zpspec = pl.BlockSpec(
        (1, 1, nyp, half), lambda r, z: (r, (z + 1) % nz, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = [jax.ShapeDtypeStruct((nrep, nz, nyp, half), jnp.int32)]
    out_specs = [plane]
    if measuring:
        out_shape.append(jax.ShapeDtypeStruct((nrep, 1, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 1, 128),
                                      lambda r, z: (r, 0, 0),
                                      memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape) if measuring else out_shape[0],
        grid=(nrep, nz),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            plane, plane, zmspec, zpspec,
        ],
        out_specs=tuple(out_specs) if measuring else out_specs[0],
        input_output_aliases={1: 0},
    )(seeds, xw, ow, ow, ow)


def phase3d_packed_with_bits(xw, ow, b4, b8, b12, *, color,
                             interpret=False):
    """Single packed 3-D phase with injected Bernoulli planes (bitwise
    testable against packed_phase3d_reference)."""
    nrep, nz, nyp, half = xw.shape
    kernel = functools.partial(
        _phase_kernel, color=color, d4=(), d8=(), d12=(), has_bits=True
    )
    plane = pl.BlockSpec((1, 1, nyp, half), lambda r, z: (r, z, 0, 0),
                         memory_space=pltpu.VMEM)
    zmspec = pl.BlockSpec(
        (1, 1, nyp, half), lambda r, z: (r, (z - 1 + nz) % nz, 0, 0),
        memory_space=pltpu.VMEM,
    )
    zpspec = pl.BlockSpec(
        (1, 1, nyp, half), lambda r, z: (r, (z + 1) % nz, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nrep, nz, nyp, half), jnp.int32),
        grid=(nrep, nz),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            plane, plane, zmspec, zpspec, plane, plane, plane,
        ],
        out_specs=plane,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.zeros((2,), jnp.int32), xw, ow, ow, ow, b4, b8, b12)


# ---------------------------------------------------------------------------
# whole-volume VMEM-resident packed multisweep (3-D ensemble fast path)
# ---------------------------------------------------------------------------

# both packed color volumes + ~12 z-block temporaries must fit VMEM
_MS3_VMEM_VOL_WORDS = 1 << 20
_MS3_TZ = 32


def multisweep3d_fits_vmem(nz: int, ny: int, half: int) -> bool:
    return (nz % _MS3_TZ == 0
            and nz * (ny // PACK) * half <= _MS3_VMEM_VOL_WORDS)


def _ms3_kernel(seed_ref, wa_in, wb_in, wa_ref, wb_ref, obs_ref,
                *, sweeps: int, d4, d8, d12, tz: int, nz: int,
                nyp: int, half: int):
    """S full 3-D MCS on resident packed volumes + fused per-sweep
    (m, e).  Grid = (replicas,); phases run over z-blocks of ``tz``
    planes (whole-volume temporaries would blow VMEM), reading z-edge
    planes from the resident ref — the per-(replica, z-plane) grid of
    the streaming kernel collapses into in-kernel loops, which is the
    whole win at ensemble shapes where single planes are tiny."""
    r = pl.program_id(0)
    wa_ref[0] = wa_in[0]
    wb_ref[0] = wb_in[0]
    nblk = nz // tz
    shape = (tz, nyp, half)
    nsites_blk = jnp.int32(tz * nyp * half * PACK)

    def block_chains(s, phase_idx, i):
        """(p4, p8, p12) for z-block i of sweep s: the SAME per-global-
        (z-plane, replica) keyed streams as the streaming and z-sharded
        phase kernels (seed pair per (sweep, phase) from seed_ref), so
        the resident path is bitwise identical to them."""
        s0 = seed_ref[s, phase_idx, 0]
        s1 = seed_ref[s, phase_idx, 1]
        cols = [[], [], []]
        for k in range(tz):
            tag = ((i * tz + k) * jnp.int32(-1640531527)
                   + r * jnp.int32(0x3C6EF35F))
            pltpu.prng_seed(s0, s1 ^ tag)

            def gen():
                return pltpu.bitcast(
                    pltpu.prng_random_bits((nyp, half)), jnp.uint32)

            cols[0].append(_bern_plane((nyp, half), d4, gen))
            cols[1].append(_bern_plane((nyp, half), d8, gen))
            cols[2].append(_bern_plane((nyp, half), d12, gen))
        return tuple(jnp.stack(c, axis=0) for c in cols)

    def load_blk(ref, i):
        return pltpu.bitcast(ref[0, pl.ds(i * tz, tz)], jnp.uint32)

    def nbr_counts(o_ref_full, i, o, color):
        zm_edge = pltpu.bitcast(
            o_ref_full[0, pl.ds((i * tz - 1 + nz) % nz, 1)], jnp.uint32)
        zp_edge = pltpu.bitcast(
            o_ref_full[0, pl.ds(((i + 1) * tz) % nz, 1)], jnp.uint32)
        zm = jnp.concatenate([zm_edge, o[:-1]], axis=0)
        zp = jnp.concatenate([o[1:], zp_edge], axis=0)
        w_prev = pltpu.roll(o, 1, axis=1)
        w_next = pltpu.roll(o, nyp - 1, axis=1)
        one = jnp.uint32(1)
        up = (o << one) | (w_prev >> jnp.uint32(31))
        dn = (o >> one) | (w_next << jnp.uint32(31))
        minus = pltpu.roll(o, 1, axis=2)
        plus = pltpu.roll(o, half - 1, axis=2)
        z_odd = (((jax.lax.broadcasted_iota(jnp.int32, (tz, 1, 1), 0)
                   + i * tz) & 1) == 1)
        modd = jnp.where(z_odd, jnp.uint32(_EVEN_BITS),
                         jnp.uint32(_ODD_BITS))
        meven = jnp.where(z_odd, jnp.uint32(_ODD_BITS),
                          jnp.uint32(_EVEN_BITS))
        if color == 0:
            side = (plus & modd) | (minus & meven)
        else:
            side = (minus & modd) | (plus & meven)
        return _count6(zm, zp, up, dn, o, side)

    def phase_a(i, s):
        x = load_blk(wa_ref, i)
        o = load_blk(wb_ref, i)
        b1, b2, b4c = nbr_counts(wb_ref, i, o, 0)
        p4, p8, p12 = block_chains(s, 0, i)
        flip = _flip_plane3d(x, b1, b2, b4c, p4, p8, p12)
        wa_ref[0, pl.ds(i * tz, tz)] = pltpu.bitcast(x ^ flip,
                                                     jnp.int32)
        return s

    def phase_b_measure(i, carry):
        m, e, s = carry
        x = load_blk(wb_ref, i)
        o = load_blk(wa_ref, i)
        b1, b2, b4c = nbr_counts(wa_ref, i, o, 1)
        p4, p8, p12 = block_chains(s, 1, i)
        flip = _flip_plane3d(x, b1, b2, b4c, p4, p8, p12)
        new = x ^ flip
        wb_ref[0, pl.ds(i * tz, tz)] = pltpu.bitcast(new, jnp.int32)
        s_x = _pc_sum(new)
        s_c = _pc_sum(b1) + 2 * _pc_sum(b2) + 4 * _pc_sum(b4c)
        s_xc = (_pc_sum(new & b1) + 2 * _pc_sum(new & b2)
                + 4 * _pc_sum(new & b4c))
        m = m + 2 * (s_x + _pc_sum(o)) - 2 * nsites_blk
        e = e - (4 * s_xc - 12 * s_x - 2 * s_c + 6 * nsites_blk)
        return m, e, s

    def body(s, _):
        jax.lax.fori_loop(0, nblk, phase_a, s)
        m, e, _s = jax.lax.fori_loop(
            0, nblk, phase_b_measure, (jnp.int32(0), jnp.int32(0), s))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, m, jnp.where(lane == 1, e, 0))
        obs_ref[0, pl.ds(s, 1), :] = row
        return 0

    jax.lax.fori_loop(0, sweeps, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("sweeps", "beta", "nrep", "nz", "nyp", "half"),
)
def _multisweep_packed3d(wa, wb, seeds_t, *, sweeps, beta, nrep, nz,
                         nyp, half):
    d4 = tuple(chain_digits(float(np.exp(-4.0 * beta))))
    d8 = tuple(chain_digits(float(np.exp(-8.0 * beta))))
    d12 = tuple(chain_digits(float(np.exp(-12.0 * beta))))
    kernel = functools.partial(
        _ms3_kernel, sweeps=sweeps, d4=d4, d8=d8, d12=d12,
        tz=_MS3_TZ, nz=nz, nyp=nyp, half=half,
    )
    vol = pl.BlockSpec((1, nz, nyp, half), lambda r: (r, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    obs = pl.BlockSpec((1, sweeps, 128), lambda r: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nrep, nz, nyp, half), jnp.int32),
            jax.ShapeDtypeStruct((nrep, nz, nyp, half), jnp.int32),
            jax.ShapeDtypeStruct((nrep, sweeps, 128), jnp.int32),
        ),
        grid=(nrep,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vol, vol],
        out_specs=(vol, vol, obs),
        input_output_aliases={1: 0, 2: 1},
    )(seeds_t, wa, wb)


def multisweep_packed3d(model, wa, wb, key, sweeps: int, t0=0):
    """Advance ``sweeps`` 3-D MCS on packed volumes with fused
    per-sweep (m, e) densities (R, sweeps).

    ``key`` is the SAMPLE-level key and ``t0`` the global sweep index
    already completed: sweeps run at t = t0+1 .. t0+sweeps with the
    unified global-t keying, so the resident path is bitwise identical
    to the streaming phase kernels and the z-sharded runner for the
    same config (the per-(z-plane, replica) granule scheme those
    already share)."""
    from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_multispin import (
        sweep_seed_pairs,
    )

    nrep, nz, nyp, half = wa.shape
    if not multisweep3d_fits_vmem(nz, nyp * PACK, half):
        raise ValueError(
            f"packed volume {nz}x{nyp * PACK}x{2 * half} exceeds the "
            "VMEM-resident 3-D multisweep budget"
        )
    wa, wb, obs = _multisweep_packed3d(
        wa, wb, sweep_seed_pairs(key, sweeps, t0), sweeps=sweeps,
        beta=float(model.beta), nrep=nrep, nz=nz, nyp=nyp, half=half,
    )
    n_inv = jnp.float32(1.0 / model.nsites)
    return wa, wb, {
        "m": obs[:, :, 0].astype(jnp.float32) * n_inv,
        "e": obs[:, :, 1].astype(jnp.float32) * n_inv,
    }


# ---------------------------------------------------------------------------
# halo-aware packed phase for the z-sharded (shard_map) path
# ---------------------------------------------------------------------------

def packed_sharded_phase3d_reference(xw, ow, color: int, b4, b8, b12,
                                     hzm, hzp, z0_parity: int = 0):
    """Pure-jnp packed 3-D phase on a z-sharded local block: the z±1
    neighbors of the edge planes come from exchanged PACKED halo planes
    (1, nyp, half) instead of a periodic wrap."""
    xw = xw.astype(jnp.uint32)
    ow = ow.astype(jnp.uint32)
    zm = jnp.concatenate([hzm.astype(jnp.uint32), ow[:-1]], axis=0)
    zp = jnp.concatenate([ow[1:], hzp.astype(jnp.uint32)], axis=0)
    w_prev = jnp.roll(ow, 1, axis=1)
    w_next = jnp.roll(ow, -1, axis=1)
    one = jnp.uint32(1)
    up = (ow << one) | (w_prev >> jnp.uint32(31))
    dn = (ow >> one) | (w_next << jnp.uint32(31))
    minus = jnp.roll(ow, 1, axis=2)
    plus = jnp.roll(ow, -1, axis=2)
    nz = ow.shape[0]
    z_odd = (((jnp.arange(nz) + z0_parity) & 1) == 1)[:, None, None]
    modd = jnp.where(z_odd, jnp.uint32(_EVEN_BITS), jnp.uint32(_ODD_BITS))
    meven = jnp.where(z_odd, jnp.uint32(_ODD_BITS), jnp.uint32(_EVEN_BITS))
    if color == 0:
        side = (plus & modd) | (minus & meven)
    else:
        side = (minus & modd) | (plus & meven)
    b1, b2, b4c = _count6(zm, zp, up, dn, ow, side)
    flip = _flip_plane3d(xw, b1, b2, b4c,
                         b4.astype(jnp.uint32), b8.astype(jnp.uint32),
                         b12.astype(jnp.uint32))
    return (xw ^ flip).astype(jnp.int32)


def _sharded_phase3d_kernel(seed_ref, offs_ref, x_ref, oc_ref, ozm_ref,
                            ozp_ref, hzm_ref, hzp_ref, *rest,
                            color: int, d4, d8, d12, nz: int,
                            has_bits: bool, measuring: bool = False):
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    if has_bits:
        b4_ref, b8_ref, b12_ref, out_ref = refs
    else:
        (out_ref,) = refs
    r = pl.program_id(0)
    z = pl.program_id(1)
    x = pltpu.bitcast(x_ref[0, 0], jnp.uint32)
    o = pltpu.bitcast(oc_ref[0, 0], jnp.uint32)
    zm = jnp.where(z == 0,
                   pltpu.bitcast(hzm_ref[0, 0], jnp.uint32),
                   pltpu.bitcast(ozm_ref[0, 0], jnp.uint32))
    zp = jnp.where(z == nz - 1,
                   pltpu.bitcast(hzp_ref[0, 0], jnp.uint32),
                   pltpu.bitcast(ozp_ref[0, 0], jnp.uint32))
    up, dn = _y_planes(o)
    # local z parity equals global (local nz even per shard)
    side = _side_plane(o, color, (z & 1) == 1)
    b1, b2, b4c = _count6(zm, zp, up, dn, o, side)
    if has_bits:
        p4 = pltpu.bitcast(b4_ref[0, 0], jnp.uint32)
        p8 = pltpu.bitcast(b8_ref[0, 0], jnp.uint32)
        p12 = pltpu.bitcast(b12_ref[0, 0], jnp.uint32)
    else:
        z_g = offs_ref[1] + z
        rep_g = offs_ref[0] + r
        tile_tag = (z_g * jnp.int32(-1640531527)
                    + rep_g * jnp.int32(0x3C6EF35F))
        pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)

        def gen():
            return pltpu.bitcast(pltpu.prng_random_bits(x.shape),
                                 jnp.uint32)

        p4 = _bern_plane(x.shape, d4, gen)
        p8 = _bern_plane(x.shape, d8, gen)
        p12 = _bern_plane(x.shape, d12, gen)
    flip = _flip_plane3d(x, b1, b2, b4c, p4, p8, p12)
    new = x ^ flip
    out_ref[0, 0] = pltpu.bitcast(new, jnp.int32)
    if measuring:
        nblk = jnp.int32(x.shape[0] * x.shape[1] * PACK)
        s_x = _pc_sum(new)
        s_c = _pc_sum(b1) + 2 * _pc_sum(b2) + 4 * _pc_sum(b4c)
        s_xc = (_pc_sum(new & b1) + 2 * _pc_sum(new & b2)
                + 4 * _pc_sum(new & b4c))
        m = 2 * (s_x + _pc_sum(o)) - 2 * nblk
        e = -(4 * s_xc - 12 * s_x - 2 * s_c + 6 * nblk)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, m, jnp.where(lane == 1, e, 0))

        @pl.when(z == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def _interpret_chain_planes3d(seeds, rep0, z0, nrep, nz, nyp, half,
                              d4, d8, d12):
    """CPU-interpret fallback: threefry chains keyed per (global
    replica, global z-plane) — mesh-shape invariant."""
    base = jax.random.fold_in(
        jax.random.PRNGKey(seeds[0].astype(jnp.uint32)), seeds[1]
    )

    def plane(digits, tag, kg):
        cnt = [0]

        def gen():
            cnt[0] += 1
            return jax.random.bits(
                jax.random.fold_in(kg, tag * 64 + cnt[0]),
                (nyp, half), dtype=jnp.uint32)

        return _bern_plane((nyp, half), tuple(digits), gen)

    def per_rep(r):
        kr = jax.random.fold_in(base, rep0 + r)

        def per_z(g):
            kg = jax.random.fold_in(kr, z0 + g)
            return (plane(d4, 0, kg), plane(d8, 1, kg),
                    plane(d12, 2, kg))

        return jax.vmap(per_z)(jnp.arange(nz))

    b4, b8, b12 = jax.vmap(per_rep)(jnp.arange(nrep))
    return (b4.astype(jnp.int32), b8.astype(jnp.int32),
            b12.astype(jnp.int32))


def sharded_phase3d_packed(xw, ow, hzm, hzp, seeds, offs, *,
                           color: int, beta: float,
                           b4=None, b8=None, b12=None,
                           interpret: bool = False,
                           measuring: bool = False):
    """One packed 3-D checkerboard phase of a z-sharded local block.

    xw, ow: (R, nz_loc, nyp, half) packed local color volumes; hzm/hzp:
    (R, 1, nyp, half) exchanged packed z-halo planes (whole word planes
    — z neighbors share bit positions, so no bit extraction is needed);
    offs: (rep0, z0) global offsets.  Local nz must be even so local z
    parity equals global."""
    nrep, nz, nyp, half = xw.shape
    d4 = tuple(chain_digits(float(np.exp(-4.0 * beta))))
    d8 = tuple(chain_digits(float(np.exp(-8.0 * beta))))
    d12 = tuple(chain_digits(float(np.exp(-12.0 * beta))))
    if interpret and b4 is None:
        b4, b8, b12 = _interpret_chain_planes3d(
            seeds, offs[0], offs[1], nrep, nz, nyp, half, d4, d8, d12)
    has_bits = b4 is not None
    kernel = functools.partial(
        _sharded_phase3d_kernel, color=color, d4=d4, d8=d8, d12=d12,
        nz=nz, has_bits=has_bits, measuring=measuring,
    )
    plane = pl.BlockSpec((1, 1, nyp, half), lambda r, z: (r, z, 0, 0),
                         memory_space=pltpu.VMEM)
    zmspec = pl.BlockSpec(
        (1, 1, nyp, half), lambda r, z: (r, (z - 1 + nz) % nz, 0, 0),
        memory_space=pltpu.VMEM,
    )
    zpspec = pl.BlockSpec(
        (1, 1, nyp, half), lambda r, z: (r, (z + 1) % nz, 0, 0),
        memory_space=pltpu.VMEM,
    )
    halo = pl.BlockSpec((1, 1, nyp, half), lambda r, z: (r, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        plane, plane, zmspec, zpspec, halo, halo,
    ]
    operands = [seeds, offs, xw, ow, ow, ow, hzm, hzp]
    if has_bits:
        in_specs += [plane, plane, plane]
        operands += [b4, b8, b12]
    out_shape = [jax.ShapeDtypeStruct((nrep, nz, nyp, half), jnp.int32)]
    out_specs = [plane]
    if measuring:
        out_shape.append(jax.ShapeDtypeStruct((nrep, 1, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 1, 128),
                                      lambda r, z: (r, 0, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape) if measuring else out_shape[0],
        grid=(nrep, nz),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if measuring else out_specs[0],
        input_output_aliases={2: 0},
        interpret=interpret,
    )(*operands)
    if measuring:
        state_out, obs = res
        return state_out, obs[:, 0, 0], obs[:, 0, 1]
    return res


def shard_packed3d_ok(local_shape: tuple[int, ...]) -> bool:
    """Local packed (R, nz_loc, nyp, half) block is servable."""
    if len(local_shape) != 4:
        return False
    _, nz, nyp, half = local_shape
    return half % 128 == 0 and nyp % 8 == 0 and nz % 2 == 0


def sweep_packed3d(model, wa, wb, key):
    """One full MCS on packed color volumes (R, nz, ny//32, half)."""
    nrep, nz, nyp, half = wa.shape
    kw = dict(beta=float(model.beta), nrep=nrep, nz=nz, nyp=nyp,
              half=half)
    wa = _metropolis_phase3d(wa, wb, seeds_from_key(key, 0),
                             color=0, **kw)
    wb = _metropolis_phase3d(wb, wa, seeds_from_key(key, 1),
                             color=1, **kw)
    return wa, wb


def sweep_measure_packed3d(model, wa, wb, key):
    """One MCS + fused per-sweep (m, e) densities from phase b."""
    from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_multispin import (
        _check_obs_sites,
    )

    _check_obs_sites(model.nsites)
    nrep, nz, nyp, half = wa.shape
    kw = dict(beta=float(model.beta), nrep=nrep, nz=nz, nyp=nyp,
              half=half)
    wa = _metropolis_phase3d(wa, wb, seeds_from_key(key, 0),
                             color=0, **kw)
    wb, obs = _metropolis_phase3d(wb, wa, seeds_from_key(key, 1),
                                  color=1, measuring=True, **kw)
    n_inv = jnp.float32(1.0 / model.nsites)
    return wa, wb, {
        "m": obs[:, 0, 0].astype(jnp.float32) * n_inv,
        "e": obs[:, 0, 1].astype(jnp.float32) * n_inv,
    }
