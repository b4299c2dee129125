"""Bit-packed (multispin-coded) checkerboard Metropolis for Ising2D.

The fused int8 phase kernel (ops/ising2d_pallas.py) is VPU-compute
bound: ~9 int32 word-ops per site at the measured ~10¹² i32 op/s leave
the 8192² headline at ~1.1×10¹¹ flips/s, 40% of the HBM roofline.
This kernel stores 32 spins per int32 word (bit k of word row Y is
lattice row y = 32Y + k of one checkerboard color) and runs the whole
update in boolean algebra, ~3-4 word-ops per 32 sites:

- neighbor geometry: y±1 are single-bit funnel shifts with a carry bit
  from the adjacent word row; x±1 are lane rolls of whole words; the
  row-parity left/right selection of the dual-color layout
  (core/lattice.py:18-28) becomes constant bit masks 0xAAAA.../0x5555...
  because bit parity IS row parity;
- the 4-neighbor count is a bit-sliced 4:3 counter (two half-adder
  layers), giving ones/twos/fours planes;
- acceptance: the only positive-ΔE cases are (spin up, count 3|4) and
  (spin down, count 1|0) (ΔE = 4 resp. 8 — the reference's exparr
  levels, /root/reference/src/ising2d_gpu_m.f90:122-131); the Bernoulli
  planes B4 ~ exp(-4β), B8 ~ exp(-8β) come from per-bit random chains:
  with p = 0.d₁d₂…d_k binary, B = fold(r_j | B if d_j else r_j & B)
  over digits LSB→MSB gives P(bit) = p exactly at k-digit resolution
  (2⁻²⁰ here, an order below the f32 rounding of exp(-βΔE) thresholds
  the unpacked kernels use on p₈ ≈ 7×10⁻⁴).

This is the multispin coding technique of the classic CUDA Ising
literature (PAPERS.md "A Performance Study of the 2D Ising Model on
GPUs") re-built on TPU word lanes: the reference itself updates one
spin per thread (/root/reference/src/ising2d_gpu_m.f90:148-162).

Same dual-color dense storage and update order as the int8 engine, so
physics (detailed balance, checkerboard phasing) is identical; the RNG
*consumption pattern* differs (bit chains vs one u32 compare per site),
so trajectories match the int8 engine statistically, not bitwise.
Validation: packed-vs-unpacked single-phase equivalence given injected
Bernoulli planes (bitwise, CPU+TPU), chain-probability statistics, and
equilibrium energy at Tc on the chip (tests/test_ising2d_multispin.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.models.base import CheckerboardState
from cuda_fortran_mc_simulation_spin_tpu.ops import multispin_rng, stencil
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    seeds_from_key,
)

PACK = 32          # spins per word (int32)
# fused (m, e) partials accumulate in int32 (exact, so sums are
# independent of block/shard order — the bitwise mesh-invariance
# guarantee); |e_sum| ≤ 3N caps the measurable lattice
OBS_INT32_MAX_SITES = (2 ** 31 - 1) // 3


def _check_obs_sites(nsites: int) -> None:
    if nsites > OBS_INT32_MAX_SITES:
        raise ValueError(
            f"lattice of {nsites} sites overflows the int32 fused-"
            f"observable accumulators (max {OBS_INT32_MAX_SITES}); "
            "measure with a separate reduction pass"
        )
CHAIN_BITS = 20    # Bernoulli-chain resolution: P quantized to 2^-20
_ODD_BITS = 0xAAAAAAAA   # word bits at odd lattice rows
_EVEN_BITS = 0x55555555
_TYP = 32          # word-rows per grid block (multiple of 8)


def packable(ny: int, half: int) -> bool:
    """Shape is servable by the multispin kernel: the y extent packs
    into whole words and word-rows tile into 8-sublane granules."""
    return ny % (PACK * 8) == 0 and half % 128 == 0


# per-plane tile budget (words): ~12 live word-plane temporaries per
# phase must fit VMEM, so very wide lattices (32768²: half=16384) take
# shorter tiles
_TILE_BUDGET_WORDS = 128 << 10


def _pick_typ(nyp: int, half: int | None = None) -> int:
    """Largest multiple-of-8 divisor of nyp not exceeding _TYP (the
    8-word-row halo BlockSpec trick needs 8-aligned tiles), capped so
    typ·half stays within the VMEM temporary budget."""
    cap = _TYP
    if half is not None:
        cap = min(cap, max(8, (_TILE_BUDGET_WORDS // half) // 8 * 8))
    typ = min(cap, nyp)
    typ -= typ % 8
    while typ >= 8:
        if nyp % typ == 0:
            return typ
        typ -= 8
    raise ValueError(f"nyp={nyp} needs a multiple-of-8 tiling "
                     "(ny % 256 == 0)")


def pack_color(plane: jax.Array) -> jax.Array:
    """(..., ny, half) ±1 int8 color plane -> (..., ny//32, half) int32
    with bit k of word row Y = (spin at row 32Y+k) > 0."""
    ny, half = plane.shape[-2:]
    bits = (plane > 0).astype(jnp.uint32)
    bits = bits.reshape(plane.shape[:-2] + (ny // PACK, PACK, half))
    w = jnp.zeros(plane.shape[:-2] + (ny // PACK, half), jnp.uint32)
    for k in range(PACK):
        w = w | (bits[..., k, :] << np.uint32(k))
    return w.astype(jnp.int32)


def unpack_color(w: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_color` (to ±1 int8)."""
    wu = w.astype(jnp.uint32)
    rows = [
        (((wu >> np.uint32(k)) & jnp.uint32(1)).astype(jnp.int32) * 2 - 1)
        for k in range(PACK)
    ]
    stacked = jnp.stack(rows, axis=-2)  # (..., nyp, 32, half)
    shape = w.shape[:-2] + (w.shape[-2] * PACK, w.shape[-1])
    return stacked.reshape(shape).astype(jnp.int8)


def popcount_sum(w: jax.Array) -> jax.Array:
    """Total set-bit (spin-up) count over packed planes (SWAR)."""
    u = w.astype(jnp.uint32)
    u = u - ((u >> jnp.uint32(1)) & jnp.uint32(0x55555555))
    u = ((u & jnp.uint32(0x33333333))
         + ((u >> jnp.uint32(2)) & jnp.uint32(0x33333333)))
    u = (u + (u >> jnp.uint32(4))) & jnp.uint32(0x0F0F0F0F)
    per_word = (u * jnp.uint32(0x01010101)) >> jnp.uint32(24)
    return jnp.sum(per_word.astype(jnp.int32))


def chain_digits(p: float, k: int = CHAIN_BITS) -> list[int]:
    """Binary digits d₁..d_k (MSB first) of p rounded to k bits."""
    q = int(round(min(max(p, 0.0), 1.0) * (1 << k)))
    if q >= (1 << k):
        # p rounds to 1: clamp to 1 - 2^-k (the always-accept ΔE ≤ 0
        # branch is separate, so this only touches p(ΔE>0) ≈ 1 runs at
        # absurdly high T, where the 2^-k deficit is far below noise)
        q = (1 << k) - 1
    return [(q >> (k - 1 - j)) & 1 for j in range(k)]


def _bern_plane(shape, digits, gen):
    """Bernoulli(0.d₁d₂…) bit plane from fresh random words.

    LSB→MSB: B ← r|B on digit 1, r&B on digit 0; trailing zero digits
    are skipped (they only mask an all-zero start)."""
    j = len(digits) - 1
    while j >= 0 and digits[j] == 0:
        j -= 1
    if j < 0:
        return jnp.zeros(shape, jnp.uint32)
    b = gen()  # digit j is 1: B = r | 0
    for d in reversed(digits[:j]):
        r = gen()
        b = (r | b) if d else (r & b)
    return b


def _granule_chain_planes(s0, s1, rep_g, wrow0, nrows, d4, d8,
                          w, w_total, col0):
    """(nrows, w) Bernoulli-chain planes (b4, b8) from the unified
    granule-keyed hardware streams (ops/multispin_rng.granule_planes) —
    THE keying scheme of every packed-Ising2D execution path
    (single-chip streaming phases, the VMEM-resident multisweep, and
    the (dp, y[, x])-sharded halo kernels).  With the per-(sweep,
    phase) seed pair (s0, s1) also derived identically everywhere
    (seeds_from_key of the global-t sweep key), a routed single-chip
    run is bitwise identical to any mesh-sharded run of the same
    config — SURVEY.md §7's bit-reproducibility-across-sharding goal."""
    return multispin_rng.granule_planes(
        s0, s1, rep_g, wrow0, nrows, w, w_total, col0,
        lambda shape, gen: (_bern_plane(shape, d4, gen),
                            _bern_plane(shape, d8, gen)))


def _nbr_planes(o, w_prev, w_next, color: int):
    """(up, dn, center, side) one-bit neighbor planes for a packed
    other-color block.  w_prev/w_next: word rows above/below (spliced
    halos).  All uint32."""
    one = jnp.uint32(1)
    up = (o << one) | (w_prev >> jnp.uint32(31))
    dn = (o >> one) | (w_next << jnp.uint32(31))
    minus = pltpu.roll(o, 1, axis=1)            # x: i-1
    plus = pltpu.roll(o, o.shape[1] - 1, axis=1)  # x: i+1
    odd = jnp.uint32(_ODD_BITS)
    even = jnp.uint32(_EVEN_BITS)
    if color == 0:
        side = (plus & odd) | (minus & even)
    else:
        side = (minus & odd) | (plus & even)
    return up, dn, o, side


def _count_planes(n1, n2, n3, n4):
    """Bit-sliced count of 4 one-bit planes -> (ones, twos, fours)."""
    s1 = n1 ^ n2
    c1 = n1 & n2
    s2 = n3 ^ n4
    c2 = n3 & n4
    ones = s1 ^ s2
    c3 = s1 & s2
    twos = c1 ^ c2 ^ c3
    fours = (c1 & c2) | (c3 & (c1 ^ c2))
    return ones, twos, fours


def _flip_plane(x, ones, twos, fours, b4, b8):
    """Packed Metropolis decision: flip mask for spin plane ``x`` given
    neighbor-count planes and Bernoulli threshold planes."""
    nx_ = ~x
    nf = ~fours
    c3p = twos & ones & nf
    c1p = ones & ~twos & nf
    c0p = ~(ones | twos | fours)
    need4 = (x & c3p) | (nx_ & c1p)
    need8 = (x & fours) | (nx_ & c0p)
    return ~(need4 | need8) | (need4 & b4) | (need8 & b8)


def packed_phase_reference(xw, ow, color: int, b4, b8):
    """Pure-jnp packed phase on full planes (periodic wrap via roll) —
    the oracle the Pallas kernel is tested against bitwise."""
    xw = xw.astype(jnp.uint32)
    ow = ow.astype(jnp.uint32)
    w_prev = jnp.roll(ow, 1, axis=0)
    w_next = jnp.roll(ow, -1, axis=0)
    one = jnp.uint32(1)
    up = (ow << one) | (w_prev >> jnp.uint32(31))
    dn = (ow >> one) | (w_next << jnp.uint32(31))
    minus = jnp.roll(ow, 1, axis=1)
    plus = jnp.roll(ow, -1, axis=1)
    odd = jnp.uint32(_ODD_BITS)
    even = jnp.uint32(_EVEN_BITS)
    if color == 0:
        side = (plus & odd) | (minus & even)
    else:
        side = (minus & odd) | (plus & even)
    ones, twos, fours = _count_planes(up, dn, ow, side)
    flip = _flip_plane(xw, ones, twos, fours,
                       b4.astype(jnp.uint32), b8.astype(jnp.uint32))
    return (xw ^ flip).astype(jnp.int32)


def _pc_plane(u):
    """Per-word set-bit count (SWAR), uint32 plane -> int32 plane."""
    u = u - ((u >> jnp.uint32(1)) & jnp.uint32(0x55555555))
    u = ((u & jnp.uint32(0x33333333))
         + ((u >> jnp.uint32(2)) & jnp.uint32(0x33333333)))
    u = (u + (u >> jnp.uint32(4))) & jnp.uint32(0x0F0F0F0F)
    return ((u * jnp.uint32(0x01010101)) >> jnp.uint32(24)).astype(
        jnp.int32)


def _pc_sum(u):
    return jnp.sum(_pc_plane(u))


def _phase_kernel(seed_ref, x_ref, oc_ref, oup_ref, odn_ref, *rest,
                  color: int, d4, d8, has_bits: bool,
                  measuring: bool = False, tiled_obs: bool = False):
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    if has_bits:
        b4_ref, b8_ref, out_ref = refs
    else:
        (out_ref,) = refs
    r = pl.program_id(0)
    i = pl.program_id(1)
    x = pltpu.bitcast(x_ref[0], jnp.uint32)
    o = pltpu.bitcast(oc_ref[0], jnp.uint32)
    w_prev, w_next = stencil.splice_updown(
        o,
        pltpu.bitcast(oup_ref[0, 7:8, :], jnp.uint32),
        pltpu.bitcast(odn_ref[0, 0:1, :], jnp.uint32),
    )
    up, dn, ctr, side = _nbr_planes(o, w_prev, w_next, color)
    ones, twos, fours = _count_planes(up, dn, ctr, side)
    if has_bits:
        b4 = pltpu.bitcast(b4_ref[0], jnp.uint32)
        b8 = pltpu.bitcast(b8_ref[0], jnp.uint32)
    else:
        # unified global-granule keying (see _granule_chain_planes):
        # single-chip tiles consume the same streams as any sharding
        typ = x.shape[0]
        b4, b8 = _granule_chain_planes(
            seed_ref[0], seed_ref[1], r, i * typ, typ, d4, d8,
            x.shape[1], x.shape[1], jnp.int32(0))
    flip = _flip_plane(x, ones, twos, fours, b4, b8)
    new = x ^ flip
    out_ref[0] = pltpu.bitcast(new, jnp.int32)
    if measuring:
        # phase-b fused (m, e): the count planes come from the FINAL
        # other-color values, so e = -Σ_b s_b·(2c-4) covers every bond
        # once (same trick as the int8 measure-in-phase kernels);
        # s = 2·bit-1 and Σ s·(2c-4) = 4·Σ(bit·c) - 8·Σbit - 2·Σc + 4N.
        nblk = jnp.int32(x.shape[0] * x.shape[1] * PACK)
        s_x = _pc_sum(new)
        s_c = (_pc_sum(ones) + 2 * _pc_sum(twos) + 4 * _pc_sum(fours))
        s_xc = (_pc_sum(new & ones) + 2 * _pc_sum(new & twos)
                + 4 * _pc_sum(new & fours))
        m = 2 * (s_x + _pc_sum(o)) - 2 * nblk
        e = -(4 * s_xc - 8 * s_x - 2 * s_c + 4 * nblk)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, m, jnp.where(lane == 1, e, 0))

        if tiled_obs:
            # one exact int32 partial row PER TILE (giant lattices
            # whose totals would wrap int32); caller reduces the ~32
            # tile rows in f32.  The obs block spans all tiles (a
            # (1, n, 128) block can't tile VMEM), written per-row.
            obs_ref[0, pl.ds(i, 1), :] = row
        else:
            @pl.when(i == 0)
            def _():
                obs_ref[0] = jnp.zeros_like(obs_ref[0])

            obs_ref[0] = obs_ref[0] + row


@functools.partial(
    jax.jit,
    static_argnames=("color", "beta", "nrep", "nyp", "half", "measuring",
                     "tiled_obs"),
)
def _metropolis_phase_packed(xw, ow, seeds, *, color, beta, nrep, nyp,
                             half, measuring=False, tiled_obs=False):
    d4 = tuple(chain_digits(float(np.exp(-4.0 * beta))))
    d8 = tuple(chain_digits(float(np.exp(-8.0 * beta))))
    typ = _pick_typ(nyp, half)
    n = nyp // typ
    nb8 = nyp // 8
    kernel = functools.partial(
        _phase_kernel, color=color, d4=d4, d8=d8, has_bits=False,
        measuring=measuring, tiled_obs=tiled_obs,
    )
    out_shape = [jax.ShapeDtypeStruct((nrep, nyp, half), jnp.int32)]
    out_specs = [pl.BlockSpec((1, typ, half), lambda r, i: (r, i, 0),
                              memory_space=pltpu.VMEM)]
    if measuring:
        nobs = n if tiled_obs else 1
        out_shape.append(
            jax.ShapeDtypeStruct((nrep, nobs, 128), jnp.int32))
        out_specs.append(pl.BlockSpec(
            (1, nobs, 128), lambda r, i: (r, 0, 0),
            memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape) if measuring else out_shape[0],
        grid=(nrep, n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, typ, half), lambda r, i: (r, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, typ, half), lambda r, i: (r, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 8, half),
                lambda r, i: (r, (i * typ // 8 - 1 + nb8) % nb8, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, half),
                lambda r, i: (r, ((i + 1) * typ // 8) % nb8, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=tuple(out_specs) if measuring else out_specs[0],
        input_output_aliases={1: 0},
    )(seeds, xw, ow, ow, ow)


def phase_packed_with_bits(xw, ow, b4, b8, *, color, interpret=False):
    """Single packed phase with injected Bernoulli planes — the
    bitwise-testable entry (mirrors packed_phase_reference)."""
    nrep, nyp, half = xw.shape
    typ = _pick_typ(nyp, half)
    n = nyp // typ
    nb8 = nyp // 8
    kernel = functools.partial(
        _phase_kernel, color=color, d4=(), d8=(), has_bits=True
    )
    blk = pl.BlockSpec((1, typ, half), lambda r, i: (r, i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nrep, nyp, half), jnp.int32),
        grid=(nrep, n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk, blk,
            pl.BlockSpec(
                (1, 8, half),
                lambda r, i: (r, (i * typ // 8 - 1 + nb8) % nb8, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, half),
                lambda r, i: (r, ((i + 1) * typ // 8) % nb8, 0),
                memory_space=pltpu.VMEM,
            ),
            blk, blk,
        ],
        out_specs=blk,
        input_output_aliases={1: 0},
        interpret=interpret,
    )(jnp.zeros((2,), jnp.int32), xw, ow, ow, ow, b4, b8)


# ---------------------------------------------------------------------------
# whole-lattice VMEM-resident packed multisweep (ensemble fast path)
# ---------------------------------------------------------------------------

# both packed colors + ~12 live word-plane temporaries must fit VMEM
_MS_VMEM_PLANE_WORDS = 160 << 10


def multisweep_fits_vmem(ny: int, half: int) -> bool:
    return (ny // PACK) * half <= _MS_VMEM_PLANE_WORDS


def _ms_kernel(seed_ref, wa_in, wb_in, wa_ref, wb_ref, obs_ref,
               *, sweeps: int, d4, d8):
    """S full MCS on whole resident packed planes + fused per-sweep
    (m, e).  Grid = (replicas,): the whole lattice is one block, so
    word-row wrap is a plain sublane roll (no halo splicing) and each
    sweep is pure VPU work — zero HBM traffic between sweeps.

    ``seed_ref``: (sweeps, 2, 2) SMEM per-(sweep, phase) seed pairs
    (seeds_from_key of the GLOBAL-t sweep keys) — combined with the
    global-granule chain keying this makes the resident path bitwise
    identical to the streaming phase kernels and the sharded halo
    kernels for the same config."""
    r = pl.program_id(0)
    wa_ref[0] = wa_in[0]
    wb_ref[0] = wb_in[0]
    shape = wa_ref.shape[1:]
    nyp = shape[0]
    nsites = jnp.int32(shape[0] * shape[1] * PACK)

    def phase(x, o, color, s, phase_idx):
        w_prev = pltpu.roll(o, 1, axis=0)
        w_next = pltpu.roll(o, nyp - 1, axis=0)
        up, dn, ctr, side = _nbr_planes(o, w_prev, w_next, color)
        ones, twos, fours = _count_planes(up, dn, ctr, side)
        b4, b8 = _granule_chain_planes(
            seed_ref[s, phase_idx, 0], seed_ref[s, phase_idx, 1],
            r, jnp.int32(0), nyp, d4, d8,
            shape[1], shape[1], jnp.int32(0))
        flip = _flip_plane(x, ones, twos, fours, b4, b8)
        return x ^ flip, ones, twos, fours

    def body(s, _):
        wa = pltpu.bitcast(wa_ref[0], jnp.uint32)
        wb = pltpu.bitcast(wb_ref[0], jnp.uint32)
        wa, _, _, _ = phase(wa, wb, 0, s, 0)
        wb, ones, twos, fours = phase(wb, wa, 1, s, 1)
        wa_ref[0] = pltpu.bitcast(wa, jnp.int32)
        wb_ref[0] = pltpu.bitcast(wb, jnp.int32)
        # fused (m, e) from the phase-b counts (final a values)
        s_x = _pc_sum(wb)
        s_c = (_pc_sum(ones) + 2 * _pc_sum(twos) + 4 * _pc_sum(fours))
        s_xc = (_pc_sum(wb & ones) + 2 * _pc_sum(wb & twos)
                + 4 * _pc_sum(wb & fours))
        m = 2 * (s_x + _pc_sum(wa)) - 2 * nsites
        e = -(4 * s_xc - 8 * s_x - 2 * s_c + 4 * nsites)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, m, jnp.where(lane == 1, e, 0))
        obs_ref[0, pl.ds(s, 1), :] = row
        return 0

    jax.lax.fori_loop(0, sweeps, body, 0)


@functools.partial(
    jax.jit, static_argnames=("sweeps", "beta", "nrep", "nyp", "half")
)
def _multisweep_packed(wa, wb, seeds_t, *, sweeps, beta, nrep, nyp,
                       half):
    d4 = tuple(chain_digits(float(np.exp(-4.0 * beta))))
    d8 = tuple(chain_digits(float(np.exp(-8.0 * beta))))
    kernel = functools.partial(_ms_kernel, sweeps=sweeps, d4=d4, d8=d8)
    plane = pl.BlockSpec((1, nyp, half), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM)
    obs = pl.BlockSpec((1, sweeps, 128), lambda r: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nrep, nyp, half), jnp.int32),
            jax.ShapeDtypeStruct((nrep, nyp, half), jnp.int32),
            jax.ShapeDtypeStruct((nrep, sweeps, 128), jnp.int32),
        ),
        grid=(nrep,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), plane, plane],
        out_specs=(plane, plane, obs),
        input_output_aliases={1: 0, 2: 1},
    )(seeds_t, wa, wb)


def sweep_seed_pairs(key, sweeps: int, t0=0):
    """(sweeps, 2, 2) int32 per-(sweep, phase) hardware-PRNG seed pairs
    for global sweep indices t0+1 .. t0+sweeps — the SAME derivation
    (seeds_from_key of the global-t sweep key) the streaming and
    sharded paths apply one sweep at a time, so a resident multisweep
    invocation reproduces their streams bitwise."""
    from cuda_fortran_mc_simulation_spin_tpu.core import rng as _rng

    ts = jnp.asarray(t0, jnp.int32) + jnp.arange(1, sweeps + 1,
                                                 dtype=jnp.int32)
    keys = jax.vmap(lambda t: _rng.sweep_key(key, t))(ts)
    return jax.vmap(
        lambda k: jnp.stack([seeds_from_key(k, 0), seeds_from_key(k, 1)])
    )(keys)


def multisweep_packed(model, wa, wb, key, sweeps: int, t0=0):
    """Advance ``sweeps`` MCS on packed planes with fused per-sweep
    (m, e) densities of shape (R, sweeps) — the packed analog of
    ops/ising2d_multisweep for VMEM-resident ensemble shapes.

    ``key`` is the SAMPLE-level key and ``t0`` the global sweep index
    already completed: sweeps run at t = t0+1 .. t0+sweeps with the
    unified global-t keying (bitwise identical to the streaming phase
    kernels and the sharded runners for the same config)."""
    nrep, nyp, half = wa.shape
    if not multisweep_fits_vmem(nyp * PACK, half):
        raise ValueError(
            f"packed lattice {nyp * PACK}x{2 * half} exceeds the "
            "VMEM-resident multisweep budget; use sweep_measure_packed"
        )
    wa, wb, obs = _multisweep_packed(
        wa, wb, sweep_seed_pairs(key, sweeps, t0), sweeps=sweeps,
        beta=float(model.beta), nrep=nrep, nyp=nyp, half=half,
    )
    n_inv = jnp.float32(1.0 / model.nsites)
    return wa, wb, {
        "m": obs[:, :, 0].astype(jnp.float32) * n_inv,
        "e": obs[:, :, 1].astype(jnp.float32) * n_inv,
    }


# ---------------------------------------------------------------------------
# halo-aware packed phase for the domain-sharded (shard_map) path
# ---------------------------------------------------------------------------

def packed_sharded_phase_reference(xw, ow, color: int, b4, b8,
                                   hup01, hdn01,
                                   halo_lf=None, halo_rt=None):
    """Pure-jnp packed phase on a (y[, x])-sharded local block: instead
    of periodic word-row wrap, the first word row's up-carry comes from
    ``hup01`` and the last word row's down-carry from ``hdn01``
    ((1, half) int32 0/1 planes of the exchanged boundary sites).
    ``halo_lf``/``halo_rt`` ((Lp, 1) packed word columns): x-sharded
    boundary columns replacing the lane-roll wrap."""
    xw = xw.astype(jnp.uint32)
    ow = ow.astype(jnp.uint32)
    syn_up = hup01.astype(jnp.uint32) << jnp.uint32(31)
    syn_dn = hdn01.astype(jnp.uint32)
    w_prev = jnp.concatenate([syn_up, ow[:-1]], axis=0)
    w_next = jnp.concatenate([ow[1:], syn_dn], axis=0)
    one = jnp.uint32(1)
    up = (ow << one) | (w_prev >> jnp.uint32(31))
    dn = (ow >> one) | (w_next << jnp.uint32(31))
    if halo_lf is not None:
        minus = jnp.concatenate(
            [halo_lf.astype(jnp.uint32), ow[:, :-1]], axis=1)
        plus = jnp.concatenate(
            [ow[:, 1:], halo_rt.astype(jnp.uint32)], axis=1)
    else:
        minus = jnp.roll(ow, 1, axis=1)
        plus = jnp.roll(ow, -1, axis=1)
    odd = jnp.uint32(_ODD_BITS)
    even = jnp.uint32(_EVEN_BITS)
    if color == 0:
        side = (plus & odd) | (minus & even)
    else:
        side = (minus & odd) | (plus & even)
    ones, twos, fours = _count_planes(up, dn, ow, side)
    flip = _flip_plane(xw, ones, twos, fours,
                       b4.astype(jnp.uint32), b8.astype(jnp.uint32))
    return (xw ^ flip).astype(jnp.int32)


def _sharded_phase_kernel(seed_ref, offs_ref, x_ref, oc_ref, oup_ref,
                          odn_ref, hup_ref, hdn_ref, *rest,
                          color: int, d4, d8, typ: int, nblk: int,
                          has_bits: bool, has_cols: bool = False,
                          measuring: bool = False,
                          w_total: int | None = None):
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    if has_cols:
        hlf_ref = refs.pop(0)
        hrt_ref = refs.pop(0)
    if has_bits:
        b4_ref, b8_ref, out_ref = refs
    else:
        (out_ref,) = refs
    r = pl.program_id(0)
    i = pl.program_id(1)
    x = pltpu.bitcast(x_ref[0], jnp.uint32)
    o = pltpu.bitcast(oc_ref[0], jnp.uint32)
    # word row above / below: in-shard from the 8-word-row neighbor
    # blocks; at the shard edges a synthetic word carrying the exchanged
    # boundary bit (up-carry reads bit 31, down-carry reads bit 0)
    syn_up = pltpu.bitcast(hup_ref[0, 7:8, :], jnp.uint32) << jnp.uint32(31)
    syn_dn = pltpu.bitcast(hdn_ref[0, 0:1, :], jnp.uint32)
    up_row = jnp.where(i == 0, syn_up,
                       pltpu.bitcast(oup_ref[0, 7:8, :], jnp.uint32))
    dn_row = jnp.where(i == nblk - 1, syn_dn,
                       pltpu.bitcast(odn_ref[0, 0:1, :], jnp.uint32))
    w_prev, w_next = stencil.splice_updown(o, up_row, dn_row)
    if has_cols:
        # x-sharded block: the lane rolls wrap locally — replace the
        # edge lanes with the exchanged boundary word-columns (packed
        # words carry no sub-lane structure along x, so the column
        # halo needs no bit extraction, unlike the y boundary)
        one = jnp.uint32(1)
        up = (o << one) | (w_prev >> jnp.uint32(31))
        dn = (o >> one) | (w_next << jnp.uint32(31))
        minus = pltpu.roll(o, 1, axis=1)
        plus = pltpu.roll(o, o.shape[1] - 1, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, o.shape, 1)
        minus = jnp.where(
            lane == 0,
            pltpu.bitcast(hlf_ref[0][:, 0:1], jnp.uint32), minus)
        plus = jnp.where(
            lane == o.shape[1] - 1,
            pltpu.bitcast(hrt_ref[0][:, 0:1], jnp.uint32), plus)
        odd = jnp.uint32(_ODD_BITS)
        even = jnp.uint32(_EVEN_BITS)
        if color == 0:
            side = (plus & odd) | (minus & even)
        else:
            side = (minus & odd) | (plus & even)
        ctr = o
    else:
        up, dn, ctr, side = _nbr_planes(o, w_prev, w_next, color)
    ones, twos, fours = _count_planes(up, dn, ctr, side)
    if has_bits:
        b4 = pltpu.bitcast(b4_ref[0], jnp.uint32)
        b8 = pltpu.bitcast(b8_ref[0], jnp.uint32)
    else:
        # unified global-granule keying (_granule_chain_planes):
        # granules never straddle tile or shard boundaries (typ and
        # local nyp are multiples of 8), and x-shards slice their lane
        # window out of redundantly generated full-width rows — so
        # trajectories are invariant to the mesh shape, the tile size,
        # x-axis splits, AND equal to the routed single-chip engines
        rep_g = offs_ref[0] + r
        col0 = offs_ref[2] if has_cols else jnp.int32(0)
        b4, b8 = _granule_chain_planes(
            seed_ref[0], seed_ref[1], rep_g, offs_ref[1] + i * typ,
            typ, d4, d8, x.shape[1], w_total, col0)
    flip = _flip_plane(x, ones, twos, fours, b4, b8)
    new = x ^ flip
    out_ref[0] = pltpu.bitcast(new, jnp.int32)
    if measuring:
        nblk_sites = jnp.int32(x.shape[0] * x.shape[1] * PACK)
        s_x = _pc_sum(new)
        s_c = (_pc_sum(ones) + 2 * _pc_sum(twos) + 4 * _pc_sum(fours))
        s_xc = (_pc_sum(new & ones) + 2 * _pc_sum(new & twos)
                + 4 * _pc_sum(new & fours))
        m = 2 * (s_x + _pc_sum(o)) - 2 * nblk_sites
        e = -(4 * s_xc - 8 * s_x - 2 * s_c + 4 * nblk_sites)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, m, jnp.where(lane == 1, e, 0))

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def _interpret_chain_planes(seeds, rep0, wrow0, col0, nrep, nyp, half,
                            d4, d8, w_total=None):
    """CPU-interpret fallback for the Bernoulli planes: threefry chains
    with the same granule structure (and invariance properties) as the
    unified hardware scheme — ops/multispin_rng.granule_planes_interpret
    (different bits than the chip, same statistics)."""
    w_total = half if w_total is None else w_total
    b4, b8 = multispin_rng.granule_planes_interpret(
        seeds, rep0, wrow0, col0, nrep, nyp, half, w_total,
        lambda shape, gen: (_bern_plane(shape, tuple(d4), gen),
                            _bern_plane(shape, tuple(d8), gen)))
    return b4.astype(jnp.int32), b8.astype(jnp.int32)


def sharded_phase_packed(xw, ow, hup01, hdn01, seeds, offs, *,
                         color: int, beta: float,
                         halo_lf=None, halo_rt=None,
                         b4=None, b8=None, interpret: bool = False,
                         measuring: bool = False,
                         w_total: int | None = None):
    """One packed checkerboard phase of a (y[, x])-sharded local block.

    xw, ow: (R, Lp, half) packed local color blocks (Lp = L_rows/32);
    hup01/hdn01: (R, 1, half) int32 0/1 exchanged boundary sites of the
    other color (halo.exchange_halo_rows_packed); offs: (rep0, wrow0)
    GLOBAL offsets in (replica, word-row) units.  ``measuring`` (phase 1
    only) additionally returns per-shard (m, e) partial sums (R,) —
    caller psums over the mesh's spatial axes.

    ``halo_lf``/``halo_rt`` ((R, Lp, 1) packed word COLUMNS of the
    other color, with offs extended to (rep0, wrow0, lane0)): the
    x-sharded variant — exchanged boundary columns are whole packed
    words (bits run along y, which x-sharding never cuts), so the
    column halo needs no bit extraction."""
    nrep, nyp, half = xw.shape
    has_cols = halo_lf is not None
    w_total = half if w_total is None else w_total
    d4 = tuple(chain_digits(float(np.exp(-4.0 * beta))))
    d8 = tuple(chain_digits(float(np.exp(-8.0 * beta))))
    typ = _pick_typ(nyp, half)
    n = nyp // typ
    nb8 = nyp // 8
    if interpret and b4 is None:
        b4, b8 = _interpret_chain_planes(
            seeds, offs[0], offs[1],
            offs[2] if has_cols else jnp.int32(0),
            nrep, nyp, half, d4, d8, w_total=w_total)
    has_bits = b4 is not None
    # 8-word-row alignment: exchanged planes sit where the in-array
    # neighbor blocks place theirs (up -> row 7, dn -> row 0)
    hup = jnp.pad(hup01, ((0, 0), (7, 0), (0, 0)))
    hdn = jnp.pad(hdn01, ((0, 0), (0, 7), (0, 0)))
    kernel = functools.partial(
        _sharded_phase_kernel, color=color, d4=d4, d8=d8, typ=typ,
        nblk=n, has_bits=has_bits, has_cols=has_cols,
        measuring=measuring, w_total=w_total,
    )
    blk = pl.BlockSpec((1, typ, half), lambda r, i: (r, i, 0),
                       memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        blk, blk,
        pl.BlockSpec(
            (1, 8, half),
            lambda r, i: (r, (i * typ // 8 - 1 + nb8) % nb8, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 8, half),
            lambda r, i: (r, ((i + 1) * typ // 8) % nb8, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((1, 8, half), lambda r, i: (r, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, half), lambda r, i: (r, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [seeds, offs, xw, ow, ow, ow, hup, hdn]
    if has_cols:
        # 128-lane alignment: exchanged word columns ride in lane 0
        col_spec = pl.BlockSpec((1, typ, 128), lambda r, i: (r, i, 0),
                                memory_space=pltpu.VMEM)
        in_specs += [col_spec, col_spec]
        operands += [
            jnp.pad(halo_lf, ((0, 0), (0, 0), (0, 127))),
            jnp.pad(halo_rt, ((0, 0), (0, 0), (0, 127))),
        ]
    if has_bits:
        in_specs += [blk, blk]
        operands += [b4, b8]
    out_shape = [jax.ShapeDtypeStruct((nrep, nyp, half), jnp.int32)]
    out_specs = [blk]
    if measuring:
        out_shape.append(jax.ShapeDtypeStruct((nrep, 1, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 1, 128),
                                      lambda r, i: (r, 0, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape) if measuring else out_shape[0],
        grid=(nrep, n),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if measuring else out_specs[0],
        input_output_aliases={2: 0},
        interpret=interpret,
    )(*operands)
    if measuring:
        state_out, obs = res
        return state_out, obs[:, 0, 0], obs[:, 0, 1]
    return res


def shard_packed_ok(local_shape: tuple[int, ...]) -> bool:
    """Local packed (R, Lp, half) word-block shape is tileable."""
    if len(local_shape) != 3:
        return False
    _, nyp, half = local_shape
    return half % 128 == 0 and nyp % 8 == 0


def sweep_measure_packed(model, wa, wb, key):
    """One MCS + fused per-sweep (m, e) densities from the phase-b
    kernel (the packed analog of the int8 measure-in-phase path).

    Lattices whose totals would wrap the int32 accumulators (nsites >
    OBS_INT32_MAX_SITES, e.g. 32768²) emit one exact int32 partial per
    tile instead and reduce the ~nyp/32 tile rows in f32 — the
    densities keep ≲1e-7 relative accuracy and the packed engine keeps
    serving giant lattices instead of dropping to the int8 path."""
    nrep, nyp, half = wa.shape
    tiled = model.nsites > OBS_INT32_MAX_SITES
    if tiled and _pick_typ(nyp, half) * PACK * half > (2 ** 31 - 1) // 2:
        # |e tile partial| ≤ 2·tile_sites must stay exact
        raise ValueError(
            "single tile overflows the int32 per-tile observable "
            "partials; measure with a separate reduction pass")
    kw = dict(beta=float(model.beta), nrep=nrep, nyp=nyp, half=half)
    wa = _metropolis_phase_packed(wa, wb, seeds_from_key(key, 0),
                                  color=0, **kw)
    wb, obs = _metropolis_phase_packed(wb, wa, seeds_from_key(key, 1),
                                       color=1, measuring=True,
                                       tiled_obs=tiled, **kw)
    n_inv = jnp.float32(1.0 / model.nsites)
    if tiled:
        m = jnp.sum(obs[:, :, 0].astype(jnp.float32), axis=1) * n_inv
        e = jnp.sum(obs[:, :, 1].astype(jnp.float32), axis=1) * n_inv
    else:
        m = obs[:, 0, 0].astype(jnp.float32) * n_inv
        e = obs[:, 0, 1].astype(jnp.float32) * n_inv
    return wa, wb, {"m": m, "e": e}


def sweep_packed(model, wa, wb, key):
    """One full MCS on packed color planes (R, ny//32, half) int32."""
    nrep, nyp, half = wa.shape
    kw = dict(beta=float(model.beta), nrep=nrep, nyp=nyp, half=half)
    wa = _metropolis_phase_packed(wa, wb, seeds_from_key(key, 0),
                                  color=0, **kw)
    wb = _metropolis_phase_packed(wb, wa, seeds_from_key(key, 1),
                                  color=1, **kw)
    return wa, wb


def pack_state(state: CheckerboardState):
    a, b = state
    batched = a.ndim == 3
    if not batched:
        a, b = a[None], b[None]
    return pack_color(a), pack_color(b), batched


def unpack_state(wa, wb, batched: bool) -> CheckerboardState:
    a, b = unpack_color(wa), unpack_color(wb)
    if not batched:
        a, b = a[0], b[0]
    return CheckerboardState(a, b)
