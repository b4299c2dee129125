"""Bit-sliced packed q=6 clock engine for the HELICAL (odd-nx)
geometry — the reference's committed 501×500 clock workload
(/root/reference/app/clock_gpu_relaxation.f90:6-13,
/root/reference/src/clock_gpu_m.f90:49-79) and its replica variant
(/root/reference/src/clock_gpu_multi_m.f90).

Combines the two proven engines:

- the flat even/odd parity split of ops/helical_multispin.py — odd nx
  two-colors the helical lattice by INDEX parity, giving dense color
  vectors of length M = nall/2 whose neighbor maps are four constant
  modular offsets realized as packed funnel shifts (no parity
  masking);
- the CRT bit-sliced q=6 state of ops/clock_multispin.py — Z₆ ≅
  Z₂ × Z₃ stores a color as THREE packed bit planes (σ = c mod 2;
  τ = c mod 3 one-hot-ish in two planes); the whole Metropolis
  decision (bond energies, 4:3 counters, thermometer proposal, exact
  gated Bernoulli-chain acceptance) is the boolean algebra of
  clock_multispin._decide, reused verbatim.

Per phase: 12 modular bit-shifts (4 offsets × 3 planes) feed _decide;
the 501×500 state is 6 planes × 16 KB — everything lives in one
VMEM-resident multisweep kernel per replica with fused per-sweep
(m, my, e): m and e are exact int32 half-sums as in clock_multispin
(2·cos values are integers), and my is an exact integer multiple of
√3/2 (sin(2πc/6) ∈ {0, ±√3/2}) counted from the (σ, τ) planes.

RNG consumption differs from the int8/masked engines (bit chains vs
f32 compares), so trajectories match statistically, not bitwise —
the standard packed-engine contract.  Validation ladder mirrors
tests/test_clock_multispin.py + tests/test_helical_multispin.py:
packed phase vs a per-site integer oracle on the flat color vectors
(bitwise, injected planes), Pallas kernel (interpret/Mosaic) vs the
jnp packed oracle, absorbing states, fused obs vs direct reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.ops.clock_multispin import (
    OBS_INT32_MAX_SITES,
    _decide,
    accept_digit_planes,
    draw_planes,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.helical_multispin import (
    LANES,
    _jnp_roll,
    _pltpu_roll,
    _shift_mod_impl,
    grid_rows,
    helical_offsets,
    merge_flat,
    pack_flat,
    split_flat,
    unpack_flat,
    valid_mask as _valid_mask_rows,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    seeds_from_key,
)

# 2*cos(2*pi*d/6) for d = 0..5 — exact integers (flat oracle)
_TWOCOS = np.array([2, 1, -1, -2, -1, 1], dtype=np.int32)


# ---------------------------------------------------------------------------
# pack / unpack: flat int8 states (0..5) <-> three (rows, 128) planes
# ---------------------------------------------------------------------------

def _pack_bits_flat(bits: jax.Array, m: int) -> jax.Array:
    """(..., m) 0/1 ints -> (..., rows, 128) int32 words — the same
    word layout as the Ising engine's :func:`helical_multispin
    .pack_flat` ((x > 0) packing covers the 0/1 domain)."""
    return pack_flat(bits, m)


def _unpack_bits_flat(w: jax.Array, m: int) -> jax.Array:
    """Inverse of :func:`_pack_bits_flat` (to 0/1 int32, pad dropped):
    helical_multispin.unpack_flat's ±1 output mapped back to bits."""
    return (unpack_flat(w, m).astype(jnp.int32) + 1) >> 1


def pack_clock_flat(flat: jax.Array, m: int):
    """(..., m) int8 clock states 0..5 -> (σ, t0, t1) packed planes."""
    c = flat.astype(jnp.int32)
    tau = c % 3
    return (
        _pack_bits_flat(c & 1, m),
        _pack_bits_flat((tau == 1).astype(jnp.int32), m),
        _pack_bits_flat((tau == 2).astype(jnp.int32), m),
    )


def unpack_clock_flat(s, t0, t1, m: int) -> jax.Array:
    """Inverse of :func:`pack_clock_flat` (CRT: c = (3σ + 4τ) mod 6)."""
    sb = _unpack_bits_flat(s, m)
    tau = _unpack_bits_flat(t0, m) + 2 * _unpack_bits_flat(t1, m)
    return ((3 * sb + 4 * tau) % 6).astype(jnp.int8)


# split_flat / merge_flat are the Ising helical engine's (re-exported
# from helical_multispin in the import block above): the even/odd
# index-parity color split is layout, not physics.


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def flat_phase6_reference(x_flat, o_flat, offs, r_sites, chain5):
    """Per-site integer Metropolis on flat color vectors — the
    int-domain oracle.  ``r_sites``: (m,) proposal offsets in [1, 5];
    ``chain5``: 5 boolean (m,) chain-pass vectors (B₁, B₂, B₄, B₈a,
    B₈b)."""
    x = x_flat.astype(jnp.int32)
    o = o_flat.astype(jnp.int32)
    cand = (x + r_sites.astype(jnp.int32)) % 6
    tc = jnp.asarray(_TWOCOS)
    d_cur = 0
    d_new = 0
    for d in offs:
        nbr = jnp.roll(o, -d)
        d_cur = d_cur + tc[(x - nbr) % 6]
        d_new = d_new + tc[(cand - nbr) % 6]
    big_d = d_cur - d_new            # = 2·ΔE ∈ [-16, 16]
    mm = jnp.clip(big_d, 0, None)
    gates = [(mm >> 0) & 1, (mm >> 1) & 1, (mm >> 2) & 1,
             ((mm >> 3) & 1) | ((mm >> 4) & 1), (mm >> 4) & 1]
    passes = jnp.ones_like(x, dtype=bool)
    for g, b in zip(gates, chain5):
        passes = passes & ((g == 0) | b)
    accept = (big_d <= 0) | passes
    return jnp.where(accept, cand, x).astype(jnp.int8)


def _nbr_tuples(oplanes, offs, m: int, roll):
    os_, ot0, ot1 = [p.astype(jnp.uint32) for p in oplanes]
    ns = tuple(_shift_mod_impl(os_, d, m, roll) for d in offs)
    nt0 = tuple(_shift_mod_impl(ot0, d, m, roll) for d in offs)
    nt1 = tuple(_shift_mod_impl(ot1, d, m, roll) for d in offs)
    return ns, nt0, nt1


def packed_helical_phase6_reference(xplanes, oplanes, offs, planes8,
                                    m: int):
    """Pure-jnp packed phase (oracle): neighbor tuples via shift_mod
    with jnp.roll, decision via clock_multispin._decide."""
    xs, xt0, xt1 = [p.astype(jnp.uint32) for p in xplanes]
    ns, nt0, nt1 = _nbr_tuples(oplanes, offs, m, _jnp_roll)
    planes8 = tuple(p.astype(jnp.uint32) for p in planes8)
    s, t0, t1, _ = _decide(xs, xt0, xt1, ns, nt0, nt1, planes8)
    return tuple(p.astype(jnp.int32) for p in (s, t0, t1))


# ---------------------------------------------------------------------------
# Pallas phase with injected planes (bitwise-testable, interpret-able)
# ---------------------------------------------------------------------------

def _phase_bits_kernel(xs_ref, xt0_ref, xt1_ref,
                       os_ref, ot0_ref, ot1_ref,
                       *rest, offs, m: int):
    inject = rest[:8]
    s_out, t0_out, t1_out = rest[8:]
    xs = pltpu.bitcast(xs_ref[0], jnp.uint32)
    xt0 = pltpu.bitcast(xt0_ref[0], jnp.uint32)
    xt1 = pltpu.bitcast(xt1_ref[0], jnp.uint32)
    opl = (os_ref[0], ot0_ref[0], ot1_ref[0])
    ns, nt0, nt1 = _nbr_tuples(opl, offs, m, _pltpu_roll)
    planes8 = tuple(
        pltpu.bitcast(ref[0], jnp.uint32) for ref in inject
    )
    s, t0, t1, _ = _decide(xs, xt0, xt1, ns, nt0, nt1, planes8)
    s_out[0] = pltpu.bitcast(s, jnp.int32)
    t0_out[0] = pltpu.bitcast(t0, jnp.int32)
    t1_out[0] = pltpu.bitcast(t1, jnp.int32)


def phase_packed_with_bits(xplanes, oplanes, planes8, *, offs, m: int,
                           interpret: bool = False):
    """(R, rows, 128) packed phase with injected (ρ, rt1, rt2, B…)
    planes — bitwise testable vs packed_helical_phase6_reference."""
    nrep, rows, lanes = xplanes[0].shape
    kernel = functools.partial(_phase_bits_kernel, offs=tuple(offs),
                               m=m)
    blk = pl.BlockSpec((1, rows, lanes), lambda r: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    plane = jax.ShapeDtypeStruct((nrep, rows, lanes), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=(plane,) * 3,
        grid=(nrep,),
        in_specs=[blk] * 14,
        out_specs=(blk,) * 3,
        input_output_aliases={0: 0, 1: 1, 2: 2},
        interpret=interpret,
    )(*xplanes, *oplanes, *planes8)


# ---------------------------------------------------------------------------
# VMEM-resident multisweep kernel with fused (m, my, e)
# ---------------------------------------------------------------------------

# the Ising engine's per-word valid-site mask (pads hold garbage)
_valid_mask = _valid_mask_rows


def _pc(u):
    return jnp.sum(jax.lax.population_count(u.astype(jnp.uint32))
                   .astype(jnp.int32))


def _m2_my2_color(s, t0, t1, vmask, m):
    """(2·Σcos, Σsin/(√3/2)) of one color, pads masked.

    Per site 2cos(2πc/6) = (−1)^σ(3[τ=0] − 1) and sin(2πc/6) =
    (√3/2)·(+1 for (σ,τ) ∈ {(1,1),(0,2)}; −1 for {(0,1),(1,2)}; 0 at
    τ=0)."""
    zz = ~(t0 | t1) & vmask
    m2 = (3 * _pc(zz) - 6 * _pc(s & zz) + 2 * _pc(s & vmask)
          - jnp.int32(m))
    plus = ((s & t0) | (~s & t1)) & vmask
    minus = ((~s & t0) | (s & t1)) & vmask
    my2 = _pc(plus) - _pc(minus)
    return m2, my2


def _ms_kernel(seed_ref, as_in, at0_in, at1_in, bs_in, bt0_in, bt1_in,
               as_ref, at0_ref, at1_ref, bs_ref, bt0_ref, bt1_ref,
               obs_ref, *, sweeps: int, digit5, offs_a, offs_b,
               m: int, rows: int):
    """S helical clock MCS on resident packed plane triplets + fused
    per-sweep (2m, my2, 2e) int32 sums."""
    r = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0],
                    seed_ref[1] ^ (r * jnp.int32(0x3C6EF35F)))
    as_ref[0] = as_in[0]
    at0_ref[0] = at0_in[0]
    at1_ref[0] = at1_in[0]
    bs_ref[0] = bs_in[0]
    bt0_ref[0] = bt0_in[0]
    bt1_ref[0] = bt1_in[0]
    shape = (rows, LANES)
    vmask = _valid_mask(rows, m)

    def gen():
        return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)

    def body(sw, _):
        a3 = tuple(pltpu.bitcast(ref[0], jnp.uint32)
                   for ref in (as_ref, at0_ref, at1_ref))
        b3 = tuple(pltpu.bitcast(ref[0], jnp.uint32)
                   for ref in (bs_ref, bt0_ref, bt1_ref))
        ns, nt0, nt1 = _nbr_tuples(b3, offs_a, m, _pltpu_roll)
        planes8 = draw_planes(shape, gen, digit5)
        a3 = _decide(*a3, ns, nt0, nt1, planes8)[:3]
        as_ref[0] = pltpu.bitcast(a3[0], jnp.int32)
        at0_ref[0] = pltpu.bitcast(a3[1], jnp.int32)
        at1_ref[0] = pltpu.bitcast(a3[2], jnp.int32)
        ns, nt0, nt1 = _nbr_tuples(a3, offs_b, m, _pltpu_roll)
        planes8 = draw_planes(shape, gen, digit5)
        bs, bt0, bt1, fin = _decide(*b3, ns, nt0, nt1, planes8)
        bs_ref[0] = pltpu.bitcast(bs, jnp.int32)
        bt0_ref[0] = pltpu.bitcast(bt0, jnp.int32)
        bt1_ref[0] = pltpu.bitcast(bt1, jnp.int32)
        # fused obs: every a-b bond has exactly one odd endpoint, so
        # the 4 bonds of every b site vs the FINAL a values cover each
        # lattice bond once; 2e = 4M + Σx − 3Σw, pads masked
        m2a, my2a = _m2_my2_color(a3[0], a3[1], a3[2], vmask, m)
        m2b, my2b = _m2_my2_color(bs, bt0, bt1, vmask, m)
        x_fin, w_fin = fin
        s_x = sum(_pc(x & vmask) for x in x_fin)
        s_w = sum(_pc(w & vmask) for w in w_fin)
        e2 = 4 * jnp.int32(m) + s_x - 3 * s_w
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(
            lane == 0, m2a + m2b,
            jnp.where(lane == 1, e2,
                      jnp.where(lane == 2, my2a + my2b, 0)),
        )
        obs_ref[0, pl.ds(sw, 1), :] = row
        return 0

    jax.lax.fori_loop(0, sweeps, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("sweeps", "beta", "nx", "m", "nrep", "rows"),
)
def _multisweep(wa3, wb3, seeds, *, sweeps, beta, nx, m, nrep, rows):
    digit5 = accept_digit_planes(beta)
    offs_a, offs_b = helical_offsets(nx)
    kernel = functools.partial(
        _ms_kernel, sweeps=sweeps, digit5=digit5,
        offs_a=offs_a, offs_b=offs_b, m=m, rows=rows,
    )
    plane = pl.BlockSpec((1, rows, LANES), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM)
    obs = pl.BlockSpec((1, sweeps, 128), lambda r: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    pshape = jax.ShapeDtypeStruct((nrep, rows, LANES), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=(pshape,) * 6 + (
            jax.ShapeDtypeStruct((nrep, sweeps, 128), jnp.int32),
        ),
        grid=(nrep,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [plane] * 6,
        out_specs=(plane,) * 6 + (obs,),
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5},
    )(seeds, *wa3, *wb3)


def obs_packed6_reference(wa3, wb3, nx: int, m: int):
    """(2m, 2e, my2) int32 sums from FINAL packed plane triplets at
    jnp level — the state-based equivalent of the kernel's fused obs
    (the kernel's candidate-aware ``fin`` planes reduce to exactly
    these counts at the final values): validates the m/my/e bit
    formulas on CPU and pins the kernel's sums on chip."""
    rows = wa3[0].shape[-2]
    vmask = _valid_mask(rows, m)
    a3 = tuple(p.astype(jnp.uint32) for p in wa3)
    b3 = tuple(p.astype(jnp.uint32) for p in wb3)
    m2a, my2a = _m2_my2_color(a3[0], a3[1], a3[2], vmask, m)
    m2b, my2b = _m2_my2_color(b3[0], b3[1], b3[2], vmask, m)
    offs_b = helical_offsets(nx)[1]
    ns, nt0, nt1 = _nbr_tuples(a3, offs_b, m, _jnp_roll)
    s_x = jnp.int32(0)
    s_w = jnp.int32(0)
    for k in range(4):
        x = b3[0] ^ ns[k]
        d0 = b3[1] ^ nt0[k]
        d1 = b3[2] ^ nt1[k]
        eq = ~(d0 | d1)
        s_x = s_x + _pc(x & vmask)
        s_w = s_w + _pc((x ^ eq) & vmask)
    e2 = 4 * jnp.int32(m) + s_x - 3 * s_w
    return m2a + m2b, e2, my2a + my2b


# 6 resident planes + ~20 temporaries of (rows, 128) words
_VMEM_ROW_BUDGET = 512

_SQRT3_2 = float(np.sqrt(3.0) / 2.0)


def fits(model) -> bool:
    """Shape/parameter gate for the packed helical clock engine."""
    m = model.nsites // 2
    return (getattr(model, "q", None) == 6
            and model.nx % 2 == 1
            and model.nsites % 2 == 0
            and model.nsites <= OBS_INT32_MAX_SITES
            and grid_rows(m) <= _VMEM_ROW_BUDGET)


def multisweep(model, wa3, wb3, key, sweeps: int):
    """Advance ``sweeps`` helical clock MCS on packed plane triplets
    ((s, t0, t1) each (R, rows, 128)); returns (wa3, wb3,
    {m, my, e}) per-sweep densities."""
    m = model.nsites // 2
    nrep, rows, _ = wa3[0].shape
    out = _multisweep(
        tuple(wa3), tuple(wb3), seeds_from_key(key, 0), sweeps=sweeps,
        beta=float(model.beta), nx=model.nx, m=m, nrep=nrep, rows=rows,
    )
    wa3, wb3, obs = out[:3], out[3:6], out[6]
    half_n_inv = jnp.float32(0.5 / model.nsites)
    return wa3, wb3, {
        "m": obs[:, :, 0].astype(jnp.float32) * half_n_inv,
        "e": obs[:, :, 1].astype(jnp.float32) * half_n_inv,
        "my": obs[:, :, 2].astype(jnp.float32)
              * jnp.float32(_SQRT3_2 / model.nsites),
    }
