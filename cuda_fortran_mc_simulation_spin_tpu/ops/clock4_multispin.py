"""Bit-sliced (multispin-coded) checkerboard Metropolis for the q=4
clock model — the 2-bit-digit companion of the q=6 engine
(ops/clock_multispin.py), closing that module's documented deferral
("q=4 would take a 2-bit digit representation the same way").

The reference supports runtime q ≤ 50 through its typed clock engine
(/root/reference/src/clock_gpu_m.f90:10,49-79); q=6 is the only
committed production q, so this engine is capability beyond the
reference's committed workloads: it gives q=4 (the Ashkin-Teller /
vector-Potts point, where the clock model factorizes into two Ising
models) the same decode-free packed treatment.

This module carries ONLY the q=4 bond algebra; every piece of engine
scaffolding (streaming/sharded Pallas kernels, oracles, interpret
streams, sweep and padded wrappers) is the shared plane-count-generic
machinery in ops/clock_planes, bound here through :data:`SPEC`.

Representation.  A q=4 state is its two binary digits, stored as two
packed bit planes per checkerboard color (32 sites/word along y, the
ising2d_multispin layout):

  c = 2·b1 + b0,   b0 = c mod 2,  b1 = c div 2.

The bond energy is exactly integer: with a = b0⊕n0 (difference parity)
and z = b1⊕n1,

  cos(2π(c−n)/4) = (1 − a)·(1 − 2z)  ∈ {+1, 0, −1},

so each bond contributes one of {pos, zero, neg} read off two XORs:
pos = ¬a∧¬z, neg = ¬a∧z.  ΔE for a proposed move is

  ΔE = (n_pos + n_neg') − (n_neg + n_pos')  ∈ [−8, 8]

from FOUR 4:3 counters combined by one ripple add per side (cheaper
than q=6's scaled sums — no ×3 weighting).

Proposal.  r ∈ {1,2,3} as the reference's ceiling(u·(q−1))
(/root/reference/src/clock/clock_tableall_gpu_m.f90:142-143), realized
as a 12-bit bit-sliced thermometer with thresholds round(k·4096/3):
category probabilities {1365, 1366, 1365}/4096 satisfy P(r) = P(4−r)
exactly, so Metropolis detailed balance is exact and only the proposal
dynamics deviate (≤ 3e-4 relative) from the f32-uniform engines.
Candidate digits are a mod-4 add: b0' = b0⊕r0, b1' = b1⊕r1⊕(b0∧r0).

Acceptance min(1, e^(−βΔE)) decomposes EXACTLY over the binary digits
of m = ΔE ∈ [1, 8]:

  e^(−βm) = p1^(m0) · p2^(m1) · p4^(m2) · p8^(m3),   p_k = e^(−kβ)

— four independent Bernoulli-chain planes ANDed where the digit gates
are set (one fewer chain than q=6, whose ΔE is half-integer).

RNG consumption differs from the int8 engine (bit chains vs one f32
compare/site): trajectories match statistically, not bitwise — the
ising2d_multispin contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cuda_fortran_mc_simulation_spin_tpu.ops import clock_planes
from cuda_fortran_mc_simulation_spin_tpu.ops.clock_planes import (
    PadSpec,
    _chain_len,
    _fa,
    _ha,
    _lt_multi,
    _nbr_planes_jnp,
    _packbits,
    _unpackbits,
    pad_mask,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_multispin import (
    _bern_plane,
    _count_planes,
    _pc_sum,
    chain_digits,
)

# fused (m, e) partials accumulate in int32; |e| ≤ 2N
OBS_INT32_MAX_SITES = (2 ** 31 - 1) // 2

# proposal thermometer: 12-bit thresholds round(k·4096/3); rounded
# category sizes {1365, 1366, 1365} are symmetric around r=2, so
# P(r) = P(4−r) holds exactly and detailed balance is exact
_PROP_BITS = 12
_PROP_T = tuple(int(round(k * 4096 / 3)) for k in (1, 2))


def accept_digit_planes4(beta: float):
    """Digit tuples for the four gated chains (p₁, p₂, p₄, p₈),
    p_k = e^(−kβ) (integer ΔE — no half levels at q=4)."""
    out = []
    for k in (1.0, 2.0, 4.0, 8.0):
        p = float(np.exp(-k * beta))
        out.append(tuple(chain_digits(p, _chain_len(p))))
    return tuple(out)


# ---------------------------------------------------------------------------
# pack / unpack: int8 states (0..3) <-> two bit planes (b0, b1)
# ---------------------------------------------------------------------------

def pack_clock4_color(plane: jax.Array):
    """(..., ny, half) int8 q=4 states -> (b0, b1) packed int32 planes
    (..., ny//32, half)."""
    c = plane.astype(jnp.int32)
    return (_packbits((c & 1).astype(jnp.int8)),
            _packbits(((c >> 1) & 1).astype(jnp.int8)))


def unpack_clock4_color(b0: jax.Array, b1: jax.Array):
    """Inverse of :func:`pack_clock4_color` (to int8 states 0..3)."""
    return (_unpackbits(b0) + 2 * _unpackbits(b1)).astype(jnp.int8)


def draw_planes4(shape, gen, digit4):
    """(r0, r1, B₁, B₂, B₄, B₈) planes from fresh random words: the
    proposal thermometer (shared 12-bit uniform) and the four
    acceptance chains (independent uniforms)."""
    prop = [gen() for _ in range(_PROP_BITS)]
    c1, c2 = _lt_multi(prop, _PROP_T, _PROP_BITS)
    # r = 3 − (c1 + c2) ∈ {1, 2, 3}  (thermometer: c1 ⊆ c2)
    r0 = c1 | ~c2                           # r odd (r ∈ {1, 3})
    r1 = ~c1                                # r ≥ 2 (r ∈ {2, 3})
    chains = [_bern_plane(shape, d, gen) for d in digit4]
    return (r0, r1, *chains)


def _decide4(xb0, xb1, nb0, nb1, planes6):
    """Packed Metropolis decision for one q=4 phase.

    xb0/xb1: center-color digit planes; nb0/nb1: 4-tuples of neighbor
    planes (up, dn, ctr, side) of the other color's digit planes;
    planes6 = (r0, r1, B₁, B₂, B₄, B₈).

    Returns (b0_new, b1_new, fin) where ``fin`` carries the per-bond
    final-value planes for fused measurement: (a_fin[4], z_fin[4])."""
    r0, r1, b1c, b2c, b4c, b8c = planes6

    # candidate digits: mod-4 add of r
    carry = xb0 & r0
    rz = r1 ^ carry                          # b1' = b1 ⊕ rz

    # per-bond planes: a = b0⊕n0 (bond zero if set), z = b1⊕n1
    #   pos = ¬a∧¬z (+1), neg = ¬a∧z (−1)
    # ΔE = (n_pos + n_neg') − (n_neg + n_pos')
    ab, zb = [], []
    posb, negb, pospb, negpb = [], [], [], []
    for b in range(4):
        a = xb0 ^ nb0[b]
        z = xb1 ^ nb1[b]
        ap = a ^ r0
        zp = z ^ rz
        na = ~a
        nap = ~ap
        ab.append(a)
        zb.append(z)
        posb.append(na & ~z)
        negb.append(na & z)
        pospb.append(nap & ~zp)
        negpb.append(nap & zp)

    def side_sum(c4a, c4b):
        # (ones, twos, fours) + (ones, twos, fours) -> 4-bit sum ≤ 8
        o1, t1, f1 = _count_planes(*c4a)
        o2, t2, f2 = _count_planes(*c4b)
        s0, c = _ha(o1, o2)
        s1, c = _fa(t1, t2, c)
        s2, c = _fa(f1, f2, c)
        return s0, s1, s2, c

    p = side_sum(posb, negpb)
    n = side_sum(negb, pospb)

    # D = P − N via P + ~N + 1 (4-bit two's complement, carry-in 1)
    ones = jnp.uint32(0xFFFFFFFF)
    d0, c = _fa(p[0], ~n[0], ones)
    d1, c = _fa(p[1], ~n[1], c)
    d2, c = _fa(p[2], ~n[2], c)
    d3, co = _fa(p[3], ~n[3], c)
    pos = co & (d0 | d1 | d2 | d3)           # D ≥ 1

    # exact acceptance over the binary digits of m = D ∈ [1, 8]
    passes = ((~d0 | b1c) & (~d1 | b2c) & (~d2 | b4c) & (~d3 | b8c))
    accept = ~pos | passes

    flip0 = r0 & accept
    b0_new = xb0 ^ flip0
    b1_new = xb1 ^ (rz & accept)

    a_fin = [a ^ flip0 for a in ab]
    z_fin = [z ^ (rz & accept) for z in zb]
    return b0_new, b1_new, (a_fin, z_fin)


def _obs_partial4(b0_ctr, b1_ctr, b0_oth, b1_oth, fin, nblk_sites,
                  mask=None):
    """Fused (m, e) int32 partials from the phase-b final values.

    Per site cos(2πc/4) = (1−b0)(1−2·b1), so per color
    m = pc(¬b0∧¬b1) − pc(¬b0∧b1); per bond E = Σ neg − Σ pos over the
    4 bonds of every phase-b site against final phase-a values (every
    lattice bond exactly once).  ``mask`` (uint32 real-site bit plane,
    padded engine) restricts every count to real sites."""
    def pc_m(u):
        return _pc_sum(u if mask is None else u & mask)

    def m_color(b0, b1):
        nb0 = ~b0
        return pc_m(nb0 & ~b1) - pc_m(nb0 & b1)

    m = m_color(b0_ctr, b1_ctr) + m_color(b0_oth, b1_oth)
    a_fin, z_fin = fin
    e = jnp.int32(0)
    for a, z in zip(a_fin, z_fin):
        na = ~a
        e = e + pc_m(na & z) - pc_m(na & ~z)
    return m, e


def obs_packed4_masked(wa, wb, spec: PadSpec):
    """Masked (m, e) int32 sums from padded planes (wa refreshed)."""
    mask = pad_mask(spec)

    def pc(x):
        return jnp.sum(jax.lax.population_count(x),
                       axis=(-1, -2)).astype(jnp.int32)

    def m_color(planes):
        b0, b1 = [p.astype(jnp.uint32) for p in planes]
        nb0 = ~b0 & mask
        return pc(nb0 & ~b1) - pc(nb0 & b1)

    ob0, ob1 = [p.astype(jnp.uint32) for p in wa]
    nb0 = _nbr_planes_jnp(ob0, 1)
    nb1 = _nbr_planes_jnp(ob1, 1)
    xb0, xb1 = [p.astype(jnp.uint32) for p in wb]
    e = 0
    for k in range(4):
        a = xb0 ^ nb0[k]
        z = xb1 ^ nb1[k]
        na = ~a
        e = e + pc(na & z & mask) - pc(na & ~z & mask)
    m = m_color(wa) + m_color(wb)
    return m, e


# ---------------------------------------------------------------------------
# the generic-scaffold binding (ops/clock_planes) and the public API
# ---------------------------------------------------------------------------

def _decide_t(xs, nbrs, rand):
    b0, b1, fin = _decide4(xs[0], xs[1], nbrs[0], nbrs[1], rand)
    return (b0, b1), fin


def _obs_partial_t(new, oth, fin, nblk, mask=None):
    return _obs_partial4(new[0], new[1], oth[0], oth[1], fin, nblk,
                         mask)


SPEC = clock_planes.PlaneSpec(
    name="clock4",
    q=4,
    n_state=2,
    n_rand=6,
    max_sites=OBS_INT32_MAX_SITES,
    obs_scale=1.0,
    accept_digits=accept_digit_planes4,
    draw=draw_planes4,
    decide=_decide_t,
    obs_partial=_obs_partial_t,
    obs_masked=obs_packed4_masked,
    pack_color=pack_clock4_color,
    unpack_color=unpack_clock4_color,
)

_b = functools.partial

packed_phase_reference4 = _b(clock_planes.phase_reference, SPEC)
phase_packed4 = _b(clock_planes.phase_packed, SPEC)
interpret_planes4 = _b(clock_planes.interpret_planes, SPEC)
_interpret_phase4 = _b(clock_planes.interpret_phase, SPEC)
clock4_packable = _b(clock_planes.packable_gate, SPEC)
pack_state4 = _b(clock_planes.pack_state, SPEC)
unpack_state4 = _b(clock_planes.unpack_state, SPEC)
sweep_packed4 = _b(clock_planes.sweep_packed, SPEC)
sweep_measure_packed4 = _b(clock_planes.sweep_measure_packed, SPEC)
pack_clock4_color_padded = _b(clock_planes.pack_color_padded, SPEC)
unpack_clock4_color_padded = _b(clock_planes.unpack_color_padded, SPEC)
sweep_packed4_padded = _b(clock_planes.sweep_packed_padded, SPEC)
sweep_measure_packed4_padded = _b(
    clock_planes.sweep_measure_packed_padded, SPEC)
clock4_padded_packable = _b(clock_planes.padded_packable_gate, SPEC)
packed_sharded_phase_reference4 = _b(
    clock_planes.sharded_phase_reference, SPEC)
interpret_planes_sharded4 = _b(
    clock_planes.interpret_planes_sharded, SPEC)
sharded_phase_packed4 = _b(clock_planes.sharded_phase_packed, SPEC)
shard_packed4_ok = clock_planes.shard_ok
