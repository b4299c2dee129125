"""Bit-sliced (multispin-coded) checkerboard Metropolis for the q=3
clock model — the Z₃ companion of the q=6 CRT engine
(ops/clock_multispin.py) and the q=4 digit engine
(ops/clock4_multispin.py), completing the packed family for every q
whose state factors into cheap bit planes: q = 2 (Ising), 3, 4, 6.

The reference supports runtime q ≤ 50 through its typed clock engine
(/root/reference/src/clock_gpu_m.f90:10,49-79); q=6 is the only
committed production q, so this engine is capability beyond the
reference's committed workloads.  The q=3 clock is exactly the 3-state
Potts model up to an affine energy map (cos differences take only the
two values 1 and −1/2), which makes it the scientifically most common
non-Ising discrete point.

This module carries ONLY the q=3 bond algebra; every piece of engine
scaffolding (streaming/sharded Pallas kernels, oracles, interpret
streams, sweep and padded wrappers) is the shared plane-count-generic
machinery in ops/clock_planes, bound here through :data:`SPEC`.

Representation.  τ ∈ {0, 1, 2} stored as the q=6 engine's Z₃ encoding —
two packed bit planes per checkerboard color (32 sites/word along y,
the ising2d_multispin layout):

  t0 = [τ = 1],  t1 = [τ = 2]        (τ = 0 ⇔ neither)

Bond energy.  cos(2π(τ−n)/3) = 1 if τ=n else −1/2, i.e.

  2cos = 3·eq − 1,   eq = [τ = n] = ¬((t0⊕n0) ∨ (t1⊕n1))

so 2ΔE = 3·(n_eq − n_eq′) over the 4 bonds: TWO bit-sliced 4:3
counters and one 3-bit two's-complement subtract — the cheapest ΔE in
the packed family.

Proposal.  The reference's candidate is `ceiling(u·(q−1))`
(/root/reference/src/clock/clock_tableall_gpu_m.f90:142-143); at q=3
that is r ∈ {1, 2} uniform — ONE random bit plane, so unlike the q=6
and q=4 thermometers the proposal distribution here is EXACT (no
rounded-category deviation at all).  τ′ = τ + r (mod 3) is the q=6
engine's mod-3 plane add with the r≡0 leg dropped.

Acceptance min(1, e^(−βΔE)) decomposes EXACTLY over the binary digits
of k = (n_eq − n_eq′) ∈ [1, 4]:

  e^(−3βk/2) = p₁^(k₀) · p₂^(k₁) · p₄^(k₂),   p_j = e^(−3jβ/2)

— three independent Bernoulli-chain planes ANDed where the digit gates
are set (two fewer chains than q=6).

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

# fused (2m, 2e) partials accumulate in int32; |2e| ≤ 4N
OBS_INT32_MAX_SITES = (2 ** 31 - 1) // 4


def accept_digit_planes3(beta: float):
    """Digit tuples for the three gated chains (p₁, p₂, p₄),
    p_j = e^(−3jβ/2): 2ΔE = 3k, so the digit-k chains carry
    e^(−βΔE) = e^(−3βk/2) exactly."""
    out = []
    for j in (1.0, 2.0, 4.0):
        p = float(np.exp(-1.5 * j * beta))
        out.append(tuple(chain_digits(p, _chain_len(p))))
    return tuple(out)


# ---------------------------------------------------------------------------
# pack / unpack: int8 states (0..2) <-> two bit planes (t0, t1)
# ---------------------------------------------------------------------------

def pack_clock3_color(plane: jax.Array):
    """(..., ny, half) int8 q=3 states -> (t0, t1) packed int32 planes
    (..., ny//32, half): t0 = [τ=1], t1 = [τ=2]."""
    c = plane.astype(jnp.int32)
    return (_packbits((c == 1).astype(jnp.int8)),
            _packbits((c == 2).astype(jnp.int8)))


def unpack_clock3_color(t0: jax.Array, t1: jax.Array):
    """Inverse of :func:`pack_clock3_color` (to int8 states 0..2)."""
    return (_unpackbits(t0) + 2 * _unpackbits(t1)).astype(jnp.int8)


def draw_planes3(shape, gen, digit3):
    """(rb, B₁, B₂, B₄) planes from fresh random words: one uniform
    proposal bit (r = 1 + rb — exact, no thermometer) and the three
    acceptance chains (independent uniforms)."""
    rb = gen()
    chains = [_bern_plane(shape, d, gen) for d in digit3]
    return (rb, *chains)


def _decide3(xt0, xt1, nt0, nt1, planes4):
    """Packed Metropolis decision for one q=3 phase.

    xt0/xt1: center-color τ planes; nt0/nt1: 4-tuples of neighbor
    planes (up, dn, ctr, side) of the other color's τ planes;
    planes4 = (rb, B₁, B₂, B₄).

    Returns (t0_new, t1_new, eq_fin) where ``eq_fin`` carries the four
    per-bond final-value equality planes for fused measurement."""
    rb, b1c, b2c, b4c = planes4

    # candidate τ' = τ + r (mod 3), r = 1 + rb: the q=6 mod-3 plane
    # add with its r≡0 leg dropped (rt1 = ¬rb, rt2 = rb)
    z = ~(xt0 | xt1)
    t0p = (z & ~rb) | (xt1 & rb)
    t1p = (z & rb) | (xt0 & ~rb)

    # per-bond equality planes for current and candidate states
    eqb, eqpb = [], []
    for b in range(4):
        eqb.append(~((xt0 ^ nt0[b]) | (xt1 ^ nt1[b])))
        eqpb.append(~((t0p ^ nt0[b]) | (t1p ^ nt1[b])))

    p = _count_planes(*eqb)                  # n_eq  ∈ [0, 4], 3 bits
    n = _count_planes(*eqpb)                 # n_eq' ∈ [0, 4], 3 bits

    # k = n_eq − n_eq' via P + ~N + 1 (3-bit two's complement,
    # carry-in 1; carry-out ⇔ P ≥ N, and then d = k ∈ [0, 4] exactly)
    ones = jnp.uint32(0xFFFFFFFF)
    d0, c = _fa(p[0], ~n[0], ones)
    d1, c = _fa(p[1], ~n[1], c)
    d2, co = _fa(p[2], ~n[2], c)
    pos = co & (d0 | d1 | d2)                # k ≥ 1 (ΔE > 0)

    # exact acceptance over the binary digits of k ∈ [1, 4]
    passes = (~d0 | b1c) & (~d1 | b2c) & (~d2 | b4c)
    accept = ~pos | passes

    t0_new = (t0p & accept) | (xt0 & ~accept)
    t1_new = (t1p & accept) | (xt1 & ~accept)

    eq_fin = [(ep & accept) | (e & ~accept)
              for e, ep in zip(eqb, eqpb)]
    return t0_new, t1_new, eq_fin


def _obs_partial3(t0_ctr, t1_ctr, t0_oth, t1_oth, eq_fin, nblk_sites,
                  mask=None):
    """Fused (2m, 2e) int32 partials from the phase-b final values.

    Per site 2cos(2πτ/3) = 3[τ=0] − 1, so per color
    2m = 3·pc(¬t0∧¬t1) − n_sites; per bond 2·(−cos) = 1 − 3·eq, so
    2e = 4·n_sites − 3·Σ_b pc(eq) over the 4 bonds of every phase-b
    site against final phase-a values (every lattice bond exactly
    once).  ``mask`` (uint32 real-site bit plane, padded engine)
    restricts every count to real sites."""
    if mask is not None:
        nblk_sites = _pc_sum(mask)

    def pc_m(u):
        return _pc_sum(u if mask is None else u & mask)

    def m2_color(t0, t1):
        return 3 * pc_m(~(t0 | t1)) - nblk_sites

    m2 = m2_color(t0_ctr, t1_ctr) + m2_color(t0_oth, t1_oth)
    s_eq = sum(pc_m(e) for e in eq_fin)
    e2 = 4 * nblk_sites - 3 * s_eq
    return m2, e2


def obs_packed3_masked(wa, wb, spec: PadSpec):
    """Masked (2m, 2e) int32 sums from padded planes.

    Expects ``wa`` refreshed (it is after sweep_packed3_padded: phase b
    writes only ``wb``) — the q=6 obs_packed6_masked conventions."""
    mask = pad_mask(spec)
    nreal = spec.ny * spec.half          # sites per color

    def pc(x):
        return jnp.sum(jax.lax.population_count(x),
                       axis=(-1, -2)).astype(jnp.int32)

    def m2_color(planes):
        t0, t1 = [p.astype(jnp.uint32) for p in planes]
        return 3 * pc(~(t0 | t1) & mask) - jnp.int32(nreal)

    ot0, ot1 = [p.astype(jnp.uint32) for p in wa]
    nt0 = _nbr_planes_jnp(ot0, 1)
    nt1 = _nbr_planes_jnp(ot1, 1)
    xt0, xt1 = [p.astype(jnp.uint32) for p in wb]
    s_eq = 0
    for b in range(4):
        eq = ~((xt0 ^ nt0[b]) | (xt1 ^ nt1[b]))
        s_eq = s_eq + pc(eq & mask)
    e2 = 4 * jnp.int32(nreal) - 3 * s_eq
    m2 = m2_color(wa) + m2_color(wb)
    return m2, e2


# ---------------------------------------------------------------------------
# the generic-scaffold binding (ops/clock_planes) and the public API
# ---------------------------------------------------------------------------

def _decide_t(xs, nbrs, rand):
    t0, t1, fin = _decide3(xs[0], xs[1], nbrs[0], nbrs[1], rand)
    return (t0, t1), fin


def _obs_partial_t(new, oth, fin, nblk, mask=None):
    return _obs_partial3(new[0], new[1], oth[0], oth[1], fin, nblk,
                         mask)


SPEC = clock_planes.PlaneSpec(
    name="clock3",
    q=3,
    n_state=2,
    n_rand=4,
    max_sites=OBS_INT32_MAX_SITES,
    obs_scale=0.5,
    accept_digits=accept_digit_planes3,
    draw=draw_planes3,
    decide=_decide_t,
    obs_partial=_obs_partial_t,
    obs_masked=obs_packed3_masked,
    pack_color=pack_clock3_color,
    unpack_color=unpack_clock3_color,
)

_b = functools.partial

packed_phase_reference3 = _b(clock_planes.phase_reference, SPEC)
phase_packed3 = _b(clock_planes.phase_packed, SPEC)
interpret_planes3 = _b(clock_planes.interpret_planes, SPEC)
_interpret_phase3 = _b(clock_planes.interpret_phase, SPEC)
clock3_packable = _b(clock_planes.packable_gate, SPEC)
pack_state3 = _b(clock_planes.pack_state, SPEC)
unpack_state3 = _b(clock_planes.unpack_state, SPEC)
sweep_packed3 = _b(clock_planes.sweep_packed, SPEC)
sweep_measure_packed3 = _b(clock_planes.sweep_measure_packed, SPEC)
pack_clock3_color_padded = _b(clock_planes.pack_color_padded, SPEC)
unpack_clock3_color_padded = _b(clock_planes.unpack_color_padded, SPEC)
sweep_packed3_padded = _b(clock_planes.sweep_packed_padded, SPEC)
sweep_measure_packed3_padded = _b(
    clock_planes.sweep_measure_packed_padded, SPEC)
clock3_padded_packable = _b(clock_planes.padded_packable_gate, SPEC)
packed_sharded_phase_reference3 = _b(
    clock_planes.sharded_phase_reference, SPEC)
interpret_planes_sharded3 = _b(
    clock_planes.interpret_planes_sharded, SPEC)
sharded_phase_packed3 = _b(clock_planes.sharded_phase_packed, SPEC)
shard_packed3_ok = clock_planes.shard_ok
