"""Bit-sliced (multispin-coded) checkerboard Metropolis for the q=6
clock model — the packed engine for the reference's largest production
workload (clock 2000²-class × 10⁵ MCS × 5000 samples,
/root/reference/app/clock_dual_lattice_yhalf_tableall_gpu_relaxation.f90:8-9,
/root/reference/src/clock/clock_dual_lattice_yhalf_tableall_m.f90:13).

The reference's fastest clock variant removes transcendentals with a
q⁶ probability table looked up per site (…tableall_m.f90:144-151); a
46k-entry gather per site is the worst possible TPU op.  This engine
instead removes the *decode* entirely by CRT-splitting the state:

  Z₆ ≅ Z₂ × Z₃:  c ↔ (σ = c mod 2, τ = c mod 3),  c = (3σ + 4τ) mod 6

so cos(2π(c−n)/6) = (−1)^(σ_c⊕σ_n) · (1 if τ_c=τ_n else −1/2): the Z₂
part of every bond is an Ising-like XOR and the Z₃ part a 2-bit-plane
equality.  Storage is 3 packed bit planes per checkerboard color
(32 sites/word along the row axis, exactly the ising2d_multispin
layout), and the whole Metropolis update is boolean algebra:

- neighbor geometry: identical funnel-shift/lane-roll/parity-mask
  algebra as ising2d_multispin (reused);
- 2ΔE ∈ [−16, 16] from FOUR bit-sliced 4:3 counters via the bond
  identity 2cos(2π(c−n)/6) = ¬x + 3(x⊕eq) − 2 (x = σ⊕σ_n,
  eq = [τ=τ_n]): 2ΔE = (n_x' + 3n_w) − (n_x + 3n_w'), combined with
  small ripple adders;
- proposal: uniform candidate offset r ∈ [1, q−1] as the reference's
  `ceiling(u·(q−1))` (/root/reference/src/clock/clock_tableall_gpu_m
  .f90:142-143), realized as a 12-bit bit-sliced thermometer over
  shared random planes; the rounded category probabilities
  {819,819,820,819,819}/4096 are symmetric (P(r)=P(6−r)), so detailed
  balance is exact and only the proposal *dynamics* deviate (≤ 5e-4
  relative) from the f32-uniform engines;
- acceptance min(1, e^(−βΔE)) decomposed EXACTLY over the binary
  digits of m = 2ΔE ∈ [1, 16]:
      e^(−βm/2) = p₁^(m₀) p₂^(m₁) p₄^(m₂) p₈^(m₃∨m₄) p₈^(m₄),
  (p_k = e^(−kβ/2)) — five independent Bernoulli-chain planes
  (ising2d_multispin digit chains, resolution ~12 significant bits
  each), ANDed where the corresponding digit gates are set.

This module carries ONLY the q=6 bond algebra; every piece of engine
scaffolding (streaming/sharded Pallas kernels, oracles, interpret
streams, sweep and padded wrappers, and the PadSpec/refresh padded
machinery with its wrap-refresh rationale) is the shared
plane-count-generic machinery in ops/clock_planes, bound here through
:data:`SPEC`.  The bit-sliced helpers (_ha/_fa/_lt_multi/_chain_len)
and PadSpec family re-exported below for compatibility also live
there.

RNG consumption differs from the int8 engine (bit chains vs one f32
compare/site), so trajectories match statistically, not bitwise — the
same contract as ising2d_multispin.  Validation: bitwise packed-vs-
int-domain oracle given injected planes (interpret + Mosaic),
chain/proposal statistics, and equilibrium physics cross-checks
(tests/test_clock_multispin.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cuda_fortran_mc_simulation_spin_tpu.ops import clock_planes
from cuda_fortran_mc_simulation_spin_tpu.ops.clock_planes import (  # noqa: F401  (compat re-exports)
    PadSpec,
    _chain_len,
    _fa,
    _ha,
    _lt_multi,
    _nbr_planes_jnp,
    _packbits,
    _refresh_plane,
    _unpackbits,
    pad_mask,
    padded_spec,
    refresh_padded,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_multispin import (
    PACK,
    _bern_plane,
    _count_planes,
    _pc_sum,
    chain_digits,
)

# fused (2m, 2e) partials accumulate in int32; |2e| ≤ 4N
OBS_INT32_MAX_SITES = (2 ** 31 - 1) // 4

# proposal thermometer: 12-bit thresholds round(k·4096/5); the rounded
# spacings {819,819,820,819,819} are symmetric around r=3, so
# P(r) = P(6−r) holds exactly and Metropolis detailed balance is exact
_PROP_BITS = 12
_PROP_T = tuple(int(round(k * 4096 / 5)) for k in (1, 2, 3, 4))


def accept_digit_planes(beta: float):
    """Digit tuples for the five gated chains (p₁, p₂, p₄, p₈, p₈)."""
    out = []
    for k in (1.0, 2.0, 4.0, 8.0, 8.0):
        p = float(np.exp(-0.5 * k * beta))
        out.append(tuple(chain_digits(p, _chain_len(p))))
    return tuple(out)


# ---------------------------------------------------------------------------
# pack / unpack: int8 states (0..5) <-> three bit planes (σ, t0, t1)
# ---------------------------------------------------------------------------

def pack_clock_color(plane: jax.Array):
    """(..., ny, half) int8 clock states -> (s, t0, t1) packed int32
    planes (..., ny//32, half): s = c mod 2, (t0, t1) = one-hot-ish
    encoding of τ = c mod 3 ([τ=1], [τ=2])."""
    c = plane.astype(jnp.int32)
    s = (c & 1).astype(jnp.int8)
    tau = c % 3
    t0 = (tau == 1).astype(jnp.int8)
    t1 = (tau == 2).astype(jnp.int8)
    return _packbits(s), _packbits(t0), _packbits(t1)


def unpack_clock_color(s: jax.Array, t0: jax.Array, t1: jax.Array):
    """Inverse of :func:`pack_clock_color` (to int8 states 0..5 via
    CRT: c = (3σ + 4τ) mod 6)."""
    sb = _unpackbits(s)
    tau = _unpackbits(t0) + 2 * _unpackbits(t1)
    return ((3 * sb + 4 * tau) % 6).astype(jnp.int8)


def draw_planes(shape, gen, digit5):
    """(ρ, rt1, rt2, B₁, B₂, B₄, B₈a, B₈b) planes from fresh random
    words: the proposal thermometer (shared 12-bit uniform) and the
    five acceptance chains (independent uniforms)."""
    prop = [gen() for _ in range(_PROP_BITS)]
    c1, c2, c3, c4 = _lt_multi(prop, _PROP_T, _PROP_BITS)
    full = jnp.uint32(0xFFFFFFFF)
    # r = 5 − (c1+c2+c3+c4) ∈ [1,5] (thermometer: c1 ⊆ c2 ⊆ c3 ⊆ c4)
    rho = full ^ c1 ^ c2 ^ c3 ^ c4          # r mod 2
    rt1 = c1 | (c4 & ~c3)                   # r mod 3 == 1 (r ∈ {1,4})
    rt2 = (c2 & ~c1) | ~c4                  # r mod 3 == 2 (r ∈ {2,5})
    chains = [_bern_plane(shape, d, gen) for d in digit5]
    return (rho, rt1, rt2, *chains)


def _decide(xs, xt0, xt1, ns, nt0, nt1, planes8):
    """Packed Metropolis decision for one phase.

    xs/xt0/xt1: center-color planes; ns/nt0/nt1: 4-tuples of neighbor
    planes (up, dn, ctr, side) of the σ/t0/t1 other-color planes;
    planes8 = (ρ, rt1, rt2, B₁, B₂, B₄, B₈a, B₈b).

    Returns (s_new, t0_new, t1_new, fin) where ``fin`` carries the
    final-value bond planes for fused measurement:
    (x_fin[4], eq_fin[4])."""
    rho, rt1, rt2, b1, b2, b4, b8a, b8b = planes8

    # candidate: σ' = σ⊕ρ, τ' = τ + rτ (mod 3)
    z = ~(xt0 | xt1)
    rz = ~(rt1 | rt2)
    t0p = (z & rt1) | (xt0 & rz) | (xt1 & rt2)
    t1p = (z & rt2) | (xt0 & rt1) | (xt1 & rz)

    # per-bond planes: x = σ⊕σ_n, eq = [τ=τ_n], w = x⊕eq; the bond
    # energy identity 2cos(2π(c−n)/6) = ¬x + 3(x⊕eq) − 2 reduces the
    # whole ΔE to FOUR 4:3 counters:
    #   2ΔE = (n_x' + 3 n_w) − (n_x + 3 n_w')  ∈ [−16, 16]
    xb, xpb, wb, wpb = [], [], [], []
    for b in range(4):
        x = xs ^ ns[b]
        d0 = xt0 ^ nt0[b]
        d1 = xt1 ^ nt1[b]
        eq = ~(d0 | d1)
        d0p = t0p ^ nt0[b]
        d1p = t1p ^ nt1[b]
        eqp = ~(d0p | d1p)
        xp = x ^ rho
        xb.append(x)
        xpb.append(xp)
        wb.append(x ^ eq)
        wpb.append(xp ^ eqp)

    n_x = _count_planes(*xb)
    n_xp = _count_planes(*xpb)
    n_w = _count_planes(*wb)
    n_wp = _count_planes(*wpb)

    def scaled_sum(na, nw):
        # na + 3·nw = (na + nw) + 2·nw, counts as (ones, twos, fours)
        b0, c = _ha(na[0], nw[0])
        b1_, c = _fa(na[1], nw[1], c)
        b2_, c = _fa(na[2], nw[2], c)
        b3_ = c                                 # na+nw ≤ 8
        p0 = b0
        p1, c = _ha(b1_, nw[0])
        p2, c = _fa(b2_, nw[1], c)
        p3, c = _fa(b3_, nw[2], c)
        p4 = c                                  # ≤ 16, 5 bits
        return p0, p1, p2, p3, p4

    p = scaled_sum(n_xp, n_w)
    n = scaled_sum(n_x, n_wp)

    # D = P − N via P + ~N + 1 (5-bit two's complement, carry-in 1)
    ones = jnp.uint32(0xFFFFFFFF)
    d0, c = _fa(p[0], ~n[0], ones)
    d1, c = _fa(p[1], ~n[1], c)
    d2, c = _fa(p[2], ~n[2], c)
    d3, c = _fa(p[3], ~n[3], c)
    d4, co = _fa(p[4], ~n[4], c)
    pos = co & (d0 | d1 | d2 | d3 | d4)         # D ≥ 1

    # exact acceptance over the binary digits of m = D ∈ [1, 16]
    g8a = d3 | d4
    passes = ((~d0 | b1) & (~d1 | b2) & (~d2 | b4)
              & (~g8a | b8a) & (~d4 | b8b))
    accept = ~pos | passes

    s_new = xs ^ (rho & accept)
    t0_new = (t0p & accept) | (xt0 & ~accept)
    t1_new = (t1p & accept) | (xt1 & ~accept)

    flip = rho & accept
    x_fin = [x ^ flip for x in xb]
    w_fin = [(wp & accept) | (w & ~accept)
             for w, wp in zip(wb, wpb)]
    return s_new, t0_new, t1_new, (x_fin, w_fin)


def _obs_partial(s_ctr, t0_ctr, t1_ctr, s_oth, t0_oth, t1_oth, fin,
                 nblk_sites, mask=None):
    """Fused (2m, 2e) int32 partials from the phase-b final values.

    Per site 2cos(2πc/6) = (−1)^σ(3[τ=0] − 1), so
    2m = Σ_colors [3Sz − 6Sσz + 2Sσ − N]; per bond
    2cos = ¬x + 3w − 2 (w = x⊕eq), so 2e = 4N_b + Sx − 3Sw over the
    4 bonds of every phase-b site against final phase-a values
    (every lattice bond exactly once).

    ``mask`` (uint32 real-site bit plane, padded engine): every count
    is restricted to real sites and the site total is pc(mask) —
    exactly :func:`obs_packed6_masked` folded into the phase kernel."""
    if mask is not None:
        nblk_sites = _pc_sum(mask)

    def pc_m(u):
        return _pc_sum(u if mask is None else u & mask)

    def m2_color(s, t0, t1, nsz):
        zz = ~(t0 | t1) if mask is None else ~(t0 | t1) & mask
        s_s = pc_m(s)
        s_z = _pc_sum(zz)
        s_sz = _pc_sum(s & zz)
        return 3 * s_z - 6 * s_sz + 2 * s_s - nsz

    m2 = (m2_color(s_ctr, t0_ctr, t1_ctr, nblk_sites)
          + m2_color(s_oth, t0_oth, t1_oth, nblk_sites))
    x_fin, w_fin = fin
    s_x = sum(pc_m(x) for x in x_fin)
    s_w = sum(pc_m(w) for w in w_fin)
    e2 = 4 * nblk_sites + s_x - 3 * s_w
    return m2, e2


def obs_packed6_masked(wa, wb, spec: PadSpec):
    """Masked (2m, 2e) int32 sums from padded planes.

    Expects ``wa`` refreshed (it is after sweep_packed6_padded: phase b
    writes only ``wb``).  Same conventions as _obs_partial: m over both
    colors; e as bonds of every phase-b site against its four color-a
    neighbors (each real lattice bond exactly once)."""
    mask = pad_mask(spec)
    nreal = spec.ny * spec.half          # sites per color

    def pc(x):
        return jnp.sum(jax.lax.population_count(x),
                       axis=(-1, -2)).astype(jnp.int32)

    def m2_color(planes):
        s, t0, t1 = [p.astype(jnp.uint32) for p in planes]
        zz = ~(t0 | t1) & mask
        return (3 * pc(zz) - 6 * pc(s & zz) + 2 * pc(s & mask)
                - jnp.int32(nreal))

    sA, t0A, t1A = [p.astype(jnp.uint32) for p in wa]
    ns = _nbr_planes_jnp(sA, 1)
    nt0 = _nbr_planes_jnp(t0A, 1)
    nt1 = _nbr_planes_jnp(t1A, 1)
    sB, t0B, t1B = [p.astype(jnp.uint32) for p in wb]
    e_x = 0
    e_w = 0
    for k in range(4):
        x = sB ^ ns[k]
        d0 = t0B ^ nt0[k]
        d1 = t1B ^ nt1[k]
        eq = ~(d0 | d1)
        e_x = e_x + pc(x & mask)
        e_w = e_w + pc((x ^ eq) & mask)
    e2 = 4 * jnp.int32(nreal) + e_x - 3 * e_w
    m2 = m2_color(wa) + m2_color(wb)
    return m2, e2


# ---------------------------------------------------------------------------
# the generic-scaffold binding (ops/clock_planes) and the public API
# ---------------------------------------------------------------------------

def _decide_t(xs, nbrs, rand):
    s, t0, t1, fin = _decide(xs[0], xs[1], xs[2], nbrs[0], nbrs[1],
                             nbrs[2], rand)
    return (s, t0, t1), fin


def _obs_partial_t(new, oth, fin, nblk, mask=None):
    return _obs_partial(new[0], new[1], new[2], oth[0], oth[1], oth[2],
                        fin, nblk, mask)


SPEC = clock_planes.PlaneSpec(
    name="clock6",
    q=6,
    n_state=3,
    n_rand=8,
    max_sites=OBS_INT32_MAX_SITES,
    obs_scale=0.5,
    accept_digits=accept_digit_planes,
    draw=draw_planes,
    decide=_decide_t,
    obs_partial=_obs_partial_t,
    obs_masked=obs_packed6_masked,
    pack_color=pack_clock_color,
    unpack_color=unpack_clock_color,
)

_b = functools.partial

packed_phase_reference = _b(clock_planes.phase_reference, SPEC)
phase_packed = _b(clock_planes.phase_packed, SPEC)
interpret_planes = _b(clock_planes.interpret_planes, SPEC)
_interpret_phase = _b(clock_planes.interpret_phase, SPEC)
clock_packable = _b(clock_planes.packable_gate, SPEC)
pack_state = _b(clock_planes.pack_state, SPEC)
unpack_state = _b(clock_planes.unpack_state, SPEC)
sweep_packed6 = _b(clock_planes.sweep_packed, SPEC)
sweep_measure_packed6 = _b(clock_planes.sweep_measure_packed, SPEC)
pack_clock_color_padded = _b(clock_planes.pack_color_padded, SPEC)
unpack_clock_color_padded = _b(clock_planes.unpack_color_padded, SPEC)
sweep_packed6_padded = _b(clock_planes.sweep_packed_padded, SPEC)
sweep_measure_packed6_padded = _b(
    clock_planes.sweep_measure_packed_padded, SPEC)
clock_padded_packable = _b(clock_planes.padded_packable_gate, SPEC)
packed_sharded_phase_reference6 = _b(
    clock_planes.sharded_phase_reference, SPEC)
interpret_planes_sharded = _b(
    clock_planes.interpret_planes_sharded, SPEC)
sharded_phase_packed6 = _b(clock_planes.sharded_phase_packed, SPEC)
shard_packed6_ok = clock_planes.shard_ok
