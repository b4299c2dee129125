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

RNG consumption differs from the int8 engine (bit chains vs one f32
compare/site), so trajectories match statistically, not bitwise — the
same contract as ising2d_multispin.  Validation: bitwise packed-vs-
int-domain oracle given injected planes (interpret + Mosaic),
chain/proposal statistics, and equilibrium physics cross-checks
(tests/test_clock_multispin.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.ops import stencil
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_multispin import (
    PACK,
    _bern_plane,
    _count_planes,
    _nbr_planes,
    _pc_sum,
    _pick_typ,
    chain_digits,
    packable,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    seeds_from_key,
)

# fused (2m, 2e) partials accumulate in int32; |2e| ≤ 4N
OBS_INT32_MAX_SITES = (2 ** 31 - 1) // 4

# proposal thermometer: 12-bit thresholds round(k·4096/5); the rounded
# spacings {819,819,820,819,819} are symmetric around r=3, so
# P(r) = P(6−r) holds exactly and Metropolis detailed balance is exact
_PROP_BITS = 12
_PROP_T = tuple(int(round(k * 4096 / 5)) for k in (1, 2, 3, 4))


def _check_obs_sites(nsites: int) -> None:
    if nsites > OBS_INT32_MAX_SITES:
        raise ValueError(
            f"lattice of {nsites} sites overflows the int32 fused-"
            f"observable accumulators (max {OBS_INT32_MAX_SITES})"
        )


def _chain_len(p: float) -> int:
    """Digits for a Bernoulli chain: ~12 significant bits below the
    leading zeros of p (the ising2d_multispin 20-bit chain carries the
    same ~12 significant bits on its deepest level at Tc)."""
    if p <= 0.0:
        return 28
    return int(min(28, max(6, np.ceil(-np.log2(min(p, 1.0))) + 12)))


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

    def packbits(bits8):
        ny, half = bits8.shape[-2:]
        b = bits8.astype(jnp.uint32).reshape(
            bits8.shape[:-2] + (ny // PACK, PACK, half)
        )
        w = jnp.zeros(bits8.shape[:-2] + (ny // PACK, half), jnp.uint32)
        for k in range(PACK):
            w = w | (b[..., k, :] << np.uint32(k))
        return w.astype(jnp.int32)

    return packbits(s), packbits(t0), packbits(t1)


def unpack_clock_color(s: jax.Array, t0: jax.Array, t1: jax.Array):
    """Inverse of :func:`pack_clock_color` (to int8 states 0..5 via
    CRT: c = (3σ + 4τ) mod 6)."""
    def unpackbits(w):
        wu = w.astype(jnp.uint32)
        rows = [((wu >> np.uint32(k)) & jnp.uint32(1)).astype(jnp.int32)
                for k in range(PACK)]
        st = jnp.stack(rows, axis=-2)
        shape = w.shape[:-2] + (w.shape[-2] * PACK, w.shape[-1])
        return st.reshape(shape)

    sb = unpackbits(s)
    tau = unpackbits(t0) + 2 * unpackbits(t1)
    return ((3 * sb + 4 * tau) % 6).astype(jnp.int8)


# ---------------------------------------------------------------------------
# bit-sliced helpers
# ---------------------------------------------------------------------------

def _ha(a, b):
    return a ^ b, a & b


def _fa(a, b, c):
    t = a ^ b
    return t ^ c, (a & b) | (c & t)


def _lt_multi(planes, thresholds, bits):
    """[u < T] for each constant T over ONE shared uniform whose binary
    digits (MSB first) are ``planes`` — LSB→MSB lt-recurrence, the
    multi-threshold generalization of the ising2d_multispin chain."""
    outs = []
    for t_val in thresholds:
        digs = [(t_val >> (bits - 1 - j)) & 1 for j in range(bits)]
        lt = jnp.zeros_like(planes[0])
        for j in range(bits - 1, -1, -1):
            nr = ~planes[j]
            lt = (nr | lt) if digs[j] else (nr & lt)
        outs.append(lt)
    return outs


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
        b1, c = _fa(na[1], nw[1], c)
        b2, c = _fa(na[2], nw[2], c)
        b3 = c                                  # na+nw ≤ 8
        p0 = b0
        p1, c = _ha(b1, nw[0])
        p2, c = _fa(b2, nw[1], c)
        p3, c = _fa(b3, nw[2], c)
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


# ---------------------------------------------------------------------------
# jnp oracle (periodic wrap via roll) — bitwise test target
# ---------------------------------------------------------------------------

def _nbr_planes_jnp(o, color):
    from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_multispin import (
        _EVEN_BITS,
        _ODD_BITS,
    )
    o = o.astype(jnp.uint32)
    # negative axes: also correct on leading-batched (R, nyp, half)
    w_prev = jnp.roll(o, 1, axis=-2)
    w_next = jnp.roll(o, -1, axis=-2)
    one = jnp.uint32(1)
    up = (o << one) | (w_prev >> jnp.uint32(31))
    dn = (o >> one) | (w_next << jnp.uint32(31))
    minus = jnp.roll(o, 1, axis=-1)
    plus = jnp.roll(o, -1, axis=-1)
    odd = jnp.uint32(_ODD_BITS)
    even = jnp.uint32(_EVEN_BITS)
    if color == 0:
        side = (plus & odd) | (minus & even)
    else:
        side = (minus & odd) | (plus & even)
    return (up, dn, o, side)


def packed_phase_reference(xplanes, oplanes, color, planes8):
    """Pure-jnp packed phase on full planes — the oracle the Pallas
    kernel is tested against bitwise (injected planes8)."""
    xs, xt0, xt1 = [p.astype(jnp.uint32) for p in xplanes]
    os_, ot0, ot1 = [p.astype(jnp.uint32) for p in oplanes]
    ns = _nbr_planes_jnp(os_, color)
    nt0 = _nbr_planes_jnp(ot0, color)
    nt1 = _nbr_planes_jnp(ot1, color)
    planes8 = tuple(p.astype(jnp.uint32) for p in planes8)
    s, t0, t1, _ = _decide(xs, xt0, xt1, ns, nt0, nt1, planes8)
    return tuple(p.astype(jnp.int32) for p in (s, t0, t1))


# ---------------------------------------------------------------------------
# Pallas streaming phase kernel
# ---------------------------------------------------------------------------

def _phase_kernel(seed_ref, xs_ref, xt0_ref, xt1_ref,
                  os_ref, ot0_ref, ot1_ref,
                  us_ref, ut0_ref, ut1_ref,
                  ds_ref, dt0_ref, dt1_ref,
                  *rest, color: int, digit5, n_inject: int,
                  has_mask: bool = False,
                  measuring: bool = False):
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    mask_ref = refs.pop(0) if has_mask else None
    inject = refs[:n_inject]
    s_out, t0_out, t1_out = refs[n_inject:]
    r = pl.program_id(0)
    i = pl.program_id(1)

    def planes_of(o_ref, up_ref, dn_ref):
        o = pltpu.bitcast(o_ref[0], jnp.uint32)
        w_prev, w_next = stencil.splice_updown(
            o,
            pltpu.bitcast(up_ref[0, 7:8, :], jnp.uint32),
            pltpu.bitcast(dn_ref[0, 0:1, :], jnp.uint32),
        )
        return o, _nbr_planes(o, w_prev, w_next, color)

    xs = pltpu.bitcast(xs_ref[0], jnp.uint32)
    xt0 = pltpu.bitcast(xt0_ref[0], jnp.uint32)
    xt1 = pltpu.bitcast(xt1_ref[0], jnp.uint32)
    os_, ns = planes_of(os_ref, us_ref, ds_ref)
    ot0, nt0 = planes_of(ot0_ref, ut0_ref, dt0_ref)
    ot1, nt1 = planes_of(ot1_ref, ut1_ref, dt1_ref)

    if n_inject:
        planes8 = tuple(
            pltpu.bitcast(ref[0], jnp.uint32) for ref in inject
        )
    else:
        tile_tag = i * jnp.int32(-1640531527) + r * jnp.int32(0x3C6EF35F)
        pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)

        def gen():
            return pltpu.bitcast(pltpu.prng_random_bits(xs.shape),
                                 jnp.uint32)

        planes8 = draw_planes(xs.shape, gen, digit5)

    s_new, t0_new, t1_new, fin = _decide(
        xs, xt0, xt1, ns, nt0, nt1, planes8
    )
    s_out[0] = pltpu.bitcast(s_new, jnp.int32)
    t0_out[0] = pltpu.bitcast(t0_new, jnp.int32)
    t1_out[0] = pltpu.bitcast(t1_new, jnp.int32)

    if measuring:
        nblk = jnp.int32(xs.shape[0] * xs.shape[1] * PACK)
        mask = (pltpu.bitcast(mask_ref[...], jnp.uint32)
                if has_mask else None)
        m2, e2 = _obs_partial(s_new, t0_new, t1_new, os_, ot0, ot1,
                              fin, nblk, mask)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, m2, jnp.where(lane == 1, e2, 0))

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def phase_packed(xplanes, oplanes, seeds, *, color: int, beta: float,
                 inject=None, obs_mask=None, interpret: bool = False,
                 measuring: bool = False):
    """One packed checkerboard phase on (R, nyp, half) plane triplets.

    ``inject``: optional 8-tuple of (R, nyp, half) int32 planes
    (ρ, rt1, rt2, B₁, B₂, B₄, B₈a, B₈b) replacing the in-kernel PRNG —
    the bitwise-testable entry mirroring :func:`packed_phase_reference`.
    ``measuring`` (phase b only) additionally returns per-replica
    (2m, 2e) int32 sums.  ``obs_mask`` (uint32/int32 (nyp, half) plane
    with real-site bits set, padded engine): restricts the fused sums
    to real sites — the in-kernel analog of obs_packed6_masked."""
    nrep, nyp, half = xplanes[0].shape
    digit5 = accept_digit_planes(beta)
    typ = _pick_typ(nyp, 3 * half)
    n = nyp // typ
    nb8 = nyp // 8
    n_inject = 8 if inject is not None else 0
    has_mask = measuring and obs_mask is not None
    kernel = functools.partial(
        _phase_kernel, color=color, digit5=digit5, n_inject=n_inject,
        has_mask=has_mask, measuring=measuring,
    )
    blk = pl.BlockSpec((1, typ, half), lambda r, i: (r, i, 0),
                       memory_space=pltpu.VMEM)
    up8 = pl.BlockSpec(
        (1, 8, half),
        lambda r, i: (r, (i * typ // 8 - 1 + nb8) % nb8, 0),
        memory_space=pltpu.VMEM,
    )
    dn8 = pl.BlockSpec(
        (1, 8, half),
        lambda r, i: (r, ((i + 1) * typ // 8) % nb8, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs += [blk] * 6 + [up8] * 3 + [dn8] * 3
    operands = [seeds, *xplanes, *oplanes, *oplanes, *oplanes]
    if has_mask:
        in_specs.append(pl.BlockSpec((typ, half), lambda r, i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(obs_mask.astype(jnp.int32))
    if inject is not None:
        in_specs += [blk] * 8
        operands += list(inject)
    plane_shape = jax.ShapeDtypeStruct((nrep, nyp, half), jnp.int32)
    out_shape = [plane_shape] * 3
    out_specs = [blk] * 3
    if measuring:
        out_shape.append(jax.ShapeDtypeStruct((nrep, 1, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 1, 128),
                                      lambda r, i: (r, 0, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(nrep, n),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )(*operands)
    if measuring:
        return res[:3], res[3]
    return res


# ---------------------------------------------------------------------------
# interpret-mode plane source (CPU tests / oracle statistics)
# ---------------------------------------------------------------------------

def interpret_planes(seeds, nrep, nyp, half, beta):
    """Threefry-derived (ρ, rt1, rt2, B…) planes keyed per (replica,
    word row) — the CPU fallback stream (same statistics as the on-chip
    hardware PRNG, different bits)."""
    digit5 = accept_digit_planes(beta)
    base = jax.random.fold_in(
        jax.random.PRNGKey(seeds[0].astype(jnp.uint32)), seeds[1]
    )

    def per_rep(r):
        kr = jax.random.fold_in(base, r)

        def per_row(g):
            kg = jax.random.fold_in(kr, g)
            cnt = [0]

            def gen():
                cnt[0] += 1
                return jax.random.bits(
                    jax.random.fold_in(kg, cnt[0]), (half,),
                    dtype=jnp.uint32)

            return draw_planes((half,), gen, digit5)

        return jax.vmap(per_row)(jnp.arange(nyp))

    planes = jax.vmap(per_rep)(jnp.arange(nrep))
    return tuple(p.astype(jnp.int32) for p in planes)


# ---------------------------------------------------------------------------
# sweep wrappers (the routed ensemble path)
# ---------------------------------------------------------------------------

def clock_packable(model) -> bool:
    """Shape/parameter gate for the packed q=6 engine."""
    if getattr(model, "q", None) != 6:
        return False
    ny, half = model.color_shape
    return (packable(ny, half)
            and model.nsites <= OBS_INT32_MAX_SITES)


def pack_state(state):
    a, b = state
    batched = a.ndim == 3
    if not batched:
        a, b = a[None], b[None]
    return pack_clock_color(a), pack_clock_color(b), batched


def unpack_state(wa, wb, batched: bool):
    from cuda_fortran_mc_simulation_spin_tpu.models.base import (
        CheckerboardState,
    )
    a = unpack_clock_color(*wa)
    b = unpack_clock_color(*wb)
    if not batched:
        a, b = a[0], b[0]
    return CheckerboardState(a, b)


def _interpret_phase(xplanes, oplanes, seeds, color, beta,
                     measuring=False):
    nrep, nyp, half = xplanes[0].shape
    inject = interpret_planes(seeds, nrep, nyp, half, beta)
    xs, xt0, xt1 = [p.astype(jnp.uint32) for p in xplanes]
    os_, ot0, ot1 = [p.astype(jnp.uint32) for p in oplanes]

    def one(xs, xt0, xt1, os_, ot0, ot1, *planes8):
        ns = _nbr_planes_jnp(os_, color)
        nt0 = _nbr_planes_jnp(ot0, color)
        nt1 = _nbr_planes_jnp(ot1, color)
        s, t0, t1, fin = _decide(
            xs, xt0, xt1, ns, nt0, nt1,
            tuple(p.astype(jnp.uint32) for p in planes8),
        )
        nblk = jnp.int32(nyp * half * PACK)
        m2, e2 = _obs_partial(s, t0, t1, os_, ot0, ot1, fin, nblk)
        return (tuple(p.astype(jnp.int32) for p in (s, t0, t1)),
                jnp.stack([m2, e2]))

    new, obs = jax.vmap(one)(xs, xt0, xt1, os_, ot0, ot1, *inject)
    if measuring:
        return new, obs
    return new


def sweep_packed6(model, wa, wb, key):
    """One full MCS on packed clock plane triplets."""
    seeds0 = seeds_from_key(key, 0)
    seeds1 = seeds_from_key(key, 1)
    beta = float(model.beta)
    if jax.default_backend() in ("cpu", "gpu"):
        wa = _interpret_phase(wa, wb, seeds0, 0, beta)
        wb = _interpret_phase(wb, wa, seeds1, 1, beta)
        return wa, wb
    wa = phase_packed(wa, wb, seeds0, color=0, beta=beta)
    wb = phase_packed(wb, wa, seeds1, color=1, beta=beta)
    return wa, wb


def sweep_measure_packed6(model, wa, wb, key):
    """One MCS + fused per-sweep (m, e) densities from the phase-b
    kernel — the routed clock ensemble path."""
    _check_obs_sites(model.nsites)
    seeds0 = seeds_from_key(key, 0)
    seeds1 = seeds_from_key(key, 1)
    beta = float(model.beta)
    if jax.default_backend() in ("cpu", "gpu"):
        wa = _interpret_phase(wa, wb, seeds0, 0, beta)
        wb, obs = _interpret_phase(wb, wa, seeds1, 1, beta,
                                   measuring=True)
        m2 = obs[:, 0]
        e2 = obs[:, 1]
    else:
        wa = phase_packed(wa, wb, seeds0, color=0, beta=beta)
        wb, obs = phase_packed(wb, wa, seeds1, color=1, beta=beta,
                               measuring=True)
        m2 = obs[:, 0, 0]
        e2 = obs[:, 0, 1]
    half_n_inv = jnp.float32(0.5 / model.nsites)
    return wa, wb, {
        "m": m2.astype(jnp.float32) * half_n_inv,
        "e": e2.astype(jnp.float32) * half_n_inv,
    }


# ---------------------------------------------------------------------------
# halo-aware packed phase for the domain-sharded (shard_map) path
# ---------------------------------------------------------------------------

def packed_sharded_phase_reference6(xplanes, oplanes, color, planes8,
                                    hup, hdn,
                                    halo_lf=None, halo_rt=None):
    """Pure-jnp packed phase on a (y[, x])-sharded local block: word-row
    wrap replaced by synthetic edge words built from the exchanged
    boundary site planes ``hup``/``hdn`` (3-tuples of (1, half) 0/1
    int32 — σ, t0, t1 of the rows owned by the y-neighbor shards).
    ``halo_lf``/``halo_rt`` (3-tuples of (Lp, 1) packed word columns):
    x-sharded boundary columns replacing the lane-roll wrap — whole
    packed words, as in the Ising x-split (bits run along y, which
    x-sharding never cuts)."""
    xs, xt0, xt1 = [p.astype(jnp.uint32) for p in xplanes]
    os_, ot0, ot1 = [p.astype(jnp.uint32) for p in oplanes]

    def nbrs(o, up01, dn01, lf, rt):
        syn_up = up01.astype(jnp.uint32) << jnp.uint32(31)
        syn_dn = dn01.astype(jnp.uint32)
        w_prev = jnp.concatenate([syn_up, o[:-1]], axis=0)
        w_next = jnp.concatenate([o[1:], syn_dn], axis=0)
        one = jnp.uint32(1)
        up = (o << one) | (w_prev >> jnp.uint32(31))
        dn = (o >> one) | (w_next << jnp.uint32(31))
        if lf is not None:
            minus = jnp.concatenate(
                [lf.astype(jnp.uint32), o[:, :-1]], axis=1)
            plus = jnp.concatenate(
                [o[:, 1:], rt.astype(jnp.uint32)], axis=1)
        else:
            minus = jnp.roll(o, 1, axis=1)
            plus = jnp.roll(o, -1, axis=1)
        from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_multispin \
            import _EVEN_BITS, _ODD_BITS
        odd = jnp.uint32(_ODD_BITS)
        even = jnp.uint32(_EVEN_BITS)
        if color == 0:
            side = (plus & odd) | (minus & even)
        else:
            side = (minus & odd) | (plus & even)
        return (up, dn, o, side)

    lf3 = halo_lf if halo_lf is not None else (None,) * 3
    rt3 = halo_rt if halo_rt is not None else (None,) * 3
    ns = nbrs(os_, hup[0], hdn[0], lf3[0], rt3[0])
    nt0 = nbrs(ot0, hup[1], hdn[1], lf3[1], rt3[1])
    nt1 = nbrs(ot1, hup[2], hdn[2], lf3[2], rt3[2])
    planes8 = tuple(p.astype(jnp.uint32) for p in planes8)
    s, t0, t1, _ = _decide(xs, xt0, xt1, ns, nt0, nt1, planes8)
    return tuple(p.astype(jnp.int32) for p in (s, t0, t1))


def _sharded_phase_kernel6(seed_ref, offs_ref, xs_ref, xt0_ref, xt1_ref,
                           os_ref, ot0_ref, ot1_ref,
                           us_ref, ut0_ref, ut1_ref,
                           ds_ref, dt0_ref, dt1_ref,
                           hus_ref, hut0_ref, hut1_ref,
                           hds_ref, hdt0_ref, hdt1_ref,
                           *rest, color: int, digit5, typ: int,
                           nblk: int, n_inject: int,
                           has_cols: bool = False,
                           measuring: bool = False):
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    if has_cols:
        col_refs = refs[:6]          # (lf_s, lf_t0, lf_t1, rt_s, ...)
        refs = refs[6:]
    else:
        col_refs = (None,) * 6
    inject = refs[:n_inject]
    s_out, t0_out, t1_out = refs[n_inject:]
    r = pl.program_id(0)
    i = pl.program_id(1)

    def planes_of(o_ref, up_ref, dn_ref, hu_ref, hd_ref,
                  lf_ref=None, rt_ref=None):
        o = pltpu.bitcast(o_ref[0], jnp.uint32)
        syn_up = (pltpu.bitcast(hu_ref[0, 7:8, :], jnp.uint32)
                  << jnp.uint32(31))
        syn_dn = pltpu.bitcast(hd_ref[0, 0:1, :], jnp.uint32)
        up_row = jnp.where(i == 0, syn_up,
                           pltpu.bitcast(up_ref[0, 7:8, :], jnp.uint32))
        dn_row = jnp.where(i == nblk - 1, syn_dn,
                           pltpu.bitcast(dn_ref[0, 0:1, :], jnp.uint32))
        w_prev, w_next = stencil.splice_updown(o, up_row, dn_row)
        if not has_cols:
            return o, _nbr_planes(o, w_prev, w_next, color)
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
            pltpu.bitcast(lf_ref[0][:, 0:1], jnp.uint32), minus)
        plus = jnp.where(
            lane == o.shape[1] - 1,
            pltpu.bitcast(rt_ref[0][:, 0:1], jnp.uint32), plus)
        from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_multispin \
            import _EVEN_BITS, _ODD_BITS
        odd = jnp.uint32(_ODD_BITS)
        even = jnp.uint32(_EVEN_BITS)
        if color == 0:
            side = (plus & odd) | (minus & even)
        else:
            side = (minus & odd) | (plus & even)
        return o, (up, dn, o, side)

    xs = pltpu.bitcast(xs_ref[0], jnp.uint32)
    xt0 = pltpu.bitcast(xt0_ref[0], jnp.uint32)
    xt1 = pltpu.bitcast(xt1_ref[0], jnp.uint32)
    os_, ns = planes_of(os_ref, us_ref, ds_ref, hus_ref, hds_ref,
                        col_refs[0], col_refs[3])
    ot0, nt0 = planes_of(ot0_ref, ut0_ref, dt0_ref, hut0_ref, hdt0_ref,
                         col_refs[1], col_refs[4])
    ot1, nt1 = planes_of(ot1_ref, ut1_ref, dt1_ref, hut1_ref, hdt1_ref,
                         col_refs[2], col_refs[5])

    if n_inject:
        planes8 = tuple(
            pltpu.bitcast(ref[0], jnp.uint32) for ref in inject
        )
    else:
        # streams keyed per GLOBAL (replica, 8-word-row granule,
        # 128-lane chunk) — mesh-shape/tile-size invariant including
        # x-splits, matching the Ising packed sharded keying
        rep_g = offs_ref[0] + r
        col0 = offs_ref[2] if has_cols else jnp.int32(0)
        nck = xs.shape[1] // 128
        pieces = [[] for _ in range(8)]
        for g in range(typ // 8):
            wrow_g = offs_ref[1] + i * typ + g * 8
            row_tag = (wrow_g * jnp.int32(-1640531527)
                       + rep_g * jnp.int32(0x3C6EF35F))
            chunk_cols = [[] for _ in range(8)]
            for c in range(nck):
                tag = row_tag + ((col0 + c * 128)
                                 * jnp.int32(0x27D4EB2F))
                pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tag)

                def gen():
                    return pltpu.bitcast(
                        pltpu.prng_random_bits((8, 128)), jnp.uint32)

                p8 = draw_planes((8, 128), gen, digit5)
                for k in range(8):
                    chunk_cols[k].append(p8[k])
            for k in range(8):
                pieces[k].append(
                    chunk_cols[k][0] if nck == 1
                    else jnp.concatenate(chunk_cols[k], axis=1))
        planes8 = tuple(
            pieces[k][0] if typ == 8
            else jnp.concatenate(pieces[k], axis=0)
            for k in range(8)
        )

    s_new, t0_new, t1_new, fin = _decide(
        xs, xt0, xt1, ns, nt0, nt1, planes8
    )
    s_out[0] = pltpu.bitcast(s_new, jnp.int32)
    t0_out[0] = pltpu.bitcast(t0_new, jnp.int32)
    t1_out[0] = pltpu.bitcast(t1_new, jnp.int32)

    if measuring:
        nblk_sites = jnp.int32(xs.shape[0] * xs.shape[1] * PACK)
        m2, e2 = _obs_partial(s_new, t0_new, t1_new, os_, ot0, ot1,
                              fin, nblk_sites)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, m2, jnp.where(lane == 1, e2, 0))

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def interpret_planes_sharded(seeds, rep0, wrow0, nrep, nyp, half, beta,
                             col0=0):
    """Threefry planes keyed per (global replica, global word row,
    128-lane chunk) — the CPU fallback stream for the sharded engine
    (mesh-shape invariant, including x-splits via ``col0``)."""
    digit5 = accept_digit_planes(beta)
    base = jax.random.fold_in(
        jax.random.PRNGKey(seeds[0].astype(jnp.uint32)), seeds[1]
    )
    nck = half // 128

    def per_rep(r):
        kr = jax.random.fold_in(base, rep0 + r)

        def per_row(g):
            kg = jax.random.fold_in(kr, wrow0 + g)

            def per_chunk(c):
                kc = jax.random.fold_in(kg, col0 + c * 128)
                cnt = [0]

                def gen():
                    cnt[0] += 1
                    return jax.random.bits(
                        jax.random.fold_in(kc, cnt[0]), (128,),
                        dtype=jnp.uint32)

                return draw_planes((128,), gen, digit5)

            ck = jax.vmap(per_chunk)(jnp.arange(nck))
            return tuple(p.reshape(half) for p in ck)

        return jax.vmap(per_row)(jnp.arange(nyp))

    planes = jax.vmap(per_rep)(jnp.arange(nrep))
    return tuple(p.astype(jnp.int32) for p in planes)


def sharded_phase_packed6(xplanes, oplanes, hup, hdn, seeds, offs, *,
                          color: int, beta: float,
                          halo_lf=None, halo_rt=None, inject=None,
                          interpret: bool = False,
                          measuring: bool = False):
    """One packed clock phase of a (y[, x])-sharded local block.

    xplanes/oplanes: 3-tuples (σ, t0, t1) of (R, Lp, half) packed local
    color blocks; hup/hdn: 3-tuples of (R, 1, half) 0/1 int32 exchanged
    boundary-site planes of the other color
    (halo.exchange_halo_rows_packed applied per plane); offs: (rep0,
    wrow0) GLOBAL offsets.  ``measuring`` (phase b only) additionally
    returns per-shard (2m, 2e) int32 partials (R,) each — caller psums
    over the mesh's spatial axis and halves.

    ``halo_lf``/``halo_rt`` (3-tuples of (R, Lp, 1) packed word COLUMNS
    of the other color, with offs extended to (rep0, wrow0, lane0)):
    the x-sharded variant — exchanged boundary columns are whole packed
    words (bits run along y, which x-sharding never cuts), matching the
    Ising packed x-split and the reference's own x-split clock variant
    (/root/reference/src/clock/clock_dual_lattice_tableall_m.f90:62-63).
    """
    nrep, nyp, half = xplanes[0].shape
    has_cols = halo_lf is not None
    digit5 = accept_digit_planes(beta)
    typ = _pick_typ(nyp, 3 * half)
    n = nyp // typ
    nb8 = nyp // 8
    if interpret and inject is None:
        inject = interpret_planes_sharded(
            seeds, offs[0], offs[1], nrep, nyp, half, beta,
            offs[2] if has_cols else jnp.int32(0))
    n_inject = 8 if inject is not None else 0
    hup_p = [jnp.pad(h, ((0, 0), (7, 0), (0, 0))) for h in hup]
    hdn_p = [jnp.pad(h, ((0, 0), (0, 7), (0, 0))) for h in hdn]
    kernel = functools.partial(
        _sharded_phase_kernel6, color=color, digit5=digit5, typ=typ,
        nblk=n, n_inject=n_inject, has_cols=has_cols,
        measuring=measuring,
    )
    blk = pl.BlockSpec((1, typ, half), lambda r, i: (r, i, 0),
                       memory_space=pltpu.VMEM)
    up8 = pl.BlockSpec(
        (1, 8, half),
        lambda r, i: (r, (i * typ // 8 - 1 + nb8) % nb8, 0),
        memory_space=pltpu.VMEM,
    )
    dn8 = pl.BlockSpec(
        (1, 8, half),
        lambda r, i: (r, ((i + 1) * typ // 8) % nb8, 0),
        memory_space=pltpu.VMEM,
    )
    h8 = pl.BlockSpec((1, 8, half), lambda r, i: (r, 0, 0),
                      memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    in_specs += [blk] * 6 + [up8] * 3 + [dn8] * 3 + [h8] * 6
    operands = [seeds, offs, *xplanes, *oplanes, *oplanes, *oplanes,
                *hup_p, *hdn_p]
    if has_cols:
        # 128-lane alignment: exchanged word columns ride in lane 0
        col_spec = pl.BlockSpec((1, typ, 128), lambda r, i: (r, i, 0),
                                memory_space=pltpu.VMEM)
        in_specs += [col_spec] * 6
        operands += [jnp.pad(h, ((0, 0), (0, 0), (0, 127)))
                     for h in (*halo_lf, *halo_rt)]
    if inject is not None:
        in_specs += [blk] * 8
        operands += list(inject)
    plane_shape = jax.ShapeDtypeStruct((nrep, nyp, half), jnp.int32)
    out_shape = [plane_shape] * 3
    out_specs = [blk] * 3
    if measuring:
        out_shape.append(jax.ShapeDtypeStruct((nrep, 1, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 1, 128),
                                      lambda r, i: (r, 0, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(nrep, n),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        input_output_aliases={2: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(*operands)
    if measuring:
        return res[:3], res[3][:, 0, 0], res[3][:, 0, 1]
    return res[:3]


def shard_packed6_ok(local_shape: tuple[int, ...]) -> bool:
    """Local packed (R, Lp, half) word-block shape is tileable."""
    if len(local_shape) != 3:
        return False
    _, nyp, half = local_shape
    return half % 128 == 0 and nyp % 8 == 0


# ---------------------------------------------------------------------------
# padded packed engine: non-aligned even shapes on the SAME phase kernel
# ---------------------------------------------------------------------------
#
# The aligned engine needs ny % 256 == 0 and (nx/2) % 128 == 0, which
# excludes the reference's two LITERAL committed clock geometries:
# 2000x2000 (/root/reference/src/clock/clock_dual_lattice_yhalf_tableall
# _m.f90:13) and 1000x1000 (/root/reference/src/clock/clock_simple_gpu_m
# .f90:10-13).  Instead of a masked kernel variant, the padded engine
# runs the UNCHANGED phase kernel on word/lane-padded planes and keeps
# the periodic wrap exact with a tiny per-phase "refresh" of the only
# pad positions the kernel ever reads on behalf of real sites:
#
# - y wrap.  Sites pack 32/word along y.  The kernel reads w_prev only
#   through `w_prev >> 31` (bit 31 = the site above row 0's wrap) and
#   w_next only through `w_next << 31` (bit 0).  So it suffices that
#     * the partial top word (ny % 32 != 0) carries a copy of the
#       first rows in its pad bits (its in-word shift then yields the
#       wrap neighbor of y = ny-1 directly), and
#     * the LAST padded word row holds a word whose bit 31 is site
#       y = ny-1 (it is the modular w_prev of word row 0).
#   Every other pad word row is written garbage and never read for a
#   real site (word row r only ever reads r +- 1).
# - x wrap.  `pltpu.roll(o, +-1, axis=1)` wraps at the padded lane
#   count, so lane `half` gets a copy of lane 0 (read as the +x
#   neighbor of lane half-1) and lane halfp-1 a copy of lane half-1
#   (read as the -x neighbor of lane 0).
#
# Pad sites consume PRNG planes and are updated with garbage, but the
# refresh overwrites every pad position the next phase reads, so real
# dynamics are exactly the periodic dynamics.  Observables are masked
# popcount sums at jnp level (the in-kernel fused obs would count pad
# bits); measurement is a pure function of the final packed state.
# Overhead for 2000x2000: word rows 63->64, lanes 1000->1024 (~4.6%).

class PadSpec(NamedTuple):
    ny: int       # real site rows per color array
    half: int     # real lanes (nx / 2)
    nyw: int      # real word rows = ceil(ny / 32)
    nb: int       # ny % 32 (real bits in the partial top word)
    nyp: int      # padded word rows (multiple of 8)
    halfp: int    # padded lanes (multiple of 128)


def padded_spec(ny: int, half: int) -> PadSpec | None:
    """Pad geometry for a color array, or None if the shape is either
    fully aligned (plain engine) or not padded-servable."""
    if ny % 2 or ny < 4 or half < 2:
        return None
    nyw = -(-ny // PACK)
    nb = ny % PACK
    y_aligned = nb == 0 and nyw % 8 == 0
    halfp = -(-half // 128) * 128
    if y_aligned and halfp == half:
        return None      # aligned: the plain engine serves it
    if halfp != half and halfp - half < 2:
        return None      # the two pad-lane copies need distinct lanes
    if nb and nyw < 2:
        return None      # wrap word splices the top TWO real words
    nyp = nyw if y_aligned else -(-(nyw + 1) // 8) * 8
    return PadSpec(ny, half, nyw, nb, nyp, halfp)


def pad_mask(spec: PadSpec) -> jax.Array:
    """uint32 (nyp, halfp) plane with real-site bits set."""
    m = np.zeros((spec.nyp, spec.halfp), np.uint32)
    m[:spec.nyw, :spec.half] = np.uint32(0xFFFFFFFF)
    if spec.nb:
        m[spec.nyw - 1, :spec.half] = np.uint32((1 << spec.nb) - 1)
    return jnp.asarray(m)


def _refresh_plane(w: jax.Array, spec: PadSpec) -> jax.Array:
    """Rewrite the pad words/lanes the next phase reads (see header)."""
    u = w.astype(jnp.uint32)
    rp = spec.nyw - 1
    if spec.nb:
        low = jnp.uint32((1 << spec.nb) - 1)
        w0 = u[..., 0, :]
        wrp = (u[..., rp, :] & low) | (w0 << jnp.uint32(spec.nb))
        u = u.at[..., rp, :].set(wrp)
        wrap = ((wrp << jnp.uint32(32 - spec.nb))
                | (u[..., rp - 1, :] >> jnp.uint32(spec.nb)))
        u = u.at[..., spec.nyp - 1, :].set(wrap)
    elif spec.nyp != spec.nyw:
        f, last = spec.nyw, spec.nyp - 1
        if f == last:
            comb = ((u[..., 0, :] & jnp.uint32(1))
                    | (u[..., rp, :] & jnp.uint32(0x80000000)))
            u = u.at[..., f, :].set(comb)
        else:
            u = u.at[..., f, :].set(u[..., 0, :])
            u = u.at[..., last, :].set(u[..., rp, :])
    if spec.halfp != spec.half:
        u = u.at[..., :, spec.half].set(u[..., :, 0])
        u = u.at[..., :, spec.halfp - 1].set(u[..., :, spec.half - 1])
    return u.astype(jnp.int32)


def refresh_padded(planes, spec: PadSpec):
    return tuple(_refresh_plane(p, spec) for p in planes)


def pack_clock_color_padded(plane: jax.Array, spec: PadSpec):
    """(..., ny, half) int8 states -> padded (s, t0, t1) word planes
    (..., nyp, halfp), pad region zeroed (refresh fills what matters)."""
    pad_y = spec.nyp * PACK - spec.ny
    pad_x = spec.halfp - spec.half
    widths = [(0, 0)] * (plane.ndim - 2) + [(0, pad_y), (0, pad_x)]
    return pack_clock_color(jnp.pad(plane, widths))


def unpack_clock_color_padded(s, t0, t1, spec: PadSpec):
    return unpack_clock_color(s, t0, t1)[..., :spec.ny, :spec.half]


def sweep_packed6_padded(model, spec: PadSpec, wa, wb, key):
    """One full MCS on padded packed plane triplets."""
    seeds0 = seeds_from_key(key, 0)
    seeds1 = seeds_from_key(key, 1)
    beta = float(model.beta)
    interp = jax.default_backend() in ("cpu", "gpu")
    wb = refresh_padded(wb, spec)
    if interp:
        wa = _interpret_phase(wa, wb, seeds0, 0, beta)
    else:
        wa = phase_packed(wa, wb, seeds0, color=0, beta=beta)
    wa = refresh_padded(wa, spec)
    if interp:
        wb = _interpret_phase(wb, wa, seeds1, 1, beta)
    else:
        wb = phase_packed(wb, wa, seeds1, color=1, beta=beta)
    return wa, wb


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


def sweep_measure_packed6_padded(model, spec: PadSpec, wa, wb, key):
    """One MCS + per-sweep (m, e) densities on the padded engine.

    On the chip the masked sums are FUSED into the phase-b kernel
    (``obs_mask`` operand): 8.90→9.89×10¹⁰ flips/s at the literal
    2000² routed ensemble (BENCHMARKS.md); the interpret path keeps
    the separate jnp obs (its phase is the jnp oracle)."""
    _check_obs_sites(model.nsites)
    beta = float(model.beta)
    if jax.default_backend() in ("cpu", "gpu"):
        wa, wb = sweep_packed6_padded(model, spec, wa, wb, key)
        m2, e2 = obs_packed6_masked(wa, wb, spec)
    else:
        wb = refresh_padded(wb, spec)
        wa = phase_packed(wa, wb, seeds_from_key(key, 0),
                          color=0, beta=beta)
        wa = refresh_padded(wa, spec)
        wb, obs = phase_packed(wb, wa, seeds_from_key(key, 1),
                               color=1, beta=beta, measuring=True,
                               obs_mask=pad_mask(spec))
        m2 = obs[:, 0, 0]
        e2 = obs[:, 0, 1]
    half_n_inv = jnp.float32(0.5 / model.nsites)
    return wa, wb, {
        "m": m2.astype(jnp.float32) * half_n_inv,
        "e": e2.astype(jnp.float32) * half_n_inv,
    }


# overhead gate: below this real/padded occupancy the int8 engine wins
_PAD_MIN_OCCUPANCY = 0.35


def clock_padded_packable(model) -> bool:
    """Shape/parameter gate for the padded packed q=6 engine."""
    if getattr(model, "q", None) != 6:
        return False
    ny, half = model.color_shape
    spec = padded_spec(ny, half)
    if spec is None:
        return False
    occ = (ny / (spec.nyp * PACK)) * (half / spec.halfp)
    return (occ >= _PAD_MIN_OCCUPANCY
            and model.nsites <= OBS_INT32_MAX_SITES)
