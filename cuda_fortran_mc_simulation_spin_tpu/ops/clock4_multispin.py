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
ising2d_multispin contract.  Padded (non-aligned even) shapes reuse the
q=6 module's shape-generic pad/refresh machinery (padded_spec,
refresh_padded, pad_mask are plane-count agnostic).  Domain-sharded
meshes take :func:`sharded_phase_packed4` inside shard_map (y-halos as
boundary digit-bit planes, x-halos as boundary word columns, granule-
keyed PRNG — the q=6 sharded machinery transferred to two planes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.ops import stencil
from cuda_fortran_mc_simulation_spin_tpu.ops.clock_multispin import (
    _chain_len,
    _fa,
    _ha,
    _lt_multi,
    _nbr_planes_jnp,
    PadSpec,
    pad_mask,
    padded_spec,
    refresh_padded,
)
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

# fused (m, e) partials accumulate in int32; |e| ≤ 2N
OBS_INT32_MAX_SITES = (2 ** 31 - 1) // 2

# proposal thermometer: 12-bit thresholds round(k·4096/3); rounded
# category sizes {1365, 1366, 1365} are symmetric around r=2, so
# P(r) = P(4−r) holds exactly and detailed balance is exact
_PROP_BITS = 12
_PROP_T = tuple(int(round(k * 4096 / 3)) for k in (1, 2))


def _check_obs_sites(nsites: int) -> None:
    if nsites > OBS_INT32_MAX_SITES:
        raise ValueError(
            f"lattice of {nsites} sites overflows the int32 fused-"
            f"observable accumulators (max {OBS_INT32_MAX_SITES})"
        )


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

def _packbits(bits8):
    ny, half = bits8.shape[-2:]
    b = bits8.astype(jnp.uint32).reshape(
        bits8.shape[:-2] + (ny // PACK, PACK, half)
    )
    w = jnp.zeros(bits8.shape[:-2] + (ny // PACK, half), jnp.uint32)
    for k in range(PACK):
        w = w | (b[..., k, :] << np.uint32(k))
    return w.astype(jnp.int32)


def _unpackbits(w):
    wu = w.astype(jnp.uint32)
    rows = [((wu >> np.uint32(k)) & jnp.uint32(1)).astype(jnp.int32)
            for k in range(PACK)]
    st = jnp.stack(rows, axis=-2)
    shape = w.shape[:-2] + (w.shape[-2] * PACK, w.shape[-1])
    return st.reshape(shape)


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


# ---------------------------------------------------------------------------
# jnp oracle (periodic wrap via roll) — bitwise test target
# ---------------------------------------------------------------------------

def packed_phase_reference4(xplanes, oplanes, color, planes6):
    """Pure-jnp packed q=4 phase on full planes — the oracle the Pallas
    kernel is tested against bitwise (injected planes6)."""
    xb0, xb1 = [p.astype(jnp.uint32) for p in xplanes]
    ob0, ob1 = [p.astype(jnp.uint32) for p in oplanes]
    nb0 = _nbr_planes_jnp(ob0, color)
    nb1 = _nbr_planes_jnp(ob1, color)
    planes6 = tuple(p.astype(jnp.uint32) for p in planes6)
    b0, b1, _ = _decide4(xb0, xb1, nb0, nb1, planes6)
    return tuple(p.astype(jnp.int32) for p in (b0, b1))


# ---------------------------------------------------------------------------
# Pallas streaming phase kernel
# ---------------------------------------------------------------------------

def _phase_kernel4(seed_ref, xb0_ref, xb1_ref, ob0_ref, ob1_ref,
                   u0_ref, u1_ref, d0_ref, d1_ref,
                   *rest, color: int, digit4, n_inject: int,
                   has_mask: bool = False,
                   measuring: bool = False):
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    mask_ref = refs.pop(0) if has_mask else None
    inject = refs[:n_inject]
    b0_out, b1_out = refs[n_inject:]
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

    xb0 = pltpu.bitcast(xb0_ref[0], jnp.uint32)
    xb1 = pltpu.bitcast(xb1_ref[0], jnp.uint32)
    ob0, nb0 = planes_of(ob0_ref, u0_ref, d0_ref)
    ob1, nb1 = planes_of(ob1_ref, u1_ref, d1_ref)

    if n_inject:
        planes6 = tuple(
            pltpu.bitcast(ref[0], jnp.uint32) for ref in inject
        )
    else:
        tile_tag = i * jnp.int32(-1640531527) + r * jnp.int32(0x3C6EF35F)
        pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)

        def gen():
            return pltpu.bitcast(pltpu.prng_random_bits(xb0.shape),
                                 jnp.uint32)

        planes6 = draw_planes4(xb0.shape, gen, digit4)

    b0_new, b1_new, fin = _decide4(xb0, xb1, nb0, nb1, planes6)
    b0_out[0] = pltpu.bitcast(b0_new, jnp.int32)
    b1_out[0] = pltpu.bitcast(b1_new, jnp.int32)

    if measuring:
        nblk = jnp.int32(xb0.shape[0] * xb0.shape[1] * PACK)
        mask = (pltpu.bitcast(mask_ref[...], jnp.uint32)
                if has_mask else None)
        m, e = _obs_partial4(b0_new, b1_new, ob0, ob1, fin, nblk, mask)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, m, jnp.where(lane == 1, e, 0))

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def phase_packed4(xplanes, oplanes, seeds, *, color: int, beta: float,
                  inject=None, obs_mask=None, interpret: bool = False,
                  measuring: bool = False):
    """One packed q=4 checkerboard phase on (R, nyp, half) plane pairs.

    ``inject``: optional 6-tuple of (R, nyp, half) int32 planes
    (r0, r1, B₁, B₂, B₄, B₈) replacing the in-kernel PRNG — the
    bitwise-testable entry mirroring :func:`packed_phase_reference4`.
    ``measuring`` (phase b only) additionally returns per-replica
    (m, e) int32 sums; ``obs_mask`` restricts them to real sites
    (padded engine)."""
    nrep, nyp, half = xplanes[0].shape
    digit4 = accept_digit_planes4(beta)
    typ = _pick_typ(nyp, 2 * half)
    n = nyp // typ
    nb8 = nyp // 8
    n_inject = 6 if inject is not None else 0
    has_mask = measuring and obs_mask is not None
    kernel = functools.partial(
        _phase_kernel4, color=color, digit4=digit4, n_inject=n_inject,
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
    in_specs += [blk] * 4 + [up8] * 2 + [dn8] * 2
    operands = [seeds, *xplanes, *oplanes, *oplanes, *oplanes]
    if has_mask:
        in_specs.append(pl.BlockSpec((typ, half), lambda r, i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(obs_mask.astype(jnp.int32))
    if inject is not None:
        in_specs += [blk] * 6
        operands += list(inject)
    plane_shape = jax.ShapeDtypeStruct((nrep, nyp, half), jnp.int32)
    out_shape = [plane_shape] * 2
    out_specs = [blk] * 2
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
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(*operands)
    if measuring:
        return res[:2], res[2]
    return res


# ---------------------------------------------------------------------------
# interpret-mode plane source (CPU tests / oracle statistics)
# ---------------------------------------------------------------------------

def interpret_planes4(seeds, nrep, nyp, half, beta):
    """Threefry-derived (r0, r1, B…) planes keyed per (replica, word
    row) — the CPU fallback stream (same statistics as the on-chip
    hardware PRNG, different bits)."""
    digit4 = accept_digit_planes4(beta)
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

            return draw_planes4((half,), gen, digit4)

        return jax.vmap(per_row)(jnp.arange(nyp))

    planes = jax.vmap(per_rep)(jnp.arange(nrep))
    return tuple(p.astype(jnp.int32) for p in planes)


# ---------------------------------------------------------------------------
# sweep wrappers (the routed ensemble path)
# ---------------------------------------------------------------------------

def clock4_packable(model) -> bool:
    """Shape/parameter gate for the packed q=4 engine."""
    if getattr(model, "q", None) != 4:
        return False
    ny, half = model.color_shape
    return (packable(ny, half)
            and model.nsites <= OBS_INT32_MAX_SITES)


def pack_state4(state):
    a, b = state
    batched = a.ndim == 3
    if not batched:
        a, b = a[None], b[None]
    return pack_clock4_color(a), pack_clock4_color(b), batched


def unpack_state4(wa, wb, batched: bool):
    from cuda_fortran_mc_simulation_spin_tpu.models.base import (
        CheckerboardState,
    )
    a = unpack_clock4_color(*wa)
    b = unpack_clock4_color(*wb)
    if not batched:
        a, b = a[0], b[0]
    return CheckerboardState(a, b)


def _interpret_phase4(xplanes, oplanes, seeds, color, beta,
                      measuring=False):
    nrep, nyp, half = xplanes[0].shape
    inject = interpret_planes4(seeds, nrep, nyp, half, beta)
    xb0, xb1 = [p.astype(jnp.uint32) for p in xplanes]
    ob0, ob1 = [p.astype(jnp.uint32) for p in oplanes]

    def one(xb0, xb1, ob0, ob1, *planes6):
        nb0 = _nbr_planes_jnp(ob0, color)
        nb1 = _nbr_planes_jnp(ob1, color)
        b0, b1, fin = _decide4(
            xb0, xb1, nb0, nb1,
            tuple(p.astype(jnp.uint32) for p in planes6),
        )
        nblk = jnp.int32(nyp * half * PACK)
        m, e = _obs_partial4(b0, b1, ob0, ob1, fin, nblk)
        return (tuple(p.astype(jnp.int32) for p in (b0, b1)),
                jnp.stack([m, e]))

    new, obs = jax.vmap(one)(xb0, xb1, ob0, ob1, *inject)
    if measuring:
        return new, obs
    return new


def sweep_packed4(model, wa, wb, key):
    """One full MCS on packed q=4 plane pairs."""
    seeds0 = seeds_from_key(key, 0)
    seeds1 = seeds_from_key(key, 1)
    beta = float(model.beta)
    if jax.default_backend() in ("cpu", "gpu"):
        wa = _interpret_phase4(wa, wb, seeds0, 0, beta)
        wb = _interpret_phase4(wb, wa, seeds1, 1, beta)
        return wa, wb
    wa = phase_packed4(wa, wb, seeds0, color=0, beta=beta)
    wb = phase_packed4(wb, wa, seeds1, color=1, beta=beta)
    return wa, wb


def sweep_measure_packed4(model, wa, wb, key):
    """One MCS + fused per-sweep (m, e) densities from the phase-b
    kernel — the routed q=4 clock ensemble path."""
    _check_obs_sites(model.nsites)
    seeds0 = seeds_from_key(key, 0)
    seeds1 = seeds_from_key(key, 1)
    beta = float(model.beta)
    if jax.default_backend() in ("cpu", "gpu"):
        wa = _interpret_phase4(wa, wb, seeds0, 0, beta)
        wb, obs = _interpret_phase4(wb, wa, seeds1, 1, beta,
                                    measuring=True)
        m = obs[:, 0]
        e = obs[:, 1]
    else:
        wa = phase_packed4(wa, wb, seeds0, color=0, beta=beta)
        wb, obs = phase_packed4(wb, wa, seeds1, color=1, beta=beta,
                                measuring=True)
        m = obs[:, 0, 0]
        e = obs[:, 0, 1]
    n_inv = jnp.float32(1.0 / model.nsites)
    return wa, wb, {
        "m": m.astype(jnp.float32) * n_inv,
        "e": e.astype(jnp.float32) * n_inv,
    }


# ---------------------------------------------------------------------------
# padded engine: non-aligned even shapes on the SAME phase kernel,
# reusing the q=6 module's shape-generic pad/refresh machinery
# ---------------------------------------------------------------------------

def pack_clock4_color_padded(plane: jax.Array, spec: PadSpec):
    """(..., ny, half) int8 states -> padded (b0, b1) word planes
    (..., nyp, halfp), pad region zeroed (refresh fills what matters)."""
    pad_y = spec.nyp * PACK - spec.ny
    pad_x = spec.halfp - spec.half
    widths = [(0, 0)] * (plane.ndim - 2) + [(0, pad_y), (0, pad_x)]
    return pack_clock4_color(jnp.pad(plane, widths))


def unpack_clock4_color_padded(b0, b1, spec: PadSpec):
    return unpack_clock4_color(b0, b1)[..., :spec.ny, :spec.half]


def sweep_packed4_padded(model, spec: PadSpec, wa, wb, key):
    """One full MCS on padded packed q=4 plane pairs."""
    seeds0 = seeds_from_key(key, 0)
    seeds1 = seeds_from_key(key, 1)
    beta = float(model.beta)
    interp = jax.default_backend() in ("cpu", "gpu")
    wb = refresh_padded(wb, spec)
    if interp:
        wa = _interpret_phase4(wa, wb, seeds0, 0, beta)
    else:
        wa = phase_packed4(wa, wb, seeds0, color=0, beta=beta)
    wa = refresh_padded(wa, spec)
    if interp:
        wb = _interpret_phase4(wb, wa, seeds1, 1, beta)
    else:
        wb = phase_packed4(wb, wa, seeds1, color=1, beta=beta)
    return wa, wb


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


def sweep_measure_packed4_padded(model, spec: PadSpec, wa, wb, key):
    """One MCS + per-sweep (m, e) densities on the padded q=4 engine
    (fused masked obs in the phase-b kernel on the chip)."""
    _check_obs_sites(model.nsites)
    beta = float(model.beta)
    if jax.default_backend() in ("cpu", "gpu"):
        wa, wb = sweep_packed4_padded(model, spec, wa, wb, key)
        m, e = obs_packed4_masked(wa, wb, spec)
    else:
        wb = refresh_padded(wb, spec)
        wa = phase_packed4(wa, wb, seeds_from_key(key, 0),
                           color=0, beta=beta)
        wa = refresh_padded(wa, spec)
        wb, obs = phase_packed4(wb, wa, seeds_from_key(key, 1),
                                color=1, beta=beta, measuring=True,
                                obs_mask=pad_mask(spec))
        m = obs[:, 0, 0]
        e = obs[:, 0, 1]
    n_inv = jnp.float32(1.0 / model.nsites)
    return wa, wb, {
        "m": m.astype(jnp.float32) * n_inv,
        "e": e.astype(jnp.float32) * n_inv,
    }


# ---------------------------------------------------------------------------
# sharded engine: the q=4 packed kernel inside shard_map — structured
# exactly like the q=6 sharded engine (ops/clock_multispin.py): y-halos
# as exchanged boundary-site bit planes spliced into synthetic edge
# words, x-halos as whole boundary WORD COLUMNS (x-sharding never cuts
# the packed bit axis), PRNG streams keyed per GLOBAL (replica,
# 8-word-row granule, 128-lane chunk) so trajectories are bitwise
# invariant to the mesh shape.
# ---------------------------------------------------------------------------

def packed_sharded_phase_reference4(xplanes, oplanes, color, planes6,
                                    hup, hdn,
                                    halo_lf=None, halo_rt=None):
    """Pure-jnp packed q=4 phase on a (y[, x])-sharded local block:
    word-row wrap replaced by synthetic edge words built from the
    exchanged boundary site planes ``hup``/``hdn`` (2-tuples of
    (1, half) 0/1 int32 — b0, b1 of the rows owned by the y-neighbor
    shards).  ``halo_lf``/``halo_rt`` (2-tuples of (Lp, 1) packed word
    columns): x-sharded boundary columns replacing the lane-roll wrap."""
    from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_multispin \
        import _EVEN_BITS, _ODD_BITS

    xb0, xb1 = [p.astype(jnp.uint32) for p in xplanes]
    ob0, ob1 = [p.astype(jnp.uint32) for p in oplanes]

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
        odd = jnp.uint32(_ODD_BITS)
        even = jnp.uint32(_EVEN_BITS)
        if color == 0:
            side = (plus & odd) | (minus & even)
        else:
            side = (minus & odd) | (plus & even)
        return (up, dn, o, side)

    lf2 = halo_lf if halo_lf is not None else (None,) * 2
    rt2 = halo_rt if halo_rt is not None else (None,) * 2
    nb0 = nbrs(ob0, hup[0], hdn[0], lf2[0], rt2[0])
    nb1 = nbrs(ob1, hup[1], hdn[1], lf2[1], rt2[1])
    planes6 = tuple(p.astype(jnp.uint32) for p in planes6)
    b0, b1, _ = _decide4(xb0, xb1, nb0, nb1, planes6)
    return tuple(p.astype(jnp.int32) for p in (b0, b1))


def _sharded_phase_kernel4(seed_ref, offs_ref, xb0_ref, xb1_ref,
                           ob0_ref, ob1_ref,
                           ub0_ref, ub1_ref, db0_ref, db1_ref,
                           hub0_ref, hub1_ref, hdb0_ref, hdb1_ref,
                           *rest, color: int, digit4, typ: int,
                           nblk: int, n_inject: int,
                           has_cols: bool = False,
                           measuring: bool = False):
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    if has_cols:
        col_refs = refs[:4]          # (lf_b0, lf_b1, rt_b0, rt_b1)
        refs = refs[4:]
    else:
        col_refs = (None,) * 4
    inject = refs[:n_inject]
    b0_out, b1_out = refs[n_inject:]
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
        # x-sharded block: replace the lane-roll wrap's edge lanes
        # with the exchanged boundary word-columns
        from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_multispin \
            import _EVEN_BITS, _ODD_BITS
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
        odd = jnp.uint32(_ODD_BITS)
        even = jnp.uint32(_EVEN_BITS)
        if color == 0:
            side = (plus & odd) | (minus & even)
        else:
            side = (minus & odd) | (plus & even)
        return o, (up, dn, o, side)

    xb0 = pltpu.bitcast(xb0_ref[0], jnp.uint32)
    xb1 = pltpu.bitcast(xb1_ref[0], jnp.uint32)
    ob0, nb0 = planes_of(ob0_ref, ub0_ref, db0_ref, hub0_ref, hdb0_ref,
                         col_refs[0], col_refs[2])
    ob1, nb1 = planes_of(ob1_ref, ub1_ref, db1_ref, hub1_ref, hdb1_ref,
                         col_refs[1], col_refs[3])

    if n_inject:
        planes6 = tuple(
            pltpu.bitcast(ref[0], jnp.uint32) for ref in inject
        )
    else:
        # streams keyed per GLOBAL (replica, 8-word-row granule,
        # 128-lane chunk) — mesh-shape/tile-size invariant incl.
        # x-splits, matching the q=6 and Ising packed sharded keying
        rep_g = offs_ref[0] + r
        col0 = offs_ref[2] if has_cols else jnp.int32(0)
        nck = xb0.shape[1] // 128
        pieces = [[] for _ in range(6)]
        for g in range(typ // 8):
            wrow_g = offs_ref[1] + i * typ + g * 8
            row_tag = (wrow_g * jnp.int32(-1640531527)
                       + rep_g * jnp.int32(0x3C6EF35F))
            chunk_cols = [[] for _ in range(6)]
            for c in range(nck):
                tag = row_tag + ((col0 + c * 128)
                                 * jnp.int32(0x27D4EB2F))
                pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tag)

                def gen():
                    return pltpu.bitcast(
                        pltpu.prng_random_bits((8, 128)), jnp.uint32)

                p6 = draw_planes4((8, 128), gen, digit4)
                for k in range(6):
                    chunk_cols[k].append(p6[k])
            for k in range(6):
                pieces[k].append(
                    chunk_cols[k][0] if nck == 1
                    else jnp.concatenate(chunk_cols[k], axis=1))
        planes6 = tuple(
            pieces[k][0] if typ == 8
            else jnp.concatenate(pieces[k], axis=0)
            for k in range(6)
        )

    b0_new, b1_new, fin = _decide4(xb0, xb1, nb0, nb1, planes6)
    b0_out[0] = pltpu.bitcast(b0_new, jnp.int32)
    b1_out[0] = pltpu.bitcast(b1_new, jnp.int32)

    if measuring:
        nblk_sites = jnp.int32(xb0.shape[0] * xb0.shape[1] * PACK)
        m, e = _obs_partial4(b0_new, b1_new, ob0, ob1, fin, nblk_sites)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, m, jnp.where(lane == 1, e, 0))

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def interpret_planes_sharded4(seeds, rep0, wrow0, nrep, nyp, half,
                              beta, col0=0):
    """Threefry planes keyed per (global replica, global word row,
    128-lane chunk) — the CPU fallback stream for the sharded q=4
    engine (mesh-shape invariant, including x-splits via ``col0``)."""
    digit4 = accept_digit_planes4(beta)
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

                return draw_planes4((128,), gen, digit4)

            ck = jax.vmap(per_chunk)(jnp.arange(nck))
            return tuple(p.reshape(half) for p in ck)

        return jax.vmap(per_row)(jnp.arange(nyp))

    planes = jax.vmap(per_rep)(jnp.arange(nrep))
    return tuple(p.astype(jnp.int32) for p in planes)


def sharded_phase_packed4(xplanes, oplanes, hup, hdn, seeds, offs, *,
                          color: int, beta: float,
                          halo_lf=None, halo_rt=None, inject=None,
                          interpret: bool = False,
                          measuring: bool = False):
    """One packed q=4 clock phase of a (y[, x])-sharded local block.

    xplanes/oplanes: 2-tuples (b0, b1) of (R, Lp, half) packed local
    color blocks; hup/hdn: 2-tuples of (R, 1, half) 0/1 int32 exchanged
    boundary-site digit planes of the other color; offs: (rep0, wrow0)
    GLOBAL offsets ((rep0, wrow0, lane0) with column halos).
    ``measuring`` (phase b only) additionally returns per-shard (m, e)
    int32 partials (R,) each — caller psums over the mesh's spatial
    axes.  ``halo_lf``/``halo_rt``: 2-tuples of (R, Lp, 1) packed word
    COLUMNS of the other color (the x-sharded variant)."""
    nrep, nyp, half = xplanes[0].shape
    has_cols = halo_lf is not None
    digit4 = accept_digit_planes4(beta)
    typ = _pick_typ(nyp, 2 * half)
    n = nyp // typ
    nb8 = nyp // 8
    if interpret and inject is None:
        inject = interpret_planes_sharded4(
            seeds, offs[0], offs[1], nrep, nyp, half, beta,
            offs[2] if has_cols else jnp.int32(0))
    n_inject = 6 if inject is not None else 0
    hup_p = [jnp.pad(h, ((0, 0), (7, 0), (0, 0))) for h in hup]
    hdn_p = [jnp.pad(h, ((0, 0), (0, 7), (0, 0))) for h in hdn]
    kernel = functools.partial(
        _sharded_phase_kernel4, color=color, digit4=digit4, typ=typ,
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
    in_specs += [blk] * 4 + [up8] * 2 + [dn8] * 2 + [h8] * 4
    operands = [seeds, offs, *xplanes, *oplanes, *oplanes, *oplanes,
                *hup_p, *hdn_p]
    if has_cols:
        # 128-lane alignment: exchanged word columns ride in lane 0
        col_spec = pl.BlockSpec((1, typ, 128), lambda r, i: (r, i, 0),
                                memory_space=pltpu.VMEM)
        in_specs += [col_spec] * 4
        operands += [jnp.pad(h, ((0, 0), (0, 0), (0, 127)))
                     for h in (*halo_lf, *halo_rt)]
    if inject is not None:
        in_specs += [blk] * 6
        operands += list(inject)
    plane_shape = jax.ShapeDtypeStruct((nrep, nyp, half), jnp.int32)
    out_shape = [plane_shape] * 2
    out_specs = [blk] * 2
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
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
    )(*operands)
    if measuring:
        return res[:2], res[2][:, 0, 0], res[2][:, 0, 1]
    return res[:2]


def shard_packed4_ok(local_shape: tuple[int, ...]) -> bool:
    """Local packed (R, Lp, half) word-block shape is tileable."""
    if len(local_shape) != 3:
        return False
    _, nyp, half = local_shape
    return half % 128 == 0 and nyp % 8 == 0


# overhead gate shared with the q=6 engine
_PAD_MIN_OCCUPANCY = 0.35


def clock4_padded_packable(model) -> bool:
    """Shape/parameter gate for the padded packed q=4 engine."""
    if getattr(model, "q", None) != 4:
        return False
    ny, half = model.color_shape
    spec = padded_spec(ny, half)
    if spec is None:
        return False
    occ = (ny / (spec.nyp * PACK)) * (half / spec.halfp)
    return (occ >= _PAD_MIN_OCCUPANCY
            and model.nsites <= OBS_INT32_MAX_SITES)
