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
ising2d_multispin contract.  Padded (non-aligned even) shapes reuse the
q=6 module's shape-generic pad/refresh machinery; domain-sharded meshes
take :func:`sharded_phase_packed3` inside shard_map (y-halos as
boundary digit-bit planes, x-halos as boundary word columns, granule-
keyed PRNG — the q=4 sharded machinery, which is also 2-plane).
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
    _nbr_planes_jnp,
    PadSpec,
    pad_mask,
    padded_spec,
    refresh_padded,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.clock4_multispin import (
    _packbits,
    _unpackbits,
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

# fused (2m, 2e) partials accumulate in int32; |2e| ≤ 4N
OBS_INT32_MAX_SITES = (2 ** 31 - 1) // 4


def _check_obs_sites(nsites: int) -> None:
    if nsites > OBS_INT32_MAX_SITES:
        raise ValueError(
            f"lattice of {nsites} sites overflows the int32 fused-"
            f"observable accumulators (max {OBS_INT32_MAX_SITES})"
        )


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


# ---------------------------------------------------------------------------
# jnp oracle (periodic wrap via roll) — bitwise test target
# ---------------------------------------------------------------------------

def packed_phase_reference3(xplanes, oplanes, color, planes4):
    """Pure-jnp packed q=3 phase on full planes — the oracle the Pallas
    kernel is tested against bitwise (injected planes4)."""
    xt0, xt1 = [p.astype(jnp.uint32) for p in xplanes]
    ot0, ot1 = [p.astype(jnp.uint32) for p in oplanes]
    nt0 = _nbr_planes_jnp(ot0, color)
    nt1 = _nbr_planes_jnp(ot1, color)
    planes4 = tuple(p.astype(jnp.uint32) for p in planes4)
    t0, t1, _ = _decide3(xt0, xt1, nt0, nt1, planes4)
    return tuple(p.astype(jnp.int32) for p in (t0, t1))


# ---------------------------------------------------------------------------
# Pallas streaming phase kernel
# ---------------------------------------------------------------------------

def _phase_kernel3(seed_ref, xt0_ref, xt1_ref, ot0_ref, ot1_ref,
                   u0_ref, u1_ref, d0_ref, d1_ref,
                   *rest, color: int, digit3, n_inject: int,
                   has_mask: bool = False,
                   measuring: bool = False):
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    mask_ref = refs.pop(0) if has_mask else None
    inject = refs[:n_inject]
    t0_out, t1_out = refs[n_inject:]
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

    xt0 = pltpu.bitcast(xt0_ref[0], jnp.uint32)
    xt1 = pltpu.bitcast(xt1_ref[0], jnp.uint32)
    ot0, nt0 = planes_of(ot0_ref, u0_ref, d0_ref)
    ot1, nt1 = planes_of(ot1_ref, u1_ref, d1_ref)

    if n_inject:
        planes4 = tuple(
            pltpu.bitcast(ref[0], jnp.uint32) for ref in inject
        )
    else:
        tile_tag = i * jnp.int32(-1640531527) + r * jnp.int32(0x3C6EF35F)
        pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)

        def gen():
            return pltpu.bitcast(pltpu.prng_random_bits(xt0.shape),
                                 jnp.uint32)

        planes4 = draw_planes3(xt0.shape, gen, digit3)

    t0_new, t1_new, eq_fin = _decide3(xt0, xt1, nt0, nt1, planes4)
    t0_out[0] = pltpu.bitcast(t0_new, jnp.int32)
    t1_out[0] = pltpu.bitcast(t1_new, jnp.int32)

    if measuring:
        nblk = jnp.int32(xt0.shape[0] * xt0.shape[1] * PACK)
        mask = (pltpu.bitcast(mask_ref[...], jnp.uint32)
                if has_mask else None)
        m2, e2 = _obs_partial3(t0_new, t1_new, ot0, ot1, eq_fin, nblk,
                               mask)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, m2, jnp.where(lane == 1, e2, 0))

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def phase_packed3(xplanes, oplanes, seeds, *, color: int, beta: float,
                  inject=None, obs_mask=None, interpret: bool = False,
                  measuring: bool = False):
    """One packed q=3 checkerboard phase on (R, nyp, half) plane pairs.

    ``inject``: optional 4-tuple of (R, nyp, half) int32 planes
    (rb, B₁, B₂, B₄) replacing the in-kernel PRNG — the bitwise-testable
    entry mirroring :func:`packed_phase_reference3`.  ``measuring``
    (phase b only) additionally returns per-replica (2m, 2e) int32
    sums; ``obs_mask`` restricts them to real sites (padded engine)."""
    nrep, nyp, half = xplanes[0].shape
    digit3 = accept_digit_planes3(beta)
    typ = _pick_typ(nyp, 2 * half)
    n = nyp // typ
    nb8 = nyp // 8
    n_inject = 4 if inject is not None else 0
    has_mask = measuring and obs_mask is not None
    kernel = functools.partial(
        _phase_kernel3, color=color, digit3=digit3, n_inject=n_inject,
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
        in_specs += [blk] * 4
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

def interpret_planes3(seeds, nrep, nyp, half, beta):
    """Threefry-derived (rb, B…) planes keyed per (replica, word row) —
    the CPU fallback stream (same statistics as the on-chip hardware
    PRNG, different bits)."""
    digit3 = accept_digit_planes3(beta)
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

            return draw_planes3((half,), gen, digit3)

        return jax.vmap(per_row)(jnp.arange(nyp))

    planes = jax.vmap(per_rep)(jnp.arange(nrep))
    return tuple(p.astype(jnp.int32) for p in planes)


# ---------------------------------------------------------------------------
# sweep wrappers (the routed ensemble path)
# ---------------------------------------------------------------------------

def clock3_packable(model) -> bool:
    """Shape/parameter gate for the packed q=3 engine."""
    if getattr(model, "q", None) != 3:
        return False
    ny, half = model.color_shape
    return (packable(ny, half)
            and model.nsites <= OBS_INT32_MAX_SITES)


def pack_state3(state):
    a, b = state
    batched = a.ndim == 3
    if not batched:
        a, b = a[None], b[None]
    return pack_clock3_color(a), pack_clock3_color(b), batched


def unpack_state3(wa, wb, batched: bool):
    from cuda_fortran_mc_simulation_spin_tpu.models.base import (
        CheckerboardState,
    )
    a = unpack_clock3_color(*wa)
    b = unpack_clock3_color(*wb)
    if not batched:
        a, b = a[0], b[0]
    return CheckerboardState(a, b)


def _interpret_phase3(xplanes, oplanes, seeds, color, beta,
                      measuring=False):
    nrep, nyp, half = xplanes[0].shape
    inject = interpret_planes3(seeds, nrep, nyp, half, beta)
    xt0, xt1 = [p.astype(jnp.uint32) for p in xplanes]
    ot0, ot1 = [p.astype(jnp.uint32) for p in oplanes]

    def one(xt0, xt1, ot0, ot1, *planes4):
        nt0 = _nbr_planes_jnp(ot0, color)
        nt1 = _nbr_planes_jnp(ot1, color)
        t0, t1, eq_fin = _decide3(
            xt0, xt1, nt0, nt1,
            tuple(p.astype(jnp.uint32) for p in planes4),
        )
        nblk = jnp.int32(nyp * half * PACK)
        m2, e2 = _obs_partial3(t0, t1, ot0, ot1, eq_fin, nblk)
        return (tuple(p.astype(jnp.int32) for p in (t0, t1)),
                jnp.stack([m2, e2]))

    new, obs = jax.vmap(one)(xt0, xt1, ot0, ot1, *inject)
    if measuring:
        return new, obs
    return new


def sweep_packed3(model, wa, wb, key):
    """One full MCS on packed q=3 plane pairs."""
    seeds0 = seeds_from_key(key, 0)
    seeds1 = seeds_from_key(key, 1)
    beta = float(model.beta)
    if jax.default_backend() in ("cpu", "gpu"):
        wa = _interpret_phase3(wa, wb, seeds0, 0, beta)
        wb = _interpret_phase3(wb, wa, seeds1, 1, beta)
        return wa, wb
    wa = phase_packed3(wa, wb, seeds0, color=0, beta=beta)
    wb = phase_packed3(wb, wa, seeds1, color=1, beta=beta)
    return wa, wb


def sweep_measure_packed3(model, wa, wb, key):
    """One MCS + fused per-sweep (m, e) densities from the phase-b
    kernel — the routed q=3 clock ensemble path."""
    _check_obs_sites(model.nsites)
    seeds0 = seeds_from_key(key, 0)
    seeds1 = seeds_from_key(key, 1)
    beta = float(model.beta)
    if jax.default_backend() in ("cpu", "gpu"):
        wa = _interpret_phase3(wa, wb, seeds0, 0, beta)
        wb, obs = _interpret_phase3(wb, wa, seeds1, 1, beta,
                                    measuring=True)
        m2 = obs[:, 0]
        e2 = obs[:, 1]
    else:
        wa = phase_packed3(wa, wb, seeds0, color=0, beta=beta)
        wb, obs = phase_packed3(wb, wa, seeds1, color=1, beta=beta,
                                measuring=True)
        m2 = obs[:, 0, 0]
        e2 = obs[:, 0, 1]
    half_n_inv = jnp.float32(0.5 / model.nsites)
    return wa, wb, {
        "m": m2.astype(jnp.float32) * half_n_inv,
        "e": e2.astype(jnp.float32) * half_n_inv,
    }


# ---------------------------------------------------------------------------
# padded engine: non-aligned even shapes on the SAME phase kernel,
# reusing the q=6 module's shape-generic pad/refresh machinery
# ---------------------------------------------------------------------------

def pack_clock3_color_padded(plane: jax.Array, spec: PadSpec):
    """(..., ny, half) int8 states -> padded (t0, t1) word planes
    (..., nyp, halfp), pad region zeroed (refresh fills what matters)."""
    pad_y = spec.nyp * PACK - spec.ny
    pad_x = spec.halfp - spec.half
    widths = [(0, 0)] * (plane.ndim - 2) + [(0, pad_y), (0, pad_x)]
    return pack_clock3_color(jnp.pad(plane, widths))


def unpack_clock3_color_padded(t0, t1, spec: PadSpec):
    return unpack_clock3_color(t0, t1)[..., :spec.ny, :spec.half]


def sweep_packed3_padded(model, spec: PadSpec, wa, wb, key):
    """One full MCS on padded packed q=3 plane pairs."""
    seeds0 = seeds_from_key(key, 0)
    seeds1 = seeds_from_key(key, 1)
    beta = float(model.beta)
    interp = jax.default_backend() in ("cpu", "gpu")
    wb = refresh_padded(wb, spec)
    if interp:
        wa = _interpret_phase3(wa, wb, seeds0, 0, beta)
    else:
        wa = phase_packed3(wa, wb, seeds0, color=0, beta=beta)
    wa = refresh_padded(wa, spec)
    if interp:
        wb = _interpret_phase3(wb, wa, seeds1, 1, beta)
    else:
        wb = phase_packed3(wb, wa, seeds1, color=1, beta=beta)
    return wa, wb


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


def sweep_measure_packed3_padded(model, spec: PadSpec, wa, wb, key):
    """One MCS + per-sweep (m, e) densities on the padded q=3 engine
    (fused masked obs in the phase-b kernel on the chip)."""
    _check_obs_sites(model.nsites)
    beta = float(model.beta)
    if jax.default_backend() in ("cpu", "gpu"):
        wa, wb = sweep_packed3_padded(model, spec, wa, wb, key)
        m2, e2 = obs_packed3_masked(wa, wb, spec)
    else:
        wb = refresh_padded(wb, spec)
        wa = phase_packed3(wa, wb, seeds_from_key(key, 0),
                           color=0, beta=beta)
        wa = refresh_padded(wa, spec)
        wb, obs = phase_packed3(wb, wa, seeds_from_key(key, 1),
                                color=1, beta=beta, measuring=True,
                                obs_mask=pad_mask(spec))
        m2 = obs[:, 0, 0]
        e2 = obs[:, 0, 1]
    half_n_inv = jnp.float32(0.5 / model.nsites)
    return wa, wb, {
        "m": m2.astype(jnp.float32) * half_n_inv,
        "e": e2.astype(jnp.float32) * half_n_inv,
    }


# ---------------------------------------------------------------------------
# sharded engine: the q=3 packed kernel inside shard_map — the q=4
# sharded machinery (also 2-plane): y-halos as exchanged boundary-site
# bit planes spliced into synthetic edge words, x-halos as whole
# boundary WORD COLUMNS, PRNG streams keyed per GLOBAL (replica,
# 8-word-row granule, 128-lane chunk) so trajectories are bitwise
# invariant to the mesh shape.
# ---------------------------------------------------------------------------

def packed_sharded_phase_reference3(xplanes, oplanes, color, planes4,
                                    hup, hdn,
                                    halo_lf=None, halo_rt=None):
    """Pure-jnp packed q=3 phase on a (y[, x])-sharded local block:
    word-row wrap replaced by synthetic edge words built from the
    exchanged boundary site planes ``hup``/``hdn`` (2-tuples of
    (1, half) 0/1 int32 — t0, t1 of the rows owned by the y-neighbor
    shards).  ``halo_lf``/``halo_rt`` (2-tuples of (Lp, 1) packed word
    columns): x-sharded boundary columns replacing the lane-roll wrap."""
    from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_multispin \
        import _EVEN_BITS, _ODD_BITS

    xt0, xt1 = [p.astype(jnp.uint32) for p in xplanes]
    ot0, ot1 = [p.astype(jnp.uint32) for p in oplanes]

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
    nt0 = nbrs(ot0, hup[0], hdn[0], lf2[0], rt2[0])
    nt1 = nbrs(ot1, hup[1], hdn[1], lf2[1], rt2[1])
    planes4 = tuple(p.astype(jnp.uint32) for p in planes4)
    t0, t1, _ = _decide3(xt0, xt1, nt0, nt1, planes4)
    return tuple(p.astype(jnp.int32) for p in (t0, t1))


def _sharded_phase_kernel3(seed_ref, offs_ref, xt0_ref, xt1_ref,
                           ot0_ref, ot1_ref,
                           ut0_ref, ut1_ref, dt0_ref, dt1_ref,
                           hut0_ref, hut1_ref, hdt0_ref, hdt1_ref,
                           *rest, color: int, digit3, typ: int,
                           nblk: int, n_inject: int,
                           has_cols: bool = False,
                           measuring: bool = False):
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    if has_cols:
        col_refs = refs[:4]          # (lf_t0, lf_t1, rt_t0, rt_t1)
        refs = refs[4:]
    else:
        col_refs = (None,) * 4
    inject = refs[:n_inject]
    t0_out, t1_out = refs[n_inject:]
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

    xt0 = pltpu.bitcast(xt0_ref[0], jnp.uint32)
    xt1 = pltpu.bitcast(xt1_ref[0], jnp.uint32)
    ot0, nt0 = planes_of(ot0_ref, ut0_ref, dt0_ref, hut0_ref, hdt0_ref,
                         col_refs[0], col_refs[2])
    ot1, nt1 = planes_of(ot1_ref, ut1_ref, dt1_ref, hut1_ref, hdt1_ref,
                         col_refs[1], col_refs[3])

    if n_inject:
        planes4 = tuple(
            pltpu.bitcast(ref[0], jnp.uint32) for ref in inject
        )
    else:
        # streams keyed per GLOBAL (replica, 8-word-row granule,
        # 128-lane chunk) — mesh-shape/tile-size invariant incl.
        # x-splits, matching the q=6/q=4 and Ising packed sharded keying
        rep_g = offs_ref[0] + r
        col0 = offs_ref[2] if has_cols else jnp.int32(0)
        nck = xt0.shape[1] // 128
        pieces = [[] for _ in range(4)]
        for g in range(typ // 8):
            wrow_g = offs_ref[1] + i * typ + g * 8
            row_tag = (wrow_g * jnp.int32(-1640531527)
                       + rep_g * jnp.int32(0x3C6EF35F))
            chunk_cols = [[] for _ in range(4)]
            for c in range(nck):
                tag = row_tag + ((col0 + c * 128)
                                 * jnp.int32(0x27D4EB2F))
                pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tag)

                def gen():
                    return pltpu.bitcast(
                        pltpu.prng_random_bits((8, 128)), jnp.uint32)

                p4 = draw_planes3((8, 128), gen, digit3)
                for k in range(4):
                    chunk_cols[k].append(p4[k])
            for k in range(4):
                pieces[k].append(
                    chunk_cols[k][0] if nck == 1
                    else jnp.concatenate(chunk_cols[k], axis=1))
        planes4 = tuple(
            pieces[k][0] if typ == 8
            else jnp.concatenate(pieces[k], axis=0)
            for k in range(4)
        )

    t0_new, t1_new, eq_fin = _decide3(xt0, xt1, nt0, nt1, planes4)
    t0_out[0] = pltpu.bitcast(t0_new, jnp.int32)
    t1_out[0] = pltpu.bitcast(t1_new, jnp.int32)

    if measuring:
        nblk_sites = jnp.int32(xt0.shape[0] * xt0.shape[1] * PACK)
        m2, e2 = _obs_partial3(t0_new, t1_new, ot0, ot1, eq_fin,
                               nblk_sites)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, m2, jnp.where(lane == 1, e2, 0))

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def interpret_planes_sharded3(seeds, rep0, wrow0, nrep, nyp, half,
                              beta, col0=0):
    """Threefry planes keyed per (global replica, global word row,
    128-lane chunk) — the CPU fallback stream for the sharded q=3
    engine (mesh-shape invariant, including x-splits via ``col0``)."""
    digit3 = accept_digit_planes3(beta)
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

                return draw_planes3((128,), gen, digit3)

            ck = jax.vmap(per_chunk)(jnp.arange(nck))
            return tuple(p.reshape(half) for p in ck)

        return jax.vmap(per_row)(jnp.arange(nyp))

    planes = jax.vmap(per_rep)(jnp.arange(nrep))
    return tuple(p.astype(jnp.int32) for p in planes)


def sharded_phase_packed3(xplanes, oplanes, hup, hdn, seeds, offs, *,
                          color: int, beta: float,
                          halo_lf=None, halo_rt=None, inject=None,
                          interpret: bool = False,
                          measuring: bool = False):
    """One packed q=3 clock phase of a (y[, x])-sharded local block.

    xplanes/oplanes: 2-tuples (t0, t1) of (R, Lp, half) packed local
    color blocks; hup/hdn: 2-tuples of (R, 1, half) 0/1 int32 exchanged
    boundary-site digit planes of the other color; offs: (rep0, wrow0)
    GLOBAL offsets ((rep0, wrow0, lane0) with column halos).
    ``measuring`` (phase b only) additionally returns per-shard
    (2m, 2e) int32 partials (R,) each — caller psums over the mesh's
    spatial axes.  ``halo_lf``/``halo_rt``: 2-tuples of (R, Lp, 1)
    packed word COLUMNS of the other color (the x-sharded variant)."""
    nrep, nyp, half = xplanes[0].shape
    has_cols = halo_lf is not None
    digit3 = accept_digit_planes3(beta)
    typ = _pick_typ(nyp, 2 * half)
    n = nyp // typ
    nb8 = nyp // 8
    if interpret and inject is None:
        inject = interpret_planes_sharded3(
            seeds, offs[0], offs[1], nrep, nyp, half, beta,
            offs[2] if has_cols else jnp.int32(0))
    n_inject = 4 if inject is not None else 0
    hup_p = [jnp.pad(h, ((0, 0), (7, 0), (0, 0))) for h in hup]
    hdn_p = [jnp.pad(h, ((0, 0), (0, 7), (0, 0))) for h in hdn]
    kernel = functools.partial(
        _sharded_phase_kernel3, color=color, digit3=digit3, typ=typ,
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
        in_specs += [blk] * 4
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


def shard_packed3_ok(local_shape: tuple[int, ...]) -> bool:
    """Local packed (R, Lp, half) word-block shape is tileable."""
    if len(local_shape) != 3:
        return False
    _, nyp, half = local_shape
    return half % 128 == 0 and nyp % 8 == 0


# overhead gate shared with the q=6 engine
_PAD_MIN_OCCUPANCY = 0.35


def clock3_padded_packable(model) -> bool:
    """Shape/parameter gate for the padded packed q=3 engine."""
    if getattr(model, "q", None) != 3:
        return False
    ny, half = model.color_shape
    spec = padded_spec(ny, half)
    if spec is None:
        return False
    occ = (ny / (spec.nyp * PACK)) * (half / spec.halfp)
    return (occ >= _PAD_MIN_OCCUPANCY
            and model.nsites <= OBS_INT32_MAX_SITES)
