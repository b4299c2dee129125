"""Shared scaffolding for the bit-sliced packed clock family.

The three packed clock engines — q=6 (ops/clock_multispin, CRT Z₂×Z₃,
three bit planes), q=4 (ops/clock4_multispin, two binary digits) and
q=3 (ops/clock3_multispin, two Z₃ indicator planes) — previously each
carried a private copy of the same machinery: the streaming Pallas
phase kernel and its BlockSpec plumbing, the halo-aware sharded kernel,
the jnp oracles' shard-boundary construction, the interpret-mode plane
sources, the sweep/measure wrappers and the padded-shape wrappers.
Only the *bond algebra* differs between them.  This module holds ONE
copy of the scaffolding, generic over the number of state planes and
random planes; each q-module supplies a :class:`PlaneSpec` carrying its
q-specific pieces (proposal draw, packed Metropolis decision, fused
observable partials, pack/unpack) and keeps only those.

The reference's analog of this family is its clock optimization ladder
(/root/reference/src/clock/clock_simple_gpu_m.f90 through
clock_dual_lattice_yhalf_tableall_m.f90) — six separately maintained
engine copies; here the ladder collapses into one scaffold + one
bond-algebra module per q.

Layout contract (all engines): states pack 32 sites/word along y per
checkerboard color ((R, nyp, half) int32 word planes per state plane),
PRNG streams are keyed by GLOBAL granule coordinates
(ops/multispin_rng) so trajectories are invariant to tile size, mesh
shape and x-splits.  The padded-shape machinery (PadSpec/refresh) is
plane-count agnostic and also lives here.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.ops import multispin_rng, stencil
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_multispin import (
    _EVEN_BITS,
    _ODD_BITS,
    PACK,
    _nbr_planes,
    _pick_typ,
    packable,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    seeds_from_key,
)


class PlaneSpec(NamedTuple):
    """The q-specific pieces of a packed clock engine.

    ``decide(xs, nbrs, rand) -> (new, fin)``: packed Metropolis
    decision for one phase — ``xs`` the center-color state planes
    (n_state uint32 planes), ``nbrs`` per state plane the 4-tuple of
    neighbor planes (up, dn, ctr, side) of the other color, ``rand``
    the n_rand random planes; returns the new center planes and the
    opaque final-value bond planes ``fin`` consumed by
    ``obs_partial(new, oth, fin, nblk_sites, mask) -> (m, e)`` (int32
    fused partials; scaled by ``obs_scale / nsites`` to densities).
    ``draw(shape, gen, digits)`` produces the n_rand planes from fresh
    ``gen()`` words; ``digits = accept_digits(beta)``.
    ``obs_masked(wa, wb, pad) -> (m, e)`` is the padded engine's jnp
    masked-observable fallback (CPU path).
    """

    name: str
    q: int
    n_state: int
    n_rand: int
    max_sites: int
    obs_scale: float
    accept_digits: Callable
    draw: Callable
    decide: Callable
    obs_partial: Callable
    obs_masked: Callable
    pack_color: Callable
    unpack_color: Callable


def check_obs_sites(spec: PlaneSpec, nsites: int) -> None:
    if nsites > spec.max_sites:
        raise ValueError(
            f"lattice of {nsites} sites overflows the int32 fused-"
            f"observable accumulators (max {spec.max_sites})"
        )


def _draw_cb(spec: PlaneSpec, digits):
    return lambda shape, gen: spec.draw(shape, gen, digits)


# ---------------------------------------------------------------------------
# bit-sliced word-plane helpers shared by every engine's bond algebra
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


def _chain_len(p: float) -> int:
    """Digits for a Bernoulli chain: ~12 significant bits below the
    leading zeros of p (the ising2d_multispin 20-bit chain carries the
    same ~12 significant bits on its deepest level at Tc)."""
    if p <= 0.0:
        return 28
    return int(min(28, max(6, np.ceil(-np.log2(min(p, 1.0))) + 12)))


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


def _nbr_planes_jnp(o, color):
    """(up, dn, ctr, side) neighbor planes of a full packed color plane
    with periodic wrap via roll — the jnp-oracle counterpart of the
    kernels' _nbr_planes."""
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


# ---------------------------------------------------------------------------
# jnp oracle (periodic wrap via roll) — bitwise test target
# ---------------------------------------------------------------------------

def phase_reference(spec: PlaneSpec, xplanes, oplanes, color, rand):
    """Pure-jnp packed phase on full planes — the oracle the Pallas
    kernel is tested against bitwise (injected random planes)."""
    xs = tuple(p.astype(jnp.uint32) for p in xplanes)
    os_ = tuple(p.astype(jnp.uint32) for p in oplanes)
    nbrs = tuple(_nbr_planes_jnp(o, color) for o in os_)
    rand = tuple(p.astype(jnp.uint32) for p in rand)
    new, _ = spec.decide(xs, nbrs, rand)
    return tuple(p.astype(jnp.int32) for p in new)


# ---------------------------------------------------------------------------
# Pallas streaming phase kernel
# ---------------------------------------------------------------------------

def _phase_kernel(seed_ref, *rest, spec: PlaneSpec, color: int, digits,
                  n_inject: int, has_mask: bool = False,
                  measuring: bool = False):
    ns_ = spec.n_state
    refs = list(rest)
    x_refs = refs[:ns_]
    o_refs = refs[ns_:2 * ns_]
    u_refs = refs[2 * ns_:3 * ns_]
    d_refs = refs[3 * ns_:4 * ns_]
    refs = refs[4 * ns_:]
    obs_ref = refs.pop() if measuring else None
    mask_ref = refs.pop(0) if has_mask else None
    inject = refs[:n_inject]
    outs = refs[n_inject:]
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

    xs = tuple(pltpu.bitcast(xr[0], jnp.uint32) for xr in x_refs)
    o_nb = [planes_of(o_refs[k], u_refs[k], d_refs[k])
            for k in range(ns_)]
    oth = tuple(o for o, _ in o_nb)
    nbrs = tuple(nb for _, nb in o_nb)

    if n_inject:
        rand = tuple(
            pltpu.bitcast(ref[0], jnp.uint32) for ref in inject
        )
    else:
        # unified global-granule keying (ops/multispin_rng): single-
        # chip tiles consume the same streams as any sharded run
        typ_ = xs[0].shape[0]
        rand = multispin_rng.granule_planes(
            seed_ref[0], seed_ref[1], r, i * typ_, typ_,
            xs[0].shape[1], xs[0].shape[1], jnp.int32(0),
            _draw_cb(spec, digits))

    new, fin = spec.decide(xs, nbrs, rand)
    for out_ref, p in zip(outs, new):
        out_ref[0] = pltpu.bitcast(p, jnp.int32)

    if measuring:
        nblk = jnp.int32(xs[0].shape[0] * xs[0].shape[1] * PACK)
        mask = (pltpu.bitcast(mask_ref[...], jnp.uint32)
                if has_mask else None)
        m, e = spec.obs_partial(new, oth, fin, nblk, mask)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, m, jnp.where(lane == 1, e, 0))

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def phase_packed(spec: PlaneSpec, xplanes, oplanes, seeds, *,
                 color: int, beta: float, inject=None, obs_mask=None,
                 interpret: bool = False, measuring: bool = False):
    """One packed checkerboard phase on (R, nyp, half) plane tuples.

    ``inject``: optional n_rand-tuple of (R, nyp, half) int32 planes
    replacing the in-kernel PRNG — the bitwise-testable entry mirroring
    :func:`phase_reference`.  ``measuring`` (phase b only) additionally
    returns per-replica (m, e) int32 sums; ``obs_mask`` restricts them
    to real sites (padded engine)."""
    nrep, nyp, half = xplanes[0].shape
    ns_ = spec.n_state
    digits = spec.accept_digits(beta)
    typ = _pick_typ(nyp, ns_ * half)
    n = nyp // typ
    nb8 = nyp // 8
    n_inject = spec.n_rand if inject is not None else 0
    has_mask = measuring and obs_mask is not None
    kernel = functools.partial(
        _phase_kernel, spec=spec, color=color, digits=digits,
        n_inject=n_inject, has_mask=has_mask, measuring=measuring,
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
    in_specs += [blk] * (2 * ns_) + [up8] * ns_ + [dn8] * ns_
    operands = [seeds, *xplanes, *oplanes, *oplanes, *oplanes]
    if has_mask:
        in_specs.append(pl.BlockSpec((typ, half), lambda r, i: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(obs_mask.astype(jnp.int32))
    if inject is not None:
        in_specs += [blk] * spec.n_rand
        operands += list(inject)
    plane_shape = jax.ShapeDtypeStruct((nrep, nyp, half), jnp.int32)
    out_shape = [plane_shape] * ns_
    out_specs = [blk] * ns_
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
        input_output_aliases={k + 1: k for k in range(ns_)},
        interpret=interpret,
    )(*operands)
    if measuring:
        return res[:ns_], res[ns_]
    return res


# ---------------------------------------------------------------------------
# interpret-mode plane sources (CPU tests / oracle statistics)
# ---------------------------------------------------------------------------

def interpret_planes_sharded(spec: PlaneSpec, seeds, rep0, wrow0, nrep,
                             nyp, half, beta, col0=0, w_total=None):
    """Threefry planes with the unified granule structure
    (ops/multispin_rng.granule_planes_interpret) — the CPU fallback
    stream (mesh-shape invariant including x-splits; same statistics as
    the on-chip hardware PRNG, different bits)."""
    digits = spec.accept_digits(beta)
    planes = multispin_rng.granule_planes_interpret(
        seeds, rep0, wrow0, col0, nrep, nyp, half,
        half if w_total is None else w_total,
        _draw_cb(spec, digits))
    return tuple(p.astype(jnp.int32) for p in planes)


def interpret_planes(spec: PlaneSpec, seeds, nrep, nyp, half, beta):
    """Single-chip interpret stream — the sharded stream at offsets 0,
    so a CPU single-chip run is bitwise identical to a CPU (1,1)-mesh
    sharded run."""
    return interpret_planes_sharded(spec, seeds, 0, 0, nrep, nyp, half,
                                    beta)


def interpret_phase(spec: PlaneSpec, xplanes, oplanes, seeds, color,
                    beta, measuring=False):
    nrep, nyp, half = xplanes[0].shape
    ns_ = spec.n_state
    inject = interpret_planes(spec, seeds, nrep, nyp, half, beta)
    xs = tuple(p.astype(jnp.uint32) for p in xplanes)
    os_ = tuple(p.astype(jnp.uint32) for p in oplanes)

    def one(*args):
        xs1 = args[:ns_]
        os1 = args[ns_:2 * ns_]
        rand = tuple(p.astype(jnp.uint32) for p in args[2 * ns_:])
        nbrs = tuple(_nbr_planes_jnp(o, color) for o in os1)
        new, fin = spec.decide(xs1, nbrs, rand)
        nblk = jnp.int32(nyp * half * PACK)
        m, e = spec.obs_partial(new, os1, fin, nblk)
        return (tuple(p.astype(jnp.int32) for p in new),
                jnp.stack([m, e]))

    new, obs = jax.vmap(one)(*xs, *os_, *inject)
    if measuring:
        return new, obs
    return new


# ---------------------------------------------------------------------------
# sweep wrappers (the routed ensemble path)
# ---------------------------------------------------------------------------

def packable_gate(spec: PlaneSpec, model) -> bool:
    """Shape/parameter gate for the aligned packed engine."""
    if getattr(model, "q", None) != spec.q:
        return False
    ny, half = model.color_shape
    return (packable(ny, half)
            and model.nsites <= spec.max_sites)


def pack_state(spec: PlaneSpec, state):
    a, b = state
    batched = a.ndim == 3
    if not batched:
        a, b = a[None], b[None]
    return spec.pack_color(a), spec.pack_color(b), batched


def unpack_state(spec: PlaneSpec, wa, wb, batched: bool):
    from cuda_fortran_mc_simulation_spin_tpu.models.base import (
        CheckerboardState,
    )
    a = spec.unpack_color(*wa)
    b = spec.unpack_color(*wb)
    if not batched:
        a, b = a[0], b[0]
    return CheckerboardState(a, b)


def sweep_packed(spec: PlaneSpec, model, wa, wb, key):
    """One full MCS on packed plane tuples."""
    seeds0 = seeds_from_key(key, 0)
    seeds1 = seeds_from_key(key, 1)
    beta = float(model.beta)
    if jax.default_backend() in ("cpu", "gpu"):
        wa = interpret_phase(spec, wa, wb, seeds0, 0, beta)
        wb = interpret_phase(spec, wb, wa, seeds1, 1, beta)
        return wa, wb
    wa = phase_packed(spec, wa, wb, seeds0, color=0, beta=beta)
    wb = phase_packed(spec, wb, wa, seeds1, color=1, beta=beta)
    return wa, wb


def _obs_densities(spec: PlaneSpec, model, m, e):
    scale = jnp.float32(spec.obs_scale / model.nsites)
    return {
        "m": m.astype(jnp.float32) * scale,
        "e": e.astype(jnp.float32) * scale,
    }


def sweep_measure_packed(spec: PlaneSpec, model, wa, wb, key):
    """One MCS + fused per-sweep (m, e) densities from the phase-b
    kernel — the routed clock ensemble path."""
    check_obs_sites(spec, model.nsites)
    seeds0 = seeds_from_key(key, 0)
    seeds1 = seeds_from_key(key, 1)
    beta = float(model.beta)
    if jax.default_backend() in ("cpu", "gpu"):
        wa = interpret_phase(spec, wa, wb, seeds0, 0, beta)
        wb, obs = interpret_phase(spec, wb, wa, seeds1, 1, beta,
                                  measuring=True)
        m = obs[:, 0]
        e = obs[:, 1]
    else:
        wa = phase_packed(spec, wa, wb, seeds0, color=0, beta=beta)
        wb, obs = phase_packed(spec, wb, wa, seeds1, color=1,
                               beta=beta, measuring=True)
        m = obs[:, 0, 0]
        e = obs[:, 0, 1]
    return wa, wb, _obs_densities(spec, model, m, e)


# ---------------------------------------------------------------------------
# padded engine machinery: non-aligned even shapes on the SAME phase
# kernel (plane-count agnostic).
#
# The aligned engines need ny % 256 == 0 and (nx/2) % 128 == 0, which
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
# popcount sums (fused into the phase-b kernel on the chip via the
# obs_mask operand; jnp fallback per q-module); measurement is a pure
# function of the final packed state.  Overhead for 2000x2000: word
# rows 63->64, lanes 1000->1024 (~4.6%).
# ---------------------------------------------------------------------------

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
    """Rewrite the pad words/lanes the next phase reads (see the
    padded-engine header comment above)."""
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


def pack_color_padded(spec: PlaneSpec, plane: jax.Array, pad: PadSpec):
    """(..., ny, half) int8 states -> padded packed word planes
    (..., nyp, halfp), pad region zeroed (refresh fills what
    matters)."""
    pad_y = pad.nyp * PACK - pad.ny
    pad_x = pad.halfp - pad.half
    widths = [(0, 0)] * (plane.ndim - 2) + [(0, pad_y), (0, pad_x)]
    return spec.pack_color(jnp.pad(plane, widths))


def unpack_color_padded(spec: PlaneSpec, *args):
    """(plane0, ..., planeN, pad) -> unpadded int8 states — the planes
    ride as separate positional args (the per-module historical
    signature, e.g. unpack_clock_color_padded(s, t0, t1, pad))."""
    planes, pad = args[:-1], args[-1]
    return spec.unpack_color(*planes)[..., :pad.ny, :pad.half]


def sweep_packed_padded(spec: PlaneSpec, model, pad: PadSpec, wa, wb,
                        key):
    """One full MCS on padded packed plane tuples."""
    seeds0 = seeds_from_key(key, 0)
    seeds1 = seeds_from_key(key, 1)
    beta = float(model.beta)
    interp = jax.default_backend() in ("cpu", "gpu")
    wb = refresh_padded(wb, pad)
    if interp:
        wa = interpret_phase(spec, wa, wb, seeds0, 0, beta)
    else:
        wa = phase_packed(spec, wa, wb, seeds0, color=0, beta=beta)
    wa = refresh_padded(wa, pad)
    if interp:
        wb = interpret_phase(spec, wb, wa, seeds1, 1, beta)
    else:
        wb = phase_packed(spec, wb, wa, seeds1, color=1, beta=beta)
    return wa, wb


def sweep_measure_packed_padded(spec: PlaneSpec, model, pad: PadSpec,
                                wa, wb, key):
    """One MCS + per-sweep (m, e) densities on the padded engine (fused
    masked obs in the phase-b kernel on the chip; the interpret path
    keeps the q-module's separate jnp obs — its phase is the jnp
    oracle)."""
    check_obs_sites(spec, model.nsites)
    beta = float(model.beta)
    if jax.default_backend() in ("cpu", "gpu"):
        wa, wb = sweep_packed_padded(spec, model, pad, wa, wb, key)
        m, e = spec.obs_masked(wa, wb, pad)
    else:
        wb = refresh_padded(wb, pad)
        wa = phase_packed(spec, wa, wb, seeds_from_key(key, 0),
                          color=0, beta=beta)
        wa = refresh_padded(wa, pad)
        wb, obs = phase_packed(spec, wb, wa, seeds_from_key(key, 1),
                               color=1, beta=beta, measuring=True,
                               obs_mask=pad_mask(pad))
        m = obs[:, 0, 0]
        e = obs[:, 0, 1]
    return wa, wb, _obs_densities(spec, model, m, e)


# overhead gate: below this real/padded occupancy the int8 engine wins
_PAD_MIN_OCCUPANCY = 0.35


def padded_packable_gate(spec: PlaneSpec, model) -> bool:
    """Shape/parameter gate for the padded packed engine."""
    if getattr(model, "q", None) != spec.q:
        return False
    ny, half = model.color_shape
    pad = padded_spec(ny, half)
    if pad is None:
        return False
    occ = (ny / (pad.nyp * PACK)) * (half / pad.halfp)
    return (occ >= _PAD_MIN_OCCUPANCY
            and model.nsites <= spec.max_sites)


# ---------------------------------------------------------------------------
# halo-aware packed phase for the domain-sharded (shard_map) path
# ---------------------------------------------------------------------------

def sharded_phase_reference(spec: PlaneSpec, xplanes, oplanes, color,
                            rand, hup, hdn,
                            halo_lf=None, halo_rt=None):
    """Pure-jnp packed phase on a (y[, x])-sharded local block: word-row
    wrap replaced by synthetic edge words built from the exchanged
    boundary site planes ``hup``/``hdn`` (n_state-tuples of (1, half)
    0/1 int32 — the rows owned by the y-neighbor shards).
    ``halo_lf``/``halo_rt`` (n_state-tuples of (Lp, 1) packed word
    columns): x-sharded boundary columns replacing the lane-roll wrap —
    whole packed words, as in the Ising x-split (bits run along y,
    which x-sharding never cuts)."""
    ns_ = spec.n_state
    xs = tuple(p.astype(jnp.uint32) for p in xplanes)
    os_ = tuple(p.astype(jnp.uint32) for p in oplanes)

    def nbrs_of(o, up01, dn01, lf, rt):
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

    lfs = halo_lf if halo_lf is not None else (None,) * ns_
    rts = halo_rt if halo_rt is not None else (None,) * ns_
    nbrs = tuple(
        nbrs_of(os_[k], hup[k], hdn[k], lfs[k], rts[k])
        for k in range(ns_)
    )
    rand = tuple(p.astype(jnp.uint32) for p in rand)
    new, _ = spec.decide(xs, nbrs, rand)
    return tuple(p.astype(jnp.int32) for p in new)


def _sharded_phase_kernel(seed_ref, offs_ref, *rest, spec: PlaneSpec,
                          color: int, digits, typ: int, nblk: int,
                          n_inject: int, has_cols: bool = False,
                          measuring: bool = False,
                          w_total: int | None = None):
    ns_ = spec.n_state
    refs = list(rest)
    x_refs = refs[:ns_]
    o_refs = refs[ns_:2 * ns_]
    u_refs = refs[2 * ns_:3 * ns_]
    d_refs = refs[3 * ns_:4 * ns_]
    hu_refs = refs[4 * ns_:5 * ns_]
    hd_refs = refs[5 * ns_:6 * ns_]
    refs = refs[6 * ns_:]
    obs_ref = refs.pop() if measuring else None
    if has_cols:
        col_refs = refs[:2 * ns_]    # (lf × n_state, rt × n_state)
        refs = refs[2 * ns_:]
    else:
        col_refs = (None,) * (2 * ns_)
    inject = refs[:n_inject]
    outs = refs[n_inject:]
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
        odd = jnp.uint32(_ODD_BITS)
        even = jnp.uint32(_EVEN_BITS)
        if color == 0:
            side = (plus & odd) | (minus & even)
        else:
            side = (minus & odd) | (plus & even)
        return o, (up, dn, o, side)

    xs = tuple(pltpu.bitcast(xr[0], jnp.uint32) for xr in x_refs)
    o_nb = [
        planes_of(o_refs[k], u_refs[k], d_refs[k], hu_refs[k],
                  hd_refs[k], col_refs[k], col_refs[ns_ + k])
        for k in range(ns_)
    ]
    oth = tuple(o for o, _ in o_nb)
    nbrs = tuple(nb for _, nb in o_nb)

    if n_inject:
        rand = tuple(
            pltpu.bitcast(ref[0], jnp.uint32) for ref in inject
        )
    else:
        # unified global-granule keying (ops/multispin_rng): invariant
        # to mesh shape, tile size and x-splits, and equal to the
        # routed single-chip engine's streams
        rep_g = offs_ref[0] + r
        col0 = offs_ref[2] if has_cols else jnp.int32(0)
        rand = multispin_rng.granule_planes(
            seed_ref[0], seed_ref[1], rep_g, offs_ref[1] + i * typ,
            typ, xs[0].shape[1], w_total, col0,
            _draw_cb(spec, digits))

    new, fin = spec.decide(xs, nbrs, rand)
    for out_ref, p in zip(outs, new):
        out_ref[0] = pltpu.bitcast(p, jnp.int32)

    if measuring:
        nblk_sites = jnp.int32(xs[0].shape[0] * xs[0].shape[1] * PACK)
        m, e = spec.obs_partial(new, oth, fin, nblk_sites)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, m, jnp.where(lane == 1, e, 0))

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def sharded_phase_packed(spec: PlaneSpec, xplanes, oplanes, hup, hdn,
                         seeds, offs, *, color: int, beta: float,
                         halo_lf=None, halo_rt=None, inject=None,
                         interpret: bool = False,
                         measuring: bool = False,
                         w_total: int | None = None):
    """One packed clock phase of a (y[, x])-sharded local block.

    xplanes/oplanes: n_state-tuples of (R, Lp, half) packed local color
    blocks; hup/hdn: n_state-tuples of (R, 1, half) 0/1 int32 exchanged
    boundary-site planes of the other color
    (halo.exchange_halo_rows_packed applied per plane); offs: (rep0,
    wrow0) GLOBAL offsets ((rep0, wrow0, lane0) with column halos).
    ``measuring`` (phase b only) additionally returns per-shard (m, e)
    int32 partials (R,) each — caller psums over the mesh's spatial
    axes.  ``halo_lf``/``halo_rt``: n_state-tuples of (R, Lp, 1) packed
    word COLUMNS of the other color (the x-sharded variant — whole
    packed words; bits run along y, which x-sharding never cuts),
    matching the reference's own x-split clock variant
    (/root/reference/src/clock/clock_dual_lattice_tableall_m.f90:62-63).
    """
    nrep, nyp, half = xplanes[0].shape
    ns_ = spec.n_state
    has_cols = halo_lf is not None
    w_total = half if w_total is None else w_total
    digits = spec.accept_digits(beta)
    typ = _pick_typ(nyp, ns_ * half)
    n = nyp // typ
    nb8 = nyp // 8
    if interpret and inject is None:
        inject = interpret_planes_sharded(
            spec, seeds, offs[0], offs[1], nrep, nyp, half, beta,
            offs[2] if has_cols else jnp.int32(0), w_total=w_total)
    n_inject = spec.n_rand if inject is not None else 0
    hup_p = [jnp.pad(h, ((0, 0), (7, 0), (0, 0))) for h in hup]
    hdn_p = [jnp.pad(h, ((0, 0), (0, 7), (0, 0))) for h in hdn]
    kernel = functools.partial(
        _sharded_phase_kernel, spec=spec, color=color, digits=digits,
        typ=typ, nblk=n, n_inject=n_inject, has_cols=has_cols,
        measuring=measuring, w_total=w_total,
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
    in_specs += ([blk] * (2 * ns_) + [up8] * ns_ + [dn8] * ns_
                 + [h8] * (2 * ns_))
    operands = [seeds, offs, *xplanes, *oplanes, *oplanes, *oplanes,
                *hup_p, *hdn_p]
    if has_cols:
        # 128-lane alignment: exchanged word columns ride in lane 0
        col_spec = pl.BlockSpec((1, typ, 128), lambda r, i: (r, i, 0),
                                memory_space=pltpu.VMEM)
        in_specs += [col_spec] * (2 * ns_)
        operands += [jnp.pad(h, ((0, 0), (0, 0), (0, 127)))
                     for h in (*halo_lf, *halo_rt)]
    if inject is not None:
        in_specs += [blk] * spec.n_rand
        operands += list(inject)
    plane_shape = jax.ShapeDtypeStruct((nrep, nyp, half), jnp.int32)
    out_shape = [plane_shape] * ns_
    out_specs = [blk] * ns_
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
        input_output_aliases={k + 2: k for k in range(ns_)},
        interpret=interpret,
    )(*operands)
    if measuring:
        return res[:ns_], res[ns_][:, 0, 0], res[ns_][:, 0, 1]
    return res[:ns_]


def shard_ok(local_shape: tuple[int, ...]) -> bool:
    """Local packed (R, Lp, half) word-block shape is tileable."""
    if len(local_shape) != 3:
        return False
    _, nyp, half = local_shape
    return half % 128 == 0 and nyp % 8 == 0
