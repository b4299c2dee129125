"""f32-ANGLE storage variant of the periodic XY Pallas engine.

The periodic XY workloads (4000² M+OR script workload, 10000²
relaxation literal — /root/reference/src/xy2d_periodic_gpu_m.f90:353-439
geometries) are HBM-bound on the component engine (ops/xy2d_pallas.py):
each phase streams TWO f32 planes per color.  Storing ONE f32 angle (in
TURNS, θ/2π ∈ [-0.5, 0.5)) per site halves the lattice traffic; the
kernels decode (cos, sin) in-VMEM with the quarter-period polynomial
(ops/trig.cos_sin_2pi) and over-relaxation becomes pure angle
arithmetic θ' = 2φ − θ, φ = atan2_2pi(hy, hx) — the same representation
change that measured 1.94× on the helical OR literal
(ops/xy2d_helical_dense_angle.py, BENCHMARKS.md §5).

Same Markov chain as the component engine, different state
representation: identical candidate distribution (uniform angle) and
acceptance compare; |S| = 1 exact by construction (no renormalization);
the only new rounding is the degree-7 atan2 polynomial (~5e-8 turns,
the magnitude of the component engine's two rsqrt roundings).

Layout mirrors ops/xy2d_pallas.py: one (R, ny, half) f32 angle plane
per checkerboard color, grid (replicas, row-blocks), 8-row y-halo
BlockSpecs.  Lane-PADDED planes (``valid_half`` > 0) follow the padded
API's seam contract (stencil.nbr_sum_padded substitutes the x-wrap at
the real seam, so real sites never read pad lanes); pad angles are
frozen by masking ``accept``/``valid`` and the fused observables mask
pad lanes explicitly (a pad angle decodes to (1, 0), not (0, 0), so
the component engine's pads-are-zero unmasked-sum trick does not
transfer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XYState
from cuda_fortran_mc_simulation_spin_tpu.ops import stencil, trig
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    _pick_tile_rows,
    seeds_from_key,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.xy2d_pallas import (
    pad_width,
)


def pack_angles(state: XYState, half: int | None = None):
    """XYState component planes -> (a, b) angle planes in turns
    ∈ [-0.5, 0.5); with ``half`` (the real lane count) the planes are
    lane-padded to pad_width(half) with pad angles 0."""
    a = trig.atan2_2pi(state.ay, state.ax)
    b = trig.atan2_2pi(state.by, state.bx)
    if half is not None:
        halfp = pad_width(half)
        if halfp != a.shape[-1]:
            widths = [(0, 0)] * (a.ndim - 1) + [(0, halfp - half)]
            a = jnp.pad(a, widths)
            b = jnp.pad(b, widths)
    return a, b


def unpack_angles(planes, half: int | None = None) -> XYState:
    """(a, b) angle planes -> XYState component planes (unpadding to
    ``half`` real lanes if given)."""
    a, b = planes
    if half is not None:
        a = a[..., :half]
        b = b[..., :half]
    ax, ay = trig.cos_sin_2pi(a)
    bx, by = trig.cos_sin_2pi(b)
    return XYState(ax, ay, bx, by)


# ---------------------------------------------------------------------------
# shared math (kernel + jnp reference run the SAME ops in the SAME
# order so interpret-mode comparisons are bitwise)
# ---------------------------------------------------------------------------

def _field_angles(o, oup_row, odn_row, color, parity, half: int):
    """(hx, hy) local-field planes from an other-color ANGLE block and
    its 1-row y-halos (decode, then the component engine's neighbor
    sums; ``half`` > 0 → lane-padded seam sums)."""
    ox, oy = trig.cos_sin_2pi(o)
    oxu, oyu = trig.cos_sin_2pi(oup_row)
    oxd, oyd = trig.cos_sin_2pi(odn_row)
    if half:
        hx = stencil.nbr_sum_padded(ox, oxu, oxd, color, parity, half)
        hy = stencil.nbr_sum_padded(oy, oyu, oyd, color, parity, half)
    else:
        hx = stencil.nbr_sum(ox, oxu, oxd, color, parity)
        hy = stencil.nbr_sum(oy, oyu, oyd, color, parity)
    return (ox, oy), (hx, hy)


def _lane_mask(shape, half: int):
    if not half:
        return None
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return lane < half


def _metro_math(s, hx, hy, u_cand, u_acc, beta, valid):
    """Metropolis accept on an angle plane; returns (fin_angle, fx, fy)
    with (fx, fy) the decoded FINAL components (for fused obs)."""
    sx, sy = trig.cos_sin_2pi(s)
    cand = u_cand - jnp.float32(0.5)
    cx, cy = trig.cos_sin_2pi(cand)
    de = -((cx - sx) * hx + (cy - sy) * hy)
    p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))
    accept = u_acc < p
    if valid is not None:
        accept = accept & valid
    fin = jnp.where(accept, cand, s)
    fx = jnp.where(accept, cx, sx)
    fy = jnp.where(accept, cy, sy)
    return fin, fx, fy


def _or_math(s, hx, hy, valid):
    """Reflection about the local field in angle space: θ' = 2φ − θ,
    wrapped to [-0.5, 0.5] turns.  A zero field gives φ = 0 → θ' = −θ,
    matching the component engine's guarded-rsqrt degenerate case."""
    phi = trig.atan2_2pi(hy, hx)
    tp = 2.0 * phi - s
    tp = tp - jnp.round(tp)
    if valid is None:
        return tp
    return jnp.where(valid, tp, s)


def _obs_accumulate(obs_ref, i, mx, my, e):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row = jnp.where(
        lane == 0, mx,
        jnp.where(lane == 1, my, jnp.where(lane == 2, e, 0.0)),
    )

    @pl.when(i == 0)
    def _():
        obs_ref[0] = jnp.zeros_like(obs_ref[0])

    obs_ref[0] = obs_ref[0] + row


def _masked_obs(fx, fy, hx, hy, ox, oy, valid):
    if valid is None:
        mx = jnp.sum(fx) + jnp.sum(ox)
        my = jnp.sum(fy) + jnp.sum(oy)
        e = -jnp.sum(fx * hx + fy * hy)
        return mx, my, e
    vm = valid.astype(jnp.float32)
    mx = jnp.sum(fx * vm) + jnp.sum(ox * vm)
    my = jnp.sum(fy * vm) + jnp.sum(oy * vm)
    e = -jnp.sum((fx * hx + fy * hy) * vm)
    return mx, my, e


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _angle_metro_kernel(seed_ref, s_ref, o_ref, ou_ref, od_ref, *rest,
                        color: int, ty: int, beta: float,
                        half: int = 0, has_u: bool = False,
                        measuring: bool = False):
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    if has_u:
        ucand_ref, uacc_ref, out_ref = refs
    else:
        (out_ref,) = refs
    r = pl.program_id(0)
    i = pl.program_id(1)
    parity = stencil.row_parity_mask(ty, i * ty)
    s = s_ref[0]
    (ox, oy), (hx, hy) = _field_angles(
        o_ref[0], ou_ref[0, 7:8, :], od_ref[0, 0:1, :], color, parity,
        half)
    if has_u:
        u_cand = ucand_ref[0]
        u_acc = uacc_ref[0]
    else:
        tile_tag = i * jnp.int32(-1640531527) + r * jnp.int32(0x3C6EF35F)
        pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)
        u_cand = stencil.bits_to_uniform(
            pltpu.bitcast(pltpu.prng_random_bits(s.shape), jnp.uint32))
        u_acc = stencil.bits_to_uniform(
            pltpu.bitcast(pltpu.prng_random_bits(s.shape), jnp.uint32))
    valid = _lane_mask(s.shape, half)
    fin, fx, fy = _metro_math(s, hx, hy, u_cand, u_acc, beta, valid)
    out_ref[0] = fin
    if measuring:
        # phase-b fused (mx, my, e): h from FINAL phase-a values, each
        # bond once in Σ_b S·h; pad lanes masked (they decode to (1,0))
        mx, my, e = _masked_obs(fx, fy, hx, hy, ox, oy, valid)
        _obs_accumulate(obs_ref, i, mx, my, e)


def _angle_or_kernel(s_ref, o_ref, ou_ref, od_ref, out_ref, *rest,
                     color: int, ty: int, half: int = 0,
                     measuring: bool = False):
    obs_ref = rest[0] if measuring else None
    i = pl.program_id(1)
    parity = stencil.row_parity_mask(ty, i * ty)
    s = s_ref[0]
    (ox, oy), (hx, hy) = _field_angles(
        o_ref[0], ou_ref[0, 7:8, :], od_ref[0, 0:1, :], color, parity,
        half)
    valid = _lane_mask(s.shape, half)
    fin = _or_math(s, hx, hy, valid)
    out_ref[0] = fin
    if measuring:
        fx, fy = trig.cos_sin_2pi(fin)
        mx, my, e = _masked_obs(fx, fy, hx, hy, ox, oy, valid)
        _obs_accumulate(obs_ref, i, mx, my, e)


def _specs(ty: int, ny: int, half: int):
    nb8 = ny // 8
    center = pl.BlockSpec((1, ty, half), lambda r, i: (r, i, 0),
                          memory_space=pltpu.VMEM)
    up = pl.BlockSpec(
        (1, 8, half), lambda r, i: (r, (i * ty // 8 - 1 + nb8) % nb8, 0),
        memory_space=pltpu.VMEM,
    )
    dn = pl.BlockSpec(
        (1, 8, half), lambda r, i: (r, ((i + 1) * ty // 8) % nb8, 0),
        memory_space=pltpu.VMEM,
    )
    return center, up, dn


@functools.partial(
    jax.jit, static_argnames=("color", "beta", "nrep", "ny", "half",
                              "valid_half", "measuring", "interpret")
)
def _angle_metro_phase(s, o, seeds, *, color, beta, nrep, ny, half,
                       valid_half=0, measuring=False, u_cand=None,
                       u_acc=None, interpret=False):
    ty = _pick_tile_rows(ny, half, budget_bytes=128 << 10, gran=8)
    n = ny // ty
    center, up, dn = _specs(ty, ny, half)
    has_u = u_cand is not None
    kernel = functools.partial(
        _angle_metro_kernel, color=color, ty=ty, beta=beta,
        half=valid_half, has_u=has_u, measuring=measuring,
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                center, center, up, dn]
    operands = [seeds, s, o, o, o]
    if has_u:
        in_specs += [center, center]
        operands += [u_cand, u_acc]
    out_shape = [jax.ShapeDtypeStruct((nrep, ny, half), jnp.float32)]
    out_specs = [center]
    if measuring:
        out_shape.append(jax.ShapeDtypeStruct((nrep, 1, 128),
                                              jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, 128),
                                      lambda r, i: (r, 0, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(nrep, n),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(*operands)
    if measuring:
        return res
    return res[0]


@functools.partial(
    jax.jit, static_argnames=("color", "nrep", "ny", "half",
                              "valid_half", "measuring", "interpret")
)
def _angle_or_phase(s, o, *, color, nrep, ny, half, valid_half=0,
                    measuring=False, interpret=False):
    ty = _pick_tile_rows(ny, half, budget_bytes=128 << 10, gran=8)
    n = ny // ty
    center, up, dn = _specs(ty, ny, half)
    kernel = functools.partial(_angle_or_kernel, color=color, ty=ty,
                               half=valid_half, measuring=measuring)
    out_shape = [jax.ShapeDtypeStruct((nrep, ny, half), jnp.float32)]
    out_specs = [center]
    if measuring:
        out_shape.append(jax.ShapeDtypeStruct((nrep, 1, 128),
                                              jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, 128),
                                      lambda r, i: (r, 0, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(nrep, n),
        in_specs=[center, center, up, dn],
        out_specs=tuple(out_specs),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(s, o, o, o)
    if measuring:
        return res
    return res[0]


# ---------------------------------------------------------------------------
# phase b with fused snapshot measurement: the disorder-protocol fast
# path.  In angle storage the autocorrelation needs NO snapshot decode:
# S(t)·S(0) = cos 2π(θ_t − θ_0), one quarter-period polynomial on the
# difference (domain (-1, 1) — both operands are turns in [-0.5, 0.5)).
# Traffic per measuring phase: 4 plane reads + 1 write vs the component
# engine's 8 + 2 (ops/xy2d_pallas._metropolis_phase_b_measure).
# ---------------------------------------------------------------------------

def _angle_metro_snap_kernel(seed_ref, s_ref, o_ref, ou_ref, od_ref,
                             sna_ref, sno_ref, *rest,
                             color: int, ty: int, beta: float,
                             half: int = 0, has_u: bool = False):
    refs = list(rest)
    obs_ref = refs.pop()
    if has_u:
        ucand_ref, uacc_ref, out_ref = refs
    else:
        (out_ref,) = refs
    r = pl.program_id(0)
    i = pl.program_id(1)
    parity = stencil.row_parity_mask(ty, i * ty)
    s = s_ref[0]
    o = o_ref[0]
    (ox, oy), (hx, hy) = _field_angles(
        o, ou_ref[0, 7:8, :], od_ref[0, 0:1, :], color, parity, half)
    if has_u:
        u_cand = ucand_ref[0]
        u_acc = uacc_ref[0]
    else:
        tile_tag = i * jnp.int32(-1640531527) + r * jnp.int32(0x3C6EF35F)
        pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)
        u_cand = stencil.bits_to_uniform(
            pltpu.bitcast(pltpu.prng_random_bits(s.shape), jnp.uint32))
        u_acc = stencil.bits_to_uniform(
            pltpu.bitcast(pltpu.prng_random_bits(s.shape), jnp.uint32))
    valid = _lane_mask(s.shape, half)
    fin, fx, fy = _metro_math(s, hx, hy, u_cand, u_acc, beta, valid)
    out_ref[0] = fin

    # fused (mx, my, e, A): h from FINAL phase-a values, each bond once
    # in Σ_b S·h; A over BOTH colors against the t=0 angle snapshots
    ca, _ = trig.cos_sin_2pi(fin - sna_ref[0])
    cb, _ = trig.cos_sin_2pi(o - sno_ref[0])
    if valid is None:
        mx = jnp.sum(fx) + jnp.sum(ox)
        my = jnp.sum(fy) + jnp.sum(oy)
        e = -jnp.sum(fx * hx + fy * hy)
        a_sum = jnp.sum(ca) + jnp.sum(cb)
    else:
        vm = valid.astype(jnp.float32)
        mx = jnp.sum(fx * vm) + jnp.sum(ox * vm)
        my = jnp.sum(fy * vm) + jnp.sum(oy * vm)
        e = -jnp.sum((fx * hx + fy * hy) * vm)
        a_sum = jnp.sum(ca * vm) + jnp.sum(cb * vm)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row = jnp.where(
        lane == 0, mx,
        jnp.where(lane == 1, my,
                  jnp.where(lane == 2, e,
                            jnp.where(lane == 3, a_sum, 0.0))))

    @pl.when(i == 0)
    def _():
        obs_ref[0] = jnp.zeros_like(obs_ref[0])

    obs_ref[0] = obs_ref[0] + row


@functools.partial(
    jax.jit, static_argnames=("beta", "nrep", "ny", "half",
                              "valid_half", "interpret")
)
def _angle_metro_snap_phase(s, o, snap_s, snap_o, seeds, *, beta, nrep,
                            ny, half, valid_half=0, u_cand=None,
                            u_acc=None, interpret=False):
    """Phase b (color 1) Metropolis + fused (mx, my, e, A)."""
    ty = _pick_tile_rows(ny, half, budget_bytes=128 << 10, gran=8)
    n = ny // ty
    center, up, dn = _specs(ty, ny, half)
    has_u = u_cand is not None
    kernel = functools.partial(
        _angle_metro_snap_kernel, color=1, ty=ty, beta=beta,
        half=valid_half, has_u=has_u,
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                center, center, up, dn, center, center]
    operands = [seeds, s, o, o, o, snap_s, snap_o]
    if has_u:
        in_specs += [center, center]
        operands += [u_cand, u_acc]
    res = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nrep, ny, half), jnp.float32),
            jax.ShapeDtypeStruct((nrep, 1, 128), jnp.float32),
        ),
        grid=(nrep, n),
        in_specs=in_specs,
        out_specs=(center,
                   pl.BlockSpec((1, 1, 128), lambda r, i: (r, 0, 0),
                                memory_space=pltpu.VMEM)),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(*operands)
    return res


def sweep_measure_snap_angle(model, planes, snaps, key):
    """One Metropolis MCS + fused (mx, my, e, A) against the t=0 angle
    snapshots — the disorder-protocol measurement on angle storage
    (A(t) = Σ cos 2π(θ_t − θ_0), /root/reference/src/
    xy2d_periodic_gpu_m.f90:535-549 semantics)."""
    a, b = planes
    sa, sb = snaps
    kw = _kw(model, planes)
    beta = float(model.beta)
    a = _angle_metro_phase(a, b, seeds_from_key(key, 0), color=0,
                           beta=beta, **kw)
    b, obs = _angle_metro_snap_phase(
        b, a, sb, sa, seeds_from_key(key, 1), beta=beta, **kw)
    n_inv = jnp.float32(1.0 / model.nsites)
    return (a, b), {
        "mx": obs[:, 0, 0] * n_inv,
        "my": obs[:, 0, 1] * n_inv,
        "e": obs[:, 0, 2] * n_inv,
        "A": obs[:, 0, 3] * n_inv,
    }


# ---------------------------------------------------------------------------
# sweep wrappers (angle-plane state: a 2-tuple (a, b))
# ---------------------------------------------------------------------------

def _kw(model, planes):
    from cuda_fortran_mc_simulation_spin_tpu.ops.xy2d_pallas import (
        _padded_interp,
    )

    a, _ = planes
    ny, half = model.color_shape
    halfp = a.shape[-1]
    return dict(nrep=a.shape[0], ny=ny, half=halfp,
                valid_half=half if halfp != half else 0,
                interpret=_padded_interp())


def sweep_angle(model, planes, key):
    """One Metropolis MCS on (R, ny, half[p]) angle plane pairs."""
    a, b = planes
    kw = _kw(model, planes)
    a = _angle_metro_phase(a, b, seeds_from_key(key, 0), color=0,
                           beta=float(model.beta), **kw)
    b = _angle_metro_phase(b, a, seeds_from_key(key, 1), color=1,
                           beta=float(model.beta), **kw)
    return a, b


def sweep_measure_angle(model, planes, key):
    """One Metropolis MCS + fused (m, my, e) densities (phase b)."""
    a, b = planes
    kw = _kw(model, planes)
    a = _angle_metro_phase(a, b, seeds_from_key(key, 0), color=0,
                           beta=float(model.beta), **kw)
    b, obs = _angle_metro_phase(b, a, seeds_from_key(key, 1), color=1,
                                beta=float(model.beta), measuring=True,
                                **kw)
    n_inv = jnp.float32(1.0 / model.nsites)
    return (a, b), {
        "m": obs[:, 0, 0] * n_inv,
        "my": obs[:, 0, 1] * n_inv,
        "e": obs[:, 0, 2] * n_inv,
    }


def or_sweep_angle(model, planes):
    """One over-relaxation sweep (both colors, deterministic)."""
    a, b = planes
    kw = _kw(model, planes)
    a = _angle_or_phase(a, b, color=0, **kw)
    b = _angle_or_phase(b, a, color=1, **kw)
    return a, b


def or_sweep_measure_angle(model, planes):
    """One OR sweep + fused (m, my, e) densities from the color-1
    kernel — the OR schedule's hot path."""
    a, b = planes
    kw = _kw(model, planes)
    a = _angle_or_phase(a, b, color=0, **kw)
    b, obs = _angle_or_phase(b, a, color=1, measuring=True, **kw)
    n_inv = jnp.float32(1.0 / model.nsites)
    return (a, b), {
        "m": obs[:, 0, 0] * n_inv,
        "my": obs[:, 0, 1] * n_inv,
        "e": obs[:, 0, 2] * n_inv,
    }
