"""f32-ANGLE storage variant of the dense dual-color helical XY engine.

The committed OR literal (10001×10000 × 10⁴ MCS × 500 samples,
/root/reference/app/xy2d_gpu_over_relaxation.f90:7-17) is HBM-bound on
the component-plane engine (ops/xy2d_helical_dense.py): each phase
streams two f32 planes per color, and the measured 84.5 s/sample sits
at ~74% of the v5e HBM roofline.  Storing ONE f32 angle (in TURNS,
θ/2π ∈ [-0.5, 0.5)) per site halves the lattice traffic; the kernels
decode (cos, sin) in-VMEM with the quarter-period polynomial
(ops/trig.cos_sin_2pi) and the over-relaxation reflection becomes pure
angle arithmetic θ' = 2φ − θ with φ = atan2_2pi(hy, hx).

This is the SAME Markov chain as the component engine, in a different
state representation: the candidate distribution (uniform angle) and
the acceptance compare are identical, |S| = 1 holds exactly by
construction (no renormalization pass at all), and the only new
rounding is the degree-7 atan2 polynomial (~5e-8 turns — the component
engine's two rsqrt roundings are the same magnitude).

Unlike the earlier int16-angle negative result (ops/xy2d_multisweep.py
— a VMEM-resident design at 1536² dominated by serial grid overheads),
this targets the STREAMING HBM-bound regime where traffic is the
measured bottleneck.  The contention-honest on-chip A/B measured 1.94x
the component engine (BENCHMARKS.md §5), so this is the DEFAULT
helical-XY engine; SPINLAT_XY_DENSE_ANGLE=0 opts back into the
component (cos, sin) engine (engine/sweep.py routing).

Layout, neighbor algebra, tile picking, and validation strategy are
shared with ops/xy2d_helical_dense.py (imported, not duplicated).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.ops import stencil, trig
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    seeds_from_key,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.xy2d_helical_dense import (
    _VMEM_LIMIT,
    _nbrs_dense,
    _pick_ty,
    _roll_jnp,
    _roll_tpu,
    _specs,
    _valid_col,
    dense_nc,
    dense_pack,
    dense_unpack,
    fits,  # noqa: F401  (same shape gate as the component engine)
)

_TWO_PI = 6.283185307179586


# ---------------------------------------------------------------------------
# shared math (kernel + jnp reference run the SAME ops in the SAME
# order so interpret-mode comparisons are bitwise)
# ---------------------------------------------------------------------------

def _field_from_angles(o, oup, odn, color, nc, col, p0row, roll):
    """(hx, hy) local field planes from an other-color ANGLE block and
    its row-shifted companions (decode once, roll decoded planes)."""
    ox, oy = trig.cos_sin_2pi(o)
    oxu, oyu = trig.cos_sin_2pi(oup)
    oxd, oyd = trig.cos_sin_2pi(odn)
    ux, dx_, lx, rx = _nbrs_dense(ox, oxu, oxd, color, nc, col, p0row,
                                  roll)
    uy, dy_, ly, ry = _nbrs_dense(oy, oyu, oyd, color, nc, col, p0row,
                                  roll)
    return ux + dx_ + lx + rx, uy + dy_ + ly + ry


def _metro_math(s, hx, hy, u_cand, u_acc, beta, valid):
    """Metropolis accept on angle planes; returns (fin_angle, fx, fy)
    with (fx, fy) the decoded FINAL components (for fused obs)."""
    sx, sy = trig.cos_sin_2pi(s)
    cand = u_cand - jnp.float32(0.5)
    cx, cy = trig.cos_sin_2pi(cand)
    de = -((cx - sx) * hx + (cy - sy) * hy)
    p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))
    accept = valid & (u_acc < p)
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
    return jnp.where(valid, tp, s)


# ---------------------------------------------------------------------------
# jnp references (whole planes; bitwise vs interpret-mode kernels)
# ---------------------------------------------------------------------------

def angle_phase_reference(a, b, color, u_cand, u_acc, beta, nc):
    s, o = (a, b) if color == 0 else (b, a)
    ny, w = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (ny, w), 1)
    p0row = ((jax.lax.broadcasted_iota(jnp.int32, (ny, 1), 0) & 1)
             == 0)
    oup = jnp.roll(o, 1, axis=0)
    odn = jnp.roll(o, -1, axis=0)
    hx, hy = _field_from_angles(o, oup, odn, color, nc, col, p0row,
                                _roll_jnp)
    valid = _valid_col(color, nc, col, p0row)
    fin, _, _ = _metro_math(s, hx, hy, u_cand, u_acc, beta, valid)
    return (fin, b) if color == 0 else (a, fin)


def angle_or_reference(a, b, color, nc):
    s, o = (a, b) if color == 0 else (b, a)
    ny, w = s.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (ny, w), 1)
    p0row = ((jax.lax.broadcasted_iota(jnp.int32, (ny, 1), 0) & 1)
             == 0)
    oup = jnp.roll(o, 1, axis=0)
    odn = jnp.roll(o, -1, axis=0)
    hx, hy = _field_from_angles(o, oup, odn, color, nc, col, p0row,
                                _roll_jnp)
    valid = _valid_col(color, nc, col, p0row)
    fin = _or_math(s, hx, hy, valid)
    return (fin, b) if color == 0 else (a, fin)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

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


def _angle_phase_kernel(seed_ref, s_ref, o_ref, ou_ref, od_ref, *rest,
                        color: int, ty: int, nc: int, beta: float,
                        has_u: bool, measuring: bool):
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    if has_u:
        ucand_ref, uacc_ref = refs[:2]
        refs = refs[2:]
    out_ref = refs[0]
    r = pl.program_id(0)
    i = pl.program_id(1)
    s = s_ref[0]
    o = o_ref[0]
    w = s.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (ty, w), 1)
    rowg = (jax.lax.broadcasted_iota(jnp.int32, (ty, 1), 0)
            + pl.multiple_of(i * ty, 8))
    p0row = (rowg & 1) == 0
    oup, odn = stencil.splice_updown(
        o, ou_ref[0, 7:8, :], od_ref[0, 0:1, :])
    hx, hy = _field_from_angles(o, oup, odn, color, nc, col, p0row,
                                _roll_tpu)
    if has_u:
        u_cand = ucand_ref[0]
        u_acc = uacc_ref[0]
    else:
        tile_tag = (i * jnp.int32(-1640531527)
                    + r * jnp.int32(0x3C6EF35F))
        pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)
        u_cand = stencil.bits_to_uniform(
            pltpu.bitcast(pltpu.prng_random_bits((ty, w)), jnp.uint32))
        u_acc = stencil.bits_to_uniform(
            pltpu.bitcast(pltpu.prng_random_bits((ty, w)), jnp.uint32))
    valid = _valid_col(color, nc, col, p0row)
    fin, fx, fy = _metro_math(s, hx, hy, u_cand, u_acc, beta, valid)
    out_ref[0] = fin
    if measuring:
        # phase-b fused (m, my, e): h from FINAL phase-a values, each
        # bond once in Σ_b S·h; other-color components re-decoded here
        ox, oy = trig.cos_sin_2pi(o)
        ovalid = _valid_col(1 - color, nc, col, p0row)
        vm = valid.astype(jnp.float32)
        ovm = ovalid.astype(jnp.float32)
        mx = jnp.sum(fx * vm) + jnp.sum(ox * ovm)
        my = jnp.sum(fy * vm) + jnp.sum(oy * ovm)
        e = -jnp.sum((fx * hx + fy * hy) * vm)
        _obs_accumulate(obs_ref, i, mx, my, e)


def _angle_or_kernel(s_ref, o_ref, ou_ref, od_ref, out_ref, *rest,
                     color: int, ty: int, nc: int,
                     measuring: bool = False):
    obs_ref = rest[0] if measuring else None
    i = pl.program_id(1)
    s = s_ref[0]
    o = o_ref[0]
    w = s.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (ty, w), 1)
    rowg = (jax.lax.broadcasted_iota(jnp.int32, (ty, 1), 0)
            + pl.multiple_of(i * ty, 8))
    p0row = (rowg & 1) == 0
    oup, odn = stencil.splice_updown(
        o, ou_ref[0, 7:8, :], od_ref[0, 0:1, :])
    hx, hy = _field_from_angles(o, oup, odn, color, nc, col, p0row,
                                _roll_tpu)
    valid = _valid_col(color, nc, col, p0row)
    fin = _or_math(s, hx, hy, valid)
    out_ref[0] = fin
    if measuring:
        fx, fy = trig.cos_sin_2pi(fin)
        ox, oy = trig.cos_sin_2pi(o)
        ovalid = _valid_col(1 - color, nc, col, p0row)
        vm = valid.astype(jnp.float32)
        ovm = ovalid.astype(jnp.float32)
        mx = jnp.sum(fx * vm) + jnp.sum(ox * ovm)
        my = jnp.sum(fy * vm) + jnp.sum(oy * ovm)
        e = -jnp.sum((fx * hx + fy * hy) * vm)
        _obs_accumulate(obs_ref, i, mx, my, e)


@functools.partial(
    jax.jit,
    static_argnames=("color", "beta", "nrep", "ny", "nc", "measuring",
                     "interpret"),
)
def _angle_phase(planes, seeds, u_cand, u_acc, *, color, beta, nrep,
                 ny, nc, measuring=False, interpret=False):
    a, b = planes
    w = a.shape[-1]
    ty = _pick_ty(ny, w)
    n = ny // ty
    center, up, dn = _specs(ty, ny, w)
    has_u = u_cand is not None
    kernel = functools.partial(
        _angle_phase_kernel, color=color, ty=ty, nc=nc, beta=beta,
        has_u=has_u, measuring=measuring,
    )
    s, o = (a, b) if color == 0 else (b, a)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                center, center, up, dn]
    operands = [seeds, s, o, o, o]
    if has_u:
        in_specs += [center, center]
        operands += [u_cand, u_acc]
    out_shape = [jax.ShapeDtypeStruct((nrep, ny, w), jnp.float32)]
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
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(*operands)
    fin = res[0]
    planes = (fin, b) if color == 0 else (a, fin)
    if measuring:
        return planes, res[1]
    return planes


@functools.partial(
    jax.jit, static_argnames=("color", "nrep", "ny", "nc", "measuring",
                              "interpret")
)
def _angle_or_phase(planes, *, color, nrep, ny, nc, measuring=False,
                    interpret=False):
    a, b = planes
    w = a.shape[-1]
    ty = _pick_ty(ny, w)
    n = ny // ty
    center, up, dn = _specs(ty, ny, w)
    kernel = functools.partial(_angle_or_kernel, color=color, ty=ty,
                               nc=nc, measuring=measuring)
    s, o = (a, b) if color == 0 else (b, a)
    out_shape = [jax.ShapeDtypeStruct((nrep, ny, w), jnp.float32)]
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
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(s, o, o, o)
    fin = res[0]
    planes = (fin, b) if color == 0 else (a, fin)
    if measuring:
        return planes, res[1]
    return planes


# ---------------------------------------------------------------------------
# sweep wrappers — same surface as ops/xy2d_helical_dense so the
# helical runner swaps modules (SPINLAT_XY_DENSE_ANGLE=1)
# ---------------------------------------------------------------------------

def pack_state(state, ny: int, nx: int):
    """((R, nall), (R, nall)) flat XY component state -> (a, b) dense
    ANGLE planes (R, ny, W) in turns."""
    fx, fy = state
    turns = (jnp.arctan2(fy, fx) * jnp.float32(1.0 / _TWO_PI)
             ).astype(jnp.float32)
    return dense_pack(turns, ny, nx)


def unpack_state(planes, ny: int, nx: int):
    a, b = planes
    flat = dense_unpack(a, b, ny, nx)
    cx, cy = trig.cos_sin_2pi(flat)
    return cx, cy


def sweep_measure(model, planes, key):
    kw = dict(beta=float(model.beta), nrep=planes[0].shape[0],
              ny=model.ny, nc=dense_nc(model.nx))
    planes = _angle_phase(planes, seeds_from_key(key, 0), None, None,
                          color=0, **kw)
    planes, obs = _angle_phase(planes, seeds_from_key(key, 1), None,
                               None, color=1, measuring=True, **kw)
    n_inv = jnp.float32(1.0 / model.nsites)
    return planes, {
        "m": obs[:, 0, 0] * n_inv,
        "my": obs[:, 0, 1] * n_inv,
        "e": obs[:, 0, 2] * n_inv,
    }


def sweep(model, planes, key):
    kw = dict(beta=float(model.beta), nrep=planes[0].shape[0],
              ny=model.ny, nc=dense_nc(model.nx))
    planes = _angle_phase(planes, seeds_from_key(key, 0), None, None,
                          color=0, **kw)
    return _angle_phase(planes, seeds_from_key(key, 1), None, None,
                        color=1, **kw)


def over_relax_sweep(model, planes):
    kw = dict(nrep=planes[0].shape[0], ny=model.ny,
              nc=dense_nc(model.nx))
    planes = _angle_or_phase(planes, color=0, **kw)
    return _angle_or_phase(planes, color=1, **kw)


def over_relax_sweep_measure(model, planes):
    kw = dict(nrep=planes[0].shape[0], ny=model.ny,
              nc=dense_nc(model.nx))
    planes = _angle_or_phase(planes, color=0, **kw)
    planes, obs = _angle_or_phase(planes, color=1, measuring=True,
                                  **kw)
    n_inv = jnp.float32(1.0 / model.nsites)
    return planes, {
        "m": obs[:, 0, 0] * n_inv,
        "my": obs[:, 0, 1] * n_inv,
        "e": obs[:, 0, 2] * n_inv,
    }


def observables(model, planes):
    """{m, my, e} densities via an XLA pass over the angle planes."""
    from cuda_fortran_mc_simulation_spin_tpu.ops.xy2d_helical_dense import (
        valid_mask,
    )

    a, b = planes
    ny, nx = model.ny, model.nx
    nc = dense_nc(nx)
    va = valid_mask(ny, nx, 0).astype(jnp.float32)
    vb = valid_mask(ny, nx, 1).astype(jnp.float32)
    ax, ay = trig.cos_sin_2pi(a)
    bx, by = trig.cos_sin_2pi(b)
    mx = jnp.sum(ax * va, axis=(1, 2)) + jnp.sum(bx * vb, axis=(1, 2))
    my = jnp.sum(ay * va, axis=(1, 2)) + jnp.sum(by * vb, axis=(1, 2))

    col = jax.lax.broadcasted_iota(jnp.int32, (ny, a.shape[-1]), 1)
    p0row = ((jax.lax.broadcasted_iota(jnp.int32, (ny, 1), 0) & 1)
             == 0)

    def e_rep(ar, br):
        oup = jnp.roll(ar, 1, axis=0)
        odn = jnp.roll(ar, -1, axis=0)
        hx, hy = _field_from_angles(ar, oup, odn, 1, nc, col, p0row,
                                    _roll_jnp)
        brx, bry = trig.cos_sin_2pi(br)
        return -jnp.sum((brx * hx + bry * hy) * vb)

    e = jax.vmap(e_rep)(a, b)
    n_inv = jnp.float32(1.0 / model.nsites)
    return {"m": mx * n_inv, "my": my * n_inv, "e": e * n_inv}
