"""Dense dual-color engine for the helical XY geometry (odd nx).

The committed 10001×10000 XY workload
(/root/reference/app/xy2d_gpu_relaxation.f90:7-14) ran on full-width
masked streaming kernels (ops/helical_pallas.py): every phase computes
candidate trig/exp for ALL lanes and writes full planes, so half the
VPU work is masked away and the HBM traffic is 2× the updated data.

With nx odd, flat-index parity equals (x+y) parity, so the helical
checkerboard splits into TWO DENSE ragged color arrays:

  A[y, i] = site (y, x = 2i + (y&1))      (flat parity 0)
  B[y, i] = site (y, x = 2i + 1 - (y&1))  (flat parity 1)

of width nc = (nx+1)//2, where even/odd rows alternate between nc and
nc-1 valid entries (the one-slot raggedness of an odd-nx row).  All
four neighbors of an A site live in B (and vice versa):

  up/dn : same lane, row ±1 (helical ±nx is pure vertical)
  left  : lane i + p - 1 resp. i - p     (p = y&1)
  right : lane i + p     resp. i + 1 - p

with the helical x-seam at x=0 / x=nx-1 (which exist only on one row
parity per color) substituting the up-row's last / down-row's first
lane.  Updates are dense — every lane's trig/exp is useful work — and
a phase writes only the updated color (≈1.3× less HBM, ≈2× less VPU
than the masked kernels).

Validation: bitwise vs the flat masked engine given shared uniforms
(tests/test_xy2d_helical_dense.py), interpret+Mosaic kernel-vs-oracle,
OR energy conservation, and curve-level cross-checks.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.ops import stencil, trig
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    seeds_from_key,
)

LANES = 128


def dense_nc(nx: int) -> int:
    return (nx + 1) // 2


def dense_width(nx: int) -> int:
    nc = dense_nc(nx)
    return -(-nc // LANES) * LANES


def fits(model) -> bool:
    """Dense helical XY path gate: odd nx, even ny with 8-row tiling."""
    return model.nx % 2 == 1 and model.ny % 8 == 0


def _site_x(ny, nx, color, width=None):
    """(ny, width) full-lattice x coordinate per color slot (clipped)
    + validity, as TRACED iota math.

    Materializing these maps as numpy constants embeds ~(ny·nc) words
    into the jitted program — ~400 MB of HLO constants at the
    committed 10001×10000 geometry, which overflowed the remote-
    compile request (HTTP 413).  Iotas generate on device instead.
    Columns beyond nc (pad slots) replicate the row's last slot and
    are invalid."""
    nc = dense_nc(nx)
    shape = (ny, nc if width is None else width)
    p = jax.lax.broadcasted_iota(jnp.int32, shape, 0) & 1
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    iw = jnp.minimum(i, nc - 1)
    if color == 0:
        x = 2 * iw + p
    else:
        x = 2 * iw + 1 - p
    valid = (x <= nx - 1) & (i < nc)
    return jnp.minimum(x, nx - 1), valid


def valid_mask(ny: int, nx: int, color: int) -> jnp.ndarray:
    """(ny, W) bool validity mask of a dense color plane."""
    return _site_x(ny, nx, color, dense_width(nx))[1]


def dense_pack(flat, ny: int, nx: int):
    """(..., nall) flat plane -> (a, b) dense color planes (..., ny, W).

    Pad slots replicate their row's last valid value (finite, never
    read for valid sites)."""
    w = dense_width(nx)
    grid = flat.reshape(flat.shape[:-1] + (ny, nx))
    out = []
    for color in (0, 1):
        x, _ = _site_x(ny, nx, color, w)
        out.append(jnp.take_along_axis(
            grid, x[(None,) * (flat.ndim - 1)], axis=-1))
    return out[0], out[1]


def dense_unpack(a, b, ny: int, nx: int):
    """(a, b) dense planes -> flat (..., nall) (inverse of
    :func:`dense_pack`; invalid slots scatter to a dump column)."""
    nc = dense_nc(nx)
    lead = a.shape[:-2]
    grid = jnp.zeros(lead + (ny, nx + 1), a.dtype)
    yidx = jax.lax.broadcasted_iota(jnp.int32, (ny, nc), 0)
    for color, plane in ((0, a), (1, b)):
        x, v = _site_x(ny, nx, color)
        xs = jnp.where(v, x, nx)                # invalid -> dump col
        grid = grid.at[..., yidx, xs].set(plane[..., :, :nc])
    return grid[..., :, :nx].reshape(lead + (ny * nx,))


# ---------------------------------------------------------------------------
# shared neighbor algebra (kernel + jnp reference)
# ---------------------------------------------------------------------------

def _nbrs_dense(o, oup, odn, color, nc, col, p0row, roll):
    """(up, dn, left, right) other-color neighbor planes for a dense
    color block.

    o: other-color values; oup/odn: o shifted down/up by one row (row
    ±1 with the global wrap already applied); p0row: (rows, 1) bool,
    True on even global rows; roll(x, k) must satisfy out[i] = in[i-k]
    along the lane axis."""
    minus = roll(o, 1)
    plus = roll(o, -1)
    if color == 0:
        left = jnp.where(p0row, minus, o)
        right = jnp.where(p0row, o, plus)
        seam = p0row
    else:
        left = jnp.where(p0row, o, minus)
        right = jnp.where(p0row, plus, o)
        seam = ~p0row
    # helical x-seam: x=0's left = up-row's last site, x=nx-1's right =
    # down-row's first site (they exist on one row parity per color)
    left = jnp.where(seam & (col == 0), oup[:, nc - 1:nc], left)
    right = jnp.where(seam & (col == nc - 1), odn[:, 0:1], right)
    return oup, odn, left, right


def _roll_jnp(x, k):
    return jnp.roll(x, k, axis=-1)


def _roll_tpu(x, k):
    if k < 0:
        k += x.shape[-1]
    return pltpu.roll(x, k, axis=1)


def _valid_col(color, nc, col, p0row):
    # select the integer limit, not boolean planes (Mosaic can't
    # truncate i8 selects to i1)
    if color == 0:
        lim = jnp.where(p0row, nc, nc - 1)
    else:
        lim = jnp.where(p0row, nc - 1, nc)
    return col < lim


def dense_phase_reference(ax, ay, bx, by, color, u_cand, u_acc, beta,
                          nc):
    """Pure-jnp dense Metropolis phase on whole (ny, W) planes — the
    oracle the Pallas kernel is tested against bitwise."""
    sx, sy, ox, oy = ((ax, ay, bx, by) if color == 0
                      else (bx, by, ax, ay))
    ny, w = sx.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (ny, w), 1)
    p0row = ((jax.lax.broadcasted_iota(jnp.int32, (ny, 1), 0) & 1)
             == 0)
    oxu, oxd = jnp.roll(ox, 1, axis=0), jnp.roll(ox, -1, axis=0)
    oyu, oyd = jnp.roll(oy, 1, axis=0), jnp.roll(oy, -1, axis=0)
    ux, dx_, lx, rx = _nbrs_dense(ox, oxu, oxd, color, nc, col, p0row,
                                  _roll_jnp)
    uy, dy_, ly, ry = _nbrs_dense(oy, oyu, oyd, color, nc, col, p0row,
                                  _roll_jnp)
    hx = ux + dx_ + lx + rx
    hy = uy + dy_ + ly + ry
    cx, cy = trig.cos_sin_2pi(u_cand)
    de = -((cx - sx) * hx + (cy - sy) * hy)
    p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))
    accept = _valid_col(color, nc, col, p0row) & (u_acc < p)
    fin_x = jnp.where(accept, cx, sx)
    fin_y = jnp.where(accept, cy, sy)
    if color == 0:
        return fin_x, fin_y, bx, by
    return ax, ay, fin_x, fin_y


def dense_or_reference(ax, ay, bx, by, color, nc):
    """Pure-jnp dense over-relaxation phase (reflection + renorm)."""
    sx, sy, ox, oy = ((ax, ay, bx, by) if color == 0
                      else (bx, by, ax, ay))
    ny, w = sx.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (ny, w), 1)
    p0row = ((jax.lax.broadcasted_iota(jnp.int32, (ny, 1), 0) & 1)
             == 0)
    oxu, oxd = jnp.roll(ox, 1, axis=0), jnp.roll(ox, -1, axis=0)
    oyu, oyd = jnp.roll(oy, 1, axis=0), jnp.roll(oy, -1, axis=0)
    ux, dx_, lx, rx = _nbrs_dense(ox, oxu, oxd, color, nc, col, p0row,
                                  _roll_jnp)
    uy, dy_, ly, ry = _nbrs_dense(oy, oyu, oyd, color, nc, col, p0row,
                                  _roll_jnp)
    hx = ux + dx_ + lx + rx
    hy = uy + dy_ + ly + ry
    inv = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy,
                                    jnp.float32(1e-30)))
    nxh, nyh = hx * inv, hy * inv
    d = 2.0 * (sx * nxh + sy * nyh)
    rx_, ry_ = d * nxh - sx, d * nyh - sy
    rinv = jax.lax.rsqrt(jnp.maximum(rx_ * rx_ + ry_ * ry_,
                                     jnp.float32(1e-30)))
    valid = _valid_col(color, nc, col, p0row)
    fin_x = jnp.where(valid, rx_ * rinv, sx)
    fin_y = jnp.where(valid, ry_ * rinv, sy)
    if color == 0:
        return fin_x, fin_y, bx, by
    return ax, ay, fin_x, fin_y


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _phase_kernel(seed_ref, sx_ref, sy_ref,
                  ox_ref, oxu_ref, oxd_ref,
                  oy_ref, oyu_ref, oyd_ref, *rest,
                  color: int, ty: int, nc: int, beta: float,
                  has_u: bool, measuring: bool):
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    if has_u:
        ucand_ref, uacc_ref = refs[:2]
        refs = refs[2:]
    outx_ref, outy_ref = refs
    r = pl.program_id(0)
    i = pl.program_id(1)
    sx = sx_ref[0]
    sy = sy_ref[0]
    ox = ox_ref[0]
    oy = oy_ref[0]
    w = sx.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (ty, w), 1)
    rowg = (jax.lax.broadcasted_iota(jnp.int32, (ty, 1), 0)
            + pl.multiple_of(i * ty, 8))
    p0row = (rowg & 1) == 0
    oxu, oxd = stencil.splice_updown(
        ox, oxu_ref[0, 7:8, :], oxd_ref[0, 0:1, :])
    oyu, oyd = stencil.splice_updown(
        oy, oyu_ref[0, 7:8, :], oyd_ref[0, 0:1, :])
    ux, dx_, lx, rx = _nbrs_dense(ox, oxu, oxd, color, nc, col, p0row,
                                  _roll_tpu)
    uy, dy_, ly, ry = _nbrs_dense(oy, oyu, oyd, color, nc, col, p0row,
                                  _roll_tpu)
    hx = ux + dx_ + lx + rx
    hy = uy + dy_ + ly + ry
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
    cx, cy = trig.cos_sin_2pi(u_cand)
    de = -((cx - sx) * hx + (cy - sy) * hy)
    p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))
    valid = _valid_col(color, nc, col, p0row)
    accept = valid & (u_acc < p)
    fin_x = jnp.where(accept, cx, sx)
    fin_y = jnp.where(accept, cy, sy)
    outx_ref[0] = fin_x
    outy_ref[0] = fin_y
    if measuring:
        # phase-b fused (m, my, e): the field h is built from FINAL
        # phase-a values and each bond appears once in Σ_b S·h
        ovalid = _valid_col(1 - color, nc, col, p0row)
        vm = valid.astype(jnp.float32)
        ovm = ovalid.astype(jnp.float32)
        mx = jnp.sum(fin_x * vm) + jnp.sum(ox * ovm)
        my = jnp.sum(fin_y * vm) + jnp.sum(oy * ovm)
        e = -jnp.sum((fin_x * hx + fin_y * hy) * vm)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(
            lane == 0, mx,
            jnp.where(lane == 1, my, jnp.where(lane == 2, e, 0.0)),
        )

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def _or_kernel(sx_ref, sy_ref, ox_ref, oxu_ref, oxd_ref,
               oy_ref, oyu_ref, oyd_ref, outx_ref, outy_ref,
               *rest, color: int, ty: int, nc: int,
               measuring: bool = False):
    obs_ref = rest[0] if measuring else None
    i = pl.program_id(1)
    sx = sx_ref[0]
    sy = sy_ref[0]
    ox = ox_ref[0]
    oy = oy_ref[0]
    w = sx.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (ty, w), 1)
    rowg = (jax.lax.broadcasted_iota(jnp.int32, (ty, 1), 0)
            + pl.multiple_of(i * ty, 8))
    p0row = (rowg & 1) == 0
    oxu, oxd = stencil.splice_updown(
        ox, oxu_ref[0, 7:8, :], oxd_ref[0, 0:1, :])
    oyu, oyd = stencil.splice_updown(
        oy, oyu_ref[0, 7:8, :], oyd_ref[0, 0:1, :])
    ux, dx_, lx, rx = _nbrs_dense(ox, oxu, oxd, color, nc, col, p0row,
                                  _roll_tpu)
    uy, dy_, ly, ry = _nbrs_dense(oy, oyu, oyd, color, nc, col, p0row,
                                  _roll_tpu)
    hx = ux + dx_ + lx + rx
    hy = uy + dy_ + ly + ry
    inv = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy,
                                    jnp.float32(1e-30)))
    nxh, nyh = hx * inv, hy * inv
    d = 2.0 * (sx * nxh + sy * nyh)
    rx_, ry_ = d * nxh - sx, d * nyh - sy
    rinv = jax.lax.rsqrt(jnp.maximum(rx_ * rx_ + ry_ * ry_,
                                     jnp.float32(1e-30)))
    valid = _valid_col(color, nc, col, p0row)
    fin_x = jnp.where(valid, rx_ * rinv, sx)
    fin_y = jnp.where(valid, ry_ * rinv, sy)
    outx_ref[0] = fin_x
    outy_ref[0] = fin_y
    if measuring:
        # fused (m, my, e) from the second OR color phase: h is built
        # from FINAL other-color values (already reflected in the
        # first OR phase) and each bond appears once in Σ_b S·h —
        # saves the separate whole-lattice observables() pass the OR
        # schedule otherwise needs.
        ovalid = _valid_col(1 - color, nc, col, p0row)
        vm = valid.astype(jnp.float32)
        ovm = ovalid.astype(jnp.float32)
        mx = jnp.sum(fin_x * vm) + jnp.sum(ox * ovm)
        my = jnp.sum(fin_y * vm) + jnp.sum(oy * ovm)
        e = -jnp.sum((fin_x * hx + fin_y * hy) * vm)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(
            lane == 0, mx,
            jnp.where(lane == 1, my, jnp.where(lane == 2, e, 0.0)),
        )

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def _pick_ty(ny: int, w: int, budget: int = 420_000) -> int:
    # ~18 live f32 planes per phase tile must fit the (raised, see
    # _VMEM_LIMIT) scoped VMEM.  budget 2^17 gave ty=16 at the
    # committed 10001x10000 geometry (w=5120), whose 16 halo rows
    # double the other-color HBM fetch; measured A/Bs on the committed
    # M+OR workload (scripts/tpu_session_r4{a,b}.py): ty16 9.74e9,
    # ty40 1.13e10, ty80 1.18e10 MCS-site/s (ty200 exceeds even the
    # lifted 64M scoped-vmem cap) — budget 420K elements picks ty=80.
    # SPINLAT_XY_DENSE_TY overrides for perf probes.
    env = os.environ.get("SPINLAT_XY_DENSE_TY")
    if env:
        ty = int(env)
        if ty >= 8 and ty % 8 == 0 and ny % ty == 0:
            return ty
    ty = max(8, min(ny, budget // max(w, 1)))
    ty -= ty % 8
    while ty >= 8:
        if ny % ty == 0:
            return ty
        ty -= 8
    raise ValueError(f"ny={ny} needs a multiple-of-8 divisor")


# lift the 16M default scoped-vmem cap so 40-80-row tiles compile
# (the A/B showed bigger tiles cut halo overfetch on this HBM-bound
# path; 20M was needed at ty=80)
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _specs(ty, ny, w):
    center = pl.BlockSpec((1, ty, w), lambda r, i: (r, i, 0),
                          memory_space=pltpu.VMEM)
    nb8 = ny // 8
    up = pl.BlockSpec(
        (1, 8, w), lambda r, i: (r, (i * ty // 8 - 1 + nb8) % nb8, 0),
        memory_space=pltpu.VMEM,
    )
    dn = pl.BlockSpec(
        (1, 8, w), lambda r, i: (r, ((i + 1) * ty // 8) % nb8, 0),
        memory_space=pltpu.VMEM,
    )
    return center, up, dn


@functools.partial(
    jax.jit,
    static_argnames=("color", "beta", "nrep", "ny", "nc", "measuring",
                     "interpret"),
)
def _dense_phase(planes, seeds, u_cand, u_acc, *, color, beta, nrep,
                 ny, nc, measuring=False, interpret=False):
    ax, ay, bx, by = planes
    w = ax.shape[-1]
    ty = _pick_ty(ny, w)
    n = ny // ty
    center, up, dn = _specs(ty, ny, w)
    has_u = u_cand is not None
    kernel = functools.partial(
        _phase_kernel, color=color, ty=ty, nc=nc, beta=beta,
        has_u=has_u, measuring=measuring,
    )
    sx, sy, ox, oy = ((ax, ay, bx, by) if color == 0
                      else (bx, by, ax, ay))
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                center, center,
                center, up, dn, center, up, dn]
    operands = [seeds, sx, sy, ox, ox, ox, oy, oy, oy]
    if has_u:
        in_specs += [center, center]
        operands += [u_cand, u_acc]
    out_shape = [
        jax.ShapeDtypeStruct((nrep, ny, w), jnp.float32),
        jax.ShapeDtypeStruct((nrep, ny, w), jnp.float32),
    ]
    out_specs = [center, center]
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
        input_output_aliases={1: 0, 2: 1},
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(*operands)
    fin_x, fin_y = res[0], res[1]
    obs = res[2] if measuring else None
    planes = ((fin_x, fin_y, bx, by) if color == 0
              else (ax, ay, fin_x, fin_y))
    if measuring:
        return planes, obs
    return planes


@functools.partial(
    jax.jit, static_argnames=("color", "nrep", "ny", "nc", "measuring",
                              "interpret")
)
def _dense_or_phase(planes, *, color, nrep, ny, nc, measuring=False,
                    interpret=False):
    ax, ay, bx, by = planes
    w = ax.shape[-1]
    ty = _pick_ty(ny, w)
    n = ny // ty
    center, up, dn = _specs(ty, ny, w)
    kernel = functools.partial(_or_kernel, color=color, ty=ty, nc=nc,
                               measuring=measuring)
    sx, sy, ox, oy = ((ax, ay, bx, by) if color == 0
                      else (bx, by, ax, ay))
    out_shape = [
        jax.ShapeDtypeStruct((nrep, ny, w), jnp.float32),
        jax.ShapeDtypeStruct((nrep, ny, w), jnp.float32),
    ]
    out_specs = [center, center]
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
        in_specs=[center, center, center, up, dn, center, up, dn],
        out_specs=tuple(out_specs),
        input_output_aliases={0: 0, 1: 1},
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(sx, sy, ox, ox, ox, oy, oy, oy)
    fin_x, fin_y = res[0], res[1]
    planes = ((fin_x, fin_y, bx, by) if color == 0
              else (ax, ay, fin_x, fin_y))
    if measuring:
        return planes, res[2]
    return planes


# ---------------------------------------------------------------------------
# sweep wrappers
# ---------------------------------------------------------------------------

def pack_state(state, ny: int, nx: int):
    """((R, nall), (R, nall)) flat XY state -> (ax, ay, bx, by) dense
    color planes (R, ny, W)."""
    fx, fy = state
    ax, bx = dense_pack(fx, ny, nx)
    ay, by = dense_pack(fy, ny, nx)
    return ax, ay, bx, by


def unpack_state(planes, ny: int, nx: int):
    ax, ay, bx, by = planes
    return (dense_unpack(ax, bx, ny, nx), dense_unpack(ay, by, ny, nx))


def sweep_measure(model, planes, key):
    """One MCS + fused (m, my, e) from the phase-b kernel."""
    kw = dict(beta=float(model.beta), nrep=planes[0].shape[0],
              ny=model.ny, nc=dense_nc(model.nx))
    planes = _dense_phase(planes, seeds_from_key(key, 0), None, None,
                          color=0, **kw)
    planes, obs = _dense_phase(planes, seeds_from_key(key, 1), None,
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
    planes = _dense_phase(planes, seeds_from_key(key, 0), None, None,
                          color=0, **kw)
    return _dense_phase(planes, seeds_from_key(key, 1), None, None,
                        color=1, **kw)


def over_relax_sweep(model, planes):
    kw = dict(nrep=planes[0].shape[0], ny=model.ny,
              nc=dense_nc(model.nx))
    planes = _dense_or_phase(planes, color=0, **kw)
    return _dense_or_phase(planes, color=1, **kw)


def over_relax_sweep_measure(model, planes):
    """One OR sweep + fused (m, my, e) from the second color phase —
    the OR schedule's replacement for over_relax_sweep() followed by a
    separate observables() pass (one fewer whole-lattice read/MCS)."""
    kw = dict(nrep=planes[0].shape[0], ny=model.ny,
              nc=dense_nc(model.nx))
    planes = _dense_or_phase(planes, color=0, **kw)
    planes, obs = _dense_or_phase(planes, color=1, measuring=True,
                                  **kw)
    n_inv = jnp.float32(1.0 / model.nsites)
    return planes, {
        "m": obs[:, 0, 0] * n_inv,
        "my": obs[:, 0, 1] * n_inv,
        "e": obs[:, 0, 2] * n_inv,
    }


def observables(model, planes):
    """{m, my, e} densities via an XLA pass over the dense planes (for
    schedules where measurement can't fuse into phase b, e.g. after
    over-relaxation)."""
    ax, ay, bx, by = planes
    ny, nx = model.ny, model.nx
    nc = dense_nc(nx)
    va = valid_mask(ny, nx, 0).astype(jnp.float32)
    vb = valid_mask(ny, nx, 1).astype(jnp.float32)
    mx = jnp.sum(ax * va, axis=(1, 2)) + jnp.sum(bx * vb, axis=(1, 2))
    my = jnp.sum(ay * va, axis=(1, 2)) + jnp.sum(by * vb, axis=(1, 2))

    col = jax.lax.broadcasted_iota(jnp.int32, (ny, ax.shape[-1]), 1)
    p0row = ((jax.lax.broadcasted_iota(jnp.int32, (ny, 1), 0) & 1)
             == 0)

    def field(ox, oy, color):
        oxu, oxd = (jnp.roll(ox, 1, axis=0), jnp.roll(ox, -1, axis=0))
        oyu, oyd = (jnp.roll(oy, 1, axis=0), jnp.roll(oy, -1, axis=0))
        ux, dx_, lx, rx = _nbrs_dense(ox, oxu, oxd, color, nc, col,
                                      p0row, _roll_jnp)
        uy, dy_, ly, ry = _nbrs_dense(oy, oyu, oyd, color, nc, col,
                                      p0row, _roll_jnp)
        return ux + dx_ + lx + rx, uy + dy_ + ly + ry

    def e_rep(axr, ayr, bxr, byr):
        hx, hy = field(axr, ayr, 1)
        return -jnp.sum((bxr * hx + byr * hy) * vb)

    e = jax.vmap(e_rep)(ax, ay, bx, by)
    n_inv = jnp.float32(1.0 / model.nsites)
    return {"m": mx * n_inv, "my": my * n_inv, "e": e * n_inv}
