"""Fused Pallas TPU kernels for the 2-D XY model.

TPU-native counterparts of the reference's XY CUDA kernels:

- Metropolis phase (`update_sub`,
  /root/reference/src/xy2d_periodic_gpu_m.f90:368-387): candidate angle
  from in-kernel hardware PRNG, ΔE = -(S'-S)·Σnbr, acceptance compare —
  all fused, no HBM random arrays;
- over-relaxation phase (`over_relaxation_sub`, :418-439): reflection
  about the normalized local field with |S| renormalization — pure VPU
  arithmetic, deterministic.

Layout: spin components as separate f32 planes per checkerboard color
(R, ny, nx//2); grid (replicas, row-blocks); periodic y-halos via 8-row
BlockSpecs as in ops/ising2d_pallas.py.
"""

from __future__ import annotations

import functools
import os

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

_TWO_PI = np.float32(2.0 * np.pi)


def _field(ox_ref, oxu_ref, oxd_ref, oy_ref, oyu_ref, oyd_ref,
           color, parity, half: int = 0):
    """``half`` > 0: lane-PADDED planes — only lanes [0, half) are real
    sites (pads held at 0), x-wrap substituted at the real seam."""
    ox = ox_ref[0]
    oy = oy_ref[0]
    if half:
        hx = stencil.nbr_sum_padded(
            ox, oxu_ref[0, 7:8, :], oxd_ref[0, 0:1, :], color, parity,
            half)
        hy = stencil.nbr_sum_padded(
            oy, oyu_ref[0, 7:8, :], oyd_ref[0, 0:1, :], color, parity,
            half)
        return hx, hy
    hx = stencil.nbr_sum(ox, oxu_ref[0, 7:8, :], oxd_ref[0, 0:1, :],
                         color, parity)
    hy = stencil.nbr_sum(oy, oyu_ref[0, 7:8, :], oyd_ref[0, 0:1, :],
                         color, parity)
    return hx, hy


def _metropolis_kernel(seed_ref, sx_ref, sy_ref,
                       ox_ref, oxu_ref, oxd_ref,
                       oy_ref, oyu_ref, oyd_ref, *rest,
                       color: int, ty: int, beta: float, half: int = 0,
                       has_u: bool = False, measuring: bool = False):
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    if has_u:
        ucand_ref, uacc_ref, outx_ref, outy_ref = refs
    else:
        outx_ref, outy_ref = refs
    r = pl.program_id(0)
    i = pl.program_id(1)

    parity = stencil.row_parity_mask(ty, i * ty)
    hx, hy = _field(ox_ref, oxu_ref, oxd_ref, oy_ref, oyu_ref, oyd_ref,
                    color, parity, half)
    sx = sx_ref[0]
    sy = sy_ref[0]

    if has_u:
        u_cand = ucand_ref[0]
        u_acc = uacc_ref[0]
    else:
        tile_tag = i * jnp.int32(-1640531527) + r * jnp.int32(0x3C6EF35F)
        pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)
        u_cand = stencil.bits_to_uniform(
            pltpu.bitcast(pltpu.prng_random_bits(sx.shape), jnp.uint32)
        )
        u_acc = stencil.bits_to_uniform(
            pltpu.bitcast(pltpu.prng_random_bits(sx.shape), jnp.uint32)
        )
    cx, cy = trig.cos_sin_2pi(u_cand)
    de = -((cx - sx) * hx + (cy - sy) * hy)
    p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))
    accept = u_acc < p
    if half:
        # pads-are-zero invariant: pad lanes never accept, so they stay
        # exactly 0 and every fused sum below is exact unmasked
        lane = jax.lax.broadcasted_iota(jnp.int32, sx.shape, 1)
        accept = accept & (lane < half)
    fin_x = jnp.where(accept, cx, sx)
    fin_y = jnp.where(accept, cy, sy)
    outx_ref[0] = fin_x
    outy_ref[0] = fin_y
    if measuring:
        # phase-b fused (mx, my, e): h is built from FINAL phase-a
        # values and each bond appears once in Σ_b S·h; pad lanes
        # contribute exact zeros (S_pad = 0)
        mx = jnp.sum(fin_x) + jnp.sum(ox_ref[0])
        my = jnp.sum(fin_y) + jnp.sum(oy_ref[0])
        e = -jnp.sum(fin_x * hx + fin_y * hy)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(
            lane == 0, mx,
            jnp.where(lane == 1, my, jnp.where(lane == 2, e, 0.0)),
        )

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def _over_relax_kernel(sx_ref, sy_ref,
                       ox_ref, oxu_ref, oxd_ref,
                       oy_ref, oyu_ref, oyd_ref,
                       outx_ref, outy_ref, *rest,
                       color: int, ty: int, half: int = 0,
                       measuring: bool = False):
    obs_ref = rest[0] if measuring else None
    i = pl.program_id(1)
    parity = stencil.row_parity_mask(ty, i * ty)
    hx, hy = _field(ox_ref, oxu_ref, oxd_ref, oy_ref, oyu_ref, oyd_ref,
                    color, parity, half)
    sx = sx_ref[0]
    sy = sy_ref[0]
    inv = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy, jnp.float32(1e-30)))
    nxh = hx * inv
    nyh = hy * inv
    d = 2.0 * (sx * nxh + sy * nyh)
    rx = d * nxh - sx
    ry = d * nyh - sy
    rinv = jax.lax.rsqrt(
        jnp.maximum(rx * rx + ry * ry, jnp.float32(1e-30))
    )
    fin_x = rx * rinv
    fin_y = ry * rinv
    outx_ref[0] = fin_x
    outy_ref[0] = fin_y
    if measuring:
        # fused (mx, my, e) from the second OR color phase: h is built
        # from FINAL other-color values (reflected in the first OR
        # phase) and each bond appears once in Σ_b S·h — replaces the
        # separate measure_plain pass on the OR schedule's hot branch
        mx = jnp.sum(fin_x) + jnp.sum(ox_ref[0])
        my = jnp.sum(fin_y) + jnp.sum(oy_ref[0])
        e = -jnp.sum(fin_x * hx + fin_y * hy)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(
            lane == 0, mx,
            jnp.where(lane == 1, my, jnp.where(lane == 2, e, 0.0)),
        )

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


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
def _metropolis_phase(sx, sy, ox, oy, seeds, *, color, beta, nrep, ny,
                      half, valid_half=0, measuring=False,
                      u_cand=None, u_acc=None, interpret=False):
    ty = _pick_tile_rows(ny, half, budget_bytes=128 << 10, gran=8)
    # 128K-element blocks: ty=128 at 1536^2 measured 2.08e10 vs
    # 1.93e10 at ty=64 on the from-disorder path; ty>=256 fails
    # to compile (VMEM)
    n = ny // ty
    center, up, dn = _specs(ty, ny, half)
    has_u = u_cand is not None
    kernel = functools.partial(
        _metropolis_kernel, color=color, ty=ty, beta=beta,
        half=valid_half, has_u=has_u, measuring=measuring,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        center, center,               # sx, sy
        center, up, dn,               # ox + halos
        center, up, dn,               # oy + halos
    ]
    operands = [seeds, sx, sy, ox, ox, ox, oy, oy, oy]
    if has_u:
        in_specs += [center, center]
        operands += [u_cand, u_acc]
    out_shape = [
        jax.ShapeDtypeStruct((nrep, ny, half), jnp.float32),
        jax.ShapeDtypeStruct((nrep, ny, half), jnp.float32),
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
        interpret=interpret,
    )(*operands)
    if measuring:
        return res
    return res[0], res[1]


@functools.partial(
    jax.jit, static_argnames=("color", "nrep", "ny", "half",
                              "valid_half", "measuring", "interpret")
)
def _over_relax_phase(sx, sy, ox, oy, *, color, nrep, ny, half,
                      valid_half=0, measuring=False, interpret=False):
    ty = _pick_tile_rows(ny, half, budget_bytes=128 << 10, gran=8)
    # 128K-element blocks: ty=128 at 1536^2 measured 2.08e10 vs
    # 1.93e10 at ty=64 on the from-disorder path; ty>=256 fails
    # to compile (VMEM)
    n = ny // ty
    center, up, dn = _specs(ty, ny, half)
    kernel = functools.partial(_over_relax_kernel, color=color, ty=ty,
                               half=valid_half, measuring=measuring)
    out_shape = [
        jax.ShapeDtypeStruct((nrep, ny, half), jnp.float32),
        jax.ShapeDtypeStruct((nrep, ny, half), jnp.float32),
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
        in_specs=[
            center, center,
            center, up, dn,
            center, up, dn,
        ],
        out_specs=tuple(out_specs),
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(sx, sy, ox, ox, ox, oy, oy, oy)
    return res


def _maybe_batch(state: XYState):
    batched = state.ax.ndim == 3
    if batched:
        return state, True
    return XYState(*(p[None] for p in state)), False


def sweep(model, state: XYState, key: jax.Array) -> XYState:
    """One Metropolis MCS (both colors); (ny, half) or (R, ny, half)."""
    ny, half = model.color_shape
    st, batched = _maybe_batch(state)
    ax, ay, bx, by = st
    kw = dict(beta=float(model.beta), nrep=ax.shape[0], ny=ny, half=half)
    ax, ay = _metropolis_phase(ax, ay, bx, by, seeds_from_key(key, 0),
                               color=0, **kw)
    bx, by = _metropolis_phase(bx, by, ax, ay, seeds_from_key(key, 1),
                               color=1, **kw)
    out = XYState(ax, ay, bx, by)
    return out if batched else XYState(*(p[0] for p in out))


def over_relax_sweep(model, state: XYState) -> XYState:
    """One over-relaxation sweep (both colors, deterministic)."""
    ny, half = model.color_shape
    st, batched = _maybe_batch(state)
    ax, ay, bx, by = st
    kw = dict(nrep=ax.shape[0], ny=ny, half=half)
    ax, ay = _over_relax_phase(ax, ay, bx, by, color=0, **kw)
    bx, by = _over_relax_phase(bx, by, ax, ay, color=1, **kw)
    out = XYState(ax, ay, bx, by)
    return out if batched else XYState(*(p[0] for p in out))


def over_relax_sweep_measure(model, state: XYState):
    """One OR sweep + fused (m, my, e) densities from the color-1
    kernel — the OR schedule's replacement for over_relax_sweep()
    followed by a separate measure_plain pass (one fewer
    whole-lattice read per MCS)."""
    ny, half = model.color_shape
    st, batched = _maybe_batch(state)
    ax, ay, bx, by = st
    kw = dict(nrep=ax.shape[0], ny=ny, half=half)
    ax, ay = _over_relax_phase(ax, ay, bx, by, color=0, **kw)
    bx, by, obs = _over_relax_phase(bx, by, ax, ay, color=1,
                                    measuring=True, **kw)
    out = XYState(ax, ay, bx, by)
    n_inv = jnp.float32(1.0 / model.nsites)
    od = {
        "m": obs[:, 0, 0] * n_inv,
        "my": obs[:, 0, 1] * n_inv,
        "e": obs[:, 0, 2] * n_inv,
    }
    if batched:
        return out, od
    return (XYState(*(p[0] for p in out)),
            {k: v[0] for k, v in od.items()})


# ---------------------------------------------------------------------------
# phase b with fused measurement: the from-disorder fast path
# ---------------------------------------------------------------------------

def _metropolis_measure_kernel(seed_ref, sx_ref, sy_ref,
                               ox_ref, oxu_ref, oxd_ref,
                               oy_ref, oyu_ref, oyd_ref,
                               snax_ref, snay_ref, snbx_ref, snby_ref,
                               *rest,
                               ty: int, beta: float, half: int = 0,
                               has_u: bool = False):
    """Phase b (color 1) + fused (mx, my, e, A) measurement.

    Measuring inside the phase saves the separate measurement kernel's
    re-read of all state+snapshot planes (~20 → 16 plane transfers per
    MCS — the protocol is HBM-bound).  e = -Σ_b S_b·h_b counts every
    bond once; mx/my reuse the a-planes already fetched for the field;
    the obs output accumulates across the row-block grid axis (constant
    out index → the block stays resident until the grid finishes).

    ``half`` non-zero: lane-PADDED planes (real width ``half`` < block
    width) — the x-wrap is substituted at the real seam and pad lanes
    never accept, so state and snapshot pads stay exactly 0 and every
    fused sum (including A against the zero-padded snapshot) is exact
    unmasked."""
    refs = list(rest)
    if has_u:
        ucand_ref, uacc_ref = refs[:2]
        refs = refs[2:]
    outx_ref, outy_ref, obs_ref = refs
    r = pl.program_id(0)
    i = pl.program_id(1)

    parity = stencil.row_parity_mask(ty, i * ty)
    hx, hy = _field(ox_ref, oxu_ref, oxd_ref, oy_ref, oyu_ref, oyd_ref,
                    1, parity, half)
    sx = sx_ref[0]
    sy = sy_ref[0]
    if has_u:
        u_cand = ucand_ref[0]
        u_acc = uacc_ref[0]
    else:
        tile_tag = (i * jnp.int32(-1640531527)
                    + r * jnp.int32(0x3C6EF35F))
        pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)
        u_cand = stencil.bits_to_uniform(
            pltpu.bitcast(pltpu.prng_random_bits(sx.shape), jnp.uint32)
        )
        u_acc = stencil.bits_to_uniform(
            pltpu.bitcast(pltpu.prng_random_bits(sx.shape), jnp.uint32)
        )
    cx, cy = trig.cos_sin_2pi(u_cand)
    de = -((cx - sx) * hx + (cy - sy) * hy)
    p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))
    accept = u_acc < p
    if half:
        lane = jax.lax.broadcasted_iota(jnp.int32, sx.shape, 1)
        accept = accept & (lane < half)
    bx = jnp.where(accept, cx, sx)
    by = jnp.where(accept, cy, sy)
    outx_ref[0] = bx
    outy_ref[0] = by

    ax = ox_ref[0]
    ay = oy_ref[0]
    mx = jnp.sum(ax) + jnp.sum(bx)
    my = jnp.sum(ay) + jnp.sum(by)
    e = -jnp.sum(bx * hx + by * hy)
    A = (jnp.sum(snax_ref[0] * ax) + jnp.sum(snay_ref[0] * ay)
         + jnp.sum(snbx_ref[0] * bx) + jnp.sum(snby_ref[0] * by))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row = jnp.where(
        lane == 0, mx,
        jnp.where(lane == 1, my,
                  jnp.where(lane == 2, e,
                            jnp.where(lane == 3, A, 0.0))),
    )

    @pl.when(i == 0)
    def _():
        obs_ref[0] = jnp.zeros_like(obs_ref[0])

    obs_ref[0] = obs_ref[0] + row


@functools.partial(
    jax.jit, static_argnames=("beta", "nrep", "ny", "half",
                              "valid_half", "interpret")
)
def _metropolis_phase_b_measure(sx, sy, ox, oy, snax, snay, snbx, snby,
                                seeds, *, beta, nrep, ny, half,
                                valid_half=0, interpret=False,
                                u_cand=None, u_acc=None):
    ty = _pick_tile_rows(ny, half, budget_bytes=128 << 10, gran=8)
    # 128K-element blocks: ty=128 at 1536^2 measured 2.08e10 vs
    # 1.93e10 at ty=64 on the from-disorder path; ty>=256 fails
    # to compile (VMEM)
    n = ny // ty
    center, up, dn = _specs(ty, ny, half)
    has_u = u_cand is not None
    kernel = functools.partial(
        _metropolis_measure_kernel, ty=ty, beta=beta,
        half=valid_half if valid_half != half else 0, has_u=has_u,
    )
    obs_spec = pl.BlockSpec((1, 1, 128), lambda r, i: (r, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        center, center,               # bx, by (color being updated)
        center, up, dn,               # ax + halos
        center, up, dn,               # ay + halos
        center, center, center, center,  # snapshot planes
    ]
    operands = [seeds, sx, sy, ox, ox, ox, oy, oy, oy,
                snax, snay, snbx, snby]
    if has_u:
        in_specs += [center, center]
        operands += [u_cand, u_acc]
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nrep, ny, half), jnp.float32),
            jax.ShapeDtypeStruct((nrep, ny, half), jnp.float32),
            jax.ShapeDtypeStruct((nrep, 1, 128), jnp.float32),
        ),
        grid=(nrep, n),
        in_specs=in_specs,
        out_specs=(center, center, obs_spec),
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(*operands)


def sweep_measure(model, state: XYState, snap: XYState, key: jax.Array):
    """One MCS with fused per-sweep measurement: phase a (plain kernel),
    phase b + (mx, my, e, A) in one kernel.  Batched (R, ny, half)
    planes; returns (state, {mx, my, e, A}) observable densities."""
    ny, half = model.color_shape
    ax, ay, bx, by = state
    kw = dict(beta=float(model.beta), nrep=ax.shape[0], ny=ny, half=half)
    ax, ay = _metropolis_phase(ax, ay, bx, by, seeds_from_key(key, 0),
                               color=0, **kw)
    bx, by, obs = _metropolis_phase_b_measure(
        bx, by, ax, ay, snap.ax, snap.ay, snap.bx, snap.by,
        seeds_from_key(key, 1), **kw,
    )
    n_inv = jnp.float32(1.0 / model.nsites)
    series = {
        "mx": obs[:, 0, 0] * n_inv,
        "my": obs[:, 0, 1] * n_inv,
        "e": obs[:, 0, 2] * n_inv,
        "A": obs[:, 0, 3] * n_inv,
    }
    return XYState(ax, ay, bx, by), series


# ---------------------------------------------------------------------------
# halo-aware phase for the domain-sharded (shard_map) path
# ---------------------------------------------------------------------------

def _halo_field(i, nblk, ox_ref, oxu_ref, oxd_ref, hxu_ref, hxd_ref,
                oy_ref, oyu_ref, oyd_ref, hyu_ref, hyd_ref,
                color, parity, col_refs=None):
    """(hx, hy) of a local block: in-array halo rows for interior
    row-blocks, explicitly exchanged rows at the shard boundary.
    ``col_refs`` = (hxl, hxr, hyl, hyr) exchanged boundary-column refs
    for x-sharded blocks (lane 0 carries the column)."""
    upx = jnp.where(i == 0, hxu_ref[0, 7:8, :], oxu_ref[0, 7:8, :])
    dnx = jnp.where(i == nblk - 1, hxd_ref[0, 0:1, :],
                    oxd_ref[0, 0:1, :])
    upy = jnp.where(i == 0, hyu_ref[0, 7:8, :], oyu_ref[0, 7:8, :])
    dny = jnp.where(i == nblk - 1, hyd_ref[0, 0:1, :],
                    oyd_ref[0, 0:1, :])
    if col_refs is None:
        hx = stencil.nbr_sum(ox_ref[0], upx, dnx, color, parity)
        hy = stencil.nbr_sum(oy_ref[0], upy, dny, color, parity)
    else:
        hxl_ref, hxr_ref, hyl_ref, hyr_ref = col_refs
        hx = stencil.nbr_sum_halo4(
            ox_ref[0], upx, dnx, color, parity,
            hxl_ref[0][:, 0:1], hxr_ref[0][:, 0:1])
        hy = stencil.nbr_sum_halo4(
            oy_ref[0], upy, dny, color, parity,
            hyl_ref[0][:, 0:1], hyr_ref[0][:, 0:1])
    return hx, hy


def _halo_metropolis_kernel(seed_ref, offs_ref, sx_ref, sy_ref,
                            ox_ref, oxu_ref, oxd_ref,
                            oy_ref, oyu_ref, oyd_ref,
                            hxu_ref, hxd_ref, hyu_ref, hyd_ref,
                            *rest, color: int, ty: int, nblk: int,
                            beta: float, has_u: bool,
                            has_cols: bool = False,
                            measuring: bool = False):
    """Like _metropolis_kernel with exchanged halo operands — the XY
    instance of the shard_map promotion of the reference's halo kernels
    (/root/reference/src/xy2d_periodic_gpu_m.f90:296-326).  ``has_u``:
    take (u_cand, u_acc) operands instead of the hardware PRNG (CPU
    interpret validation against the jnp sharded phase).  ``has_cols``:
    exchanged boundary-column operands follow (x-sharded blocks).
    ``measuring`` (phase 1): emit per-shard (mx, my, e) partial sums."""
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    col_refs = None
    if has_cols:
        col_refs = tuple(refs[:4])
        refs = refs[4:]
    if has_u:
        ucand_ref, uacc_ref, outx_ref, outy_ref = refs
    else:
        outx_ref, outy_ref = refs
    r = pl.program_id(0)
    i = pl.program_id(1)
    row_g = offs_ref[1] + i * ty
    parity = stencil.row_parity_mask(ty, row_g)
    hx, hy = _halo_field(i, nblk, ox_ref, oxu_ref, oxd_ref, hxu_ref,
                         hxd_ref, oy_ref, oyu_ref, oyd_ref, hyu_ref,
                         hyd_ref, color, parity, col_refs)
    sx = sx_ref[0]
    sy = sy_ref[0]
    if has_u:
        u_cand = ucand_ref[0]
        u_acc = uacc_ref[0]
    else:
        rep_g = offs_ref[0] + r
        tile_tag = (row_g * jnp.int32(-1640531527)
                    + rep_g * jnp.int32(0x3C6EF35F))
        if has_cols:
            tile_tag = tile_tag + offs_ref[2] * jnp.int32(0x27D4EB2F)
        pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)
        u_cand = stencil.bits_to_uniform(pltpu.bitcast(
            pltpu.prng_random_bits(sx.shape), jnp.uint32))
        u_acc = stencil.bits_to_uniform(pltpu.bitcast(
            pltpu.prng_random_bits(sx.shape), jnp.uint32))
    cx, cy = trig.cos_sin_2pi(u_cand)
    de = -((cx - sx) * hx + (cy - sy) * hy)
    p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))
    accept = u_acc < p
    fin_x = jnp.where(accept, cx, sx)
    fin_y = jnp.where(accept, cy, sy)
    outx_ref[0] = fin_x
    outy_ref[0] = fin_y
    if measuring:
        # phase-1 h comes from the final other-color planes; each bond
        # appears once in Σ S_fin·h — observables come free
        mx = jnp.sum(ox_ref[0]) + jnp.sum(fin_x)
        my = jnp.sum(oy_ref[0]) + jnp.sum(fin_y)
        e = -jnp.sum(fin_x * hx + fin_y * hy)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(
            lane == 0, mx,
            jnp.where(lane == 1, my, jnp.where(lane == 2, e, 0.0)),
        )

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def _halo_or_kernel(offs_ref, sx_ref, sy_ref,
                    ox_ref, oxu_ref, oxd_ref,
                    oy_ref, oyu_ref, oyd_ref,
                    hxu_ref, hxd_ref, hyu_ref, hyd_ref,
                    *rest, color: int, ty: int, nblk: int,
                    has_cols: bool = False):
    refs = list(rest)
    col_refs = None
    if has_cols:
        col_refs = tuple(refs[:4])
        refs = refs[4:]
    outx_ref, outy_ref = refs
    i = pl.program_id(1)
    row_g = offs_ref[1] + i * ty
    parity = stencil.row_parity_mask(ty, row_g)
    hx, hy = _halo_field(i, nblk, ox_ref, oxu_ref, oxd_ref, hxu_ref,
                         hxd_ref, oy_ref, oyu_ref, oyd_ref, hyu_ref,
                         hyd_ref, color, parity, col_refs)
    sx = sx_ref[0]
    sy = sy_ref[0]
    inv = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy, jnp.float32(1e-30)))
    nxh = hx * inv
    nyh = hy * inv
    d = 2.0 * (sx * nxh + sy * nyh)
    rx = d * nxh - sx
    ry = d * nyh - sy
    rinv = jax.lax.rsqrt(
        jnp.maximum(rx * rx + ry * ry, jnp.float32(1e-30))
    )
    outx_ref[0] = rx * rinv
    outy_ref[0] = ry * rinv


def _halo_specs(ty: int, L: int, half: int):
    nb8 = L // 8
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
    halo = pl.BlockSpec((1, 8, half), lambda r, i: (r, 0, 0),
                        memory_space=pltpu.VMEM)
    return center, up, dn, halo


def _pad_halos(h):
    """(R,1,half) exchanged rows -> 8-row sublane-aligned operands."""
    hu, hd = h
    return (jnp.pad(hu, ((0, 0), (7, 0), (0, 0))),
            jnp.pad(hd, ((0, 0), (0, 7), (0, 0))))


def _pad_col(c):
    """(R,L,1) exchanged column -> 128-lane-aligned operand (lane 0)."""
    return jnp.pad(c, ((0, 0), (0, 0), (0, 127)))


def sharded_phase(sx, sy, ox, oy, halos_x, halos_y, seeds, offs, *,
                  color: int, beta: float, cols_x=None, cols_y=None,
                  u_cand=None, u_acc=None,
                  interpret: bool = False, measuring: bool = False):
    """One Metropolis phase on y-sharded (R, L, half) component planes
    with exchanged halo rows ((up, dn) per component).  Call inside
    shard_map.  ``measuring`` additionally returns per-shard
    (mx, my, e) partial sums (R,) each (phase 1 only).
    ``cols_x``/``cols_y``: exchanged boundary columns ((left, right) of
    (R, L, 1) per component) for x-sharded blocks, with offs extended to
    (rep0, row0, col0)."""
    nrep, L, half = sx.shape
    has_cols = cols_x is not None
    ty = _pick_tile_rows(L, half, budget_bytes=64 << 10, gran=8)
    n = L // ty
    if interpret and u_cand is None:
        kb = jax.random.fold_in(
            jax.random.fold_in(
                jax.random.PRNGKey(seeds[0].astype(jnp.uint32)), seeds[1]
            ),
            offs[0] * jnp.int32(65537) + offs[1]
            + (offs[2] * jnp.int32(40503) if has_cols else 0),
        )
        u_cand = jax.random.uniform(kb, sx.shape, jnp.float32)
        u_acc = jax.random.uniform(jax.random.fold_in(kb, 1), sx.shape,
                                   jnp.float32)
    has_u = u_cand is not None
    hxu, hxd = _pad_halos(halos_x)
    hyu, hyd = _pad_halos(halos_y)
    center, up, dn, halo = _halo_specs(ty, L, half)
    kernel = functools.partial(
        _halo_metropolis_kernel, color=color, ty=ty, nblk=n, beta=beta,
        has_u=has_u, has_cols=has_cols, measuring=measuring,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # seeds
        pl.BlockSpec(memory_space=pltpu.SMEM),   # offs
        center, center,                          # sx, sy
        center, up, dn,                          # ox + in-array halos
        center, up, dn,                          # oy + in-array halos
        halo, halo, halo, halo,                  # exchanged rows
    ]
    operands = [seeds, offs, sx, sy, ox, ox, ox, oy, oy, oy,
                hxu, hxd, hyu, hyd]
    if has_cols:
        col_spec = pl.BlockSpec((1, ty, 128), lambda r, i: (r, i, 0),
                                memory_space=pltpu.VMEM)
        in_specs += [col_spec] * 4
        operands += [_pad_col(c) for c in (*cols_x, *cols_y)]
    if has_u:
        in_specs += [center, center]
        operands += [u_cand, u_acc]
    out_shape = [
        jax.ShapeDtypeStruct((nrep, L, half), jnp.float32),
        jax.ShapeDtypeStruct((nrep, L, half), jnp.float32),
    ]
    out_specs = [center, center]
    if measuring:
        out_shape.append(
            jax.ShapeDtypeStruct((nrep, 1, 128), jnp.float32))
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
        gx, gy, obs = res
        return gx, gy, (obs[:, 0, 0], obs[:, 0, 1], obs[:, 0, 2])
    return res


def sharded_or_phase(sx, sy, ox, oy, halos_x, halos_y, offs, *,
                     color: int, cols_x=None, cols_y=None,
                     interpret: bool = False):
    """One over-relaxation phase on y-sharded planes with exchanged
    halo rows (deterministic).  ``cols_x``/``cols_y``: exchanged
    boundary columns for x-sharded blocks."""
    nrep, L, half = sx.shape
    has_cols = cols_x is not None
    ty = _pick_tile_rows(L, half, budget_bytes=64 << 10, gran=8)
    n = L // ty
    hxu, hxd = _pad_halos(halos_x)
    hyu, hyd = _pad_halos(halos_y)
    center, up, dn, halo = _halo_specs(ty, L, half)
    kernel = functools.partial(
        _halo_or_kernel, color=color, ty=ty, nblk=n, has_cols=has_cols
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        center, center,
        center, up, dn,
        center, up, dn,
        halo, halo, halo, halo,
    ]
    operands = [offs, sx, sy, ox, ox, ox, oy, oy, oy, hxu, hxd, hyu, hyd]
    if has_cols:
        col_spec = pl.BlockSpec((1, ty, 128), lambda r, i: (r, i, 0),
                                memory_space=pltpu.VMEM)
        in_specs += [col_spec] * 4
        operands += [_pad_col(c) for c in (*cols_x, *cols_y)]
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nrep, L, half), jnp.float32),
            jax.ShapeDtypeStruct((nrep, L, half), jnp.float32),
        ),
        grid=(nrep, n),
        in_specs=in_specs,
        out_specs=(center, center),
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(*operands)


def shard_pallas_ok(local_shape: tuple[int, ...]) -> bool:
    """Local (R, L, half) f32 block shape is tileable (gran 8)."""
    if len(local_shape) != 3:
        return False
    _, L, half = local_shape
    return half % 128 == 0 and L % 8 == 0


# ---------------------------------------------------------------------------
# lane-PADDED periodic engine: the committed XY geometries whose color
# width nx/2 is no lane multiple (10000^2 -> 5000, 4000^2 -> 2000;
# /root/reference/app/xy2d_periodic_gpu_relaxation.f90:7-13 and
# /root/reference/scripts/fpm_run_xy2d_periodic_over_relaxation.sh)
# previously fell back to ~16x slower XLA-fused jnp sweeps.  Planes are
# zero-padded to the next 128-lane multiple; pad lanes never accept a
# flip (pads-are-zero invariant), the x-wrap is substituted at the real
# seam (stencil.lr_sum_padded), and every fused observable sum is exact
# without masking because pad contributions are exact zeros.
# ---------------------------------------------------------------------------

def pad_width(half: int) -> int:
    return -(-half // 128) * 128


def pad_planes(state: XYState, half: int) -> XYState:
    """Zero-pad (..., ny, half) color planes to (..., ny, W)."""
    w = pad_width(half)
    if w == half:
        return state
    pad = [(0, 0)] * (state.ax.ndim - 1) + [(0, w - half)]
    return XYState(*(jnp.pad(p, pad) for p in state))


def unpad_planes(state: XYState, half: int) -> XYState:
    return XYState(*(p[..., :half] for p in state))


def _padded_interp() -> bool:
    # CPU test hook (mirrors SPINLAT_SHARD_PALLAS_INTERPRET in
    # parallel/domain.py): run the padded kernels in interpret mode
    return os.environ.get("SPINLAT_XY_PADDED_INTERPRET") == "1"


def padded_sweep_measure(model, st: XYState, key: jax.Array):
    """One Metropolis MCS on padded (R, ny, W) planes + fused
    (m, my, e) densities from the phase-b kernel."""
    ny, half = model.color_shape
    ax, ay, bx, by = st
    kw = dict(beta=float(model.beta), nrep=ax.shape[0], ny=ny,
              half=ax.shape[-1], valid_half=half,
              interpret=_padded_interp())
    ax, ay = _metropolis_phase(ax, ay, bx, by, seeds_from_key(key, 0),
                               color=0, **kw)
    bx, by, obs = _metropolis_phase(bx, by, ax, ay,
                                    seeds_from_key(key, 1), color=1,
                                    measuring=True, **kw)
    n_inv = jnp.float32(1.0 / model.nsites)
    return XYState(ax, ay, bx, by), {
        "m": obs[:, 0, 0] * n_inv,
        "my": obs[:, 0, 1] * n_inv,
        "e": obs[:, 0, 2] * n_inv,
    }


def padded_sweep(model, st: XYState, key: jax.Array) -> XYState:
    ny, half = model.color_shape
    ax, ay, bx, by = st
    kw = dict(beta=float(model.beta), nrep=ax.shape[0], ny=ny,
              half=ax.shape[-1], valid_half=half,
              interpret=_padded_interp())
    ax, ay = _metropolis_phase(ax, ay, bx, by, seeds_from_key(key, 0),
                               color=0, **kw)
    bx, by = _metropolis_phase(bx, by, ax, ay, seeds_from_key(key, 1),
                               color=1, **kw)
    return XYState(ax, ay, bx, by)


def padded_or_sweep(model, st: XYState) -> XYState:
    ny, half = model.color_shape
    ax, ay, bx, by = st
    kw = dict(nrep=ax.shape[0], ny=ny, half=ax.shape[-1],
              valid_half=half, interpret=_padded_interp())
    ax, ay = _over_relax_phase(ax, ay, bx, by, color=0, **kw)
    bx, by = _over_relax_phase(bx, by, ax, ay, color=1, **kw)
    return XYState(ax, ay, bx, by)


def padded_sweep_measure_snap(model, st: XYState, snap: XYState,
                              key: jax.Array):
    """One Metropolis MCS on padded (R, ny, W) planes + fused
    (mx, my, e, A) against the zero-padded t=0 snapshot — the
    disorder-protocol measurement (A(t) = Σ S(0)·S(t)) on the lane-
    padded engine.  Pad lanes of state AND snapshot are exact zeros,
    so every fused sum is exact unmasked (same invariant as
    padded_sweep_measure)."""
    ny, half = model.color_shape
    ax, ay, bx, by = st
    kw = dict(beta=float(model.beta), nrep=ax.shape[0], ny=ny,
              half=ax.shape[-1], valid_half=half,
              interpret=_padded_interp())
    ax, ay = _metropolis_phase(ax, ay, bx, by, seeds_from_key(key, 0),
                               color=0, **kw)
    bx, by, obs = _metropolis_phase_b_measure(
        bx, by, ax, ay, snap.ax, snap.ay, snap.bx, snap.by,
        seeds_from_key(key, 1), beta=float(model.beta),
        nrep=ax.shape[0], ny=ny, half=ax.shape[-1], valid_half=half,
        interpret=_padded_interp(),
    )
    n_inv = jnp.float32(1.0 / model.nsites)
    series = {
        "mx": obs[:, 0, 0] * n_inv,
        "my": obs[:, 0, 1] * n_inv,
        "e": obs[:, 0, 2] * n_inv,
        "A": obs[:, 0, 3] * n_inv,
    }
    return XYState(ax, ay, bx, by), series


def padded_or_sweep_measure(model, st: XYState):
    """One OR sweep on padded planes + fused (m, my, e) densities from
    the color-1 kernel."""
    ny, half = model.color_shape
    ax, ay, bx, by = st
    kw = dict(nrep=ax.shape[0], ny=ny, half=ax.shape[-1],
              valid_half=half, interpret=_padded_interp())
    ax, ay = _over_relax_phase(ax, ay, bx, by, color=0, **kw)
    bx, by, obs = _over_relax_phase(bx, by, ax, ay, color=1,
                                    measuring=True, **kw)
    n_inv = jnp.float32(1.0 / model.nsites)
    return XYState(ax, ay, bx, by), {
        "m": obs[:, 0, 0] * n_inv,
        "my": obs[:, 0, 1] * n_inv,
        "e": obs[:, 0, 2] * n_inv,
    }
