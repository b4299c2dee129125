"""Fused Pallas TPU kernel: checkerboard Metropolis phase for the q-state
clock model.

TPU-native replacement for the reference's tableall kernel
(/root/reference/src/clock/clock_tableall_gpu_m.f90:107-152): instead of
one gather into a q⁶ probability table per site, the kernel evaluates
per-state (cos, sin) with q-way select chains and computes
ΔE = -(S_new - S_c)·h arithmetically — all VPU selects/FMAs plus one
exp, zero gathers, RNG on the hardware PRNG inside the kernel
(two draws per site: candidate + acceptance, matching rnds(2,nx,ny),
:63,95).

Grid (replicas, row-blocks) over int8 color arrays (R, ny, nx//2), same
tiling/halo scheme as ops/ising2d_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.core import tables
from cuda_fortran_mc_simulation_spin_tpu.models.base import CheckerboardState
from cuda_fortran_mc_simulation_spin_tpu.ops import stencil, trig
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    _pick_tile_rows,
    seeds_from_key,
)


def _cos_sin_chain(state_i32: jax.Array, q: int):
    """(cos, sin)(2π s/q): select chain for small q, direct
    transcendentals past the chain-depth crossover (core/tables.py) —
    this keeps runtime q unbounded by evaluation cost."""
    if q > tables._SELECT_CHAIN_MAX_Q:
        return trig.cos_sin_2pi(
            state_i32.astype(jnp.float32) * np.float32(1.0 / q))
    tab = tables.clock_unit_vectors(q)
    c = jnp.full(state_i32.shape, np.float32(tab[0, 0]), jnp.float32)
    s = jnp.full(state_i32.shape, np.float32(tab[0, 1]), jnp.float32)
    for k in range(1, q):
        hit = state_i32 == k
        c = jnp.where(hit, jnp.float32(tab[k, 0]), c)
        s = jnp.where(hit, jnp.float32(tab[k, 1]), s)
    return c, s


def _phase_kernel(seed_ref, x_ref, oc_ref, oup_ref, odn_ref, out_ref,
                  *, color: int, ty: int, q: int, beta: float):
    r = pl.program_id(0)
    i = pl.program_id(1)
    tile_tag = i * jnp.int32(-1640531527) + r * jnp.int32(0x3C6EF35F)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)

    x = x_ref[0].astype(jnp.int32)
    parity = stencil.row_parity_mask(ty, i * ty)

    # local vector field h = Σ_nbr (cos, sin): build cos/sin planes of the
    # other color including its halo rows, then stencil-sum them.
    o = oc_ref[0].astype(jnp.int32)
    up = oup_ref[0, 7:8, :].astype(jnp.int32)
    dn = odn_ref[0, 0:1, :].astype(jnp.int32)
    co, so = _cos_sin_chain(o, q)
    cu, su = _cos_sin_chain(up, q)
    cd, sd = _cos_sin_chain(dn, q)
    hx = stencil.nbr_sum(co, cu, cd, color, parity)
    hy = stencil.nbr_sum(so, su, sd, color, parity)

    # candidate: c + ceil(u·(q-1)) mod q, excluding the current state
    # (/root/reference/src/clock/clock_tableall_gpu_m.f90:142-143)
    u_cand = stencil.bits_to_uniform(
        pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
    )
    off = (u_cand * (q - 1)).astype(jnp.int32) + 1
    new = x + off
    new = jnp.where(new >= q, new - q, new)

    cx, sx = _cos_sin_chain(x, q)
    cn, sn = _cos_sin_chain(new, q)
    de = -((cn - cx) * hx + (sn - sx) * hy)
    p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))

    u_acc = stencil.bits_to_uniform(
        pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
    )
    out_ref[0] = jnp.where(u_acc < p, new, x).astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("color", "q", "beta", "nrep", "ny", "half")
)
def _metropolis_phase(x, other, seeds, *, color, q, beta, nrep, ny, half):
    # f32 cos/sin temporaries are 4 bytes/site and several live at once:
    # use a smaller row budget than the Ising kernel.
    ty = _pick_tile_rows(ny, half, budget_bytes=256 << 10)
    n = ny // ty
    nb8 = ny // 8
    kernel = functools.partial(
        _phase_kernel, color=color, ty=ty, q=q, beta=beta
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nrep, ny, half), jnp.int8),
        grid=(nrep, n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ty, half), lambda r, i: (r, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ty, half), lambda r, i: (r, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 8, half),
                lambda r, i: (r, (i * ty // 8 - 1 + nb8) % nb8, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, half),
                lambda r, i: (r, ((i + 1) * ty // 8) % nb8, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, ty, half), lambda r, i: (r, i, 0),
                               memory_space=pltpu.VMEM),
        input_output_aliases={1: 0},
    )(seeds, x, other, other, other)


# ---------------------------------------------------------------------------
# halo-aware phase for the domain-sharded (shard_map) path
# ---------------------------------------------------------------------------

def _halo_phase_kernel(seed_ref, offs_ref, x_ref, oc_ref, oup_ref,
                       odn_ref, hup_ref, hdn_ref, *rest,
                       color: int, ty: int, nblk: int, q: int,
                       beta: float, has_u: bool, has_cols: bool = False,
                       measuring: bool = False):
    """_phase_kernel with exchanged halo operands (see
    ops/ising2d_pallas._halo_phase_kernel for the scheme; ``has_cols``
    adds exchanged boundary columns for x-sharded blocks).
    ``measuring`` (phase 1): emit per-shard (mx, my, e) partial sums."""
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    if has_cols:
        hlf_ref, hrt_ref = refs[:2]
        refs = refs[2:]
    if has_u:
        ucand_ref, uacc_ref, out_ref = refs
    else:
        (out_ref,) = refs
    r = pl.program_id(0)
    i = pl.program_id(1)
    row_g = offs_ref[1] + i * ty
    x = x_ref[0].astype(jnp.int32)
    parity = stencil.row_parity_mask(ty, row_g)

    o = oc_ref[0].astype(jnp.int32)
    up = jnp.where(i == 0, hup_ref[0, 7:8, :],
                   oup_ref[0, 7:8, :]).astype(jnp.int32)
    dn = jnp.where(i == nblk - 1, hdn_ref[0, 0:1, :],
                   odn_ref[0, 0:1, :]).astype(jnp.int32)
    co, so = _cos_sin_chain(o, q)
    cu, su = _cos_sin_chain(up, q)
    cd, sd = _cos_sin_chain(dn, q)
    if has_cols:
        cl, sl = _cos_sin_chain(hlf_ref[0][:, 0:1].astype(jnp.int32), q)
        cr, sr = _cos_sin_chain(hrt_ref[0][:, 0:1].astype(jnp.int32), q)
        hx = stencil.nbr_sum_halo4(co, cu, cd, color, parity, cl, cr)
        hy = stencil.nbr_sum_halo4(so, su, sd, color, parity, sl, sr)
    else:
        hx = stencil.nbr_sum(co, cu, cd, color, parity)
        hy = stencil.nbr_sum(so, su, sd, color, parity)

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
            pltpu.prng_random_bits(x.shape), jnp.uint32))
        u_acc = stencil.bits_to_uniform(pltpu.bitcast(
            pltpu.prng_random_bits(x.shape), jnp.uint32))
    off = (u_cand * (q - 1)).astype(jnp.int32) + 1
    new = x + off
    new = jnp.where(new >= q, new - q, new)
    cx, sx = _cos_sin_chain(x, q)
    cn, sn = _cos_sin_chain(new, q)
    de = -((cn - cx) * hx + (sn - sx) * hy)
    p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))
    sel = u_acc < p
    out_ref[0] = jnp.where(sel, new, x).astype(jnp.int8)
    if measuring:
        # phase-1 h is the final field; each bond appears once in
        # Σ_x S_fin·h — the separate observable pass fuses away
        fin_c = jnp.where(sel, cn, cx)
        fin_s = jnp.where(sel, sn, sx)
        mx = jnp.sum(co) + jnp.sum(fin_c)
        my = jnp.sum(so) + jnp.sum(fin_s)
        e = -jnp.sum(fin_c * hx + fin_s * hy)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(
            lane == 0, mx,
            jnp.where(lane == 1, my, jnp.where(lane == 2, e, 0.0)),
        )

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def sharded_phase(x, other, halo_up, halo_dn, seeds, offs, *,
                  color: int, q: int, beta: float,
                  halo_lf=None, halo_rt=None,
                  u_cand=None, u_acc=None, interpret: bool = False,
                  measuring: bool = False):
    """One clock phase on y-sharded (R, L, half) int8 blocks with
    exchanged halo rows.  Call inside shard_map.  ``measuring``
    additionally returns per-shard (mx, my, e) partial sums (R,).
    ``halo_lf``/``halo_rt``: exchanged boundary columns (R, L, 1) for
    x-sharded blocks (offs extended to (rep0, row0, col0))."""
    nrep, L, half = x.shape
    has_cols = halo_lf is not None
    ty = _pick_tile_rows(L, half, budget_bytes=256 << 10)
    n = L // ty
    nb8 = L // 8
    if interpret and u_cand is None:
        kb = jax.random.fold_in(
            jax.random.fold_in(
                jax.random.PRNGKey(seeds[0].astype(jnp.uint32)), seeds[1]
            ),
            offs[0] * jnp.int32(65537) + offs[1]
            + (offs[2] * jnp.int32(40503) if has_cols else 0),
        )
        u_cand = jax.random.uniform(kb, x.shape, jnp.float32)
        u_acc = jax.random.uniform(jax.random.fold_in(kb, 1), x.shape,
                                   jnp.float32)
    has_u = u_cand is not None
    hup = jnp.pad(halo_up, ((0, 0), (7, 0), (0, 0)))
    hdn = jnp.pad(halo_dn, ((0, 0), (0, 7), (0, 0)))
    kernel = functools.partial(
        _halo_phase_kernel, color=color, ty=ty, nblk=n, q=q, beta=beta,
        has_u=has_u, has_cols=has_cols, measuring=measuring,
    )
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
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        center, center, up, dn, halo, halo,
    ]
    operands = [seeds, offs, x, other, other, other, hup, hdn]
    if has_cols:
        col_spec = pl.BlockSpec((1, ty, 128), lambda r, i: (r, i, 0),
                                memory_space=pltpu.VMEM)
        in_specs += [col_spec, col_spec]
        operands += [
            jnp.pad(halo_lf, ((0, 0), (0, 0), (0, 127))),
            jnp.pad(halo_rt, ((0, 0), (0, 0), (0, 127))),
        ]
    if has_u:
        fcenter = pl.BlockSpec((1, ty, half), lambda r, i: (r, i, 0),
                               memory_space=pltpu.VMEM)
        in_specs += [fcenter, fcenter]
        operands += [u_cand, u_acc]
    out_shape = [jax.ShapeDtypeStruct((nrep, L, half), jnp.int8)]
    out_specs = [center]
    if measuring:
        out_shape.append(
            jax.ShapeDtypeStruct((nrep, 1, 128), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, 128),
                                      lambda r, i: (r, 0, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape) if measuring else out_shape[0],
        grid=(nrep, n),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if measuring else out_specs[0],
        input_output_aliases={2: 0},
        interpret=interpret,
    )(*operands)
    if measuring:
        state_out, obs = res
        return state_out, obs[:, 0, 0], obs[:, 0, 1], obs[:, 0, 2]
    return res


def sweep(model, state: CheckerboardState, key: jax.Array
          ) -> CheckerboardState:
    """One full MCS via the fused Pallas clock kernel; accepts (ny, half)
    or replica-batched (R, ny, half) color arrays."""
    ny, half = model.color_shape
    a, b = state
    batched = a.ndim == 3
    if not batched:
        a, b = a[None], b[None]
    kw = dict(q=model.q, beta=float(model.beta), nrep=a.shape[0],
              ny=ny, half=half)
    a = _metropolis_phase(a, b, seeds_from_key(key, 0), color=0, **kw)
    b = _metropolis_phase(b, a, seeds_from_key(key, 1), color=1, **kw)
    if not batched:
        a, b = a[0], b[0]
    return CheckerboardState(a, b)
