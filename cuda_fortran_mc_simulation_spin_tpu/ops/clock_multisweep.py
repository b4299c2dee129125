"""Whole-lattice-in-VMEM multi-sweep kernel for the q-state clock model.

The reference's largest production run is the clock family: 2000² × 10⁵
MCS × 5000 samples on the dual-lattice-yhalf tableall engine
(/root/reference/app/clock_dual_lattice_yhalf_tableall_gpu_relaxation.f90:
8-9).  A 2000²-class lattice is 4MB of int8 color arrays — it fits VMEM,
so ``S`` full MCS (two phases + RNG + per-sweep m/e measurement) run in
ONE kernel invocation with zero HBM lattice traffic per sweep.

Physics identical to ops/clock_pallas.py (vector-field ΔE via q-way
select chains, candidate excluding the current state, exp acceptance).
Grid = (replicas,).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.models.base import CheckerboardState
from cuda_fortran_mc_simulation_spin_tpu.ops import stencil
from cuda_fortran_mc_simulation_spin_tpu.ops.clock_pallas import (
    _cos_sin_chain,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_multisweep import (
    fits_vmem,
)
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    _pick_tile_rows,
    seeds_from_key,
)


def _kernel(seed_ref, a_in, b_in, a_ref, b_ref, obs_ref,
            *, sweeps: int, ty: int, ny: int, half: int, q: int,
            beta: float):
    r = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ (r * jnp.int32(0x3C6EF35F)))
    nblk = ny // ty

    def phase(x_ref, o_ref, color, measuring, carry):
        def block(i, acc):
            m_acc, e_acc = acc
            y0 = pl.multiple_of(i * ty, 8)
            o = o_ref[0, pl.ds(y0, ty), :].astype(jnp.int32)
            up_row = stencil.load_row_aligned(
                o_ref, (i * ty - 8 + ny) % ny, 7
            ).astype(jnp.int32)
            dn_row = stencil.load_row_aligned(
                o_ref, (i * ty + ty) % ny, 0
            ).astype(jnp.int32)
            parity = (
                (jax.lax.broadcasted_iota(jnp.int32, (ty, 1), 0) + y0) & 1
            ) == 1
            co, so = _cos_sin_chain(o, q)
            cu, su = _cos_sin_chain(up_row, q)
            cd, sd = _cos_sin_chain(dn_row, q)
            hx = stencil.nbr_sum(co, cu, cd, color, parity)
            hy = stencil.nbr_sum(so, su, sd, color, parity)

            x = x_ref[0, pl.ds(y0, ty), :].astype(jnp.int32)
            u_cand = stencil.bits_to_uniform(
                pltpu.bitcast(pltpu.prng_random_bits((ty, half)),
                              jnp.uint32)
            )
            off = (u_cand * (q - 1)).astype(jnp.int32) + 1
            new = x + off
            new = jnp.where(new >= q, new - q, new)
            cx, sx = _cos_sin_chain(x, q)
            cn, snw = _cos_sin_chain(new, q)
            de = -((cn - cx) * hx + (snw - sx) * hy)
            p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))
            u_acc = stencil.bits_to_uniform(
                pltpu.bitcast(pltpu.prng_random_bits((ty, half)),
                              jnp.uint32)
            )
            sel = u_acc < p
            x_ref[0, pl.ds(y0, ty), :] = jnp.where(
                sel, new, x
            ).astype(jnp.int8)
            if measuring:
                # phase-1 measurement is exact for the final state: h is
                # built from the final color-0 planes and every a-b bond
                # appears once in Σ_b S_b·h_b — the separate measurement
                # pass (with its 8 extra select-chain decodes) fuses away
                fin_c = jnp.where(sel, cn, cx)
                fin_s = jnp.where(sel, snw, sx)
                m_acc = m_acc + jnp.sum(co) + jnp.sum(fin_c)
                e_acc = e_acc - jnp.sum(fin_c * hx + fin_s * hy)
            return m_acc, e_acc

        return jax.lax.fori_loop(0, nblk, block, carry)

    a_ref[0] = a_in[0]
    b_ref[0] = b_in[0]

    def sweep_body(s, _):
        zero2 = (jnp.float32(0.0), jnp.float32(0.0))
        phase(a_ref, b_ref, 0, False, zero2)
        m, e = phase(b_ref, a_ref, 1, True, zero2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        obs_ref[0, pl.ds(s, 1), :] = jnp.where(
            lane == 0, m, jnp.where(lane == 1, e, 0.0)
        )
        return 0

    jax.lax.fori_loop(0, sweeps, sweep_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("sweeps", "q", "beta", "nrep", "ny", "half"),
)
def _multisweep(a, b, seeds, *, sweeps, q, beta, nrep, ny, half):
    ty = _pick_tile_rows(ny, half, budget_bytes=128 << 10)
    kernel = functools.partial(
        _kernel, sweeps=sweeps, ty=ty, ny=ny, half=half, q=q, beta=beta
    )
    lat = pl.BlockSpec((1, ny, half), lambda r: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    obs = pl.BlockSpec((1, sweeps, 128), lambda r: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nrep, ny, half), jnp.int8),
            jax.ShapeDtypeStruct((nrep, ny, half), jnp.int8),
            jax.ShapeDtypeStruct((nrep, sweeps, 128), jnp.float32),
        ),
        grid=(nrep,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), lat, lat],
        out_specs=(lat, lat, obs),
        input_output_aliases={1: 0, 2: 1},
    )(seeds, a, b)


def multisweep(model, state: CheckerboardState, key: jax.Array,
               sweeps: int):
    """Advance ``sweeps`` clock MCS with per-sweep (m, e) measurement."""
    ny, half = model.color_shape
    if not fits_vmem(ny, half):
        raise ValueError("lattice too large for the VMEM multisweep path")
    a, b = state
    batched = a.ndim == 3
    if not batched:
        a, b = a[None], b[None]
    a, b, obs = _multisweep(
        a, b, seeds_from_key(key, 0),
        sweeps=sweeps, q=model.q, beta=float(model.beta),
        nrep=a.shape[0], ny=ny, half=half,
    )
    n_inv = jnp.float32(1.0 / model.nsites)
    m = obs[:, :, 0] * n_inv
    e = obs[:, :, 1] * n_inv
    if not batched:
        a, b, m, e = a[0], b[0], m[0], e[0]
    return CheckerboardState(a, b), {"m": m, "e": e}
