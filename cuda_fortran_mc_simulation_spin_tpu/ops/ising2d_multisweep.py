"""Whole-lattice-in-VMEM multi-sweep Ising2D kernel.

The reference's production NER workloads are *ensembles on small
lattices*: 1001×1000 × 10³ MCS × 1.44M samples for Ising2D
(/root/reference/app/ising2d_gpu_relaxation.f90:6-8), 2000² × 10⁵ MCS ×
5000 samples for the clock family.  At those shapes the phase-per-
pallas_call kernel (ops/ising2d_pallas.py) pays full HBM round trips and
dispatch per sweep.

This kernel runs ``S`` complete MCS — both checkerboard phases, RNG, and
per-sweep magnetization/energy measurement — in ONE kernel invocation
with both int8 color arrays resident in VMEM.  HBM traffic per S sweeps
is one read + one write of the lattice plus an (S, 128) observable row
block, i.e. ~1/S of the phase-kernel traffic.  Grid = (replicas,): each
program instance owns one replica's lattice (the reference's replica
engines, /root/reference/src/clock_gpu_multi_m.f90:66, promoted to a
grid axis).

Fits lattices with 2·ny·(nx/2) ≤ ~12MB (e.g. 2048² int8 = 4MB).
Row-blocked int32 temporaries keep peak VMEM bounded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.models.base import CheckerboardState
from cuda_fortran_mc_simulation_spin_tpu.ops import stencil
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    _pick_tile_rows,
    accept_thresholds_u32,
    seeds_from_key,
)

# lattice bytes cap for "resident in VMEM" (leaves room for temps)
VMEM_LATTICE_BUDGET = 10 << 20


def fits_vmem(ny: int, half: int) -> bool:
    return 2 * ny * half <= VMEM_LATTICE_BUDGET


def _kernel(seed_ref, a_in, b_in, a_ref, b_ref, obs_ref,
            *, sweeps: int, ty: int, ny: int, half: int,
            t4: int, t8: int):
    r = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ (r * jnp.int32(0x3C6EF35F)))

    # operate on the aliased output refs only (a_in/b_in share storage)
    nblk = ny // ty

    def phase(x_ref, o_ref, color, measuring, carry):
        def block(i, acc):
            m_acc, e_acc = acc
            y0 = pl.multiple_of(i * ty, 8)
            o = o_ref[0, pl.ds(y0, ty), :].astype(jnp.int32)
            # dynamic sublane indices must be 8-aligned: fetch the
            # aligned 8-row block containing the halo row
            up_row = stencil.load_row_aligned(
                o_ref, (i * ty - 8 + ny) % ny, 7
            ).astype(jnp.int32)
            dn_row = stencil.load_row_aligned(
                o_ref, (i * ty + ty) % ny, 0
            ).astype(jnp.int32)
            parity = (
                (jax.lax.broadcasted_iota(jnp.int32, (ty, 1), 0) + y0) & 1
            ) == 1
            nsum = stencil.nbr_sum(o, up_row, dn_row, color, parity)
            x = x_ref[0, pl.ds(y0, ty), :].astype(jnp.int32)
            half_de = x * nsum
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((ty, half)), jnp.uint32
            )
            thresh = jnp.where(half_de == 2, jnp.uint32(t4),
                               jnp.uint32(t8))
            accept = (half_de <= 0) | (bits < thresh)
            out = jnp.where(accept, -x, x)
            x_ref[0, pl.ds(y0, ty), :] = out.astype(jnp.int8)
            if measuring:
                # phase-1 measurement is exact for the final state: the
                # o (color-0) operands are final, every a-b bond appears
                # once in Σ_b s_b·nsum_b — the separate measurement pass
                # (a third traversal per MCS) fuses away
                m_acc = m_acc + jnp.sum(out) + jnp.sum(o)
                e_acc = e_acc - jnp.sum(out * nsum)
            return m_acc, e_acc

        return jax.lax.fori_loop(0, nblk, block, carry)

    # initialize the aliased outputs (no-op copies under aliasing)
    a_ref[0] = a_in[0]
    b_ref[0] = b_in[0]

    def sweep_body(s, _):
        zero2 = (jnp.int32(0), jnp.int32(0))
        phase(a_ref, b_ref, 0, False, zero2)
        m, e = phase(b_ref, a_ref, 1, True, zero2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(
            lane == 0, m.astype(jnp.float32),
            jnp.where(lane == 1, e.astype(jnp.float32), 0.0),
        )
        obs_ref[0, pl.ds(s, 1), :] = row
        return 0

    jax.lax.fori_loop(0, sweeps, sweep_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("sweeps", "beta", "nrep", "ny", "half"),
)
def _multisweep(a, b, seeds, *, sweeps, beta, nrep, ny, half):
    t4, t8 = accept_thresholds_u32(beta)
    ty = _pick_tile_rows(ny, half, budget_bytes=256 << 10)
    kernel = functools.partial(
        _kernel, sweeps=sweeps, ty=ty, ny=ny, half=half, t4=t4, t8=t8
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
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            lat, lat,
        ],
        out_specs=(lat, lat, obs),
        input_output_aliases={1: 0, 2: 1},
    )(seeds, a, b)


def multisweep(model, state: CheckerboardState, key: jax.Array,
               sweeps: int):
    """Advance ``sweeps`` MCS and return per-sweep observables.

    state: (ny, half) or replica-batched (R, ny, half) int8 arrays.
    Returns (new_state, {"m": (R, S), "e": (R, S)}) — normalized
    densities (unbatched input drops the R axis).
    """
    ny, half = model.color_shape
    if not fits_vmem(ny, half):
        raise ValueError(
            f"lattice {ny}x{2 * half} does not fit the VMEM-resident "
            "multisweep kernel; use the phase kernel path"
        )
    a, b = state
    batched = a.ndim == 3
    if not batched:
        a, b = a[None], b[None]
    a, b, obs = _multisweep(
        a, b, seeds_from_key(key, 0),
        sweeps=sweeps, beta=float(model.beta), nrep=a.shape[0],
        ny=ny, half=half,
    )
    n_inv = jnp.float32(1.0 / model.nsites)
    m = obs[:, :, 0] * n_inv
    e = obs[:, :, 1] * n_inv
    if not batched:
        a, b, m, e = a[0], b[0], m[0], e[0]
    return CheckerboardState(a, b), {"m": m, "e": e}
