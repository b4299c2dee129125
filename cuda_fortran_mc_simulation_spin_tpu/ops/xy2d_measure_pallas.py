"""Fused XY observable kernel: (m_x, m_y, E, A) in one pass.

The disorder protocols measure four observables every sweep
(/root/reference/app/xy2d_periodic_gpu_relaxation_from_disorder.f90:
46-58).  As separate XLA reductions those re-read the spin planes
~4× (plus rolled copies for the bond energy), which measured ~50% of
the production step time.  This kernel reads the 4 state planes and the
4 autocorrelation-snapshot planes exactly once per sweep and emits all
four sums, accumulating across row-block grid steps in the output block
(TPU grid steps run sequentially, so the all-blocks-map-to-one output
accumulation is race-free).

Grid (replicas, row-blocks); output (R, 8, 128) f32 with
row 0 lanes [0..3] = [Σmx, Σmy, E, A].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XYState
from cuda_fortran_mc_simulation_spin_tpu.ops import stencil
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    _pick_tile_rows,
)


def _kernel(ax_ref, ay_ref, bx_ref, by_ref,
            axd_ref, ayd_ref, bxd_ref, byd_ref,
            *rest, ty: int, has_snap: bool = True):
    if has_snap:
        sax_ref, say_ref, sbx_ref, sby_ref, out_ref = rest
    else:
        (out_ref,) = rest
    i = pl.program_id(1)
    parity = stencil.row_parity_mask(ty, i * ty)

    ax, ay = ax_ref[0], ay_ref[0]
    bx, by = bx_ref[0], by_ref[0]

    mx = jnp.sum(ax) + jnp.sum(bx)
    my = jnp.sum(ay) + jnp.sum(by)

    def bond(pa, pb, pb_dn_row):
        # Σ pa·(right(pb) + down(pb)) + Σ pb·(right_of_b(pa) + down(pa))
        # split: here only the pa-side with pb neighbors; called per
        # component with both orderings below.
        right_a = jnp.where(
            parity, pltpu.roll(pb, pb.shape[1] - 1, axis=1), pb
        )
        down_a = stencil.shift_down(pb, pb_dn_row)
        return jnp.sum(pa * (right_a + down_a))

    def bond_b(pb, pa, pa_dn_row):
        right_b = jnp.where(
            parity, pa, pltpu.roll(pa, pa.shape[1] - 1, axis=1)
        )
        down_b = stencil.shift_down(pa, pa_dn_row)
        return jnp.sum(pb * (right_b + down_b))

    e = -(
        bond(ax, bx, bxd_ref[0, 0:1, :])
        + bond(ay, by, byd_ref[0, 0:1, :])
        + bond_b(bx, ax, axd_ref[0, 0:1, :])
        + bond_b(by, ay, ayd_ref[0, 0:1, :])
    )

    if has_snap:
        a_corr = (
            jnp.sum(ax * sax_ref[0]) + jnp.sum(ay * say_ref[0])
            + jnp.sum(bx * sbx_ref[0]) + jnp.sum(by * sby_ref[0])
        )
    else:
        a_corr = jnp.float32(0.0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0
    vals = jnp.where(
        lane == 0, mx,
        jnp.where(lane == 1, my,
                  jnp.where(lane == 2, e,
                            jnp.where(lane == 3, a_corr, 0.0))),
    )
    vals = jnp.where(row0, vals, 0.0)

    @pl.when(i == 0)
    def _():
        out_ref[0] = vals

    @pl.when(i > 0)
    def _():
        out_ref[0] = out_ref[0] + vals


@functools.partial(jax.jit, static_argnames=("nrep", "ny", "half"))
def _measure(planes, snap_planes, *, nrep, ny, half):
    ty = _pick_tile_rows(ny, half, budget_bytes=(256 << 10) // 4, gran=8)
    n = ny // ty
    nb8 = ny // 8
    has_snap = snap_planes is not None
    kernel = functools.partial(_kernel, ty=ty, has_snap=has_snap)
    center = pl.BlockSpec((1, ty, half), lambda r, i: (r, i, 0),
                          memory_space=pltpu.VMEM)
    dn = pl.BlockSpec(
        (1, 8, half), lambda r, i: (r, ((i + 1) * ty // 8) % nb8, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.BlockSpec((1, 8, 128), lambda r, i: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    ax, ay, bx, by = planes
    in_specs = [center, center, center, center, dn, dn, dn, dn]
    operands = [ax, ay, bx, by, ax, ay, bx, by]
    if has_snap:
        in_specs += [center, center, center, center]
        operands += list(snap_planes)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nrep, 8, 128), jnp.float32),
        grid=(nrep, n),
        in_specs=in_specs,
        out_specs=out,
    )(*operands)


def measure_plain(model, state: XYState):
    """{mx, my, e} densities without an autocorrelation snapshot — the
    relaxation/over-relaxation protocols' per-sweep measurement
    (/root/reference/app/xy2d_periodic_gpu_relaxation.f90:38-44), one
    fused pass instead of XLA's separate sum+roll reductions."""
    ny, half = model.color_shape
    batched = state.ax.ndim == 3
    if not batched:
        state = XYState(*(p[None] for p in state))
    out = _measure(tuple(state), None,
                   nrep=state.ax.shape[0], ny=ny, half=half)
    n_inv = jnp.float32(1.0 / model.nsites)
    obs = {
        "mx": out[:, 0, 0] * n_inv,
        "my": out[:, 0, 1] * n_inv,
        "e": out[:, 0, 2] * n_inv,
    }
    if not batched:
        obs = {k: v[0] for k, v in obs.items()}
    return obs


def measure(model, state: XYState, snap: XYState):
    """{mx, my, e, A} sums (densities) for (R, ny, half) or (ny, half)
    plane sets — single-pass fused reduction."""
    ny, half = model.color_shape
    batched = state.ax.ndim == 3
    if not batched:
        state = XYState(*(p[None] for p in state))
        snap = XYState(*(p[None] for p in snap))
    out = _measure(
        tuple(state), tuple(snap),
        nrep=state.ax.shape[0], ny=ny, half=half,
    )
    n_inv = jnp.float32(1.0 / model.nsites)
    obs = {
        "mx": out[:, 0, 0] * n_inv,
        "my": out[:, 0, 1] * n_inv,
        "e": out[:, 0, 2] * n_inv,
        "A": out[:, 0, 3] * n_inv,
    }
    if not batched:
        obs = {k: v[0] for k, v in obs.items()}
    return obs
