"""Shared in-kernel checkerboard stencil pieces for Pallas TPU kernels.

These run on *values* inside kernel bodies (not refs); all kernels for
2-D models share the same dual-color neighbor algebra (core/lattice.py):
y-neighbors come from a row shift with spliced halo rows, x-neighbors
from a lane roll whose direction alternates with global row parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def load_row_aligned(ref, base, sel: int, gran: int = 8):
    """One lattice row from a VMEM ref at dynamic row index base+sel.

    Mosaic requires dynamic sublane indices provably divisible by the
    sublane granule (8 for f32/int32, 16 for int16 storage): callers
    pass a ``gran``-aligned ``base`` (a modular expression of
    gran-multiples) plus a static in-block offset ``sel`` ∈ [0, gran).
    Returns shape (1, w)."""
    import jax.experimental.pallas as pl

    blk = ref[0, pl.ds(pl.multiple_of(base, gran), gran), :]
    return blk[sel:sel + 1, :]


def splice_updown(o: jax.Array, up_row: jax.Array, dn_row: jax.Array
                  ) -> tuple[jax.Array, jax.Array]:
    """(up, dn) neighbor planes for a (ty, w) block given 1-row halos.

    Sublane roll + single-row select measures ~5% faster than the
    equivalent slice+concatenate on v5e."""
    ty = o.shape[0]
    riota = jax.lax.broadcasted_iota(jnp.int32, (ty, 1), 0)
    up = pltpu.roll(o, 1, axis=0)
    up = jnp.where(riota == 0, up_row, up)
    dn = pltpu.roll(o, ty - 1, axis=0)
    dn = jnp.where(riota == ty - 1, dn_row, dn)
    return up, dn


def shift_down(o: jax.Array, dn_row: jax.Array) -> jax.Array:
    """Value of the row-below neighbor for every row of a block."""
    ty = o.shape[0]
    riota = jax.lax.broadcasted_iota(jnp.int32, (ty, 1), 0)
    dn = pltpu.roll(o, ty - 1, axis=0)
    return jnp.where(riota == ty - 1, dn_row, dn)


def row_parity_mask(ty: int, row0) -> jax.Array:
    """(ty, 1) bool: global row parity of each block row."""
    return (
        (jax.lax.broadcasted_iota(jnp.int32, (ty, 1), 0) + row0) & 1
    ) == 1


def lr_sum(o: jax.Array, color: int, parity: jax.Array) -> jax.Array:
    """left+right neighbor sum for a color block (lane rolls)."""
    minus = pltpu.roll(o, 1, axis=1)
    plus = pltpu.roll(o, o.shape[1] - 1, axis=1)  # roll by -1
    if color == 0:
        return o + jnp.where(parity, plus, minus)
    return o + jnp.where(parity, minus, plus)


def nbr_sum(o: jax.Array, up_row: jax.Array, dn_row: jax.Array,
            color: int, parity: jax.Array) -> jax.Array:
    """4-neighbor sum for one color block with spliced y-halos."""
    up, dn = splice_updown(o, up_row, dn_row)
    return up + dn + lr_sum(o, color, parity)


def lr_sum_cols(o: jax.Array, color: int, parity: jax.Array,
                left_col: jax.Array, right_col: jax.Array) -> jax.Array:
    """:func:`lr_sum` for an x-sharded block with explicit boundary
    columns: lane 0's "i-1" neighbor comes from ``left_col`` and lane
    w-1's "i+1" neighbor from ``right_col`` (both (ty, 1), exchanged
    over ICI by parallel/halo.exchange_halo_cols) instead of the
    periodic lane wrap — the column half of SURVEY.md §5.7's (dx, dy)
    decomposition."""
    w = o.shape[1]
    liota = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    minus = pltpu.roll(o, 1, axis=1)
    minus = jnp.where(liota == 0, left_col, minus)
    plus = pltpu.roll(o, w - 1, axis=1)
    plus = jnp.where(liota == w - 1, right_col, plus)
    if color == 0:
        return o + jnp.where(parity, plus, minus)
    return o + jnp.where(parity, minus, plus)


def nbr_sum_halo4(o: jax.Array, up_row: jax.Array, dn_row: jax.Array,
                  color: int, parity: jax.Array,
                  left_col: jax.Array, right_col: jax.Array) -> jax.Array:
    """4-neighbor sum with explicit halo rows AND columns (the in-kernel
    analog of core/lattice.neighbor_sums_halo2d)."""
    up, dn = splice_updown(o, up_row, dn_row)
    return up + dn + lr_sum_cols(o, color, parity, left_col, right_col)


def bits_to_uniform(bits: jax.Array) -> jax.Array:
    """uint32 -> f32 in [0, 1) using the top 24 bits (core/rng.py).

    Mosaic lacks a uint32->f32 cast; after the shift the value fits in
    int32, which does convert."""
    return (bits >> jnp.uint32(8)).astype(jnp.int32).astype(
        jnp.float32
    ) * jnp.float32(1.0 / (1 << 24))


def lr_sum_padded(o: jax.Array, color: int, parity: jax.Array,
                  half: int) -> jax.Array:
    """:func:`lr_sum` for a lane-PADDED color block: the plane is
    ``w`` lanes wide but only lanes [0, half) are real sites (pads are
    kept at 0 by the padded kernels).  The periodic x-wrap that the
    aligned kernels get for free from the lane roll is substituted at
    the real seam: lane 0's "i-1" neighbor is lane half-1 and lane
    half-1's "i+1" neighbor is lane 0.  Serves the committed
    lane-unaligned XY geometries (10000² -> half 5000, 4000² -> 2000;
    /root/reference/app/xy2d_periodic_gpu_relaxation.f90:7-13,
    /root/reference/scripts/fpm_run_xy2d_periodic_over_relaxation.sh)."""
    w = o.shape[1]
    liota = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    minus = pltpu.roll(o, 1, axis=1)
    minus = jnp.where(liota == 0, o[:, half - 1:half], minus)
    plus = pltpu.roll(o, w - 1, axis=1)
    plus = jnp.where(liota == half - 1, o[:, 0:1], plus)
    if color == 0:
        return o + jnp.where(parity, plus, minus)
    return o + jnp.where(parity, minus, plus)


def nbr_sum_padded(o: jax.Array, up_row: jax.Array, dn_row: jax.Array,
                   color: int, parity: jax.Array, half: int) -> jax.Array:
    """4-neighbor sum for a lane-padded color block (y-halos spliced,
    x-wrap at the real seam)."""
    up, dn = splice_updown(o, up_row, dn_row)
    return up + dn + lr_sum_padded(o, color, parity, half)
