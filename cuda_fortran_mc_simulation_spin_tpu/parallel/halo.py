"""ICI halo exchange for y-sharded lattice blocks.

The multi-chip promotion of the reference's "norishiro" halo-copy kernels
(/root/reference/src/ising2d_gpu_m.f90:86-106,
/root/reference/src/xy2d_periodic_gpu_m.f90:296-326): instead of copying
edge rows within one device's memory, each shard sends its boundary rows
to its y-neighbors with `lax.ppermute`, which XLA lowers to ICI
point-to-point transfers.
"""

from __future__ import annotations

import jax
from jax import lax


def exchange_halo_rows(
    local: jax.Array, axis: str, axis_size: int, row_axis: int = 0
) -> tuple[jax.Array, jax.Array]:
    """Return (halo_up, halo_dn) for a y-sharded block inside shard_map.

    halo_up = last row of the previous shard (global row above our block),
    halo_dn = first row of the next shard — both periodic in y.
    ``row_axis`` is the lattice-row axis of ``local`` (leading axes may be
    replica dims).
    """
    n_rows = local.shape[row_axis]
    last = lax.slice_in_dim(local, n_rows - 1, n_rows, axis=row_axis)
    first = lax.slice_in_dim(local, 0, 1, axis=row_axis)
    if axis_size == 1:
        return last, first
    fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]
    halo_up = lax.ppermute(last, axis, fwd)
    halo_dn = lax.ppermute(first, axis, bwd)
    return halo_up, halo_dn


def exchange_halo_rows_packed(
    wo: jax.Array, axis: str, axis_size: int
) -> tuple[jax.Array, jax.Array]:
    """(halo_up01, halo_dn01) for a y-sharded BIT-PACKED block
    (R, Lp, half) int32, 32 lattice rows per word (bit k = row 32Y+k,
    ops/ising2d_multispin.py): the exchanged payload is one extracted
    boundary bit-row per direction as a 0/1 int32 plane — 1/32nd of the
    packed word rows, and the kernels splice the single bit back into
    their carry chains."""
    import jax.numpy as jnp

    top01 = (wo[:, :1, :].astype(jnp.uint32) & jnp.uint32(1)).astype(
        jnp.int32)          # first lattice row of this shard
    bot01 = ((wo[:, -1:, :].astype(jnp.uint32) >> jnp.uint32(31))
             & jnp.uint32(1)).astype(jnp.int32)  # last lattice row
    if axis_size == 1:
        return bot01, top01
    fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]
    halo_up = lax.ppermute(bot01, axis, fwd)
    halo_dn = lax.ppermute(top01, axis, bwd)
    return halo_up, halo_dn


def exchange_halo_cols(
    local: jax.Array, axis: str, axis_size: int, col_axis: int = -1
) -> tuple[jax.Array, jax.Array]:
    """(halo_left, halo_right) for an x-sharded block inside shard_map —
    the second dimension of the (dx, dy) decomposition (SURVEY.md §5.7).

    halo_left = last column of the previous x-shard, halo_right = first
    column of the next — periodic.  The 4-neighbor stencil needs no
    corner exchange (diagonals never enter), so rows and columns
    exchange independently."""
    n_cols = local.shape[col_axis]
    last = lax.slice_in_dim(local, n_cols - 1, n_cols, axis=col_axis)
    first = lax.slice_in_dim(local, 0, 1, axis=col_axis)
    if axis_size == 1:
        return last, first
    fwd = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    bwd = [(i, (i - 1) % axis_size) for i in range(axis_size)]
    halo_left = lax.ppermute(last, axis, fwd)
    halo_right = lax.ppermute(first, axis, bwd)
    return halo_left, halo_right
