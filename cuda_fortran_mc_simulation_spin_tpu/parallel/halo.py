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
