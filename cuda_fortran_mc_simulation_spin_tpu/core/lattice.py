"""Checkerboard (two-color) lattice storage and neighbor stencils.

The canonical storage for 2-D models is a pair of dense arrays ``(a, b)``
of shape ``(ny, nx // 2)``:

- ``a[y, i]`` holds the site ``(y, x = 2*i + (y & 1))``   (color 0, (x+y) even)
- ``b[y, i]`` holds the site ``(y, x = 2*i + 1 - (y & 1))`` (color 1, (x+y) odd)

Every site's four nearest neighbors live in the *other* color array, so a
checkerboard Metropolis phase is a dense, fully-vectorized update of one
array reading the other — no parity masking, every TPU lane does useful
work.  This is the same conclusion the reference reaches in its fastest
variants (dual-lattice storage: /root/reference/src/clock/
clock_dual_lattice_yhalf_tableall_m.f90:62-63, /root/reference/src/
xy2d_periodic_yhalf_gpu_m.f90:62-63); here it is the canonical layout for
all models rather than one point in a hand-written optimization ladder.

Neighbor index algebra (periodic BC), with ``p = y & 1``:

color 0 site ``(y, 2i+p)``:
    up    = b[y-1, i]          down  = b[y+1, i]
    left  = b[y, i+p-1]        right = b[y, i+p]
color 1 site ``(y, 2i+1-p)``:
    left  = a[y, i-p]          right = a[y, i+1-p]
    up    = a[y-1, i]          down  = a[y+1, i]

so the left+right sum for color 0 is ``b + roll(b, ∓1)`` selected by row
parity, and the opposite selection for color 1.

The reference's flat-array "norishiro" halo maintenance
(/root/reference/src/ising2d_gpu_m.f90:86-106, helical BC) and the
periodic 4-sided halo kernels (/root/reference/src/xy2d_periodic_gpu_m.f90:
296-326) are replaced by `jnp.roll` wraparound on a single chip and by
`ppermute` edge exchange across chips (see ``parallel/halo.py``).

Helical (skew-periodic) BC — the reference's layout for ising2d / xy2d /
clock flat arrays, where site ``idx`` neighbors ``idx±1, idx±nx`` modulo
``nall`` — is supported by a flat masked engine for cross-checking
(`helical_neighbor_sums`); production paths use true periodic BC.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax.numpy as jnp
import numpy as np

Parity = Literal[0, 1]


@dataclasses.dataclass(frozen=True)
class LatticeSpec:
    """Static description of a 2-D lattice.

    Replaces the reference's compile-time `parameter ::` constants +
    sed-patching config mechanism (/root/reference/scripts/fpm_run.sh:11-16).
    """

    nx: int
    ny: int
    bc: Literal["periodic", "helical"] = "periodic"

    def __post_init__(self):
        if self.bc == "periodic" and self.nx % 2 != 0:
            raise ValueError(
                f"periodic checkerboard storage requires even nx, got {self.nx}"
            )
        if self.ny % 2 != 0 and self.bc == "periodic":
            # odd ny breaks color consistency across the y wraparound seam
            raise ValueError(
                f"periodic checkerboard storage requires even ny, got {self.ny}"
            )

    @property
    def nsites(self) -> int:
        return self.nx * self.ny

    @property
    def color_shape(self) -> tuple[int, int]:
        return (self.ny, self.nx // 2)


def split_checkerboard(full: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(ny, nx) full lattice -> (a, b) color arrays of shape (ny, nx//2).

    Works for trailing feature dims too: (ny, nx, *f) -> (ny, nx//2, *f).
    """
    ny, nx = full.shape[0], full.shape[1]
    pairs = full.reshape(ny, nx // 2, 2, *full.shape[2:])
    odd = (jnp.arange(ny) & 1).astype(bool).reshape(
        ny, *([1] * (pairs.ndim - 2))
    )
    even_x = pairs[:, :, 0]
    odd_x = pairs[:, :, 1]
    a = jnp.where(odd, odd_x, even_x)
    b = jnp.where(odd, even_x, odd_x)
    return a, b


def merge_checkerboard(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`split_checkerboard`."""
    ny, half = a.shape[0], a.shape[1]
    odd = (jnp.arange(ny) & 1).astype(bool).reshape(ny, *([1] * (a.ndim - 1)))
    even_x = jnp.where(odd, b, a)
    odd_x = jnp.where(odd, a, b)
    pairs = jnp.stack([even_x, odd_x], axis=2)
    return pairs.reshape(ny, half * 2, *a.shape[2:])


def neighbor_sums(
    other: jnp.ndarray, color: Parity, accum_dtype=None
) -> jnp.ndarray:
    """Sum of the 4 nearest neighbors for every site of ``color``.

    ``other`` is the opposite color array, shape (ny, nx//2) (a trailing
    feature axis is allowed, e.g. XY spin components (ny, nx//2, 2)).
    Periodic BC via roll wraparound.

    Mirrors the stencil of /root/reference/src/ising2d_gpu_m.f90:191-196 and
    /root/reference/src/xy2d_periodic_gpu_m.f90:389-397, recast as dense
    vector ops on color arrays.
    """
    if accum_dtype is not None:
        other = other.astype(accum_dtype)
    ny = other.shape[0]
    odd = (jnp.arange(ny) & 1).astype(bool).reshape(
        ny, *([1] * (other.ndim - 1))
    )
    up = jnp.roll(other, 1, axis=0)
    down = jnp.roll(other, -1, axis=0)
    minus = jnp.roll(other, 1, axis=1)   # value from i-1
    plus = jnp.roll(other, -1, axis=1)   # value from i+1
    if color == 0:
        lr = other + jnp.where(odd, plus, minus)
    else:
        lr = other + jnp.where(odd, minus, plus)
    return up + down + lr


def right_down_neighbors(
    a: jnp.ndarray, b: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-site right and down neighbor values for both colors.

    Used by bond-energy reductions: E = -Σ_sites S·(S_right + S_down)
    (/root/reference/src/ising2d_gpu_m.f90:202-211).

    Returns (right_of_a, down_of_a, right_of_b, down_of_b).
    """
    ny = a.shape[0]
    odd = (jnp.arange(ny) & 1).astype(bool).reshape(ny, *([1] * (a.ndim - 1)))
    # color 0 site (y, 2i+p): right neighbor = b[y, i+p]
    right_a = jnp.where(odd, jnp.roll(b, -1, axis=1), b)
    down_a = jnp.roll(b, -1, axis=0)
    # color 1 site (y, 2i+1-p): right neighbor = a[y, i+1-p]
    right_b = jnp.where(odd, a, jnp.roll(a, -1, axis=1))
    down_b = jnp.roll(a, -1, axis=0)
    return right_a, down_a, right_b, down_b


def neighbor_sums_halo(
    other: jnp.ndarray,
    halo_up: jnp.ndarray,
    halo_dn: jnp.ndarray,
    color: Parity,
) -> jnp.ndarray:
    """:func:`neighbor_sums` for a y-sharded local block with explicit
    halo rows.

    ``halo_up``/``halo_dn`` are the (1, nx//2[, f]) rows owned by the y-
    neighbor shards (fetched over ICI via `ppermute`, see parallel/halo.py)
    — the multi-chip promotion of the reference's intra-GPU "norishiro"
    halo kernels (/root/reference/src/xy2d_periodic_gpu_m.f90:296-326).

    Assumes the local block starts on an even global row (enforced by
    requiring ny % (2 * n_shards) == 0), so local row parity equals
    global row parity.
    """
    ny = other.shape[0]
    odd = (jnp.arange(ny) & 1).astype(bool).reshape(
        ny, *([1] * (other.ndim - 1))
    )
    up = jnp.concatenate([halo_up, other[:-1]], axis=0)
    dn = jnp.concatenate([other[1:], halo_dn], axis=0)
    minus = jnp.roll(other, 1, axis=1)
    plus = jnp.roll(other, -1, axis=1)
    if color == 0:
        lr = other + jnp.where(odd, plus, minus)
    else:
        lr = other + jnp.where(odd, minus, plus)
    return up + dn + lr


def neighbor_sums_halo2d(
    other: jnp.ndarray,
    halo_up: jnp.ndarray,
    halo_dn: jnp.ndarray,
    halo_left: jnp.ndarray,
    halo_right: jnp.ndarray,
    color: Parity,
) -> jnp.ndarray:
    """:func:`neighbor_sums` for a (dx, dy)-sharded local block: explicit
    halo rows AND columns (SURVEY.md §5.7's full 2-D decomposition).

    ``halo_left``/``halo_right`` are the (L, 1[, f]) color-array columns
    owned by the x-neighbor shards.  The 4-neighbor stencil has no
    diagonal terms, so no corner exchange is needed.  Assumes the local
    block starts on an even global row (local row parity == global)."""
    ny = other.shape[0]
    odd = (jnp.arange(ny) & 1).astype(bool).reshape(
        ny, *([1] * (other.ndim - 1))
    )
    up = jnp.concatenate([halo_up, other[:-1]], axis=0)
    dn = jnp.concatenate([other[1:], halo_dn], axis=0)
    minus = jnp.concatenate([halo_left, other[:, :-1]], axis=1)
    plus = jnp.concatenate([other[:, 1:], halo_right], axis=1)
    if color == 0:
        lr = other + jnp.where(odd, plus, minus)
    else:
        lr = other + jnp.where(odd, minus, plus)
    return up + dn + lr


# ---------------------------------------------------------------------------
# 3-D checkerboard (color = (x+y+z) & 1), storage (nz, ny, nx//2)
# ---------------------------------------------------------------------------

def split_checkerboard3d(full: jnp.ndarray
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(nz, ny, nx) -> (a, b) color arrays (nz, ny, nx//2).

    a[z, y, i] = S[z, y, 2i + ((y+z) & 1)] — the 2-D scheme with row
    parity generalized to plane+row parity.
    """
    nz, ny, nx = full.shape
    pairs = full.reshape(nz, ny, nx // 2, 2)
    odd = (
        (jnp.arange(nz)[:, None] + jnp.arange(ny)[None, :]) & 1
    ).astype(bool)[..., None]
    a = jnp.where(odd, pairs[..., 1], pairs[..., 0])
    b = jnp.where(odd, pairs[..., 0], pairs[..., 1])
    return a, b


def merge_checkerboard3d(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    nz, ny, half = a.shape
    odd = (
        (jnp.arange(nz)[:, None] + jnp.arange(ny)[None, :]) & 1
    ).astype(bool)[..., None]
    even_x = jnp.where(odd, b, a)
    odd_x = jnp.where(odd, a, b)
    return jnp.stack([even_x, odd_x], axis=-1).reshape(nz, ny, half * 2)


def neighbor_sums3d(other: jnp.ndarray, color: Parity) -> jnp.ndarray:
    """Sum of the 6 nearest neighbors for every site of ``color`` on the
    3-D checkerboard (periodic BC) — the stencil of
    /root/reference/src/ising3d_gpu_m.f90:199-203 on dual-color storage.
    """
    nz, ny = other.shape[0], other.shape[1]
    odd = (
        (jnp.arange(nz)[:, None] + jnp.arange(ny)[None, :]) & 1
    ).astype(bool)[..., None]
    zp = jnp.roll(other, -1, axis=0)
    zm = jnp.roll(other, 1, axis=0)
    yp = jnp.roll(other, -1, axis=1)
    ym = jnp.roll(other, 1, axis=1)
    minus = jnp.roll(other, 1, axis=2)
    plus = jnp.roll(other, -1, axis=2)
    if color == 0:
        lr = other + jnp.where(odd, plus, minus)
    else:
        lr = other + jnp.where(odd, minus, plus)
    return zp + zm + yp + ym + lr


def neighbor_sums3d_halo(
    other: jnp.ndarray,
    halo_zm: jnp.ndarray,
    halo_zp: jnp.ndarray,
    color: Parity,
    z0_parity: int = 0,
) -> jnp.ndarray:
    """:func:`neighbor_sums3d` for a z-sharded local block with explicit
    z-halo planes (1, ny, nx//2).  Requires nz_local even (so local z
    parity equals global) — enforced by parallel/domain.py."""
    nz, ny = other.shape[0], other.shape[1]
    odd = (
        (jnp.arange(nz)[:, None] + jnp.arange(ny)[None, :] + z0_parity) & 1
    ).astype(bool)[..., None]
    zm = jnp.concatenate([halo_zm, other[:-1]], axis=0)
    zp = jnp.concatenate([other[1:], halo_zp], axis=0)
    yp = jnp.roll(other, -1, axis=1)
    ym = jnp.roll(other, 1, axis=1)
    minus = jnp.roll(other, 1, axis=2)
    plus = jnp.roll(other, -1, axis=2)
    if color == 0:
        lr = other + jnp.where(odd, plus, minus)
    else:
        lr = other + jnp.where(odd, minus, plus)
    return zm + zp + yp + ym + lr


def right_down_back_neighbors3d(a: jnp.ndarray, b: jnp.ndarray):
    """(x+, y+, z+) neighbor values per color, for bond energy."""
    odd = (
        (jnp.arange(a.shape[0])[:, None] + jnp.arange(a.shape[1])[None, :])
        & 1
    ).astype(bool)[..., None]
    right_a = jnp.where(odd, jnp.roll(b, -1, axis=2), b)
    right_b = jnp.where(odd, a, jnp.roll(a, -1, axis=2))
    yp_a = jnp.roll(b, -1, axis=1)
    yp_b = jnp.roll(a, -1, axis=1)
    zp_a = jnp.roll(b, -1, axis=0)
    zp_b = jnp.roll(a, -1, axis=0)
    return (right_a, yp_a, zp_a), (right_b, yp_b, zp_b)


# ---------------------------------------------------------------------------
# Helical (skew-periodic) flat engine — parity with the reference layout
# ---------------------------------------------------------------------------

def helical_neighbor_sums(flat: jnp.ndarray, nx: int) -> jnp.ndarray:
    """4-neighbor sums under helical BC on a flat (nall,) lattice.

    Site ``idx`` neighbors ``idx±1`` and ``idx±nx``, wrapping modulo nall —
    the reference's "norishiro" layout (/root/reference/src/
    ising2d_gpu_m.f90:52-54,95-106: halo rows [1-nx:0] and [nall+1:nall+nx]
    mirror the opposite edge).
    """
    return (
        jnp.roll(flat, -1)
        + jnp.roll(flat, 1)
        + jnp.roll(flat, -nx)
        + jnp.roll(flat, nx)
    )


def helical_parity_mask(nall: int, offset: Parity) -> jnp.ndarray:
    """Boolean mask of the sites updated in a helical checkerboard phase.

    The reference updates ``idx = offset, nall, 2`` (1-based:
    /root/reference/src/ising2d_gpu_m.f90:155-157); 0-based this is
    ``idx % 2 == offset``.
    """
    return (jnp.arange(nall) & 1) == offset

