"""Fused Pallas TPU kernel: checkerboard Metropolis phases for Ising2D.

This is the TPU-native counterpart of the reference's CUDA `update_sub`
kernel (/root/reference/src/ising2d_gpu_m.f90:148-162).  Fusion level is
higher than the reference: RNG generation happens *inside* the kernel on
the per-core hardware PRNG (the reference bulk-generates N XORWOW
uniforms into HBM first, :138), and acceptance uses integer threshold
compares against precomputed uint32 cutoffs instead of float exp-LUT
loads, so the hot loop is VPU int32 ops with zero gathers and zero
transcendentals.

Tiling: grid (replicas, row-blocks) over color arrays (R, ny, nx//2)
int8 — the replica axis is a first-class grid dimension (the TPU-native
form of the reference's replica engines,
/root/reference/src/clock_gpu_multi_m.f90:66).  Periodic y-halo rows are
fetched by viewing the opposite-color array with 8-row BlockSpecs at
(row ± 1) mod ny — the in-kernel analog of the reference's "norishiro"
halo maintenance (/root/reference/src/ising2d_gpu_m.f90:86-106).
x-neighbors are lane rolls within the block (the dual-color layout makes
the left+right sum a single roll + add, see core/lattice.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.models.base import CheckerboardState
from cuda_fortran_mc_simulation_spin_tpu.ops import stencil

# int8 sublane granularity
_MIN_TY = 32


def _pick_tile_rows(ny: int, half: int, budget_bytes: int = 512 << 10,
                    gran: int = _MIN_TY) -> int:
    """Largest row-tile that is a multiple of ``gran`` (32 for int8
    storage, 8 for f32), divides ny, and keeps the block element count
    under ``budget_bytes`` so the kernel's f32/int32 temporaries and
    double-buffered pipeline stay within the 16MB VMEM budget."""
    ty = max(gran, min(ny, budget_bytes // max(half, 1)))
    ty = (ty // gran) * gran
    while ty >= gran:
        if ny % ty == 0:
            return ty
        ty -= gran
    raise ValueError(
        f"ny={ny} not tileable into multiples of {gran} "
        f"(need ny % {gran} == 0 for this Pallas path)"
    )


def accept_thresholds_u32(beta: float) -> tuple[int, int]:
    """uint32 acceptance cutoffs for ΔE = 4 and ΔE = 8.

    flip iff rand_bits < round(exp(-β·ΔE)·2³²) — integer-exact analog of
    the reference's `randoms(idx) <= exparr(ΔE)` test
    (/root/reference/src/ising2d_gpu_m.f90:159-161).
    """
    def cut(p):
        return int(min(0xFFFFFFFF, round(p * 4294967296.0)))

    return cut(np.exp(-4.0 * beta)), cut(np.exp(-8.0 * beta))


def _phase_kernel(seed_ref, x_ref, oc_ref, oup_ref, odn_ref, out_ref,
                  *, color: int, ty: int, t4: int, t8: int):
    r = pl.program_id(0)  # replica
    i = pl.program_id(1)  # row-block
    # hardware PRNG takes at most 2 seed words: mix replica and tile ids
    # into the second word (golden-ratio multiplies decorrelate them).
    tile_tag = i * jnp.int32(-1640531527) + r * jnp.int32(0x3C6EF35F)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)

    # int8 storage, int32 compute (Mosaic has no int8 VPU arithmetic;
    # the tile budget keeps the int32 temporaries inside VMEM).
    x = x_ref[0].astype(jnp.int32)
    o = oc_ref[0].astype(jnp.int32)

    # 4-neighbor sum: sublane roll with halo-row fixups for y, lane roll
    # selected by global row parity for x (ops/stencil.py; halo blocks
    # are 8 rows for sublane alignment, only the edge row is used).
    parity = stencil.row_parity_mask(ty, i * ty)
    nsum = stencil.nbr_sum(
        o,
        oup_ref[0, 7:8, :].astype(jnp.int32),
        odn_ref[0, 0:1, :].astype(jnp.int32),
        color, parity,
    )

    # s·Σnbr ∈ {-4,-2,0,2,4}; ΔE = 2·s·Σnbr, so ΔE=4 ⇔ s·Σnbr=2.
    half_de = x * nsum

    bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
    thresh = jnp.where(half_de == 2, jnp.uint32(t4), jnp.uint32(t8))
    accept = (half_de <= 0) | (bits < thresh)
    out_ref[0] = jnp.where(accept, -x, x).astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("color", "beta", "nrep", "ny", "half")
)
def _metropolis_phase(
    x: jax.Array,
    other: jax.Array,
    seeds: jax.Array,
    *,
    color: int,
    beta: float,
    nrep: int,
    ny: int,
    half: int,
) -> jax.Array:
    t4, t8 = accept_thresholds_u32(beta)
    ty = _pick_tile_rows(ny, half)
    n = ny // ty
    nb8 = ny // 8
    kernel = functools.partial(
        _phase_kernel, color=color, ty=ty, t4=t4, t8=t8
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nrep, ny, half), jnp.int8),
        grid=(nrep, n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seeds (2,)
            pl.BlockSpec((1, ty, half), lambda r, i: (r, i, 0),
                         memory_space=pltpu.VMEM),  # x (color being updated)
            pl.BlockSpec((1, ty, half), lambda r, i: (r, i, 0),
                         memory_space=pltpu.VMEM),  # other, centered
            pl.BlockSpec(
                (1, 8, half),
                lambda r, i: (r, (i * ty // 8 - 1 + nb8) % nb8, 0),
                memory_space=pltpu.VMEM,
            ),  # other: 8-row block whose LAST row is the halo row above
            pl.BlockSpec(
                (1, 8, half),
                lambda r, i: (r, ((i + 1) * ty // 8) % nb8, 0),
                memory_space=pltpu.VMEM,
            ),  # other: 8-row block whose FIRST row is the halo row below
        ],
        out_specs=pl.BlockSpec((1, ty, half), lambda r, i: (r, i, 0),
                               memory_space=pltpu.VMEM),
        input_output_aliases={1: 0},
    )(seeds, x, other, other, other)


def seeds_from_key(key: jax.Array, phase: int) -> jax.Array:
    """(2,) int32 hardware-PRNG seed derived from a threefry sweep key.

    Distinct per (sample, sweep) through the fold_in chain upstream
    (core/rng.py) and per phase/replica/tile inside the kernel."""
    data = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    return jnp.stack(
        [data[0].astype(jnp.int32),
         (data[-1]
          ^ jnp.uint32((0x9E3779B1 * (phase + 1)) & 0xFFFFFFFF)
          ).astype(jnp.int32)]
    )


def _sweep_nd(model, state: CheckerboardState, key: jax.Array
              ) -> CheckerboardState:
    ny, half = model.color_shape
    beta = float(model.beta)
    a, b = state
    batched = a.ndim == 3
    if not batched:
        a = a[None]
        b = b[None]
    nrep = a.shape[0]
    kw = dict(beta=beta, nrep=nrep, ny=ny, half=half)
    a = _metropolis_phase(a, b, seeds_from_key(key, 0), color=0, **kw)
    b = _metropolis_phase(b, a, seeds_from_key(key, 1), color=1, **kw)
    if not batched:
        a, b = a[0], b[0]
    return CheckerboardState(a, b)


def sweep(model, state: CheckerboardState, key: jax.Array
          ) -> CheckerboardState:
    """One full MCS (both colors) via the fused Pallas phase kernel.

    Accepts (ny, half) color arrays or replica-batched (R, ny, half)."""
    return _sweep_nd(model, state, key)


# ---------------------------------------------------------------------------
# halo-aware phase for the domain-sharded (shard_map) path
# ---------------------------------------------------------------------------

def _halo_phase_kernel(seed_ref, offs_ref, x_ref, oc_ref, oup_ref,
                       odn_ref, hup_ref, hdn_ref, *rest,
                       color: int, ty: int, nblk: int, t4: int, t8: int,
                       has_bits: bool, has_cols: bool = False,
                       measuring: bool = False):
    """Like _phase_kernel, but the first/last row-blocks of the LOCAL
    shard take their y-halo row from explicitly exchanged operands
    (parallel/halo.exchange_halo_rows → ppermute over ICI) instead of a
    periodic wrap of the local array — the in-kernel half of the
    promotion of the reference's update_norishiro_sub
    (/root/reference/src/ising2d_gpu_m.f90:86-106) to multi-chip.

    offs_ref = (global replica offset, global row offset) of this shard:
    seeds and checkerboard parity are derived from GLOBAL coordinates so
    shards never share a stream and x-neighbor geometry survives the
    row split.  ``has_bits``: use a random-bits operand instead of the
    hardware PRNG (CPU interpret-mode validation against the jnp path).
    ``measuring`` (phase 1 only): emit per-shard (Σs, -Σ_x s_new·nsum)
    partial sums — phase-1 nsum is the final neighbor value, so the
    separate observable pass over the local blocks fuses away (caller
    psums the partials over the mesh's spatial axis).
    """
    refs = list(rest)
    obs_ref = refs.pop() if measuring else None
    if has_cols:
        hlf_ref, hrt_ref = refs[:2]
        refs = refs[2:]
    if has_bits:
        bits_ref, out_ref = refs
    else:
        (out_ref,) = refs
    r = pl.program_id(0)
    i = pl.program_id(1)
    row_g = offs_ref[1] + i * ty

    x = x_ref[0].astype(jnp.int32)
    o = oc_ref[0].astype(jnp.int32)

    up_row = jnp.where(i == 0, hup_ref[0, 7:8, :], oup_ref[0, 7:8, :])
    dn_row = jnp.where(i == nblk - 1, hdn_ref[0, 0:1, :],
                       odn_ref[0, 0:1, :])
    parity = stencil.row_parity_mask(ty, row_g)
    if has_cols:
        nsum = stencil.nbr_sum_halo4(
            o, up_row.astype(jnp.int32), dn_row.astype(jnp.int32),
            color, parity,
            hlf_ref[0][:, 0:1].astype(jnp.int32),
            hrt_ref[0][:, 0:1].astype(jnp.int32),
        )
    else:
        nsum = stencil.nbr_sum(
            o, up_row.astype(jnp.int32), dn_row.astype(jnp.int32),
            color, parity,
        )
    half_de = x * nsum

    if has_bits:
        bits = bits_ref[0]
    else:
        rep_g = offs_ref[0] + r
        tile_tag = (row_g * jnp.int32(-1640531527)
                    + rep_g * jnp.int32(0x3C6EF35F))
        if has_cols:
            # distinct stream per x-shard: fold the global column offset
            tile_tag = tile_tag + offs_ref[2] * jnp.int32(0x27D4EB2F)
        pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)
        bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
    thresh = jnp.where(half_de == 2, jnp.uint32(t4), jnp.uint32(t8))
    accept = (half_de <= 0) | (bits < thresh)
    out = jnp.where(accept, -x, x)
    out_ref[0] = out.astype(jnp.int8)
    if measuring:
        # int32 partials: exact, so per-shard sums are independent of
        # block order (same guarantee as the packed engines' fused obs)
        m = jnp.sum(out) + jnp.sum(o)
        e = -jnp.sum(out * nsum)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lane == 0, m, jnp.where(lane == 1, e, 0))

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def sharded_phase(
    x: jax.Array,
    other: jax.Array,
    halo_up: jax.Array,
    halo_dn: jax.Array,
    seeds: jax.Array,
    offs: jax.Array,
    *,
    color: int,
    beta: float,
    halo_lf: jax.Array | None = None,
    halo_rt: jax.Array | None = None,
    bits: jax.Array | None = None,
    interpret: bool = False,
    measuring: bool = False,
):
    """One checkerboard phase of a y-sharded local block.

    x, other: (R, L, half) int8 local color blocks; halo_up/halo_dn:
    (R, 1, half) exchanged boundary rows (up = global row above row 0,
    dn = global row below row L-1); offs: (2,) int32 (rep0, row0) global
    offsets.  Call inside shard_map; the halo rows ride ICI, everything
    else stays in VMEM.  ``measuring`` additionally returns per-shard
    (m, e) partial sums of shape (R,) each (phase 1 only).

    ``halo_lf``/``halo_rt`` ((R, L, 1), with offs extended to
    (rep0, row0, col0)): exchanged boundary COLUMNS for an x-sharded
    block — the full (dx, dy) decomposition of SURVEY.md §5.7; lane
    rolls are fixed up at the local block's column edges.
    """
    nrep, L, half = x.shape
    has_cols = halo_lf is not None
    if measuring and L * half * 2 > (2 ** 31 - 1) // 2:
        # |e partial| ≤ 2·N_local: int32 fused accumulators would wrap
        raise ValueError(
            f"local block of {L * half * 2} sites overflows the int32 "
            "fused-observable accumulators; measure with a separate "
            "reduction pass"
        )
    t4, t8 = accept_thresholds_u32(beta)
    ty = _pick_tile_rows(L, half)
    n = L // ty
    nb8 = L // 8

    if interpret and bits is None:
        # CPU interpret mode has no lowering for the hardware PRNG;
        # derive the acceptance bits with threefry outside the kernel
        # (identical statistics, different stream than on TPU)
        kb = jax.random.fold_in(
            jax.random.fold_in(
                jax.random.PRNGKey(seeds[0].astype(jnp.uint32)), seeds[1]
            ),
            offs[0] * jnp.int32(65537) + offs[1]
            + (offs[2] * jnp.int32(40503) if has_cols else 0),
        )
        bits = jax.random.bits(kb, (nrep, L, half), dtype=jnp.uint32)

    # 8-row sublane alignment for the halo operands: real row sits where
    # the in-array neighbor blocks place theirs (up → row 7, dn → row 0)
    hup = jnp.pad(halo_up, ((0, 0), (7, 0), (0, 0)))
    hdn = jnp.pad(halo_dn, ((0, 0), (0, 7), (0, 0)))

    kernel = functools.partial(
        _halo_phase_kernel, color=color, ty=ty, nblk=n, t4=t4, t8=t8,
        has_bits=bits is not None, has_cols=has_cols,
        measuring=measuring,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seeds (2,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # offs (2,) or (3,)
        pl.BlockSpec((1, ty, half), lambda r, i: (r, i, 0),
                     memory_space=pltpu.VMEM),  # x
        pl.BlockSpec((1, ty, half), lambda r, i: (r, i, 0),
                     memory_space=pltpu.VMEM),  # other, centered
        pl.BlockSpec(
            (1, 8, half),
            lambda r, i: (r, (i * ty // 8 - 1 + nb8) % nb8, 0),
            memory_space=pltpu.VMEM,
        ),  # other: block whose LAST row is the in-shard halo row above
        pl.BlockSpec(
            (1, 8, half),
            lambda r, i: (r, ((i + 1) * ty // 8) % nb8, 0),
            memory_space=pltpu.VMEM,
        ),  # other: block whose FIRST row is the in-shard halo row below
        pl.BlockSpec((1, 8, half), lambda r, i: (r, 0, 0),
                     memory_space=pltpu.VMEM),  # exchanged up halo
        pl.BlockSpec((1, 8, half), lambda r, i: (r, 0, 0),
                     memory_space=pltpu.VMEM),  # exchanged dn halo
    ]
    operands = [seeds, offs, x, other, other, other, hup, hdn]
    if has_cols:
        # 128-lane alignment: exchanged columns ride in lane 0
        col_spec = pl.BlockSpec((1, ty, 128), lambda r, i: (r, i, 0),
                                memory_space=pltpu.VMEM)
        in_specs += [col_spec, col_spec]
        operands += [
            jnp.pad(halo_lf, ((0, 0), (0, 0), (0, 127))),
            jnp.pad(halo_rt, ((0, 0), (0, 0), (0, 127))),
        ]
    if bits is not None:
        in_specs.append(
            pl.BlockSpec((1, ty, half), lambda r, i: (r, i, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(bits)
    out_shape = [jax.ShapeDtypeStruct((nrep, L, half), jnp.int8)]
    out_specs = [pl.BlockSpec((1, ty, half), lambda r, i: (r, i, 0),
                              memory_space=pltpu.VMEM)]
    if measuring:
        out_shape.append(
            jax.ShapeDtypeStruct((nrep, 1, 128), jnp.int32))
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
        return state_out, obs[:, 0, 0], obs[:, 0, 1]
    return res


def shard_pallas_ok(local_shape: tuple[int, ...]) -> bool:
    """Local (R, L, half) block shape is tileable by the halo kernel."""
    if len(local_shape) != 3:
        return False
    _, L, half = local_shape
    return half % 128 == 0 and L % _MIN_TY == 0
