"""Fused Pallas TPU kernels for the helical ("norishiro") geometries.

The reference's largest committed workloads use helical BC with ODD nx:
1001×1000 Ising2D (/root/reference/app/ising2d_gpu_relaxation.f90:8-9),
10001×10000 XY (/root/reference/app/xy2d_gpu_relaxation.f90:9-10),
501×500 clock (/root/reference/app/clock_gpu_relaxation.f90:6-13).
The dual-color dense layout of the periodic engines needs even nx, so
round 1 served these shapes with masked flat jnp — correct but 10-20×
slower (threefry RNG on the host path, half-width utilization).

TPU-native fast path: view the flat (N,) array as (ny, nx) — helical BC
is then *periodic in y* with an x-seam: right(y, nx-1) = (y+1, 0),
left(y, 0) = (y-1, nx-1) — pad lanes to W = ceil(nx/128)·128 and run
full-width checkerboard phases with the flat-index parity mask
((y+x) & 1 when nx is odd, exactly the reference's ``idx%2`` phasing,
/root/reference/src/ising2d_gpu_m.f90:155-157).  Half the lanes idle
per phase (parity masking) but RNG is the in-kernel hardware PRNG and
the small committed lattices (1001×1000 int32 ≈ 4 MB) are VMEM-resident
across S sweeps per invocation, with fused m/e measurement.

- Ising / clock: whole-lattice VMEM multisweep kernels (grid=(R,)).
- XY 10001×10000 (~400 MB/plane): streaming masked phase kernels
  (grid=(R, row-blocks)), one pallas_call per checkerboard phase,
  plus the over-relaxation reflection phase.

Dead pad lanes hold 0 and are never read for a valid site (the seam
fixups reroute the two lane-roll wraparounds through the y-shifted
planes), so Σ over the padded block is Σ over the lattice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.ops import stencil
from cuda_fortran_mc_simulation_spin_tpu.ops import trig
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    accept_thresholds_u32,
    seeds_from_key,
)

_TWO_PI = float(2.0 * np.pi)

VMEM_LATTICE_BUDGET = 8 << 20  # int32 lattice bytes for the multisweep


def lane_width(nx: int) -> int:
    return -(-nx // 128) * 128


def pick_ty(ny: int, width: int, budget: int = 1 << 20) -> int:
    """Row-tile for the block loops: the LARGEST multiple of 8 dividing
    ny with an f32/int32 block ≤ budget (small divisors like ty=8 make
    the fori overhead dominate — ny=1000 tiles as 200, not 8).

    Returns ny itself when ny has no multiple-of-8 divisor (e.g. the
    reference's 501×500 clock): the kernels then run in single-block
    mode with roll-based periodic halos (no dynamic row slicing, so no
    sublane-alignment constraint)."""
    cap = max(8, min(ny, budget // max(4 * width, 1)))
    best = 0
    for ty in range(8, cap + 1, 8):
        if ny % ty == 0:
            best = ty
    return best if best else ny


def pack(flat: jax.Array, ny: int, nx: int, dtype=jnp.int32) -> jax.Array:
    """(…, N) flat helical array -> (…, ny, W) lane-padded plane."""
    W = lane_width(nx)
    arr = flat.reshape(flat.shape[:-1] + (ny, nx)).astype(dtype)
    padw = [(0, 0)] * (arr.ndim - 1) + [(0, W - nx)]
    return jnp.pad(arr, padw)


def unpack(arr: jax.Array, nx: int, dtype) -> jax.Array:
    """(…, ny, W) plane -> (…, N) flat array."""
    sl = arr[..., :, :nx]
    return sl.reshape(sl.shape[:-2] + (-1,)).astype(dtype)


def _helical_nbrs(o, up_row, dn_row, nx, col):
    """(up, dn, left, right) neighbor planes of a full-width block with
    the helical x-seam fixups."""
    up, dn = stencil.splice_updown(o, up_row, dn_row)
    left = pltpu.roll(o, 1, axis=1)
    right = pltpu.roll(o, o.shape[1] - 1, axis=1)
    left = jnp.where(col == 0, up[:, nx - 1:nx], left)
    right = jnp.where(col == nx - 1, dn[:, 0:1], right)
    return up, dn, left, right


def _block_nbrs(g_ref, i, ty, ny, nx, col):
    """(o, up, dn, left, right, y0) of row-block i of a whole-lattice
    VMEM ref.  ty == ny (single-block mode, used when ny has no
    multiple-of-8 divisor) takes pure-roll periodic halos — no dynamic
    row slices, so no sublane-alignment requirement on ny."""
    if ty == ny:
        o = g_ref[0]
        up = pltpu.roll(o, 1, axis=0)
        dn = pltpu.roll(o, ny - 1, axis=0)
        left = pltpu.roll(o, 1, axis=1)
        right = pltpu.roll(o, o.shape[1] - 1, axis=1)
        left = jnp.where(col == 0, up[:, nx - 1:nx], left)
        right = jnp.where(col == nx - 1, dn[:, 0:1], right)
        return o, up, dn, left, right, 0
    y0 = pl.multiple_of(i * ty, 8)
    o = g_ref[0, pl.ds(y0, ty), :]
    up_row = stencil.load_row_aligned(g_ref, (i * ty - 8 + ny) % ny, 7)
    dn_row = stencil.load_row_aligned(g_ref, (i * ty + ty) % ny, 0)
    up, dn, left, right = _helical_nbrs(o, up_row, dn_row, nx, col)
    return o, up, dn, left, right, y0


def _block_write(g_ref, i, ty, ny, new):
    if ty == ny:
        g_ref[0] = new
    else:
        g_ref[0, pl.ds(pl.multiple_of(i * ty, 8), ty), :] = new


# ---------------------------------------------------------------------------
# Ising helical: VMEM-resident multisweep (the 1001×1000 workload class)
# ---------------------------------------------------------------------------

def ising_fits_vmem(ny: int, nx: int) -> bool:
    return 4 * ny * lane_width(nx) <= VMEM_LATTICE_BUDGET


def single_block_ok(ny: int, nx: int) -> bool:
    """Single-block mode (ny % 8 != 0) keeps ~12 whole-lattice f32/int32
    temporaries live; require them to fit VMEM."""
    return 12 * 4 * ny * lane_width(nx) <= (14 << 20)


def _ising_kernel(seed_ref, g_in, g_out, obs_ref, g_ref,
                  *, sweeps: int, ty: int, ny: int, nx: int, W: int,
                  t4: int, t8: int):
    r = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ (r * jnp.int32(0x3C6EF35F)))
    nblk = ny // ty
    # lattice rides HBM↔VMEM as int8; the working copy is ONE int32
    # scratch (no double-buffered int32 pipeline blocks — the previous
    # int32-in/out form put ty=200 1.6M over the 16M scoped-VMEM limit)
    g_ref[0] = g_in[0].astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (ty, W), 1)
    valid = col < nx

    def phase(offset, measuring, carry):
        def blk(i, acc):
            m_acc, e_acc = acc
            o, up, dn, left, right, y0 = _block_nbrs(
                g_ref, i, ty, ny, nx, col
            )
            nsum = up + dn + left + right
            half_de = o * nsum
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((ty, W)), jnp.uint32
            )
            thresh = jnp.where(half_de == 2, jnp.uint32(t4),
                               jnp.uint32(t8))
            rowi = jax.lax.broadcasted_iota(jnp.int32, (ty, 1), 0) + y0
            pmask = (((rowi + col) & 1) == offset) & valid
            accept = pmask & ((half_de <= 0) | (bits < thresh))
            out = jnp.where(accept, -o, o)
            _block_write(g_ref, i, ty, ny, out)
            if measuring:
                # phase-1 nsum is the FINAL neighbor value (parity-0
                # sites are untouched by this phase) and bonds connect
                # opposite parities, so -Σ_{p1} s_new·nsum is the exact
                # final bond energy (each bond once) — the measurement
                # pass fuses away
                m_acc = m_acc + jnp.sum(out)
                e_acc = e_acc - jnp.sum(jnp.where(pmask, out * nsum, 0))
            return m_acc, e_acc

        return jax.lax.fori_loop(0, nblk, blk, carry)

    def sweep_body(s, _):
        zero2 = (jnp.int32(0), jnp.int32(0))
        phase(0, False, zero2)
        m, e = phase(1, True, zero2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(
            lane == 0, m.astype(jnp.float32),
            jnp.where(lane == 1, e.astype(jnp.float32), 0.0),
        )
        obs_ref[0, pl.ds(s, 1), :] = row
        return 0

    jax.lax.fori_loop(0, sweeps, sweep_body, 0)
    g_out[0] = g_ref[0].astype(jnp.int8)


@functools.partial(
    jax.jit, static_argnames=("sweeps", "beta", "nrep", "ny", "nx")
)
def _ising_multisweep(g, seeds, *, sweeps, beta, nrep, ny, nx):
    W = lane_width(nx)
    t4, t8 = accept_thresholds_u32(beta)
    ty = pick_ty(ny, W)
    kernel = functools.partial(
        _ising_kernel, sweeps=sweeps, ty=ty, ny=ny, nx=nx, W=W,
        t4=t4, t8=t8,
    )
    lat = pl.BlockSpec((1, ny, W), lambda r: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    obs = pl.BlockSpec((1, sweeps, 128), lambda r: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nrep, ny, W), jnp.int8),
            jax.ShapeDtypeStruct((nrep, sweeps, 128), jnp.float32),
        ),
        grid=(nrep,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), lat],
        out_specs=(lat, obs),
        scratch_shapes=[pltpu.VMEM((1, ny, W), jnp.int32)],
        input_output_aliases={1: 0},
    )(seeds, g)


def ising_multisweep(model, flat: jax.Array, key: jax.Array, sweeps: int):
    """Advance ``sweeps`` MCS on a helical Ising lattice; returns
    (flat', {"m": (R,S), "e": (R,S)}) densities.  flat: (N,) or (R, N)
    int8."""
    ny, nx = model.ny, model.nx
    if not ising_fits_vmem(ny, nx):
        raise ValueError("helical lattice exceeds the VMEM multisweep")
    batched = flat.ndim == 2
    if not batched:
        flat = flat[None]
    g = pack(flat, ny, nx, jnp.int8)
    g, obs = _ising_multisweep(
        g, seeds_from_key(key, 0), sweeps=sweeps,
        beta=float(model.beta), nrep=g.shape[0], ny=ny, nx=nx,
    )
    out = unpack(g, nx, jnp.int8)
    n_inv = jnp.float32(1.0 / model.nsites)
    m = obs[:, :, 0] * n_inv
    e = obs[:, :, 1] * n_inv
    if not batched:
        out, m, e = out[0], m[0], e[0]
    return out, {"m": m, "e": e}


# ---------------------------------------------------------------------------
# Clock helical: VMEM-resident multisweep (the 501×500 workload class)
# ---------------------------------------------------------------------------

def _clock_kernel(seed_ref, g_in, g_ref, obs_ref,
                  *, sweeps: int, ty: int, ny: int, nx: int, W: int,
                  q: int, beta: float):
    r = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ (r * jnp.int32(0x3C6EF35F)))
    nblk = ny // ty
    g_ref[0] = g_in[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (ty, W), 1)
    valid = col < nx
    inv_q = jnp.float32(1.0 / q)

    def cs(k):
        # decode via the quarter-period polynomial (ops/trig.py): the
        # VPU cos/sin pair costs more than the rest of the decode
        return trig.cos_sin_2pi(k.astype(jnp.float32) * inv_q)

    def decoded_nbrs(i):
        """Decode the block's (cos, sin) ONCE and derive all four
        neighbor planes by rolling the decoded planes (the naive form
        decodes five int planes per phase — transcendental-bound)."""
        if ty == ny:
            o = g_ref[0]
            co, so = cs(o)
            up_c = pltpu.roll(co, 1, axis=0)
            up_s = pltpu.roll(so, 1, axis=0)
            dn_c = pltpu.roll(co, ny - 1, axis=0)
            dn_s = pltpu.roll(so, ny - 1, axis=0)
        else:
            y0 = pl.multiple_of(i * ty, 8)
            o = g_ref[0, pl.ds(y0, ty), :]
            co, so = cs(o)
            up_row = stencil.load_row_aligned(
                g_ref, (i * ty - 8 + ny) % ny, 7)
            dn_row = stencil.load_row_aligned(
                g_ref, (i * ty + ty) % ny, 0)
            cu, su = cs(up_row)
            cdr, sdr = cs(dn_row)
            up_c, dn_c = stencil.splice_updown(co, cu, cdr)
            up_s, dn_s = stencil.splice_updown(so, su, sdr)
        l_c = pltpu.roll(co, 1, axis=1)
        l_s = pltpu.roll(so, 1, axis=1)
        r_c = pltpu.roll(co, W - 1, axis=1)
        r_s = pltpu.roll(so, W - 1, axis=1)
        l_c = jnp.where(col == 0, up_c[:, nx - 1:nx], l_c)
        l_s = jnp.where(col == 0, up_s[:, nx - 1:nx], l_s)
        r_c = jnp.where(col == nx - 1, dn_c[:, 0:1], r_c)
        r_s = jnp.where(col == nx - 1, dn_s[:, 0:1], r_s)
        hx = up_c + dn_c + l_c + r_c
        hy = up_s + dn_s + l_s + r_s
        y0 = 0 if ty == ny else pl.multiple_of(i * ty, 8)
        return o, co, so, hx, hy, (r_c, r_s, dn_c, dn_s), y0

    def phase(offset, measuring, carry):
        def blk(i, acc):
            mx_a, my_a, e_a = acc
            o, cx, sx, hx, hy, _, y0 = decoded_nbrs(i)
            # candidate excludes the current state: c + ceil(u(q-1)) mod q
            # (/root/reference/src/clock/clock_tableall_gpu_m.f90:142-143)
            u_c = stencil.bits_to_uniform(pltpu.bitcast(
                pltpu.prng_random_bits((ty, W)), jnp.uint32))
            off = (u_c * (q - 1)).astype(jnp.int32) + 1
            new = o + off
            new = jnp.where(new >= q, new - q, new)
            cn, sn = cs(new)
            de = -((cn - cx) * hx + (sn - sx) * hy)
            p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))
            u_a = stencil.bits_to_uniform(pltpu.bitcast(
                pltpu.prng_random_bits((ty, W)), jnp.uint32))
            rowi = jax.lax.broadcasted_iota(jnp.int32, (ty, 1), 0) + y0
            pmask = (((rowi + col) & 1) == offset) & valid
            accept = pmask & (u_a < p)
            _block_write(g_ref, i, ty, ny, jnp.where(accept, new, o))
            if measuring:
                # as in the Ising kernel: phase-1 h is the final field,
                # bonds connect opposite parities — measure in-phase
                fin_c = jnp.where(accept, cn, cx)
                fin_s = jnp.where(accept, sn, sx)
                vm = valid.astype(jnp.float32)
                mx_a = mx_a + jnp.sum(fin_c * vm)
                my_a = my_a + jnp.sum(fin_s * vm)
                e_a = e_a - jnp.sum(jnp.where(
                    pmask, fin_c * hx + fin_s * hy, 0.0))
            return mx_a, my_a, e_a

        return jax.lax.fori_loop(0, nblk, blk, carry)

    def sweep_body(s, _):
        zero3 = (jnp.float32(0), jnp.float32(0), jnp.float32(0))
        phase(0, False, zero3)
        mx, my, e = phase(1, True, zero3)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(
            lane == 0, mx,
            jnp.where(lane == 1, my, jnp.where(lane == 2, e, 0.0)),
        )
        obs_ref[0, pl.ds(s, 1), :] = row
        return 0

    jax.lax.fori_loop(0, sweeps, sweep_body, 0)


@functools.partial(
    jax.jit, static_argnames=("sweeps", "beta", "q", "nrep", "ny", "nx")
)
def _clock_multisweep(g, seeds, *, sweeps, beta, q, nrep, ny, nx):
    W = lane_width(nx)
    ty = pick_ty(ny, W, budget=512 << 10)
    kernel = functools.partial(
        _clock_kernel, sweeps=sweeps, ty=ty, ny=ny, nx=nx, W=W,
        q=q, beta=beta,
    )
    lat = pl.BlockSpec((1, ny, W), lambda r: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    obs = pl.BlockSpec((1, sweeps, 128), lambda r: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nrep, ny, W), jnp.int32),
            jax.ShapeDtypeStruct((nrep, sweeps, 128), jnp.float32),
        ),
        grid=(nrep,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), lat],
        out_specs=(lat, obs),
        input_output_aliases={1: 0},
    )(seeds, g)


def clock_multisweep(model, flat: jax.Array, key: jax.Array, sweeps: int):
    """(flat', {"m","my","e"}) for the helical q-state clock."""
    ny, nx = model.ny, model.nx
    if not ising_fits_vmem(ny, nx):
        raise ValueError("helical lattice exceeds the VMEM multisweep")
    batched = flat.ndim == 2
    if not batched:
        flat = flat[None]
    g = pack(flat, ny, nx)
    g, obs = _clock_multisweep(
        g, seeds_from_key(key, 0), sweeps=sweeps,
        beta=float(model.beta), q=int(model.q), nrep=g.shape[0],
        ny=ny, nx=nx,
    )
    out = unpack(g, nx, jnp.int8)
    n_inv = jnp.float32(1.0 / model.nsites)
    series = {
        "m": obs[:, :, 0] * n_inv,
        "my": obs[:, :, 1] * n_inv,
        "e": obs[:, :, 2] * n_inv,
    }
    if not batched:
        out = out[0]
        series = {k: v[0] for k, v in series.items()}
    return out, series


# ---------------------------------------------------------------------------
# XY helical: streaming masked phase kernels (the 10001×10000 class)
# ---------------------------------------------------------------------------

def _xy_phase_kernel(seed_ref, sx_ref, sxu_ref, sxd_ref,
                     sy_ref, syu_ref, syd_ref,
                     outx_ref, outy_ref, *rest,
                     offset: int, ty: int, nx: int, W: int,
                     beta: float, measuring: bool = False):
    r = pl.program_id(0)
    i = pl.program_id(1)
    tile_tag = (i * jnp.int32(-1640531527)
                + r * jnp.int32(0x3C6EF35F)
                + jnp.int32(offset * 0x632BE59B))
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ tile_tag)
    col = jax.lax.broadcasted_iota(jnp.int32, (ty, W), 1)
    valid = col < nx

    sx = sx_ref[0]
    sy = sy_ref[0]
    upx, dnx, lx, rx = _helical_nbrs(
        sx, sxu_ref[0, 7:8, :], sxd_ref[0, 0:1, :], nx, col
    )
    upy, dny, ly, ry = _helical_nbrs(
        sy, syu_ref[0, 7:8, :], syd_ref[0, 0:1, :], nx, col
    )
    hx = upx + dnx + lx + rx
    hy = upy + dny + ly + ry

    u_cand = stencil.bits_to_uniform(
        pltpu.bitcast(pltpu.prng_random_bits((ty, W)), jnp.uint32)
    )
    cx, cy = trig.cos_sin_2pi(u_cand)
    de = -((cx - sx) * hx + (cy - sy) * hy)
    p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))
    u_acc = stencil.bits_to_uniform(
        pltpu.bitcast(pltpu.prng_random_bits((ty, W)), jnp.uint32)
    )
    rowi = (jax.lax.broadcasted_iota(jnp.int32, (ty, 1), 0)
            + pl.multiple_of(i * ty, 8))
    pmask = (((rowi + col) & 1) == offset) & valid
    accept = pmask & (u_acc < p)
    fin_x = jnp.where(accept, cx, sx)
    fin_y = jnp.where(accept, cy, sy)
    outx_ref[0] = fin_x
    outy_ref[0] = fin_y
    if measuring:
        # offset-1 measurement is exact for the final state: the field
        # comes from final parity-0 values and each bond appears once
        # in Σ_{p1} S·h — saves the separate per-sweep XLA measurement
        # pass over the (possibly ~400MB) planes
        (obs_ref,) = rest
        vm = valid.astype(jnp.float32)
        mx = jnp.sum(fin_x * vm)
        my = jnp.sum(fin_y * vm)
        e = -jnp.sum(jnp.where(pmask, fin_x * hx + fin_y * hy, 0.0))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(
            lane == 0, mx,
            jnp.where(lane == 1, my, jnp.where(lane == 2, e, 0.0)),
        )

        @pl.when(i == 0)
        def _():
            obs_ref[0] = jnp.zeros_like(obs_ref[0])

        obs_ref[0] = obs_ref[0] + row


def _xy_or_kernel(sx_ref, sxu_ref, sxd_ref,
                  sy_ref, syu_ref, syd_ref,
                  outx_ref, outy_ref,
                  *, offset: int, ty: int, nx: int, W: int):
    i = pl.program_id(1)
    col = jax.lax.broadcasted_iota(jnp.int32, (ty, W), 1)
    valid = col < nx
    sx = sx_ref[0]
    sy = sy_ref[0]
    upx, dnx, lx, rx = _helical_nbrs(
        sx, sxu_ref[0, 7:8, :], sxd_ref[0, 0:1, :], nx, col
    )
    upy, dny, ly, ry = _helical_nbrs(
        sy, syu_ref[0, 7:8, :], syd_ref[0, 0:1, :], nx, col
    )
    hx = upx + dnx + lx + rx
    hy = upy + dny + ly + ry
    inv = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy, jnp.float32(1e-30)))
    nxh = hx * inv
    nyh = hy * inv
    d = 2.0 * (sx * nxh + sy * nyh)
    rx_ = d * nxh - sx
    ry_ = d * nyh - sy
    rinv = jax.lax.rsqrt(
        jnp.maximum(rx_ * rx_ + ry_ * ry_, jnp.float32(1e-30))
    )
    rowi = (jax.lax.broadcasted_iota(jnp.int32, (ty, 1), 0)
            + pl.multiple_of(i * ty, 8))
    pmask = (((rowi + col) & 1) == offset) & valid
    outx_ref[0] = jnp.where(pmask, rx_ * rinv, sx)
    outy_ref[0] = jnp.where(pmask, ry_ * rinv, sy)


def _xy_specs(ty: int, ny: int, W: int):
    nb8 = ny // 8
    center = pl.BlockSpec((1, ty, W), lambda r, i: (r, i, 0),
                          memory_space=pltpu.VMEM)
    up = pl.BlockSpec(
        (1, 8, W), lambda r, i: (r, (i * ty // 8 - 1 + nb8) % nb8, 0),
        memory_space=pltpu.VMEM,
    )
    dn = pl.BlockSpec(
        (1, 8, W), lambda r, i: (r, ((i + 1) * ty // 8) % nb8, 0),
        memory_space=pltpu.VMEM,
    )
    return center, up, dn


@functools.partial(
    jax.jit,
    static_argnames=("offset", "beta", "nrep", "ny", "nx", "measuring"),
)
def _xy_phase(sx, sy, seeds, *, offset, beta, nrep, ny, nx,
              measuring=False):
    W = sx.shape[-1]
    ty = pick_ty(ny, W, budget=1 << 20)
    n = ny // ty
    center, up, dn = _xy_specs(ty, ny, W)
    kernel = functools.partial(
        _xy_phase_kernel, offset=offset, ty=ty, nx=nx, W=W, beta=beta,
        measuring=measuring,
    )
    out_shape = [
        jax.ShapeDtypeStruct((nrep, ny, W), jnp.float32),
        jax.ShapeDtypeStruct((nrep, ny, W), jnp.float32),
    ]
    out_specs = [center, center]
    if measuring:
        out_shape.append(jax.ShapeDtypeStruct((nrep, 1, 128),
                                              jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, 128),
                                      lambda r, i: (r, 0, 0),
                                      memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(nrep, n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            center, up, dn,
            center, up, dn,
        ],
        out_specs=tuple(out_specs),
    )(seeds, sx, sx, sx, sy, sy, sy)


@functools.partial(
    jax.jit, static_argnames=("offset", "nrep", "ny", "nx")
)
def _xy_or_phase(sx, sy, *, offset, nrep, ny, nx):
    W = sx.shape[-1]
    ty = pick_ty(ny, W, budget=1 << 20)
    n = ny // ty
    center, up, dn = _xy_specs(ty, ny, W)
    kernel = functools.partial(
        _xy_or_kernel, offset=offset, ty=ty, nx=nx, W=W
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nrep, ny, W), jnp.float32),
            jax.ShapeDtypeStruct((nrep, ny, W), jnp.float32),
        ),
        grid=(nrep, n),
        in_specs=[
            center, up, dn,
            center, up, dn,
        ],
        out_specs=(center, center),
    )(sx, sx, sx, sy, sy, sy)


def xy_sweep_packed(model, sx, sy, key):
    """One MCS on packed (R, ny, W) component planes.

    Mirrors the jnp engine's random structure loosely (independent
    in-kernel streams per phase; the jnp path shares one batch across
    phases, /root/reference/src/xy2d_gpu_m.f90:139-156 — identical
    statistics either way since the phases touch disjoint sites)."""
    kw = dict(beta=float(model.beta), nrep=sx.shape[0], ny=model.ny,
              nx=model.nx)
    sx, sy = _xy_phase(sx, sy, seeds_from_key(key, 0), offset=0, **kw)
    sx, sy = _xy_phase(sx, sy, seeds_from_key(key, 1), offset=1, **kw)
    return sx, sy


def xy_sweep_measure_packed(model, sx, sy, key):
    """One MCS + fused (m, my, e) measurement in the offset-1 phase —
    saves the separate per-sweep observable pass over the planes.
    Returns (sx, sy, {m, my, e}) with observable densities (R,)."""
    kw = dict(beta=float(model.beta), nrep=sx.shape[0], ny=model.ny,
              nx=model.nx)
    sx, sy = _xy_phase(sx, sy, seeds_from_key(key, 0), offset=0, **kw)
    sx, sy, obs = _xy_phase(sx, sy, seeds_from_key(key, 1), offset=1,
                            measuring=True, **kw)
    n_inv = jnp.float32(1.0 / model.nsites)
    return sx, sy, {
        "m": obs[:, 0, 0] * n_inv,
        "my": obs[:, 0, 1] * n_inv,
        "e": obs[:, 0, 2] * n_inv,
    }


def xy_over_relax_sweep_packed(model, sx, sy):
    kw = dict(nrep=sx.shape[0], ny=model.ny, nx=model.nx)
    sx, sy = _xy_or_phase(sx, sy, offset=0, **kw)
    sx, sy = _xy_or_phase(sx, sy, offset=1, **kw)
    return sx, sy


def xy_pack_state(state, ny: int, nx: int):
    """((R,N),(R,N)) flat XY planes -> packed (R, ny, W) planes."""
    return (pack(state[0], ny, nx, jnp.float32),
            pack(state[1], ny, nx, jnp.float32))


def xy_unpack_state(sx, sy, nx: int):
    return (unpack(sx, nx, jnp.float32), unpack(sy, nx, jnp.float32))


def xy_observables_packed(model, sx, sy):
    """{m, my, e} densities on packed planes — pads are 0 so plain sums
    see only the lattice; the x-seam of the e-bond right neighbor is
    rerouted through the row-down plane."""
    nx = model.nx
    dnx = jnp.roll(sx, -1, axis=-2)
    dny = jnp.roll(sy, -1, axis=-2)
    rx = jnp.roll(sx, -1, axis=-1).at[..., nx - 1].set(dnx[..., 0])
    ry = jnp.roll(sy, -1, axis=-1).at[..., nx - 1].set(dny[..., 0])
    n_inv = jnp.float32(1.0 / model.nsites)
    e = -jnp.sum(sx * (rx + dnx) + sy * (ry + dny), axis=(-2, -1))
    return {
        "m": jnp.sum(sx, axis=(-2, -1)) * n_inv,
        "my": jnp.sum(sy, axis=(-2, -1)) * n_inv,
        "e": e * n_inv,
    }
