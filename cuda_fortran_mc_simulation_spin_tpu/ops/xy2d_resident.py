"""VMEM-resident multisweep for the PERIODIC XY engine.

The reference's richest committed workload — 1500² × 10⁵ MCS × 2222
samples from disorder with per-sweep (m_x, m_y, e, A)
(/root/reference/app/xy2d_periodic_gpu_relaxation_from_disorder.f90:
9-15,39-61) — maps poorly onto the per-phase streaming kernels: each
MCS re-reads the whole state (and the t=0 snapshot for A) from HBM
~16 times (BENCHMARKS.md:124, "this path is HBM-bound"), and the
literal nx/2 = 750 lane count fails the streaming kernels' 128-lane
tiling gate, dropping the literal geometry to the jnp engine.

Here the WHOLE state — four (ny, W) f32 component planes + the four
snapshot planes — stays resident in VMEM for S MCS per kernel
invocation, like every packed Ising/clock engine already does
(ops/helical_multispin.py, ops/clock_multispin.py).  Zero HBM lattice
traffic between sweeps; per-sweep (Σmx, Σmy, e, A) fuse into phase b
(its field h is built from FINAL phase-a values, so each bond appears
once in Σ_b S·h — the identity every fused engine here uses).

Lanes pad nc = nx/2 up to 128 with zeros; the periodic x-wrap is two
seam substitutions on the lane rolls (lane 0's `minus` = lane nc-1,
lane nc-1's `plus` = lane 0), so any even nx serves — including the
literal 750.  Row rolls wrap the full ny (single-block mode: ny need
not be a multiple of 8, the 501×500 clock precedent).  Pad lanes never
update and start at zero, so whole-plane reductions need no masks.

Layout/stencil identical to core/lattice.py's canonical checkerboard
(color 0 at (y, 2i + (y&1))); the injectable-uniform oracle is pinned
bitwise against XY2D._phase (tests/test_xy2d_resident.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_fortran_mc_simulation_spin_tpu.ops import stencil, trig
from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
    seeds_from_key,
)

LANES = 128

# resident planes (4 state + 4 snapshot, in/out aliased) + ~8 transient
# whole planes per phase must fit VMEM (v5e: 128M); cap the plane set
# at 48M so temporaries and double-buffering headroom stay safe
_PLANE_BUDGET_BYTES = 48 * 1024 * 1024


def plane_width(half: int) -> int:
    return -(-half // LANES) * LANES


def fits(model, snapshot: bool = True) -> bool:
    """True when the resident multisweep serves this geometry."""
    if model.nx % 2 or model.ny % 2:
        return False
    w = plane_width(model.nx // 2)
    n_planes = 8 if snapshot else 4
    return n_planes * model.ny * w * 4 <= _PLANE_BUDGET_BYTES


def pad_planes(state, half: int):
    """XYState-like 4-tuple of (..., ny, half) -> (..., ny, W) planes,
    zero-padded lanes."""
    w = plane_width(half)
    pad = [(0, 0)] * (state[0].ndim - 1) + [(0, w - half)]
    return tuple(jnp.pad(p, pad) for p in state)


def unpad_planes(planes, half: int):
    return tuple(p[..., :half] for p in planes)


# ---------------------------------------------------------------------------
# shared stencil algebra (kernel + jnp oracle)
# ---------------------------------------------------------------------------

def _field(o, color, nc, col, odd_row, roll):
    """Σ of the 4 other-color neighbor values on padded planes.

    ``roll(x, k, axis)`` must satisfy out(i) = in(i - k) (the jnp.roll
    convention).  Mirrors core/lattice.neighbor_sums with the periodic
    x-wrap as seam substitutions at lanes 0 / nc-1."""
    w = o.shape[-1]
    up = roll(o, 1, 0)
    dn = roll(o, -1, 0)
    minus = roll(o, 1, 1)
    plus = roll(o, -1, 1)
    minus = jnp.where(col == 0, o[:, nc - 1:nc], minus)
    plus = jnp.where(col == nc - 1, o[:, 0:1], plus)
    if color == 0:
        lr = o + jnp.where(odd_row, plus, minus)
    else:
        lr = o + jnp.where(odd_row, minus, plus)
    return up + dn + lr


def _roll_jnp(x, k, axis):
    return jnp.roll(x, k, axis=axis)


def _roll_tpu(x, k, axis):
    return pltpu.roll(x, k % x.shape[axis], axis=axis)


def _iotas(ny, w):
    col = jax.lax.broadcasted_iota(jnp.int32, (ny, w), 1)
    odd_row = (jax.lax.broadcasted_iota(jnp.int32, (ny, 1), 0) & 1) == 1
    return col, odd_row


def phase_reference(sx, sy, ox, oy, color, u_cand, u_acc, beta, nc):
    """Pure-jnp Metropolis phase on padded (ny, W) planes — bitwise the
    kernel's decision given the same uniforms, and equal to
    XY2D._phase on the valid lanes (pinned by test)."""
    ny, w = sx.shape
    col, odd_row = _iotas(ny, w)
    hx = _field(ox, color, nc, col, odd_row, _roll_jnp)
    hy = _field(oy, color, nc, col, odd_row, _roll_jnp)
    cx, cy = trig.cos_sin_2pi(u_cand)
    de = -((cx - sx) * hx + (cy - sy) * hy)
    p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))
    accept = (col < nc) & (u_acc < p)
    return jnp.where(accept, cx, sx), jnp.where(accept, cy, sy)


# ---------------------------------------------------------------------------
# injectable-uniform single phase (bitwise testable, interpret-able)
# ---------------------------------------------------------------------------

def _phase_bits_kernel(sx_ref, sy_ref, ox_ref, oy_ref, uc_ref, ua_ref,
                       outx_ref, outy_ref, *, color, beta, nc):
    ny, w = sx_ref.shape[1:]
    col, odd_row = _iotas(ny, w)
    ox = ox_ref[0]
    oy = oy_ref[0]
    hx = _field(ox, color, nc, col, odd_row, _roll_tpu)
    hy = _field(oy, color, nc, col, odd_row, _roll_tpu)
    sx = sx_ref[0]
    sy = sy_ref[0]
    cx, cy = trig.cos_sin_2pi(uc_ref[0])
    de = -((cx - sx) * hx + (cy - sy) * hy)
    p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))
    accept = (col < nc) & (ua_ref[0] < p)
    outx_ref[0] = jnp.where(accept, cx, sx)
    outy_ref[0] = jnp.where(accept, cy, sy)


def phase_with_bits(sx, sy, ox, oy, u_cand, u_acc, *, color, beta, nc,
                    interpret: bool = False):
    """(R, ny, W) padded phase with injected uniforms — exercises the
    in-kernel roll/seam path (interpret on CPU, Mosaic on TPU)."""
    nrep, ny, w = sx.shape
    blk = pl.BlockSpec((1, ny, w), lambda r: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    kernel = functools.partial(_phase_bits_kernel, color=color,
                               beta=float(beta), nc=nc)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((nrep, ny, w), jnp.float32),
                   jax.ShapeDtypeStruct((nrep, ny, w), jnp.float32)),
        grid=(nrep,),
        in_specs=[blk] * 6,
        out_specs=(blk, blk),
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(sx, sy, ox, oy, u_cand, u_acc)


# ---------------------------------------------------------------------------
# resident multisweep
# ---------------------------------------------------------------------------

def _ms_kernel(seed_ref, axi, ayi, bxi, byi, *rest, sweeps, beta, nc,
               ny, w, track_a):
    refs = list(rest)
    obs_ref = refs.pop()
    ax_ref, ay_ref, bx_ref, by_ref = refs[-4:]
    snaps = refs[:-4]
    r = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0],
                    seed_ref[1] ^ (r * jnp.int32(0x3C6EF35F)))
    ax_ref[0] = axi[0]
    ay_ref[0] = ayi[0]
    bx_ref[0] = bxi[0]
    by_ref[0] = byi[0]
    col, odd_row = _iotas(ny, w)
    valid = col < nc

    def gen_u():
        return stencil.bits_to_uniform(pltpu.bitcast(
            pltpu.prng_random_bits((ny, w)), jnp.uint32))

    def metro(sx, sy, ox, oy, color):
        hx = _field(ox, color, nc, col, odd_row, _roll_tpu)
        hy = _field(oy, color, nc, col, odd_row, _roll_tpu)
        cx, cy = trig.cos_sin_2pi(gen_u())
        de = -((cx - sx) * hx + (cy - sy) * hy)
        p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))
        accept = valid & (gen_u() < p)
        return (jnp.where(accept, cx, sx), jnp.where(accept, cy, sy),
                hx, hy)

    def body(s, _):
        ax, ay, _, _ = metro(ax_ref[0], ay_ref[0], bx_ref[0], by_ref[0],
                             0)
        ax_ref[0] = ax
        ay_ref[0] = ay
        bx, by, hx, hy = metro(bx_ref[0], by_ref[0], ax, ay, 1)
        bx_ref[0] = bx
        by_ref[0] = by
        # fused obs: h is built from FINAL a, each bond once in Σ_b S·h;
        # pad lanes are zero in every plane, so no masks needed
        mx = jnp.sum(ax) + jnp.sum(bx)
        my = jnp.sum(ay) + jnp.sum(by)
        e = -jnp.sum(bx * hx + by * hy)
        if track_a:
            sax, say, sbx, sby = (ref[0] for ref in snaps)
            a_sum = (jnp.sum(ax * sax) + jnp.sum(ay * say)
                     + jnp.sum(bx * sbx) + jnp.sum(by * sby))
        else:
            a_sum = jnp.float32(0.0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(
            lane == 0, mx,
            jnp.where(lane == 1, my,
                      jnp.where(lane == 2, e,
                                jnp.where(lane == 3, a_sum, 0.0))))
        obs_ref[0, pl.ds(s, 1), :] = row
        return 0

    jax.lax.fori_loop(0, sweeps, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("sweeps", "beta", "nc", "ny", "w", "nrep",
                     "track_a"),
)
def _multisweep(planes, snaps, seeds, *, sweeps, beta, nc, ny, w, nrep,
                track_a):
    kernel = functools.partial(
        _ms_kernel, sweeps=sweeps, beta=beta, nc=nc, ny=ny, w=w,
        track_a=track_a,
    )
    plane = pl.BlockSpec((1, ny, w), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM)
    obs = pl.BlockSpec((1, sweeps, 128), lambda r: (r, 0, 0),
                       memory_space=pltpu.VMEM)
    n_snap = 4 if track_a else 0
    operands = list(planes) + (list(snaps) if track_a else [])
    return pl.pallas_call(
        kernel,
        out_shape=(
            tuple(jax.ShapeDtypeStruct((nrep, ny, w), jnp.float32)
                  for _ in range(4))
            + (jax.ShapeDtypeStruct((nrep, sweeps, 128), jnp.float32),)
        ),
        grid=(nrep,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [plane] * (4 + n_snap),
        out_specs=(plane,) * 4 + (obs,),
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(seeds, *operands)


def multisweep(model, planes, snaps, key, sweeps: int):
    """Advance ``sweeps`` MCS on resident padded planes; returns
    (planes, {mx, my, e, A} densities (R, sweeps)).  ``snaps=None``
    skips the autocorrelation (plain relaxation/samples schedules)."""
    nrep, ny, w = planes[0].shape
    track_a = snaps is not None
    out = _multisweep(
        tuple(planes), tuple(snaps) if track_a else (),
        seeds_from_key(key, 0), sweeps=sweeps,
        beta=float(model.beta), nc=model.nx // 2, ny=ny, w=w,
        nrep=nrep, track_a=track_a,
    )
    planes = out[:4]
    obs = out[4]
    n_inv = jnp.float32(1.0 / model.nsites)
    res = {
        "mx": obs[:, :, 0] * n_inv,
        "my": obs[:, :, 1] * n_inv,
        "e": obs[:, :, 2] * n_inv,
    }
    if track_a:
        res["A"] = obs[:, :, 3] * n_inv
    return planes, res


def observables(model, planes):
    """{mx, my, e} densities from padded planes (jnp pass — for rows
    the kernel cannot fuse, e.g. the fix1mcs t=1 re-measurement)."""
    ax, ay, bx, by = planes
    ny, w = ax.shape[-2:]
    nc = model.nx // 2
    col, odd_row = _iotas(ny, w)

    def e_rep(axr, ayr, bxr, byr):
        hx = _field(axr, 1, nc, col, odd_row, _roll_jnp)
        hy = _field(ayr, 1, nc, col, odd_row, _roll_jnp)
        return -jnp.sum(bxr * hx + byr * hy)

    n_inv = jnp.float32(1.0 / model.nsites)
    return {
        "mx": jnp.sum(ax + bx, axis=(-2, -1)) * n_inv,
        "my": jnp.sum(ay + by, axis=(-2, -1)) * n_inv,
        "e": jax.vmap(e_rep)(ax, ay, bx, by) * n_inv,
    }


def autocorr(model, planes, snaps):
    """A density = Σ S(t)·S(0) / N from padded planes."""
    tot = sum(jnp.sum(p * s, axis=(-2, -1))
              for p, s in zip(planes, snaps))
    return tot * jnp.float32(1.0 / model.nsites)
