"""Multi-chip lattice domain decomposition (dp × y [× x] mesh) — all
models.

Shards the lattice's row dimension across the ``y`` mesh axis (and
optionally the color-array columns across ``x`` — the full (dx, dy)
decomposition of SURVEY.md §5.7) with `ppermute` halo exchange
(parallel/halo.py), and an independent-replica axis across ``dp`` —
the parallelism strategies that are meaningful for this workload
(SURVEY.md §2.4: the reference has no tensor/pipeline/expert
parallelism to promote; replicas are pure DP, the lattice-domain axes
are the spatial analog of sequence parallelism).

State layout: each color array/plane carries a leading replica axis —
``(R, ny, nx//2)`` sharded ``P("dp", "y", None)``.  One call to the
returned step function advances every replica by one MCS and returns
per-replica observables (psum over the ``y`` axis), all inside a single
jitted shard_map program: the only cross-chip traffic per sweep is two
boundary rows per phase over ICI plus scalar reductions.

Scaling note: lattice extent beyond one chip's HBM was the reference's
hard wall (max committed 10000² on one GPU,
/root/reference/app/xy2d_periodic_gpu_relaxation.f90:9); here ny scales
linearly with the mesh's y extent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuda_fortran_mc_simulation_spin_tpu.core import rng, tables
from cuda_fortran_mc_simulation_spin_tpu.models.base import CheckerboardState
from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D
from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D
from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D, XYState
from cuda_fortran_mc_simulation_spin_tpu.parallel.halo import (
    exchange_halo_rows,
)


def _state_spec(mesh: Mesh, nd: int = 3) -> P:
    """PartitionSpec for a replica-batched color array on this mesh:
    (dp, y[, x]) over (R, rows, …, cols)."""
    has_x = "x" in mesh.axis_names
    if nd == 3:
        return P("dp", "y", "x" if has_x else None)
    return P("dp", "y", *([None] * (nd - 3)), "x" if has_x else None)


def replicated_init(model, mesh: Mesh, replicas: int, kind: str,
                    key: jax.Array):
    """Build a replica-batched state sharded over (dp, y[, x])."""
    keys = jr.split(key, replicas)
    state = jax.vmap(lambda k: model.init_state(kind, k))(keys)
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, _state_spec(mesh, x.ndim))
        ),
        state,
    )


def _xch(arr, ysh):
    """Halo rows of a (R, L, w) local block over the y axis."""
    return exchange_halo_rows(arr, "y", ysh, row_axis=1)


def _xch_c(arr, xsh):
    """Halo columns of a (R, L, w) local block over the x axis."""
    from cuda_fortran_mc_simulation_spin_tpu.parallel.halo import (
        exchange_halo_cols,
    )

    return exchange_halo_cols(arr, "x", xsh, col_axis=2)


def _halos4(o, ysh, xsh):
    """(up, dn, left, right) halos of a local color block — rows over
    the y axis, columns over the x axis."""
    hu, hd = _xch(o, ysh)
    hl, hr = _xch_c(o, xsh)
    return hu, hd, hl, hr


def _vp(fn):
    """vmap a per-replica phase over the leading replica axis."""
    return jax.vmap(fn)


# column-chunk granule for the draw keying: x-shard widths are lane
# multiples, so chunked keys make draws invariant to the x-split too
_COL_CHUNK = 128


def _site_uniforms(pkey, rep0, row0, col0, rep_loc, rows_loc, tail_shape,
                   n_draws):
    """Per-site uniforms for one checkerboard phase of a local block,
    keyed by GLOBAL (replica, row, column-chunk) indices
    (pkey -> replica -> row -> chunk).

    Every mesh shape that covers the same global lattice draws the same
    uniform at the same global site, so (1,1,1), (1,4,1), (2,4,1) and
    (1,2,2) meshes produce bit-identical trajectories for one seed —
    the bitwise shard-vs-single-chip requirement of SURVEY.md §4.
    Returns ``n_draws`` arrays of shape (rep_loc, rows_loc,
    *tail_shape)."""
    tail = tuple(tail_shape)
    w = tail[-1]
    lead_tail = tail[:-1]
    if w % _COL_CHUNK == 0:
        nck, cw = w // _COL_CHUNK, _COL_CHUNK
    else:
        nck, cw = 1, w
    reps = rep0 + jnp.arange(rep_loc)
    rows = row0 + jnp.arange(rows_loc)
    chunks = col0 // cw + jnp.arange(nck)

    def per_rep(r):
        kr = jr.fold_in(pkey, r)

        def per_row(g):
            kg = jr.fold_in(kr, g)
            return jax.vmap(
                lambda c: rng.uniform(
                    jr.fold_in(kg, c), (n_draws,) + lead_tail + (cw,)
                )
            )(chunks)

        return jax.vmap(per_row)(rows)

    u = jax.vmap(per_rep)(reps)
    # (rep, rows, nck, n_draws, *lead_tail, cw) -> (..., n_draws, ..., w)
    u = jnp.moveaxis(u, 2, -2)
    u = u.reshape(u.shape[:2] + (n_draws,) + lead_tail + (w,))
    return [u[:, :, i] for i in range(n_draws)]


# --------------------------------------------------------------------------
# per-model local sweeps + observables (all on (R, ny_loc, half) blocks)
# --------------------------------------------------------------------------

def _shard_pallas_mode(model, local_shape,
                       kind: str = "ising") -> tuple[bool, bool]:
    """(use_pallas, interpret) for the domain-sharded sweep.

    The fused halo kernel runs when the model resolves to the Pallas
    backend (TPU) and the local block is tileable; setting
    SPINLAT_SHARD_PALLAS_INTERPRET=1 forces the kernel in interpret mode
    on CPU (validation of the halo kernel inside shard_map)."""
    import os

    if kind == "xy":
        from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas
        ok = xy2d_pallas.shard_pallas_ok(tuple(local_shape))
    elif kind == "ising3d":
        from cuda_fortran_mc_simulation_spin_tpu.ops import ising3d_pallas
        ok = ising3d_pallas.shard_pallas_ok(tuple(local_shape))
    else:
        from cuda_fortran_mc_simulation_spin_tpu.ops import ising2d_pallas
        ok = ising2d_pallas.shard_pallas_ok(tuple(local_shape))
    if not ok:
        return False, False
    if os.environ.get("SPINLAT_SHARD_PALLAS_INTERPRET") == "1":
        return True, True
    try:
        return model.resolved_backend == "pallas", False
    except ValueError:
        return False, False


def _shard_packed_mode(model, mesh: Mesh, replicas: int,
                       n_over_relax: int = 0
                       ) -> tuple[str | None, bool]:
    """(kind, interpret) with kind ∈ {"2d", "3d", "clock6", "clock4", "clock3",
    None} — route the domain-sharded sweep through the bit-packed
    multispin halo kernels (ops/ising2d_multispin.sharded_phase_packed /
    ops/ising3d_multispin.sharded_phase3d_packed /
    ops/clock_multispin.sharded_phase_packed6 /
    ops/clock4_multispin.sharded_phase_packed4) when shapes allow.

    Opt-out with SPINLAT_SHARD_PACKED=0;
    SPINLAT_SHARD_PALLAS_INTERPRET=1 runs it in interpret mode on CPU
    (threefry chain planes keyed by global word rows)."""
    import os

    from cuda_fortran_mc_simulation_spin_tpu.ops import ising2d_multispin

    from cuda_fortran_mc_simulation_spin_tpu.models.ising3d import Ising3D
    from cuda_fortran_mc_simulation_spin_tpu.ops import ising3d_multispin

    is2d = isinstance(model, Ising2D)
    is3d = isinstance(model, Ising3D)
    is_ck6 = isinstance(model, Clock2D) and model.q == 6
    is_ck4 = isinstance(model, Clock2D) and model.q == 4
    is_ck3 = isinstance(model, Clock2D) and model.q == 3
    is_ck = is_ck6 or is_ck4 or is_ck3
    if not (is2d or is3d or is_ck) or n_over_relax:
        return None, False
    if os.environ.get("SPINLAT_SHARD_PACKED") == "0":
        return None, False
    ysh = mesh.shape["y"]
    xsh = mesh.shape.get("x", 1)
    if xsh > 1 and not (is2d or is_ck):
        # packed column halos are implemented for the 2-D engines
        # (Ising2D and the packed clocks); 3-D x-splits keep int8 kernels
        return None, False
    dp = mesh.shape["dp"]
    if replicas % dp:
        return None, False
    if model.nsites > ising2d_multispin.OBS_INT32_MAX_SITES:
        # fused int32 (m, e) partials would wrap; int8 f32-obs path
        return None, False
    if is_ck:
        if is_ck6:
            from cuda_fortran_mc_simulation_spin_tpu.ops import (
                clock_multispin as ck_eng,
            )

            shard_ok = ck_eng.shard_packed6_ok
            kind = "clock6"
        elif is_ck4:
            from cuda_fortran_mc_simulation_spin_tpu.ops import (
                clock4_multispin as ck_eng,
            )

            shard_ok = ck_eng.shard_packed4_ok
            kind = "clock4"
        else:
            from cuda_fortran_mc_simulation_spin_tpu.ops import (
                clock3_multispin as ck_eng,
            )

            shard_ok = ck_eng.shard_packed3_ok
            kind = "clock3"

        if (os.environ.get("SPINLAT_CLOCK_PACKED") == "0"
                or model.nsites > ck_eng.OBS_INT32_MAX_SITES):
            return None, False
        ny, half = model.color_shape
        if ny % (32 * ysh) or half % xsh:
            return None, False
        local = (replicas // dp, ny // 32 // ysh, half // xsh)
        if not shard_ok(local):
            return None, False
        if os.environ.get("SPINLAT_SHARD_PALLAS_INTERPRET") == "1":
            return kind, True
        try:
            return (kind if model.resolved_backend == "pallas"
                    else None), False
        except ValueError:
            return None, False
    if is2d:
        ny, half = model.color_shape
        if ny % (32 * ysh) or half % xsh:
            return None, False
        local = (replicas // dp, ny // 32 // ysh, half // xsh)
        if not ising2d_multispin.shard_packed_ok(local):
            return None, False
        kind = "2d"
    else:
        nz, ny, half = model.color_shape
        if nz % (2 * ysh) or ny % 32:
            return None, False
        local = (replicas // dp, nz // ysh, ny // 32, half)
        if not ising3d_multispin.shard_packed3d_ok(local):
            return None, False
        kind = "3d"
    if os.environ.get("SPINLAT_SHARD_PALLAS_INTERPRET") == "1":
        return kind, True
    try:
        return (kind if model.resolved_backend == "pallas" else None,
                False)
    except ValueError:
        return None, False


def _ising_local_sweep_packed(model: Ising2D, wa, wb, key, ysh, xsh,
                              rep0, wrow0, col0, want_obs=False,
                              interpret=False):
    """One local MCS on PACKED (R, Lp, half) word blocks: boundary bits
    over ICI (exchange_halo_rows_packed — 1/32nd of the int8 halo
    payload), both phases in the multispin kernel, per-shard (m, e)
    partials fused into phase b.  With an x mesh axis the shards also
    exchange boundary WORD COLUMNS (whole packed words — x-sharding
    never cuts the bit axis), completing the (dx, dy) decomposition for
    the packed engine."""
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        ising2d_multispin as msb,
        ising2d_pallas,
    )
    from cuda_fortran_mc_simulation_spin_tpu.parallel.halo import (
        exchange_halo_cols,
        exchange_halo_rows_packed,
    )

    if xsh > 1:
        offs = jnp.stack([jnp.int32(rep0), jnp.int32(wrow0),
                          jnp.int32(col0)])

        def colkw(o):
            hl, hr = exchange_halo_cols(o, "x", xsh, col_axis=2)
            return dict(halo_lf=hl, halo_rt=hr)
    else:
        offs = jnp.stack([jnp.int32(rep0), jnp.int32(wrow0)])

        def colkw(o):
            return {}

    beta = float(model.beta)
    w_total = model.color_shape[1]
    hup, hdn = exchange_halo_rows_packed(wb, "y", ysh)
    wa = msb.sharded_phase_packed(
        wa, wb, hup, hdn, ising2d_pallas.seeds_from_key(key, 0), offs,
        color=0, beta=beta, interpret=interpret, w_total=w_total,
        **colkw(wb),
    )
    hup, hdn = exchange_halo_rows_packed(wa, "y", ysh)
    res = msb.sharded_phase_packed(
        wb, wa, hup, hdn, ising2d_pallas.seeds_from_key(key, 1), offs,
        color=1, beta=beta, interpret=interpret, measuring=want_obs,
        w_total=w_total, **colkw(wa),
    )
    if want_obs:
        wb, m, e = res
        return wa, wb, {"m": m.astype(jnp.float32),
                        "e": e.astype(jnp.float32)}
    return wa, res, None


def _clock_local_sweep_packed(model: Clock2D, wa3, wb3, key, ysh, xsh,
                              rep0, wrow0, col0, want_obs=False,
                              interpret=False):
    """One local MCS on PACKED clock plane tuples — (σ, t0, t1) for the
    q=6 CRT engine, (b0, b1) for the q=4 digit engine — each plane
    (R, Lp, half): per-plane boundary-site bit planes ride ICI per halo
    direction (3/32 or 2/32 of an int8 row payload), both phases in the
    bit-sliced kernel, fused per-shard (m, e) partials (×2 scaling for
    q=6, whose levels are half-integers).  With an x mesh axis the
    shards also exchange boundary WORD COLUMNS per plane (whole packed
    words — x-sharding never cuts the bit axis), completing the
    (dx, dy) decomposition for the packed clock engines as for Ising."""
    from cuda_fortran_mc_simulation_spin_tpu.ops import ising2d_pallas
    from cuda_fortran_mc_simulation_spin_tpu.parallel.halo import (
        exchange_halo_cols,
        exchange_halo_rows_packed,
    )

    if model.q == 4:
        from cuda_fortran_mc_simulation_spin_tpu.ops import (
            clock4_multispin as _c4,
        )

        sharded_phase = _c4.sharded_phase_packed4
        obs_scale = 1.0
    elif model.q == 3:
        from cuda_fortran_mc_simulation_spin_tpu.ops import (
            clock3_multispin as _c3,
        )

        sharded_phase = _c3.sharded_phase_packed3
        obs_scale = 0.5               # kernel emits (2m, 2e)
    else:
        from cuda_fortran_mc_simulation_spin_tpu.ops import (
            clock_multispin as _c6,
        )

        sharded_phase = _c6.sharded_phase_packed6
        obs_scale = 0.5               # kernel emits (2m, 2e)

    def h3(planes):
        ups, dns = zip(*(exchange_halo_rows_packed(p, "y", ysh)
                         for p in planes))
        return tuple(ups), tuple(dns)

    if xsh > 1:
        offs = jnp.stack([jnp.int32(rep0), jnp.int32(wrow0),
                          jnp.int32(col0)])

        def colkw(o3):
            lfs, rts = zip(*(exchange_halo_cols(p, "x", xsh, col_axis=2)
                             for p in o3))
            return dict(halo_lf=tuple(lfs), halo_rt=tuple(rts))
    else:
        offs = jnp.stack([jnp.int32(rep0), jnp.int32(wrow0)])

        def colkw(o3):
            return {}

    beta = float(model.beta)
    w_total = model.color_shape[1]
    hup, hdn = h3(wb3)
    wa3 = sharded_phase(
        wa3, wb3, hup, hdn, ising2d_pallas.seeds_from_key(key, 0),
        offs, color=0, beta=beta, interpret=interpret,
        w_total=w_total, **colkw(wb3),
    )
    hup, hdn = h3(wa3)
    res = sharded_phase(
        wb3, wa3, hup, hdn, ising2d_pallas.seeds_from_key(key, 1),
        offs, color=1, beta=beta, interpret=interpret,
        measuring=want_obs, w_total=w_total, **colkw(wa3),
    )
    if want_obs:
        wb3, m2, e2 = res
        return wa3, wb3, {"m": m2.astype(jnp.float32) * obs_scale,
                          "e": e2.astype(jnp.float32) * obs_scale}
    return wa3, res, None


def _ising3d_local_sweep_packed(model, wa, wb, key, ysh, rep0, z0,
                                want_obs=False, interpret=False):
    """One local MCS on PACKED (R, nz_loc, nyp, half) word volumes:
    packed z-halo planes over ICI (8× less than int8), both phases in
    the 3-D multispin kernel, fused per-shard (m, e) partials."""
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        ising2d_pallas,
        ising3d_multispin as ms3,
    )

    offs = jnp.stack([jnp.int32(rep0), jnp.int32(z0)])
    beta = float(model.beta)
    hzm, hzp = exchange_halo_rows(wb, "y", ysh, row_axis=1)
    wa = ms3.sharded_phase3d_packed(
        wa, wb, hzm, hzp, ising2d_pallas.seeds_from_key(key, 0), offs,
        color=0, beta=beta, interpret=interpret,
    )
    hzm, hzp = exchange_halo_rows(wa, "y", ysh, row_axis=1)
    res = ms3.sharded_phase3d_packed(
        wb, wa, hzm, hzp, ising2d_pallas.seeds_from_key(key, 1), offs,
        color=1, beta=beta, interpret=interpret, measuring=want_obs,
    )
    if want_obs:
        wb, m, e = res
        return wa, wb, {"m": m.astype(jnp.float32),
                        "e": e.astype(jnp.float32)}
    return wa, res, None


def _ising_local_sweep(model: Ising2D, a, b, key, ysh, xsh, rep0, row0,
                       col0, want_obs=False):
    """One local MCS; returns (a, b, obs_or_None) — obs are per-shard
    (m, e) partial sums fused into the phase-1 kernel on the Pallas
    path (the jnp path measures separately in the caller)."""
    use_pallas, interpret = _shard_pallas_mode(model, a.shape)
    if use_pallas:
        from cuda_fortran_mc_simulation_spin_tpu.ops import ising2d_pallas

        if xsh == 1:
            offs = jnp.stack([jnp.int32(rep0), jnp.int32(row0)])
        else:
            offs = jnp.stack(
                [jnp.int32(rep0), jnp.int32(row0), jnp.int32(col0)])

        def halos(o):
            hu, hd = _xch(o, ysh)
            if xsh == 1:
                return dict(halo_up=hu, halo_dn=hd)
            hl, hr = _xch_c(o, xsh)
            return dict(halo_up=hu, halo_dn=hd, halo_lf=hl, halo_rt=hr)

        a = ising2d_pallas.sharded_phase(
            a, b, seeds=ising2d_pallas.seeds_from_key(key, 0), offs=offs,
            color=0, beta=float(model.beta), interpret=interpret,
            **halos(b),
        )
        res = ising2d_pallas.sharded_phase(
            b, a, seeds=ising2d_pallas.seeds_from_key(key, 1), offs=offs,
            color=1, beta=float(model.beta), interpret=interpret,
            measuring=want_obs, **halos(a),
        )
        if want_obs:
            b, m, e = res
            return a, b, {"m": m, "e": e}
        return a, res, None

    def phase(x, o, color, pkey):
        (u,) = _site_uniforms(pkey, rep0, row0, col0, x.shape[0],
                              x.shape[1], x.shape[2:], 1)
        if xsh == 1:
            hu, hd = _xch(o, ysh)
            return _vp(
                lambda x1, o1, h1, h2, u1: model._phase(
                    x1, o1, color, u1, halos=(h1, h2)
                )
            )(x, o, hu, hd, u)
        hu, hd, hl, hr = _halos4(o, ysh, xsh)
        return _vp(
            lambda x1, o1, h1, h2, h3, h4, u1: model._phase(
                x1, o1, color, u1, halos=(h1, h2, h3, h4)
            )
        )(x, o, hu, hd, hl, hr, u)

    a = phase(a, b, 0, rng.phase_key(key, 0))
    b = phase(b, a, 1, rng.phase_key(key, 1))
    return a, b, None


def _plus_col(p, xsh):
    """Value of the column-after neighbor for every column of a block."""
    _, hr = _xch_c(p, xsh)
    return jnp.concatenate([p[:, :, 1:], hr], axis=2)


def _ising_local_obs(model: Ising2D, a, b, ysh, xsh):
    m = jnp.sum(a, axis=(1, 2), dtype=jnp.int32) + jnp.sum(
        b, axis=(1, 2), dtype=jnp.int32
    )
    ny_loc = a.shape[1]
    odd = (jnp.arange(ny_loc) & 1).astype(bool).reshape(1, ny_loc, 1)
    _, hd_b = _xch(b, ysh)
    _, hd_a = _xch(a, ysh)
    right_a = jnp.where(odd, _plus_col(b, xsh), b)
    down_a = jnp.concatenate([b[:, 1:], hd_b], axis=1)
    right_b = jnp.where(odd, a, _plus_col(a, xsh))
    down_b = jnp.concatenate([a[:, 1:], hd_a], axis=1)
    e = -(
        jnp.sum(a.astype(jnp.int32) * (right_a + down_a).astype(jnp.int32),
                axis=(1, 2), dtype=jnp.int32)
        + jnp.sum(b.astype(jnp.int32) * (right_b + down_b).astype(jnp.int32),
                  axis=(1, 2), dtype=jnp.int32)
    )
    return {"m": m.astype(jnp.float32), "e": e.astype(jnp.float32)}


def _clock_local_sweep(model: Clock2D, a, b, key, ysh, xsh, rep0, row0,
                       col0, want_obs=False):
    """One local MCS; returns (a, b, obs_or_None) — (mx, my, e) partial
    sums fused into the phase-1 kernel on the Pallas path."""
    q = model.q
    use_pallas, interpret = _shard_pallas_mode(model, a.shape)
    if use_pallas:
        from cuda_fortran_mc_simulation_spin_tpu.ops import (
            clock_pallas,
            ising2d_pallas,
        )

        if xsh == 1:
            offs = jnp.stack([jnp.int32(rep0), jnp.int32(row0)])
        else:
            offs = jnp.stack(
                [jnp.int32(rep0), jnp.int32(row0), jnp.int32(col0)])

        def halos(o):
            hu, hd = _xch(o, ysh)
            if xsh == 1:
                return dict(halo_up=hu, halo_dn=hd)
            hl, hr = _xch_c(o, xsh)
            return dict(halo_up=hu, halo_dn=hd, halo_lf=hl, halo_rt=hr)

        a = clock_pallas.sharded_phase(
            a, b, seeds=ising2d_pallas.seeds_from_key(key, 0), offs=offs,
            color=0, q=q, beta=float(model.beta), interpret=interpret,
            **halos(b),
        )
        res = clock_pallas.sharded_phase(
            b, a, seeds=ising2d_pallas.seeds_from_key(key, 1), offs=offs,
            color=1, q=q, beta=float(model.beta), interpret=interpret,
            measuring=want_obs, **halos(a),
        )
        if want_obs:
            b, mx, my, e = res
            return a, b, {"m": mx, "my": my, "e": e}
        return a, res, None

    def phase(x, o, color, pkey):
        u_c, u_a = _site_uniforms(pkey, rep0, row0, col0, x.shape[0],
                                  x.shape[1], x.shape[2:], 2)
        if xsh == 1:
            hu, hd = _xch(o, ysh)

            def one(x1, o1, h1, h2, uc, ua):
                huc, hus = tables.state_cos_sin(h1, q)
                hdc, hds = tables.state_cos_sin(h2, q)
                return model._phase(
                    x1, o1, color, uc, ua,
                    halos=((huc, hdc), (hus, hds)),
                )

            return _vp(one)(x, o, hu, hd, u_c, u_a)
        hu, hd, hl, hr = _halos4(o, ysh, xsh)

        def one4(x1, o1, h1, h2, h3, h4, uc, ua):
            cs_halos = [tables.state_cos_sin(h, q)
                        for h in (h1, h2, h3, h4)]
            return model._phase(
                x1, o1, color, uc, ua,
                halos=(tuple(c for c, _ in cs_halos),
                       tuple(s for _, s in cs_halos)),
            )

        return _vp(one4)(x, o, hu, hd, hl, hr, u_c, u_a)

    a = phase(a, b, 0, rng.phase_key(key, 0))
    b = phase(b, a, 1, rng.phase_key(key, 1))
    return a, b, None


def _clock_local_obs(model: Clock2D, a, b, ysh, xsh):
    q = model.q
    ca, sa = tables.state_cos_sin(a, q)
    cb, sb = tables.state_cos_sin(b, q)
    mx = jnp.sum(ca, axis=(1, 2)) + jnp.sum(cb, axis=(1, 2))
    my = jnp.sum(sa, axis=(1, 2)) + jnp.sum(sb, axis=(1, 2))
    e = _vector_bond_energy(ca, sa, cb, sb, ysh, xsh)
    return {"m": mx, "my": my, "e": e}


def _vector_bond_energy(cax, say, cbx, sby, ysh, xsh):
    """-Σ S·(S_right + S_down) for planar spins given per-color cos/sin
    planes (R, L, half)."""
    ny_loc = cax.shape[1]
    odd = (jnp.arange(ny_loc) & 1).astype(bool).reshape(1, ny_loc, 1)

    def bond(pa, pb):
        # contribution of one component plane pair
        _, hd_pb = _xch(pb, ysh)
        _, hd_pa = _xch(pa, ysh)
        right_a = jnp.where(odd, _plus_col(pb, xsh), pb)
        down_a = jnp.concatenate([pb[:, 1:], hd_pb], axis=1)
        right_b = jnp.where(odd, pa, _plus_col(pa, xsh))
        down_b = jnp.concatenate([pa[:, 1:], hd_pa], axis=1)
        return (
            jnp.sum(pa * (right_a + down_a), axis=(1, 2))
            + jnp.sum(pb * (right_b + down_b), axis=(1, 2))
        )

    return -(bond(cax, cbx) + bond(say, sby))


def _ising3d_local_sweep(model, a, b, key, ysh, rep0, row0,
                         want_obs=False):
    """z-sharded 3-D sweep: local blocks (R, nz_loc, ny, half); halo
    planes exchanged over the mesh's domain axis.  Returns (a, b,
    obs_or_None) — (m, e) partials fused into the phase-1 kernel on the
    Pallas path."""
    use_pallas, interpret = _shard_pallas_mode(model, a.shape,
                                               kind="ising3d")
    if use_pallas:
        from cuda_fortran_mc_simulation_spin_tpu.ops import (
            ising2d_pallas,
            ising3d_pallas,
        )

        offs = jnp.stack([jnp.int32(rep0), jnp.int32(row0)])
        hzm, hzp = exchange_halo_rows(b, "y", ysh, row_axis=1)
        a = ising3d_pallas.sharded_phase(
            a, b, hzm, hzp, ising2d_pallas.seeds_from_key(key, 0), offs,
            color=0, beta=float(model.beta), interpret=interpret,
        )
        hzm, hzp = exchange_halo_rows(a, "y", ysh, row_axis=1)
        res = ising3d_pallas.sharded_phase(
            b, a, hzm, hzp, ising2d_pallas.seeds_from_key(key, 1), offs,
            color=1, beta=float(model.beta), interpret=interpret,
            measuring=want_obs,
        )
        if want_obs:
            b, m, e = res
            return a, b, {"m": m, "e": e}
        return a, res, None

    def phase(x, o, color, pkey):
        hzm, hzp = exchange_halo_rows(o, "y", ysh, row_axis=1)
        (u,) = _site_uniforms(pkey, rep0, row0, jnp.int32(0),
                              x.shape[0], x.shape[1], x.shape[2:], 1)
        return _vp(
            lambda x1, o1, h1, h2, u1: model._phase(
                x1, o1, color, u1, halos=(h1, h2)
            )
        )(x, o, hzm, hzp, u)

    a = phase(a, b, 0, rng.phase_key(key, 0))
    b = phase(b, a, 1, rng.phase_key(key, 1))
    return a, b, None


def _ising3d_local_obs(model, a, b, ysh):
    m = jnp.sum(a, axis=(1, 2, 3), dtype=jnp.int32) + jnp.sum(
        b, axis=(1, 2, 3), dtype=jnp.int32
    )
    nz_loc, ny = a.shape[1], a.shape[2]
    odd = (
        (jnp.arange(nz_loc)[:, None] + jnp.arange(ny)[None, :]) & 1
    ).astype(bool)[None, :, :, None]
    _, hd_b = exchange_halo_rows(b, "y", ysh, row_axis=1)
    _, hd_a = exchange_halo_rows(a, "y", ysh, row_axis=1)
    right_a = jnp.where(odd, jnp.roll(b, -1, axis=3), b)
    right_b = jnp.where(odd, a, jnp.roll(a, -1, axis=3))
    yp_a = jnp.roll(b, -1, axis=2)
    yp_b = jnp.roll(a, -1, axis=2)
    zp_a = jnp.concatenate([b[:, 1:], hd_b], axis=1)
    zp_b = jnp.concatenate([a[:, 1:], hd_a], axis=1)
    e = -(
        jnp.sum(
            a.astype(jnp.int32)
            * (right_a + yp_a + zp_a).astype(jnp.int32),
            axis=(1, 2, 3), dtype=jnp.int32,
        )
        + jnp.sum(
            b.astype(jnp.int32)
            * (right_b + yp_b + zp_b).astype(jnp.int32),
            axis=(1, 2, 3), dtype=jnp.int32,
        )
    )
    return {"m": m.astype(jnp.float32), "e": e.astype(jnp.float32)}


def _xy_local_sweep(model: XY2D, st: XYState, key, ysh, xsh, rep0, row0,
                    col0, want_obs=False):
    """One local MCS; returns (state, obs_or_None) — (mx, my, e) partial
    sums fused into the phase-1 kernel on the Pallas path.  Callers must
    not request obs when over-relaxation sweeps follow (measure after
    OR instead)."""
    use_pallas, interpret = _shard_pallas_mode(
        model, st.ax.shape, kind="xy"
    )
    if use_pallas:
        from cuda_fortran_mc_simulation_spin_tpu.ops import (
            ising2d_pallas,
            xy2d_pallas,
        )

        offs, colkw = _xy_offs_cols(rep0, row0, col0, xsh)
        ax, ay, bx, by = st
        ax, ay = xy2d_pallas.sharded_phase(
            ax, ay, bx, by, _xch(bx, ysh), _xch(by, ysh),
            ising2d_pallas.seeds_from_key(key, 0), offs,
            color=0, beta=float(model.beta), interpret=interpret,
            **colkw(bx, by),
        )
        res = xy2d_pallas.sharded_phase(
            bx, by, ax, ay, _xch(ax, ysh), _xch(ay, ysh),
            ising2d_pallas.seeds_from_key(key, 1), offs,
            color=1, beta=float(model.beta), interpret=interpret,
            measuring=want_obs, **colkw(ax, ay),
        )
        if want_obs:
            bx, by, (mx, my, e) = res
            return (XYState(ax, ay, bx, by),
                    {"m": mx, "my": my, "e": e})
        bx, by = res
        return XYState(ax, ay, bx, by), None

    def phase(sx, sy, ox, oy, color, pkey):
        u_c, u_a = _site_uniforms(pkey, rep0, row0, col0, sx.shape[0],
                                  sx.shape[1], sx.shape[2:], 2)
        if xsh == 1:
            hux, hdx = _xch(ox, ysh)
            huy, hdy = _xch(oy, ysh)
            return _vp(
                lambda a1, a2, b1, b2, h1, h2, h3, h4, uc, ua:
                model._phase(
                    a1, a2, b1, b2, color, uc, ua,
                    halos=((h1, h2), (h3, h4)),
                )
            )(sx, sy, ox, oy, hux, hdx, huy, hdy, u_c, u_a)
        hx4 = _halos4(ox, ysh, xsh)
        hy4 = _halos4(oy, ysh, xsh)
        return _vp(
            lambda a1, a2, b1, b2, x1, x2, x3, x4, y1, y2, y3, y4,
            uc, ua: model._phase(
                a1, a2, b1, b2, color, uc, ua,
                halos=((x1, x2, x3, x4), (y1, y2, y3, y4)),
            )
        )(sx, sy, ox, oy, *hx4, *hy4, u_c, u_a)

    ax, ay, bx, by = st
    ax, ay = phase(ax, ay, bx, by, 0, rng.phase_key(key, 0))
    bx, by = phase(bx, by, ax, ay, 1, rng.phase_key(key, 1))
    return XYState(ax, ay, bx, by), None


def _xy_offs_cols(rep0, row0, col0, xsh):
    """(offs array, per-color column-halo kwargs fn) for the XY Pallas
    sharded phases."""
    if xsh == 1:
        offs = jnp.stack([jnp.int32(rep0), jnp.int32(row0)])
        return offs, lambda ox, oy: {}
    offs = jnp.stack([jnp.int32(rep0), jnp.int32(row0), jnp.int32(col0)])

    def colkw(ox, oy):
        return dict(cols_x=_xch_c(ox, xsh), cols_y=_xch_c(oy, xsh))

    return offs, colkw


def _xy_local_or_sweep(model: XY2D, st: XYState, ysh, xsh=1, rep0=None,
                       row0=None, col0=0):
    """One over-relaxation sweep on y-sharded local blocks (deterministic
    reflection about the local field, halos over ICI) — the multi-chip
    form of update_over_relaxation
    (/root/reference/src/xy2d_periodic_gpu_m.f90:418-439)."""
    use_pallas, interpret = _shard_pallas_mode(
        model, st.ax.shape, kind="xy"
    )
    if use_pallas and row0 is not None:
        from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas

        offs, colkw = _xy_offs_cols(rep0, row0, col0, xsh)
        ax, ay, bx, by = st
        ax, ay = xy2d_pallas.sharded_or_phase(
            ax, ay, bx, by, _xch(bx, ysh), _xch(by, ysh), offs,
            color=0, interpret=interpret, **colkw(bx, by),
        )
        bx, by = xy2d_pallas.sharded_or_phase(
            bx, by, ax, ay, _xch(ax, ysh), _xch(ay, ysh), offs,
            color=1, interpret=interpret, **colkw(ax, ay),
        )
        return XYState(ax, ay, bx, by)

    def phase(sx, sy, ox, oy, color):
        if xsh == 1:
            hux, hdx = _xch(ox, ysh)
            huy, hdy = _xch(oy, ysh)
            return _vp(
                lambda a1, a2, b1, b2, h1, h2, h3, h4: model._or_phase(
                    a1, a2, b1, b2, color, halos=((h1, h2), (h3, h4))
                )
            )(sx, sy, ox, oy, hux, hdx, huy, hdy)
        hx4 = _halos4(ox, ysh, xsh)
        hy4 = _halos4(oy, ysh, xsh)
        return _vp(
            lambda a1, a2, b1, b2, x1, x2, x3, x4, y1, y2, y3, y4:
            model._or_phase(
                a1, a2, b1, b2, color,
                halos=((x1, x2, x3, x4), (y1, y2, y3, y4)),
            )
        )(sx, sy, ox, oy, *hx4, *hy4)

    ax, ay, bx, by = st
    ax, ay = phase(ax, ay, bx, by, 0)
    bx, by = phase(bx, by, ax, ay, 1)
    return XYState(ax, ay, bx, by)


def _xy_local_obs(model: XY2D, st: XYState, ysh, xsh):
    mx = jnp.sum(st.ax, axis=(1, 2)) + jnp.sum(st.bx, axis=(1, 2))
    my = jnp.sum(st.ay, axis=(1, 2)) + jnp.sum(st.by, axis=(1, 2))
    e = _vector_bond_energy(st.ax, st.ay, st.bx, st.by, ysh, xsh)
    return {"m": mx, "my": my, "e": e}


# --------------------------------------------------------------------------
# the sharded step factory
# --------------------------------------------------------------------------

def make_sharded_step(model, mesh: Mesh):
    """Jitted (state, key) -> (state, {obs: (R,)}) over the (dp, y) mesh.

    Supports Ising2D, Clock2D and XY2D states.
    """
    step = _make_local_step(model, mesh)
    return jax.jit(lambda state, key: step(state, key, False))


def make_sharded_sample_runner(model, mesh: Mesh, mcs: int,
                               replicas: int, init_kind: str = "allup",
                               n_over_relax: int = 0,
                               mcs_over_relax: int = 0):
    """run(key) -> {obs: (replicas, mcs)}: full MC histories for a
    replica batch, domain-sharded over the mesh, in ONE jitted program —
    the multi-chip production driver (ensemble × lattice sharding).

    ``n_over_relax``/``mcs_over_relax``: XY over-relaxation schedule
    (n_over_relax reflection sweeps after each Metropolis sweep with
    t <= mcs_over_relax, /root/reference/app/xy2d_gpu_over_relaxation
    .f90:45-47), with halo exchange per OR phase.
    """
    use_packed, packed_interp = _shard_packed_mode(
        model, mesh, replicas, n_over_relax)
    step = _make_local_step(model, mesh, n_over_relax=n_over_relax,
                            packed=use_packed,
                            packed_interpret=packed_interp)
    _check_replicas(replicas, mesh)
    mcs_or = mcs_over_relax or mcs

    if use_packed in ("clock6", "clock4", "clock3"):
        if use_packed == "clock6":
            from cuda_fortran_mc_simulation_spin_tpu.ops import (
                clock_multispin as ck_eng,
            )

            pack_fn, n_planes = ck_eng.pack_clock_color, 3
        elif use_packed == "clock4":
            from cuda_fortran_mc_simulation_spin_tpu.ops import (
                clock4_multispin as ck_eng,
            )

            pack_fn, n_planes = ck_eng.pack_clock4_color, 2
        else:
            from cuda_fortran_mc_simulation_spin_tpu.ops import (
                clock3_multispin as ck_eng,
            )

            pack_fn, n_planes = ck_eng.pack_clock3_color, 2

        spec = _state_spec(mesh, 3)
        pack_sharded = jax.shard_map(
            lambda s: CheckerboardState(pack_fn(s.a), pack_fn(s.b)),
            mesh=mesh,
            in_specs=(CheckerboardState(spec, spec),),
            out_specs=CheckerboardState((spec,) * n_planes,
                                        (spec,) * n_planes),
            check_vma=False,
        )
    elif use_packed:
        from cuda_fortran_mc_simulation_spin_tpu.ops import (
            ising2d_multispin as msb,
        )

        spec = _state_spec(mesh, 4 if use_packed == "3d" else 3)
        pack_sharded = jax.shard_map(
            lambda s: CheckerboardState(msb.pack_color(s.a),
                                        msb.pack_color(s.b)),
            mesh=mesh,
            in_specs=(CheckerboardState(spec, spec),),
            out_specs=CheckerboardState(spec, spec),
            check_vma=False,
        )
    else:
        pack_sharded = None

    def run(key: jax.Array):
        # replica init keys fold_in(init_key, r) — the SAME derivation
        # as the single-chip packed runners (engine/sweep.py init_fn),
        # so random-init trajectories also match across paths
        init_keys = jax.vmap(
            lambda r: jr.fold_in(rng.init_key(key), r)
        )(jnp.arange(replicas))
        state = jax.vmap(lambda k: model.init_state(init_kind, k))(
            init_keys
        )
        if pack_sharded is not None:
            state = pack_sharded(state)

        def body(state, t):
            return step(state, rng.sweep_key(key, t), t <= mcs_or)

        _, series = lax.scan(body, state, jnp.arange(1, mcs + 1))
        return jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), series)

    return jax.jit(run)


def make_sharded_xy_disorder_runner(model, mesh: Mesh, mcs: int,
                                    replicas: int, init_fn, measure_fn,
                                    fix1mcs: bool = False,
                                    n_over_relax: int = 0,
                                    mcs_over_relax: int = 0):
    """run(key) -> {mx, my, e, A, ...: (replicas, mcs)} — the XY disorder
    protocols (from_disorder/fix1mcs/finite_magne) domain-sharded over
    the mesh.

    Architecture: the Metropolis/OR sweeps run inside shard_map (global-
    row-keyed draws, explicit ppermute halos); preparation (``init_fn``,
    returning (state, snapshot) per replica), the fix1mcs global
    rotation, and ``measure_fn(state, snap) -> dict`` stay *global* jnp
    on the sharded arrays — XLA's partitioner inserts the collectives
    for the sums/rolls they contain, so no protocol feature is lost to
    the mesh path.
    """
    sweep = _make_local_step(model, mesh, n_over_relax=n_over_relax,
                             with_obs=False)
    _check_replicas(replicas, mesh)
    mcs_or = mcs_over_relax or mcs
    shard = NamedSharding(mesh, _state_spec(mesh))

    def rot_one(state, snap):
        mx, my = model.magne_sums(state)
        th = -jnp.arctan2(my, mx)
        return model.rotate(state, th), model.rotate(snap, th)

    def run(key: jax.Array):
        init_keys = jr.split(rng.init_key(key), replicas)
        state, snap = jax.vmap(init_fn)(init_keys)
        state = jax.lax.with_sharding_constraint(state, shard)
        snap = jax.lax.with_sharding_constraint(snap, shard)

        def body(carry, t):
            state, snap = carry
            state = sweep(state, rng.sweep_key(key, t), t <= mcs_or)
            if fix1mcs:
                state, snap = lax.cond(
                    t == 1,
                    lambda a: jax.vmap(rot_one)(*a),
                    lambda a: a,
                    (state, snap),
                )
            return (state, snap), jax.vmap(measure_fn)(state, snap)

        _, series = lax.scan(body, (state, snap), jnp.arange(1, mcs + 1))
        return jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), series)

    return jax.jit(run)


def _check_replicas(replicas: int, mesh: Mesh) -> None:
    dp = mesh.shape["dp"]
    if replicas % dp != 0:
        raise ValueError(
            f"replica batch {replicas} must be divisible by the mesh's "
            f"dp={dp} (each dp shard holds replicas/dp histories)"
        )


def _make_local_step(model, mesh: Mesh, n_over_relax: int = 0,
                     with_obs: bool = True, packed: str | None = None,
                     packed_interpret: bool = False):
    """Non-jitted shard_map step (for composing inside scans):
    (state, key, do_or) -> (state, {obs}) or just state (with_obs=False).

    The ``y`` mesh axis shards the lattice's leading spatial dimension
    (rows for 2-D models, z-planes for Ising3D); an optional ``x`` axis
    shards the color-array columns — the full (dx, dy) decomposition of
    SURVEY.md §5.7 with column halos over ICI.  ``do_or``: apply the
    n_over_relax over-relaxation sweeps this step (XY only).
    """
    from cuda_fortran_mc_simulation_spin_tpu.models.ising3d import Ising3D

    ysh = mesh.shape["y"]
    xsh = mesh.shape.get("x", 1)
    lead = model.color_shape[0]
    if lead % (2 * ysh) != 0:
        raise ValueError(
            f"leading lattice dim {lead} must be divisible by "
            f"2*domain_shards={2 * ysh} (checkerboard parity per shard)"
        )
    n_inv = jnp.float32(1.0 / model.nsites)
    is_xy = isinstance(model, XY2D)
    is_clock = isinstance(model, Clock2D)
    is_3d = isinstance(model, Ising3D)
    if xsh > 1:
        if is_3d:
            raise ValueError(
                "the x mesh axis shards 2-D color-array columns; "
                "Ising3D decomposes over z only (use mesh (dp, y))"
            )
        half = model.color_shape[-1]
        if half % xsh != 0:
            raise ValueError(
                f"color-array width {half} must be divisible by the "
                f"mesh's x={xsh}"
            )
    if n_over_relax > 0 and not is_xy:
        raise ValueError(
            "over-relaxation is an XY-model feature "
            "(/root/reference/src/xy2d_periodic_gpu_m.f90:418-439); "
            f"got model {type(model).__name__}"
        )

    def local_step(state, key, do_or):
        # draws are keyed by GLOBAL replica/row/column-chunk ids inside
        # the local sweeps (_site_uniforms), so the trajectory is bitwise
        # invariant to the mesh shape; shard indices only locate blocks
        first = jax.tree.leaves(state)[0]
        rep0 = lax.axis_index("dp") * first.shape[0]
        row0 = lax.axis_index("y") * first.shape[1]
        col0 = (lax.axis_index("x") * first.shape[-1] if xsh > 1
                else jnp.int32(0))
        obs = None
        if is_xy:
            # fused in-phase obs are only valid when no OR follows
            # (measurement must reflect the post-OR state)
            state, obs = _xy_local_sweep(
                model, state, key, ysh, xsh, rep0, row0, col0,
                want_obs=with_obs and n_over_relax == 0,
            )
            if n_over_relax > 0:
                def do(s):
                    return lax.fori_loop(
                        0, n_over_relax,
                        lambda i, x: _xy_local_or_sweep(
                            model, x, ysh, xsh, rep0, row0, col0
                        ),
                        s,
                    )
                state = lax.cond(do_or, do, lambda s: s, state)
            if with_obs and obs is None:
                obs = _xy_local_obs(model, state, ysh, xsh)
        elif is_clock and packed in ("clock6", "clock4", "clock3"):
            a, b, obs = _clock_local_sweep_packed(
                model, state.a, state.b, key, ysh, xsh, rep0, row0,
                col0, want_obs=with_obs, interpret=packed_interpret,
            )
            state = CheckerboardState(a, b)
        elif is_clock:
            a, b, obs = _clock_local_sweep(model, state.a, state.b, key,
                                           ysh, xsh, rep0, row0, col0,
                                           want_obs=with_obs)
            state = CheckerboardState(a, b)
            if with_obs and obs is None:
                obs = _clock_local_obs(model, a, b, ysh, xsh)
        elif is_3d and packed == "3d":
            a, b, obs = _ising3d_local_sweep_packed(
                model, state.a, state.b, key, ysh, rep0, row0,
                want_obs=with_obs, interpret=packed_interpret,
            )
            state = CheckerboardState(a, b)
        elif is_3d:
            a, b, obs = _ising3d_local_sweep(model, state.a, state.b,
                                             key, ysh, rep0, row0,
                                             want_obs=with_obs)
            state = CheckerboardState(a, b)
            if with_obs and obs is None:
                obs = _ising3d_local_obs(model, a, b, ysh)
        elif packed == "2d":
            a, b, obs = _ising_local_sweep_packed(
                model, state.a, state.b, key, ysh, xsh, rep0, row0,
                col0, want_obs=with_obs, interpret=packed_interpret,
            )
            state = CheckerboardState(a, b)
        else:
            a, b, obs = _ising_local_sweep(model, state.a, state.b, key,
                                           ysh, xsh, rep0, row0, col0,
                                           want_obs=with_obs)
            state = CheckerboardState(a, b)
            if with_obs and obs is None:
                obs = _ising_local_obs(model, a, b, ysh, xsh)
        if not with_obs:
            return state
        spatial = ("y", "x") if xsh > 1 else "y"
        obs = {k: lax.psum(v, spatial) * n_inv for k, v in obs.items()}
        return state, obs

    nd = 4 if is_3d else 3
    spec = _state_spec(mesh, nd)
    if packed in ("clock6", "clock4", "clock3"):
        # state is a tuple of packed bit planes per color (3 for the
        # q=6 CRT engine, 2 for the q=4/q=3 digit engines)
        n_planes = 3 if packed == "clock6" else 2
        state_struct = CheckerboardState((spec,) * n_planes,
                                         (spec,) * n_planes)
    elif is_xy:
        state_struct = XYState(spec, spec, spec, spec)
    else:
        state_struct = CheckerboardState(spec, spec)
    out_specs = ((state_struct, P("dp")) if with_obs else state_struct)
    return jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_struct, P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )
