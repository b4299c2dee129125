"""Halo-aware Pallas phase kernel (interpret mode, CPU) vs the jnp
sharded stencil — bit-identical physics given the same random bits.

The kernel is the in-VMEM half of the multi-chip promotion of the
reference's update_norishiro_sub
(/root/reference/src/ising2d_gpu_m.f90:86-106): explicit exchanged halo
rows at the shard boundary, in-array rows elsewhere.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import lattice, rng
from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D
from cuda_fortran_mc_simulation_spin_tpu.ops import ising2d_pallas as i2p

R, L, HALF = 2, 64, 128


def _oracle_phase(x, o, hu, hd, color, bits, t4, t8):
    """jnp reference for one phase under the integer-threshold rule the
    kernel uses (flip iff ΔE<=0 or bits < round(exp(-βΔE)·2³²))."""
    nsum = jax.vmap(
        lambda o1, h1, h2: lattice.neighbor_sums_halo(o1, h1, h2, color)
    )(o, hu, hd)
    half_de = x.astype(jnp.int32) * nsum.astype(jnp.int32)
    thresh = jnp.where(half_de == 2, jnp.uint32(t4), jnp.uint32(t8))
    accept = (half_de <= 0) | (bits < thresh)
    return jnp.where(accept, -x.astype(jnp.int32), x).astype(jnp.int8)


def _random_state(key):
    ka, kb = jax.random.split(key)
    a = jnp.where(rng.uniform(ka, (R, L, HALF)) < 0.5, 1, -1)
    b = jnp.where(rng.uniform(kb, (R, L, HALF)) < 0.5, 1, -1)
    return a.astype(jnp.int8), b.astype(jnp.int8)


def _bits(key):
    return jax.random.bits(key, (R, L, HALF), dtype=jnp.uint32)


@pytest.mark.parametrize("color", [0, 1])
def test_halo_kernel_matches_jnp_stencil_bitwise(color):
    """Same random bits -> same flips, for non-trivial halo rows (taken
    from an independent random array, so splice errors can't cancel)."""
    a, b = _random_state(rng.base_key(0))
    hx, _ = _random_state(rng.base_key(9))
    hu, hd = hx[:, :1], hx[:, 1:2]
    bits = _bits(rng.base_key(1))
    model = Ising2D(nx=2 * HALF, ny=L, kbt=2.26918531421, backend="jnp")
    t4, t8 = i2p.accept_thresholds_u32(model.beta)
    offs = jnp.array([0, 0], jnp.int32)

    got = i2p.sharded_phase(
        a, b, hu, hd, i2p.seeds_from_key(rng.base_key(2), 0), offs,
        color=color, beta=float(model.beta), bits=bits, interpret=True,
    )
    want = _oracle_phase(a, b, hu, hd, color, bits, t4, t8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_halo_kernel_row0_parity():
    """A shard starting at global row row0 must use global row parity for
    the x-neighbor direction (row0 is always even by construction)."""
    a, b = _random_state(rng.base_key(3))
    hu, hd = b[:, -1:], b[:, :1]
    bits = _bits(rng.base_key(4))
    model = Ising2D(nx=2 * HALF, ny=4 * L, kbt=2.26918531421,
                    backend="jnp")
    t4, t8 = i2p.accept_thresholds_u32(model.beta)
    # row0 = 2L (even): local parity == global parity, same answer as
    # row0 = 0 — this pins the invariant the jnp path relies on
    for row0 in (0, 2 * L):
        got = i2p.sharded_phase(
            a, b, hu, hd, i2p.seeds_from_key(rng.base_key(5), 0),
            jnp.array([0, row0], jnp.int32),
            color=0, beta=float(model.beta), bits=bits, interpret=True,
        )
        want = _oracle_phase(a, b, hu, hd, 0, bits, t4, t8)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("color", [0, 1])
def test_xy_halo_kernel_matches_jnp_phase_exact_stub_trig(color):
    """XY sharded Metropolis phase (interpret mode) vs the jnp sharded
    phase with a contraction-free trig stub: the stencil/halo/accept
    logic must agree BITWISE.  (The real ops/trig.py polynomial is the
    one float chain where XLA's FMA contraction may differ by 1 ulp
    between the jnp and Pallas compilation contexts, so the exact check
    uses a stub and the real-trig check below uses atol=1e-6.)"""
    import cuda_fortran_mc_simulation_spin_tpu.ops.trig as trig
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas as xyp

    orig = trig.cos_sin_2pi
    trig.cos_sin_2pi = lambda u: (1.0 - u, u)
    try:
        model = XY2D(nx=2 * HALF, ny=4 * L, kbt=0.89, backend="jnp")
        st = jax.vmap(lambda k: model.init_state("random", k))(
            jax.random.split(rng.base_key(50), R)
        )
        hx_src = jax.vmap(lambda k: model.init_state("random", k))(
            jax.random.split(rng.base_key(51), R)
        )
        halos_x = (hx_src.bx[:, :1], hx_src.bx[:, 1:2])
        halos_y = (hx_src.by[:, :1], hx_src.by[:, 1:2])
        u_c = rng.uniform(rng.base_key(52), (R, L, HALF))
        u_a = rng.uniform(rng.base_key(53), (R, L, HALF))
        sx, sy = st.ax[:, :L], st.ay[:, :L]
        ox, oy = st.bx[:, :L], st.by[:, :L]
        gx, gy = xyp.sharded_phase(
            sx, sy, ox, oy, halos_x, halos_y,
            xyp.seeds_from_key(rng.base_key(54), 0),
            jnp.array([0, 0], jnp.int32),
            color=color, beta=float(model.beta), u_cand=u_c, u_acc=u_a,
            interpret=True,
        )
        wx, wy = jax.vmap(
            lambda a1, a2, b1, b2, h1, h2, h3, h4, uc, ua: model._phase(
                a1, a2, b1, b2, color, uc, ua, halos=((h1, h2), (h3, h4))
            )
        )(sx, sy, ox, oy, halos_x[0], halos_x[1], halos_y[0], halos_y[1],
          u_c, u_a)
        np.testing.assert_array_equal(np.asarray(gx), np.asarray(wx))
        np.testing.assert_array_equal(np.asarray(gy), np.asarray(wy))
    finally:
        trig.cos_sin_2pi = orig


@pytest.mark.parametrize("color", [0, 1])
def test_xy_halo_kernel_matches_jnp_phase_bitwise(color):
    """XY sharded Metropolis phase (interpret mode) given explicit
    uniforms matches the jnp sharded phase to 1 ulp (same op sequence;
    only the candidate polynomial's FMA contraction may differ)."""
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas as xyp

    model = XY2D(nx=2 * HALF, ny=4 * L, kbt=0.89, backend="jnp")
    st = jax.vmap(lambda k: model.init_state("random", k))(
        jax.random.split(rng.base_key(0), R)
    )
    hx_src = jax.vmap(lambda k: model.init_state("random", k))(
        jax.random.split(rng.base_key(1), R)
    )
    halos_x = (hx_src.bx[:, :1], hx_src.bx[:, 1:2])
    halos_y = (hx_src.by[:, :1], hx_src.by[:, 1:2])
    u_c = rng.uniform(rng.base_key(2), (R, L, HALF))
    u_a = rng.uniform(rng.base_key(3), (R, L, HALF))
    sx, sy = st.ax[:, :L], st.ay[:, :L]
    ox, oy = st.bx[:, :L], st.by[:, :L]

    gx, gy = xyp.sharded_phase(
        sx, sy, ox, oy, halos_x, halos_y,
        xyp.seeds_from_key(rng.base_key(4), 0),
        jnp.array([0, 0], jnp.int32),
        color=color, beta=float(model.beta), u_cand=u_c, u_acc=u_a,
        interpret=True,
    )
    wx, wy = jax.vmap(
        lambda a1, a2, b1, b2, h1, h2, h3, h4, uc, ua: model._phase(
            a1, a2, b1, b2, color, uc, ua, halos=((h1, h2), (h3, h4))
        )
    )(sx, sy, ox, oy, halos_x[0], halos_x[1], halos_y[0], halos_y[1],
      u_c, u_a)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(wy), atol=1e-6)


def test_xy_halo_or_kernel_matches_jnp():
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas as xyp

    model = XY2D(nx=2 * HALF, ny=4 * L, kbt=0.89, backend="jnp")
    st = jax.vmap(lambda k: model.init_state("random", k))(
        jax.random.split(rng.base_key(5), R)
    )
    sx, sy = st.ax[:, :L], st.ay[:, :L]
    ox, oy = st.bx[:, :L], st.by[:, :L]
    halos_x = (ox[:, -1:], ox[:, :1])
    halos_y = (oy[:, -1:], oy[:, :1])
    gx, gy = xyp.sharded_or_phase(
        sx, sy, ox, oy, halos_x, halos_y,
        jnp.array([0, 0], jnp.int32), color=0, interpret=True,
    )
    wx, wy = jax.vmap(
        lambda a1, a2, b1, b2, h1, h2, h3, h4: model._or_phase(
            a1, a2, b1, b2, 0, halos=((h1, h2), (h3, h4))
        )
    )(sx, sy, ox, oy, halos_x[0], halos_x[1], halos_y[0], halos_y[1])
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(wy), atol=1e-6)


@pytest.mark.parametrize("color", [0, 1])
def test_clock_halo_kernel_matches_jnp_phase(color):
    from cuda_fortran_mc_simulation_spin_tpu.core import tables
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import clock_pallas as cp
    from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
        seeds_from_key,
    )

    model = Clock2D(nx=2 * HALF, ny=4 * L, kbt=0.91, q=6, backend="jnp")
    st = jax.vmap(lambda k: model.init_state("random", k))(
        jax.random.split(rng.base_key(6), R)
    )
    x, o = st.a[:, :L], st.b[:, :L]
    hu, hd = o[:, -1:], o[:, :1]
    u_c = rng.uniform(rng.base_key(7), (R, L, HALF))
    u_a = rng.uniform(rng.base_key(8), (R, L, HALF))
    got = cp.sharded_phase(
        x, o, hu, hd, seeds_from_key(rng.base_key(9), 0),
        jnp.array([0, 0], jnp.int32),
        color=color, q=6, beta=float(model.beta),
        u_cand=u_c, u_acc=u_a, interpret=True,
    )

    def one(x1, o1, h1, h2, uc, ua):
        huc, hus = tables.state_cos_sin(h1, 6)
        hdc, hds = tables.state_cos_sin(h2, 6)
        return model._phase(
            x1, o1, color, uc, ua, halos=((huc, hdc), (hus, hds))
        )

    want = jax.vmap(one)(x, o, hu, hd, u_c, u_a)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("color", [0, 1])
def test_halo_kernel_cols_matches_jnp_stencil_bitwise(color):
    """x-sharded Ising phase: exchanged boundary COLUMNS (the (dx, dy)
    decomposition) must reproduce lattice.neighbor_sums_halo2d exactly."""
    a, b = _random_state(rng.base_key(20))
    hx, _ = _random_state(rng.base_key(21))
    hu, hd = hx[:, :1], hx[:, 1:2]
    hcl, _ = _random_state(rng.base_key(22))
    hl, hr = hcl[:, :, :1], hcl[:, :, 1:2]
    bits = _bits(rng.base_key(23))
    model = Ising2D(nx=4 * HALF, ny=L, kbt=2.26918531421, backend="jnp")
    t4, t8 = i2p.accept_thresholds_u32(model.beta)
    offs = jnp.array([0, 0, HALF], jnp.int32)

    got = i2p.sharded_phase(
        a, b, hu, hd, i2p.seeds_from_key(rng.base_key(24), 0), offs,
        color=color, beta=float(model.beta), halo_lf=hl, halo_rt=hr,
        bits=bits, interpret=True,
    )
    nsum = jax.vmap(
        lambda o1, h1, h2, h3, h4: lattice.neighbor_sums_halo2d(
            o1, h1, h2, h3, h4, color
        )
    )(b, hu, hd, hl, hr)
    half_de = a.astype(jnp.int32) * nsum.astype(jnp.int32)
    thresh = jnp.where(half_de == 2, jnp.uint32(t4), jnp.uint32(t8))
    accept = (half_de <= 0) | (bits < thresh)
    want = jnp.where(accept, -a.astype(jnp.int32), a).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("color", [0, 1])
def test_clock_halo_kernel_cols_matches_jnp_phase(color):
    from cuda_fortran_mc_simulation_spin_tpu.core import tables
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import clock_pallas as cp
    from cuda_fortran_mc_simulation_spin_tpu.ops.ising2d_pallas import (
        seeds_from_key,
    )

    model = Clock2D(nx=4 * HALF, ny=4 * L, kbt=0.91, q=6, backend="jnp")
    st = jax.vmap(lambda k: model.init_state("random", k))(
        jax.random.split(rng.base_key(26), R)
    )
    x, o = st.a[:, :L, :HALF], st.b[:, :L, :HALF]
    hu, hd = o[:, -1:], o[:, :1]
    hl, hr = o[:, :, -1:], o[:, :, :1]
    u_c = rng.uniform(rng.base_key(27), (R, L, HALF))
    u_a = rng.uniform(rng.base_key(28), (R, L, HALF))
    got = cp.sharded_phase(
        x, o, hu, hd, seeds_from_key(rng.base_key(29), 0),
        jnp.array([0, 0, HALF], jnp.int32),
        color=color, q=6, beta=float(model.beta),
        halo_lf=hl, halo_rt=hr, u_cand=u_c, u_acc=u_a, interpret=True,
    )

    def one(x1, o1, h1, h2, h3, h4, uc, ua):
        cs = [tables.state_cos_sin(h, 6) for h in (h1, h2, h3, h4)]
        return model._phase(
            x1, o1, color, uc, ua,
            halos=(tuple(c for c, _ in cs), tuple(s for _, s in cs)),
        )

    want = jax.vmap(one)(x, o, hu, hd, hl, hr, u_c, u_a)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("color", [0, 1])
def test_xy_halo_kernel_cols_matches_jnp_phase_bitwise(color):
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas as xyp

    model = XY2D(nx=4 * HALF, ny=4 * L, kbt=0.89, backend="jnp")
    st = jax.vmap(lambda k: model.init_state("random", k))(
        jax.random.split(rng.base_key(30), R)
    )
    sx, sy = st.ax[:, :L, :HALF], st.ay[:, :L, :HALF]
    ox, oy = st.bx[:, :L, :HALF], st.by[:, :L, :HALF]
    halos_x = (ox[:, -1:], ox[:, :1])
    halos_y = (oy[:, -1:], oy[:, :1])
    cols_x = (ox[:, :, -1:], ox[:, :, :1])
    cols_y = (oy[:, :, -1:], oy[:, :, :1])
    u_c = rng.uniform(rng.base_key(31), (R, L, HALF))
    u_a = rng.uniform(rng.base_key(32), (R, L, HALF))
    gx, gy = xyp.sharded_phase(
        sx, sy, ox, oy, halos_x, halos_y,
        xyp.seeds_from_key(rng.base_key(33), 0),
        jnp.array([0, 0, HALF], jnp.int32),
        color=color, beta=float(model.beta),
        cols_x=cols_x, cols_y=cols_y, u_cand=u_c, u_acc=u_a,
        interpret=True,
    )
    wx, wy = jax.vmap(
        lambda a1, a2, b1, b2, x1, x2, x3, x4, y1, y2, y3, y4, uc, ua:
        model._phase(
            a1, a2, b1, b2, color, uc, ua,
            halos=((x1, x2, x3, x4), (y1, y2, y3, y4)),
        )
    )(sx, sy, ox, oy, *halos_x, *cols_x, *halos_y, *cols_y, u_c, u_a)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(wy), atol=1e-6)


def test_xy_halo_or_kernel_cols_matches_jnp():
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas as xyp

    model = XY2D(nx=4 * HALF, ny=4 * L, kbt=0.89, backend="jnp")
    st = jax.vmap(lambda k: model.init_state("random", k))(
        jax.random.split(rng.base_key(34), R)
    )
    sx, sy = st.ax[:, :L, :HALF], st.ay[:, :L, :HALF]
    ox, oy = st.bx[:, :L, :HALF], st.by[:, :L, :HALF]
    halos_x = (ox[:, -1:], ox[:, :1])
    halos_y = (oy[:, -1:], oy[:, :1])
    cols_x = (ox[:, :, -1:], ox[:, :, :1])
    cols_y = (oy[:, :, -1:], oy[:, :, :1])
    gx, gy = xyp.sharded_or_phase(
        sx, sy, ox, oy, halos_x, halos_y,
        jnp.array([0, 0, HALF], jnp.int32), color=0,
        cols_x=cols_x, cols_y=cols_y, interpret=True,
    )
    wx, wy = jax.vmap(
        lambda a1, a2, b1, b2, x1, x2, x3, x4, y1, y2, y3, y4:
        model._or_phase(
            a1, a2, b1, b2, 0,
            halos=((x1, x2, x3, x4), (y1, y2, y3, y4)),
        )
    )(sx, sy, ox, oy, *halos_x, *cols_x, *halos_y, *cols_y)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(wy), atol=1e-6)


@pytest.mark.parametrize("color", [0, 1])
def test_ising3d_halo_kernel_matches_jnp_stencil_bitwise(color):
    """z-sharded 3-D phase kernel (interpret mode) vs the jnp halo
    stencil — same bits, same flips."""
    from cuda_fortran_mc_simulation_spin_tpu.core import tables
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        ising3d_pallas as i3p,
    )

    NZ = 4
    key = rng.base_key(40)

    def rs(k, shape):
        return jnp.where(rng.uniform(k, shape) < 0.5, 1, -1).astype(
            jnp.int8)

    a = rs(jax.random.fold_in(key, 0), (R, NZ, L, HALF))
    b = rs(jax.random.fold_in(key, 1), (R, NZ, L, HALF))
    hzm = rs(jax.random.fold_in(key, 2), (R, 1, L, HALF))
    hzp = rs(jax.random.fold_in(key, 3), (R, 1, L, HALF))
    bits = jax.random.bits(jax.random.fold_in(key, 4),
                           (R, NZ, L, HALF), dtype=jnp.uint32)
    beta = 1.0 / 4.51152
    t4, t8, t12 = tables.ising3d_accept_thresholds_u32(beta)
    got = i3p.sharded_phase(
        a, b, hzm, hzp, i2p.seeds_from_key(rng.base_key(41), 0),
        jnp.array([0, 0], jnp.int32),
        color=color, beta=beta, bits=bits, interpret=True,
    )
    nsum = jax.vmap(
        lambda o1, h1, h2: lattice.neighbor_sums3d_halo(o1, h1, h2, color)
    )(b, hzm, hzp)
    k6 = a.astype(jnp.int32) * nsum.astype(jnp.int32)
    thresh = jnp.where(
        k6 == 2, jnp.uint32(t4),
        jnp.where(k6 == 4, jnp.uint32(t8), jnp.uint32(t12)),
    )
    accept = (k6 <= 0) | (bits < thresh)
    want = jnp.where(accept, -a.astype(jnp.int32), a).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.multichip
def test_ising3d_halo_kernel_inside_shard_map_interpret():
    """The 3-D halo kernel inside shard_map on the virtual mesh: T→0
    absorbing known answer + gathered-state observable cross-check."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from cuda_fortran_mc_simulation_spin_tpu.models.ising3d import Ising3D
    from cuda_fortran_mc_simulation_spin_tpu.parallel import (
        domain,
        mesh as mesh_mod,
    )

    os.environ["SPINLAT_SHARD_PALLAS_INTERPRET"] = "1"
    try:
        msh = mesh_mod.make_mesh(1, 4)
        cold = Ising3D(nx=2 * HALF, ny=32, nz=16, kbt=0.05,
                       backend="jnp")
        state = domain.replicated_init(cold, msh, 2, "allup",
                                       rng.base_key(0))
        step = domain.make_sharded_step(cold, msh)
        state, obs = step(state, rng.base_key(1))
        obs = jax.device_get(obs)
        np.testing.assert_allclose(obs["m"], [1.0, 1.0])
        np.testing.assert_allclose(obs["e"], [-3.0, -3.0])

        tc = Ising3D(nx=2 * HALF, ny=32, nz=16, kbt=4.51152,
                     backend="jnp")
        state = domain.replicated_init(tc, msh, 2, "random",
                                       rng.base_key(2))
        step = domain.make_sharded_step(tc, msh)
        for t in (1, 2):
            state, obs = step(state, rng.sweep_key(rng.base_key(3), t))
        obs = jax.device_get(obs)
        for r in range(2):
            sub = jax.tree.map(lambda x: x[r], state)
            assert obs["m"][r] == pytest.approx(
                float(tc.magne_sum(sub)) / tc.nsites, abs=1e-6)
            assert obs["e"][r] == pytest.approx(
                float(tc.energy_sum(sub)) / tc.nsites, abs=1e-6)
    finally:
        os.environ.pop("SPINLAT_SHARD_PALLAS_INTERPRET", None)


@pytest.mark.multichip
def test_halo_kernel_xsharded_shard_map_interpret():
    """The Pallas halo kernels on a (1, 2, 2) mesh — rows AND columns
    sharded — reproduce known answers and gathered-state reductions."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.parallel import (
        domain,
        mesh as mesh_mod,
    )

    os.environ["SPINLAT_SHARD_PALLAS_INTERPRET"] = "1"
    try:
        msh = mesh_mod.make_mesh(1, 2, x=2)
        # local block per shard: (R, 2L/2, 2*HALF/2) = (R, L, HALF) —
        # tileable (HALF == 128)
        cold = Ising2D(nx=4 * HALF, ny=2 * L, kbt=0.05, backend="jnp")
        state = domain.replicated_init(cold, msh, 2, "allup",
                                       rng.base_key(0))
        step = domain.make_sharded_step(cold, msh)
        state, obs = step(state, rng.base_key(1))
        obs = jax.device_get(obs)
        np.testing.assert_allclose(obs["m"], [1.0, 1.0])
        np.testing.assert_allclose(obs["e"], [-2.0, -2.0])

        tc = Ising2D(nx=4 * HALF, ny=2 * L, kbt=2.26918531421,
                     backend="jnp")
        state = domain.replicated_init(tc, msh, 2, "random",
                                       rng.base_key(2))
        step = domain.make_sharded_step(tc, msh)
        for t in (1, 2):
            state, obs = step(state, rng.sweep_key(rng.base_key(3), t))
        obs = jax.device_get(obs)
        for r in range(2):
            sub = jax.tree.map(lambda x: x[r], state)
            assert obs["m"][r] == pytest.approx(
                float(tc.magne_sum(sub)) / tc.nsites, abs=1e-6)
            assert obs["e"][r] == pytest.approx(
                float(tc.energy_sum(sub)) / tc.nsites, abs=1e-6)

        cm = Clock2D(nx=4 * HALF, ny=2 * L, kbt=0.91, q=6, backend="jnp")
        cst = domain.replicated_init(cm, msh, 2, "random", rng.base_key(4))
        cst2, cobs = domain.make_sharded_step(cm, msh)(cst, rng.base_key(5))
        cobs = jax.device_get(cobs)
        sub = jax.tree.map(lambda x: x[0], cst2)
        assert cobs["e"][0] == pytest.approx(
            float(cm.energy_sum(sub)) / cm.nsites, abs=3e-4)

        xm = XY2D(nx=4 * HALF, ny=2 * L, kbt=0.89, backend="jnp")
        xst = domain.replicated_init(xm, msh, 2, "random", rng.base_key(6))
        xst2, xobs = domain.make_sharded_step(xm, msh)(xst, rng.base_key(7))
        xobs = jax.device_get(xobs)
        sub = jax.tree.map(lambda x: x[0], xst2)
        assert xobs["e"][0] == pytest.approx(
            float(xm.energy_sum(sub)) / xm.nsites, abs=3e-4)
        # OR sweeps with column halos conserve energy
        runner = domain.make_sharded_sample_runner(
            xm, msh, mcs=2, replicas=2, init_kind="random",
            n_over_relax=1)
        series = jax.device_get(runner(rng.base_key(8)))
        assert np.all(np.isfinite(series["e"]))
    finally:
        os.environ.pop("SPINLAT_SHARD_PALLAS_INTERPRET", None)


@pytest.mark.multichip
def test_halo_kernel_inside_shard_map_interpret():
    """Full domain-sharded sweep with the Pallas halo kernel (interpret
    mode) inside shard_map on the virtual CPU mesh: physics matches the
    known answer (T→0 absorbing allup; T→∞ psum observables exact)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from cuda_fortran_mc_simulation_spin_tpu.parallel import (
        domain,
        mesh as mesh_mod,
    )

    os.environ["SPINLAT_SHARD_PALLAS_INTERPRET"] = "1"
    try:
        msh = mesh_mod.make_mesh(1, 4)
        cold = Ising2D(nx=2 * HALF, ny=4 * L, kbt=0.05, backend="jnp")
        state = domain.replicated_init(cold, msh, 2, "allup",
                                       rng.base_key(0))
        step = domain.make_sharded_step(cold, msh)
        state, obs = step(state, rng.base_key(1))
        obs = jax.device_get(obs)
        # T→0 from allup is absorbing: thresholds underflow to 0
        np.testing.assert_allclose(obs["m"], [1.0, 1.0])
        np.testing.assert_allclose(obs["e"], [-2.0, -2.0])
        assert np.all(np.asarray(jax.device_get(state.a)) == 1)

        tc = Ising2D(nx=2 * HALF, ny=4 * L, kbt=2.26918531421,
                     backend="jnp")
        state = domain.replicated_init(tc, msh, 2, "random",
                                       rng.base_key(2))
        step = domain.make_sharded_step(tc, msh)
        for t in (1, 2):
            state, obs = step(state, rng.sweep_key(rng.base_key(3), t))
        obs = jax.device_get(obs)
        # psum observables equal direct reductions on the gathered state
        # (the ising fused in-phase obs path)
        for r in range(2):
            sub = jax.tree.map(lambda x: x[r], state)
            m_direct = float(tc.magne_sum(sub)) / tc.nsites
            e_direct = float(tc.energy_sum(sub)) / tc.nsites
            assert obs["m"][r] == pytest.approx(m_direct, abs=1e-6)
            assert obs["e"][r] == pytest.approx(e_direct, abs=1e-6)

        # clock and XY fused in-phase obs paths
        from cuda_fortran_mc_simulation_spin_tpu.models.clock import (
            Clock2D,
        )
        from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

        cm = Clock2D(nx=2 * HALF, ny=4 * L, kbt=0.91, q=6,
                     backend="jnp")
        cst = domain.replicated_init(cm, msh, 2, "random",
                                     rng.base_key(4))
        cst2, cobs = domain.make_sharded_step(cm, msh)(
            cst, rng.base_key(5))
        cobs = jax.device_get(cobs)
        sub = jax.tree.map(lambda x: x[0], cst2)
        mx, my = cm.magne_sums(sub)
        assert cobs["m"][0] == pytest.approx(
            float(mx) / cm.nsites, abs=3e-4)
        assert cobs["my"][0] == pytest.approx(
            float(my) / cm.nsites, abs=3e-4)
        assert cobs["e"][0] == pytest.approx(
            float(cm.energy_sum(sub)) / cm.nsites, abs=3e-4)

        xm = XY2D(nx=2 * HALF, ny=4 * L, kbt=0.89, backend="jnp")
        xst = domain.replicated_init(xm, msh, 2, "random",
                                     rng.base_key(6))
        xst2, xobs = domain.make_sharded_step(xm, msh)(
            xst, rng.base_key(7))
        xobs = jax.device_get(xobs)
        sub = jax.tree.map(lambda x: x[0], xst2)
        mx, my = xm.magne_sums(sub)
        assert xobs["m"][0] == pytest.approx(
            float(mx) / xm.nsites, abs=3e-4)
        assert xobs["e"][0] == pytest.approx(
            float(xm.energy_sum(sub)) / xm.nsites, abs=3e-4)
    finally:
        os.environ.pop("SPINLAT_SHARD_PALLAS_INTERPRET", None)
