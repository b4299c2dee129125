"""Bit-packed multispin Ising3D kernel (ops/ising3d_multispin.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import lattice, rng
from cuda_fortran_mc_simulation_spin_tpu.ops import (
    ising2d_multispin as ms2,
    ising3d_multispin as ms3,
)

NZ, NY, HALF = 8, 256, 128


def _on_tpu() -> bool:
    return jax.default_backend() != "cpu" or bool(
        os.environ.get("SPINLAT_TEST_ON_TPU"))


def _rand_vol(key, shape):
    return (jax.random.bernoulli(key, 0.5, shape).astype(jnp.int8) * 2
            - 1)


def _bits(key, shape):
    return jax.random.bits(key, shape, dtype=jnp.uint32).astype(jnp.int32)


@pytest.mark.parametrize("color", [0, 1])
def test_packed3d_reference_matches_canonical_stencil(color):
    ka, kb, k4, k8, k12 = jax.random.split(rng.base_key(20), 5)
    a = _rand_vol(ka, (NZ, NY, HALF))
    b = _rand_vol(kb, (NZ, NY, HALF))
    b4u = jax.random.bernoulli(k4, 0.3, (NZ, NY, HALF))
    b8u = jax.random.bernoulli(k8, 0.1, (NZ, NY, HALF))
    b12u = jax.random.bernoulli(k12, 0.02, (NZ, NY, HALF))
    x, o = (a, b) if color == 0 else (b, a)
    nsum = lattice.neighbor_sums3d(o.astype(jnp.int32), color)
    k = x.astype(jnp.int32) * nsum
    accept = (k <= 0) | jnp.where(
        k == 2, b4u, jnp.where(k == 4, b8u, b12u))
    want = jnp.where(accept, -x, x)
    got = ms3.packed_phase3d_reference(
        ms2.pack_color(x), ms2.pack_color(o), color,
        ms2.pack_color(b4u.astype(jnp.int8) * 2 - 1),
        ms2.pack_color(b8u.astype(jnp.int8) * 2 - 1),
        ms2.pack_color(b12u.astype(jnp.int8) * 2 - 1),
    )
    np.testing.assert_array_equal(np.asarray(ms2.unpack_color(got)),
                                  np.asarray(want))


@pytest.mark.parametrize("color", [0, 1])
def test_phase3d_kernel_interpret_matches_reference(color):
    ka, kb, k4, k8, k12 = jax.random.split(rng.base_key(21), 5)
    R = 1
    wa = ms2.pack_color(_rand_vol(ka, (R, NZ, NY, HALF)))
    wb = ms2.pack_color(_rand_vol(kb, (R, NZ, NY, HALF)))
    shp = (R, NZ, NY // 32, HALF)
    b4, b8, b12 = _bits(k4, shp), _bits(k8, shp), _bits(k12, shp)
    x, o = (wa, wb) if color == 0 else (wb, wa)
    got = ms3.phase3d_packed_with_bits(x, o, b4, b8, b12, color=color,
                                       interpret=True)
    want = jax.vmap(
        lambda xw, ow, p4, p8, p12: ms3.packed_phase3d_reference(
            xw, ow, color, p4, p8, p12)
    )(x, o, b4, b8, b12)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("color", [0, 1])
def test_phase3d_kernel_mosaic_matches_reference(color):
    if not _on_tpu():
        pytest.skip("needs the chip (Mosaic compile)")
    ka, kb, k4, k8, k12 = jax.random.split(rng.base_key(22), 5)
    R = 1
    wa = ms2.pack_color(_rand_vol(ka, (R, NZ, NY, HALF)))
    wb = ms2.pack_color(_rand_vol(kb, (R, NZ, NY, HALF)))
    shp = (R, NZ, NY // 32, HALF)
    b4, b8, b12 = _bits(k4, shp), _bits(k8, shp), _bits(k12, shp)
    x, o = (wa, wb) if color == 0 else (wb, wa)
    got = ms3.phase3d_packed_with_bits(x, o, b4, b8, b12, color=color)
    want = jax.vmap(
        lambda xw, ow, p4, p8, p12: ms3.packed_phase3d_reference(
            xw, ow, color, p4, p8, p12)
    )(x, o, b4, b8, b12)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("color", [0, 1])
def test_packed3d_sharded_reference_matches_halo_stencil(color):
    ka, kb, k4, k8, k12, kh = jax.random.split(rng.base_key(40), 6)
    x = _rand_vol(ka, (NZ, NY, HALF))
    o = _rand_vol(kb, (NZ, NY, HALF))
    hzm = _rand_vol(kh, (1, NY, HALF))
    hzp = _rand_vol(jax.random.fold_in(kh, 1), (1, NY, HALF))
    b4u = jax.random.bernoulli(k4, 0.3, (NZ, NY, HALF))
    b8u = jax.random.bernoulli(k8, 0.1, (NZ, NY, HALF))
    b12u = jax.random.bernoulli(k12, 0.02, (NZ, NY, HALF))
    nsum = lattice.neighbor_sums3d_halo(
        o.astype(jnp.int32), hzm.astype(jnp.int32),
        hzp.astype(jnp.int32), color)
    k = x.astype(jnp.int32) * nsum
    accept = (k <= 0) | jnp.where(k == 2, b4u,
                                  jnp.where(k == 4, b8u, b12u))
    want = jnp.where(accept, -x, x)
    got = ms3.packed_sharded_phase3d_reference(
        ms2.pack_color(x), ms2.pack_color(o), color,
        ms2.pack_color(b4u.astype(jnp.int8) * 2 - 1),
        ms2.pack_color(b8u.astype(jnp.int8) * 2 - 1),
        ms2.pack_color(b12u.astype(jnp.int8) * 2 - 1),
        ms2.pack_color(hzm), ms2.pack_color(hzp),
    )
    np.testing.assert_array_equal(np.asarray(ms2.unpack_color(got)),
                                  np.asarray(want))


@pytest.mark.parametrize("color", [0, 1])
def test_sharded_phase3d_packed_interpret_matches_reference(color):
    ka, kb, k4, k8, k12, kh = jax.random.split(rng.base_key(41), 6)
    R = 1
    x = ms2.pack_color(_rand_vol(ka, (R, NZ, NY, HALF)))
    o = ms2.pack_color(_rand_vol(kb, (R, NZ, NY, HALF)))
    hzm = ms2.pack_color(_rand_vol(kh, (R, 1, NY, HALF)))
    hzp = ms2.pack_color(_rand_vol(jax.random.fold_in(kh, 1),
                                   (R, 1, NY, HALF)))
    shp = (R, NZ, NY // 32, HALF)
    b4, b8, b12 = _bits(k4, shp), _bits(k8, shp), _bits(k12, shp)
    got = ms3.sharded_phase3d_packed(
        x, o, hzm, hzp, jnp.zeros((2,), jnp.int32),
        jnp.zeros((2,), jnp.int32), color=color, beta=0.22,
        b4=b4, b8=b8, b12=b12, interpret=True,
    )
    want = jax.vmap(
        lambda xw, ow, p4, p8, p12, h1, h2:
        ms3.packed_sharded_phase3d_reference(
            xw, ow, color, p4, p8, p12, h1, h2)
    )(x, o, b4, b8, b12, hzm, hzp)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_packed3d_runner_mesh_invariant_and_absorbing(
        monkeypatch):
    """Full packed 3-D sharded runner (interpret mode): (1,1) vs (2,2)
    bitwise, plus the T→0 absorbing known answer."""
    monkeypatch.setenv("SPINLAT_SHARD_PALLAS_INTERPRET", "1")
    from cuda_fortran_mc_simulation_spin_tpu.models.ising3d import Ising3D
    from cuda_fortran_mc_simulation_spin_tpu.parallel import (
        domain,
        mesh as mm,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs a virtual multi-device mesh (conftest)")
    model = Ising3D(nx=2 * HALF, ny=NY, nz=NZ, kbt=4.511536,
                    backend="jnp")
    series = {}
    for dp, y in ((1, 1), (2, 2)):
        mesh = mm.make_mesh(dp, y)
        assert domain._shard_packed_mode(model, mesh, 4)[0] == "3d"
        run = domain.make_sharded_sample_runner(model, mesh, mcs=2,
                                                replicas=4)
        series[(dp, y)] = jax.device_get(run(rng.base_key(43)))
    for k in ("m", "e"):
        np.testing.assert_array_equal(
            np.asarray(series[(1, 1)][k]), np.asarray(series[(2, 2)][k]))

    cold = Ising3D(nx=2 * HALF, ny=NY, nz=NZ, kbt=0.05, backend="jnp")
    run = domain.make_sharded_sample_runner(cold, mm.make_mesh(2, 2),
                                            mcs=2, replicas=4)
    out = jax.device_get(run(rng.base_key(44)))
    np.testing.assert_allclose(np.asarray(out["m"]), 1.0, atol=0)
    np.testing.assert_allclose(np.asarray(out["e"]), -3.0, atol=0)


def test_sweep_measure_packed3d_matches_state_observables():
    if not _on_tpu():
        pytest.skip("hardware PRNG path needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.models.ising3d import Ising3D

    model = Ising3D(nx=2 * HALF, ny=NY, nz=NZ, kbt=4.511536)
    st = jax.vmap(lambda k: model.init_state("random", k))(
        jax.random.split(rng.base_key(23), 2))
    wa, wb = ms2.pack_color(st.a), ms2.pack_color(st.b)
    wa, wb, obs = ms3.sweep_measure_packed3d(model, wa, wb,
                                             rng.base_key(24))
    final = type(st)(ms2.unpack_color(wa), ms2.unpack_color(wb))
    n_inv = 1.0 / model.nsites
    for r in range(2):
        s1 = type(st)(final.a[r], final.b[r])
        m_want = float(model.magne_sum(s1)) * n_inv
        e_want = float(model.energy_sum(s1)) * n_inv
        np.testing.assert_allclose(float(obs["m"][r]), m_want,
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(float(obs["e"][r]), e_want,
                                   rtol=0, atol=1e-6)


def test_multisweep_packed3d_matches_state_observables():
    """Final-sweep fused (m, e) from the resident 3-D multisweep equal
    direct reductions; runner resident path absorbing at T→0."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("hardware PRNG path needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.models.ising3d import Ising3D

    model = Ising3D(nx=2 * HALF, ny=NY, nz=32, kbt=4.511536)
    st = jax.vmap(lambda k: model.init_state("random", k))(
        jax.random.split(rng.base_key(70), 2))
    wa, wb = ms2.pack_color(st.a), ms2.pack_color(st.b)
    wa, wb, obs = ms3.multisweep_packed3d(model, wa, wb,
                                          rng.base_key(71), 6)
    final = type(st)(ms2.unpack_color(wa), ms2.unpack_color(wb))
    n_inv = 1.0 / model.nsites
    for r in range(2):
        s1 = type(st)(final.a[r], final.b[r])
        np.testing.assert_allclose(
            float(obs["m"][r, -1]),
            float(model.magne_sum(s1)) * n_inv, rtol=0, atol=1e-6)
        np.testing.assert_allclose(
            float(obs["e"][r, -1]),
            float(model.energy_sum(s1)) * n_inv, rtol=0, atol=1e-6)

    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw

    cold = Ising3D(nx=2 * HALF, ny=NY, nz=32, kbt=0.05)
    runner = jax.jit(sw.make_multispin3d_runner(cold, 4, 2))
    out = jax.device_get(runner(rng.base_key(72)))
    np.testing.assert_allclose(np.asarray(out["m"]), 1.0, atol=0)
    np.testing.assert_allclose(np.asarray(out["e"]), -3.0, atol=0)


def test_multispin3d_matches_phase_kernel_statistically():
    """m(t) means vs the int8 3-D phase-kernel runner (independent
    streams, wide gate)."""
    if not _on_tpu():
        pytest.skip("hardware PRNG path needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    from cuda_fortran_mc_simulation_spin_tpu.models.ising3d import Ising3D

    m = Ising3D(nx=64, ny=256, nz=8, kbt=4.511536)
    mcs, nsamp = 16, 8
    runner = jax.jit(sw.make_sample_runner(m, mcs))
    phase_curves = np.stack([
        np.asarray(jax.device_get(
            runner(rng.sample_key(rng.base_key(25), i)))["m"],
            np.float64)
        for i in range(nsamp)
    ])

    @jax.jit
    def ms_run(call_key):
        init_keys = jax.vmap(
            lambda r: jax.random.fold_in(rng.init_key(call_key), r)
        )(jnp.arange(nsamp))
        st = jax.vmap(lambda k: m.init_state("allup", k))(init_keys)
        wa, wb = ms2.pack_color(st.a), ms2.pack_color(st.b)

        def body(c, t):
            wa, wb, obs = ms3.sweep_measure_packed3d(
                m, c[0], c[1], rng.sweep_key(call_key, t))
            return (wa, wb), obs["m"]
        _, series = jax.lax.scan(body, (wa, wb),
                                 jnp.arange(1, mcs + 1))
        return series  # (mcs, nsamp)

    ms_curves = np.asarray(jax.device_get(ms_run(rng.base_key(26))),
                           np.float64).T
    sem = phase_curves.std(0, ddof=1) / np.sqrt(nsamp)
    diff = np.abs(phase_curves.mean(0) - ms_curves.mean(0))
    assert np.all(diff < 9 * sem + 5e-3)
