"""Ising3D correctness: codec, stencil, invariants, exact enumeration."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import lattice, rng
from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sweep_mod
from cuda_fortran_mc_simulation_spin_tpu.models.ising3d import Ising3D


def test_split_merge_3d_roundtrip():
    rng_np = np.random.default_rng(0)
    full = rng_np.integers(-5, 6, size=(4, 6, 8)).astype(np.int32)
    a, b = lattice.split_checkerboard3d(jnp.asarray(full))
    back = np.asarray(lattice.merge_checkerboard3d(a, b))
    np.testing.assert_array_equal(back, full)
    # color assignment: a holds (x+y+z) even
    for z in range(4):
        for y in range(6):
            for i in range(4):
                assert np.asarray(a)[z, y, i] == full[
                    z, y, 2 * i + ((y + z) & 1)
                ]


def test_neighbor_sums3d_match_bruteforce():
    rng_np = np.random.default_rng(1)
    full = rng_np.integers(-5, 6, size=(4, 6, 8)).astype(np.int32)
    ns = sum(
        np.roll(full, s, axis=ax) for ax in (0, 1, 2) for s in (1, -1)
    )
    a, b = lattice.split_checkerboard3d(jnp.asarray(full))
    ns_a_e, ns_b_e = map(
        np.asarray, lattice.split_checkerboard3d(jnp.asarray(ns))
    )
    np.testing.assert_array_equal(
        np.asarray(lattice.neighbor_sums3d(b, 0)), ns_a_e
    )
    np.testing.assert_array_equal(
        np.asarray(lattice.neighbor_sums3d(a, 1)), ns_b_e
    )


@pytest.fixture(scope="module")
def model():
    return Ising3D(nx=8, ny=6, nz=4, kbt=4.51152)


def test_allup_observables(model):
    st = model.init_state("allup")
    obs = {k: float(v) for k, v in model.observables(st).items()}
    assert obs["m"] == pytest.approx(1.0)
    assert obs["e"] == pytest.approx(-3.0)


def test_energy_matches_bruteforce(model):
    st = model.init_state("random", rng.base_key(2))
    full = model.full_lattice(st)
    assert set(np.unique(full)) <= {-1, 1}
    assert int(model.energy_sum(st)) == model.energy_sum_numpy(full)
    assert int(model.magne_sum(st)) == int(full.sum())


def test_sweep_domain_and_determinism(model):
    st = model.init_state("random", rng.base_key(3))
    s1 = jax.jit(model.sweep)(st, rng.base_key(5))
    s2 = jax.jit(model.sweep)(st, rng.base_key(5))
    np.testing.assert_array_equal(np.asarray(s1.a), np.asarray(s2.a))
    full = model.full_lattice(s1)
    assert set(np.unique(full)) <= {-1, 1}


def _exact_3d_energy(nx, ny, nz, kbt):
    beta = 1.0 / kbt
    sites = nx * ny * nz
    es = []
    for bits in itertools.product([-1, 1], repeat=sites):
        s = np.array(bits).reshape(nz, ny, nx)
        e = -sum(
            (s * np.roll(s, -1, axis=ax)).sum() for ax in (0, 1, 2)
        )
        es.append(e)
    es = np.array(es, np.float64)
    w = np.exp(-beta * (es - es.min()))
    return float((es * w).sum() / w.sum() / sites)


@pytest.mark.slow
def test_equilibrium_vs_exact_enumeration():
    nx, ny, nz, kbt = 4, 2, 2, 5.0
    e_exact = _exact_3d_energy(nx, ny, nz, kbt)
    m = Ising3D(nx=nx, ny=ny, nz=nz, kbt=kbt)
    mcs = 50_000
    runner = jax.jit(
        sweep_mod.make_sample_runner(m, mcs=mcs, init_kind="random")
    )
    series = jax.device_get(runner(rng.base_key(7)))
    e_mc = np.asarray(series["e"], np.float64)[5000:].mean()
    assert e_mc == pytest.approx(e_exact, abs=0.03)
