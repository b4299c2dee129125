"""Clock model correctness: invariants, exact enumeration, Ising limit."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng, tables
from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sweep_mod
from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D
from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D


def test_state_cos_sin_select_chain():
    q = 6
    state = jnp.asarray(np.arange(q * 4).reshape(4, q) % q, dtype=jnp.int8)
    c, s = tables.state_cos_sin(state, q)
    ang = 2 * np.pi * np.asarray(state) / q
    np.testing.assert_allclose(np.asarray(c), np.cos(ang), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), np.sin(ang), atol=1e-6)


def test_large_q_beyond_reference_cap():
    """q > 64 (the reference caps its runtime-q engine at 50,
    /root/reference/src/clock_gpu_m.f90:10): direct cos/sin evaluation
    replaces the select chain past q=16, so large q stays correct."""
    q = 100
    state = jnp.asarray(np.arange(q).reshape(4, 25), dtype=jnp.int8)
    c, s = tables.state_cos_sin(state, q)
    ang = 2 * np.pi * np.asarray(state) / q
    np.testing.assert_allclose(np.asarray(c), np.cos(ang), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s), np.sin(ang), atol=1e-5)

    m = Clock2D(nx=8, ny=8, kbt=0.9, q=q, backend="jnp")
    st = m.init_state("random", rng.base_key(5))
    full = m.full_lattice(st)
    assert full.min() >= 0 and full.max() < q
    np.testing.assert_allclose(
        float(m.energy_sum(st)), m.energy_sum_numpy(full), rtol=2e-5,
        atol=1e-3,
    )
    for t in range(2):
        st = jax.jit(m.sweep)(st, rng.sweep_key(rng.base_key(6), t))
    full = m.full_lattice(st)
    assert full.min() >= 0 and full.max() < q
    with pytest.raises(ValueError, match="supported range"):
        Clock2D(nx=8, ny=8, kbt=0.9, q=200)


def test_ordered_start_observables():
    m = Clock2D(nx=8, ny=8, kbt=0.9, q=6)
    st = m.init_state("allup")
    obs = {k: float(v) for k, v in m.observables(st).items()}
    assert obs["m"] == pytest.approx(1.0)
    assert obs["my"] == pytest.approx(0.0, abs=1e-6)
    assert obs["e"] == pytest.approx(-2.0)


def test_energy_matches_bruteforce():
    m = Clock2D(nx=8, ny=6, kbt=0.9, q=6)
    st = m.init_state("random", rng.base_key(4))
    full = m.full_lattice(st)
    assert full.min() >= 0 and full.max() < 6
    np.testing.assert_allclose(
        float(m.energy_sum(st)), m.energy_sum_numpy(full), rtol=1e-5
    )


def test_sweep_preserves_domain():
    m = Clock2D(nx=8, ny=8, kbt=0.9, q=6)
    st = m.init_state("random", rng.base_key(1))
    for t in range(3):
        st = jax.jit(m.sweep)(st, rng.sweep_key(rng.base_key(2), t))
    full = m.full_lattice(st)
    assert full.min() >= 0 and full.max() < 6


def test_candidate_never_equals_current():
    """The proposal excludes the current state (reference :142-143):
    at T→∞ every proposal accepts, so every site must change state
    every sweep."""
    m = Clock2D(nx=8, ny=8, kbt=1e8, q=6)
    st = m.init_state("random", rng.base_key(3))
    before = m.full_lattice(st)
    st2 = jax.jit(m.sweep)(st, rng.base_key(9))
    after = m.full_lattice(st2)
    assert np.all(before != after)


def _exact_clock_stats(nx, ny, q, kbt):
    beta = 1.0 / kbt
    sites = nx * ny
    tab = tables.clock_unit_vectors(q)
    es, mxs = [], []
    for conf in itertools.product(range(q), repeat=sites):
        sarr = np.array(conf).reshape(ny, nx)
        c = tab[sarr, 0]
        s = tab[sarr, 1]
        e = 0.0
        for ax in (0, 1):
            e -= (c * np.roll(c, -1, ax) + s * np.roll(s, -1, ax)).sum()
        es.append(e)
        mxs.append(c.sum())
    es = np.array(es)
    mxs = np.array(mxs)
    w = np.exp(-beta * (es - es.min()))
    z = w.sum()
    return (es * w).sum() / z / sites, (mxs * w).sum() / z / sites


@pytest.mark.slow
def test_equilibrium_vs_exact_enumeration_q4():
    nx, ny, q, kbt = 4, 2, 4, 1.2
    e_exact, _ = _exact_clock_stats(nx, ny, q, kbt)
    m = Clock2D(nx=nx, ny=ny, kbt=kbt, q=q)
    mcs = 60_000
    runner = jax.jit(
        sweep_mod.make_sample_runner(m, mcs=mcs, init_kind="random")
    )
    series = jax.device_get(runner(rng.base_key(11)))
    e_mc = series["e"][5000:].mean()
    assert e_mc == pytest.approx(e_exact, abs=0.03)


@pytest.mark.slow
def test_q2_clock_equals_ising_statistically():
    """q=2 clock is exactly the Ising model (cos ∈ {±1}); relaxation
    curves at the Ising Tc must agree within ensemble error."""
    kbt = 2.26918531421
    mcs, nsamp = 40, 12
    ci = Clock2D(nx=32, ny=32, kbt=kbt, q=2)
    ii = Ising2D(nx=32, ny=32, kbt=kbt, backend="jnp")

    def curves(model):
        runner = jax.jit(
            sweep_mod.make_sample_runner(model, mcs, init_kind="allup")
        )
        return np.stack([
            np.asarray(
                jax.device_get(runner(rng.sample_key(rng.base_key(0), i)))[
                    "m"
                ],
                dtype=np.float64,
            )
            for i in range(nsamp)
        ])

    c_clock = curves(ci)
    c_ising = curves(ii)
    sem = c_ising.std(0, ddof=1) / np.sqrt(nsamp)
    diff = np.abs(c_clock.mean(0) - c_ising.mean(0))
    assert np.all(diff < 6 * sem + 5e-3)
