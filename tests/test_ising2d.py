"""Ising2D correctness: invariants, exact-enumeration equilibrium, stats.

The reference ships no tests (/root/reference/test/check.f90 is a stub);
this is the test pyramid SURVEY.md §4 calls for.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng, stats
from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sweep_mod
from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D


@pytest.fixture(scope="module")
def model():
    return Ising2D(nx=8, ny=8, kbt=2.5)


def test_allup_observables(model):
    st = model.init_state("allup")
    obs = model.observables(st)
    assert float(obs["m"]) == pytest.approx(1.0)
    # every site contributes -2 (right+down bonds, all aligned)
    assert float(obs["e"]) == pytest.approx(-2.0)


def test_energy_matches_bruteforce(model):
    st = model.init_state("random", rng.base_key(7))
    full = model.full_lattice(st)
    assert set(np.unique(full)) <= {-1, 1}
    e_np = model.energy_sum_numpy(full)
    assert int(model.energy_sum(st)) == e_np
    assert int(model.magne_sum(st)) == int(full.sum())


def test_sweep_preserves_domain_and_shape(model):
    st = model.init_state("random", rng.base_key(3))
    st2 = jax.jit(model.sweep)(st, rng.base_key(11))
    assert st2.a.shape == st.a.shape and st2.b.dtype == st.b.dtype
    full = model.full_lattice(st2)
    assert set(np.unique(full)) <= {-1, 1}


def test_sweep_deterministic(model):
    st = model.init_state("random", rng.base_key(5))
    k = rng.base_key(9)
    s1 = jax.jit(model.sweep)(st, k)
    s2 = jax.jit(model.sweep)(st, k)
    np.testing.assert_array_equal(np.asarray(s1.a), np.asarray(s2.a))
    np.testing.assert_array_equal(np.asarray(s1.b), np.asarray(s2.b))


def test_zero_temperature_limit():
    """At very low T from an ordered state, nothing ever flips."""
    m = Ising2D(nx=8, ny=8, kbt=0.05)
    st = m.init_state("allup")
    runner = sweep_mod.make_sample_runner(m, mcs=20)
    series = jax.jit(runner)(rng.base_key(1))
    np.testing.assert_allclose(np.asarray(series["m"]), 1.0)
    np.testing.assert_allclose(np.asarray(series["e"]), -2.0)


def test_infinite_temperature_limit():
    """At T=∞ every proposal accepts.

    From an ordered start that means the lattice deterministically
    inverts every sweep (m alternates ±1); from a random start m stays
    near 0.  Both are exact consequences of accept-all Metropolis."""
    m = Ising2D(nx=16, ny=16, kbt=1e8)
    series = jax.jit(sweep_mod.make_sample_runner(m, mcs=6))(rng.base_key(2))
    np.testing.assert_allclose(
        np.asarray(series["m"]), [-1, 1, -1, 1, -1, 1]
    )
    series_r = jax.jit(
        sweep_mod.make_sample_runner(m, mcs=10, init_kind="random")
    )(rng.base_key(2))
    assert abs(float(series_r["m"][-1])) < 0.3


def _exact_ising_stats(n, kbt):
    """Exact Boltzmann <e>, <|m|> for an n×n periodic Ising lattice."""
    beta = 1.0 / kbt
    sites = n * n
    energies = []
    mags = []
    for bits in itertools.product([-1, 1], repeat=sites):
        s = np.array(bits).reshape(n, n)
        e = -(s * (np.roll(s, -1, 0) + np.roll(s, -1, 1))).sum()
        energies.append(e)
        mags.append(abs(s.sum()))
    energies = np.array(energies, dtype=np.float64)
    mags = np.array(mags, dtype=np.float64)
    w = np.exp(-beta * (energies - energies.min()))
    z = w.sum()
    return (energies * w).sum() / z / sites, (mags * w).sum() / z / sites


@pytest.mark.slow
def test_equilibrium_vs_exact_enumeration():
    """Long chain on 4×4 must reproduce exact Boltzmann averages.

    This is the detailed-balance/ergodicity test the reference never had —
    it validates the checkerboard Metropolis kernel end to end.
    """
    n, kbt = 4, 2.6
    e_exact, m_exact = _exact_ising_stats(n, kbt)
    m = Ising2D(nx=n, ny=n, kbt=kbt)

    def measure(state):
        obs = m.observables(state)
        obs["absm"] = jnp.abs(obs["m"])
        return obs

    mcs = 60_000
    runner = jax.jit(
        sweep_mod.make_sample_runner(
            m, mcs=mcs, init_kind="random", measure=measure
        )
    )
    series = jax.device_get(runner(rng.base_key(123)))
    burn = 5_000
    e_mc = series["e"][burn:].mean()
    m_mc = series["absm"][burn:].mean()
    assert e_mc == pytest.approx(e_exact, abs=0.02)
    assert m_mc == pytest.approx(m_exact, abs=0.02)


def test_run_ensemble_with_kahan_stats(model):
    mcs, tot = 5, 12
    acc = stats.VarianceCovarianceKahan((mcs,))
    captured = []

    def accumulate(series):
        captured.append((series["m"], series["e"]))
        acc.add_data(series["m"], series["e"])

    sweep_mod.run_ensemble(
        model, mcs, tot, rng.base_key(42), accumulate, replicas=3,
        samples_per_call=2,
    )
    assert acc.num_sample() == tot
    assert acc.mean1().shape == (mcs,)
    # Kahan accumulators must reproduce plain f64 numpy moments over the
    # same per-history series
    ms = np.concatenate([np.asarray(c[0], np.float64) for c in captured])
    es = np.concatenate([np.asarray(c[1], np.float64) for c in captured])
    assert ms.shape == (tot, mcs)
    # batched histories must actually be distinct
    assert len({tuple(row) for row in ms}) > 1
    np.testing.assert_allclose(acc.mean1(), ms.mean(0), rtol=1e-6)
    np.testing.assert_allclose(acc.mean2(), es.mean(0), rtol=1e-6)
    np.testing.assert_allclose(
        acc.var1(), ms.var(0, ddof=1), rtol=1e-5, atol=1e-12
    )
    np.testing.assert_allclose(
        acc.cov(),
        ((ms - ms.mean(0)) * (es - es.mean(0))).sum(0) / (tot - 1),
        rtol=1e-5, atol=1e-12,
    )


def test_sweep_batched_matches_vmapped_jnp(model):
    """jnp sweep_batched == vmap of per-replica sweeps with folded keys."""
    keys = jax.vmap(
        lambda r: jax.random.fold_in(rng.base_key(77), r)
    )(jnp.arange(3))
    state = jax.vmap(lambda k: model.init_state("random", k))(keys)
    out = model.sweep_batched(state, rng.base_key(77))
    expect = jax.vmap(model.sweep_jnp)(state, keys)
    np.testing.assert_array_equal(np.asarray(out.a), np.asarray(expect.a))
    np.testing.assert_array_equal(np.asarray(out.b), np.asarray(expect.b))


def test_phase_updates_are_independent_of_other_color(model):
    """Color-0 phase must not read updated color-0 values (race-freedom
    by construction — SURVEY.md §5.2 property test)."""
    st = model.init_state("random", rng.base_key(8))
    k = rng.base_key(21)
    # full sweep
    s_full = model.sweep(st, k)
    # manual: phase 0 then phase 1 with the same keys
    u0 = rng.uniform(rng.phase_key(k, 0), st.a.shape)
    a1 = model._phase(st.a, st.b, 0, u0)
    u1 = rng.uniform(rng.phase_key(k, 1), st.b.shape)
    b1 = model._phase(st.b, a1, 1, u1)
    np.testing.assert_array_equal(np.asarray(s_full.a), np.asarray(a1))
    np.testing.assert_array_equal(np.asarray(s_full.b), np.asarray(b1))
