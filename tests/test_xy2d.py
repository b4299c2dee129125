"""XY model correctness: invariants, microcanonical conservation,
preparation protocols, Boltzmann consistency."""

import jax

import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sweep_mod
from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D


@pytest.fixture(scope="module")
def model():
    return XY2D(nx=16, ny=16, kbt=0.89)


def _norms(model, state):
    full = model.full_vectors(state)
    return np.hypot(full[..., 0], full[..., 1])


def test_allup_observables(model):
    st = model.init_state("allup")
    obs = {k: float(v) for k, v in model.observables(st).items()}
    assert obs["m"] == pytest.approx(1.0)
    assert obs["my"] == pytest.approx(0.0, abs=1e-6)
    assert obs["e"] == pytest.approx(-2.0)


def test_random_init_unit_norm(model):
    st = model.init_state("random", rng.base_key(1))
    np.testing.assert_allclose(_norms(model, st), 1.0, atol=1e-6)


def test_energy_matches_bruteforce(model):
    st = model.init_state("random", rng.base_key(2))
    full = model.full_vectors(st)
    np.testing.assert_allclose(
        float(model.energy_sum(st)), model.energy_sum_numpy(full),
        rtol=1e-5,
    )


def test_sweep_preserves_unit_norm(model):
    st = model.init_state("random", rng.base_key(3))
    for t in range(3):
        st = jax.jit(model.sweep)(st, rng.sweep_key(rng.base_key(4), t))
    np.testing.assert_allclose(_norms(model, st), 1.0, atol=1e-5)


def test_low_temperature_freeze():
    m = XY2D(nx=8, ny=8, kbt=1e-4)
    st = m.init_state("allup")
    runner = jax.jit(sweep_mod.make_sample_runner(m, mcs=10))
    series = jax.device_get(runner(rng.base_key(5)))
    np.testing.assert_allclose(np.asarray(series["m"]), 1.0, atol=1e-3)


def test_over_relaxation_conserves_energy(model):
    """The reflection is microcanonical: E must be invariant (up to f32
    accumulation), while the configuration changes."""
    st = model.init_state("random", rng.base_key(6))
    e0 = float(model.energy_sum(st))
    st2 = jax.jit(model.over_relax_sweep)(st)
    e1 = float(model.energy_sum(st2))
    assert e1 == pytest.approx(e0, abs=2e-3 * model.nsites ** 0.5 + 1e-2)
    np.testing.assert_allclose(_norms(model, st2), 1.0, atol=1e-5)
    assert not np.allclose(
        model.full_vectors(st2), model.full_vectors(st)
    )


def test_rotation_invariants(model):
    st = model.init_state("random", rng.base_key(7))
    mx0, my0 = map(float, model.magne_sums(st))
    mabs0 = np.hypot(mx0, my0)
    e0 = float(model.energy_sum(st))
    st2 = jax.jit(model.rotate_magne_toward_xaxis)(st)
    mx1, my1 = map(float, model.magne_sums(st2))
    assert my1 == pytest.approx(0.0, abs=1e-3 * model.nsites)
    assert mx1 == pytest.approx(mabs0, rel=1e-4)
    # O(2) rotation is an energy symmetry
    assert float(model.energy_sum(st2)) == pytest.approx(e0, abs=0.05)


def test_prep_finite_magne():
    m = XY2D(nx=32, ny=32, kbt=0.89)
    st = jax.jit(lambda k: m.prep_finite_magne(k, 0.25))(rng.base_key(8))
    mx, my = map(float, m.magne_sums(st))
    mabs = np.hypot(mx, my) / m.nsites
    assert abs(mabs - 0.25) / 0.25 < 1e-2
    assert my / m.nsites == pytest.approx(0.0, abs=1e-4)
    np.testing.assert_allclose(_norms(m, st), 1.0, atol=1e-5)


def test_prep_finite_magne_beyond_single_sweep_saturation():
    """Targets above the one-field-sweep response (~0.6) must converge
    via the stage-2 iterated field sweeps (the reference's loop
    structure has no saturation cap)."""
    m = XY2D(nx=32, ny=32, kbt=0.89)
    for m0 in (0.7, 0.9):
        st = jax.jit(lambda k, t=m0: m.prep_finite_magne(k, t))(
            rng.base_key(11)
        )
        mx, my = map(float, m.magne_sums(st))
        mabs = np.hypot(mx, my) / m.nsites
        assert abs(mabs - m0) / m0 < 1e-2, (m0, mabs)
        np.testing.assert_allclose(_norms(m, st), 1.0, atol=1e-5)


def test_prep_small_magne():
    m = XY2D(nx=32, ny=32, kbt=0.89)
    st = jax.jit(lambda k: m.prep_small_magne(k, 0.02))(rng.base_key(9))
    mx, my = map(float, m.magne_sums(st))
    assert np.hypot(mx, my) / m.nsites < 0.02


def test_autocorrelation(model):
    st = model.init_state("random", rng.base_key(10))
    a0 = float(model.autocorrelation_sum(st, st))
    assert a0 == pytest.approx(model.nsites, rel=1e-5)
    st2 = jax.jit(model.sweep)(st, rng.base_key(11))
    a1 = float(model.autocorrelation_sum(st2, st))
    assert a1 < a0


def test_correlation_allup(model):
    st = model.init_state("allup")
    assert float(model.correlation_sum(st)) == pytest.approx(model.nsites)


@pytest.mark.slow
def test_metropolis_and_overrelax_same_equilibrium():
    """Metropolis-only and Metropolis+OR sample the same Boltzmann
    distribution; equilibrium <e> must agree (the OR sweeps are
    energy-conserving, so this checks both the sampler and the
    reflection)."""
    kbt = 1.2
    m = XY2D(nx=8, ny=8, kbt=kbt)
    mcs, burn = 20_000, 4_000

    def mean_e(n_or):
        runner = jax.jit(
            sweep_mod.make_sample_runner(
                m, mcs=mcs, init_kind="random",
                n_over_relax=n_or, mcs_over_relax=mcs,
            )
        )
        series = jax.device_get(runner(rng.base_key(12 + n_or)))
        return np.asarray(series["e"], np.float64)[burn:].mean()

    e_metro = mean_e(0)
    e_or = mean_e(2)
    assert e_or == pytest.approx(e_metro, abs=0.02)
