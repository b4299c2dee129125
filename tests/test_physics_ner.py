"""Known-answer NER physics: the reference's core experiment.

The reference validates itself by running at exactly-known critical
temperatures where the NER curves have literature-known power laws
(SURVEY.md §4.2).  The flagship: 2D Ising quenched from the ordered
state to Tc shows m(t) ∝ t^(-β/νz) with β/νz = 1/8 / (1 · 2.1667)
≈ 0.0577 (z ≈ 2.17 for 2D Ising Glauber dynamics)."""

import jax
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng, stats
from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sweep_mod
from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D

# fast/slow tier: whole file is statistical NER power-law fits (minutes-class)
pytestmark = pytest.mark.slow


@pytest.mark.slow
def test_ising2d_ner_power_law_at_tc():
    kbt_c = 2.26918531421  # app/ising2d_gpu_relaxation.f90:11
    m = Ising2D(nx=128, ny=128, kbt=kbt_c, backend="jnp")
    mcs, nsamp = 128, 24
    acc = stats.VarianceCovarianceKahan((mcs,))
    runner = jax.jit(
        sweep_mod.make_batch_runner(m, mcs, nsamp, init_kind="allup")
    )
    series = jax.device_get(runner(rng.base_key(0)))
    acc.add_data(
        np.asarray(series["m"], np.float64),
        np.asarray(series["e"], np.float64),
    )
    mt = acc.mean1()
    # power-law fit over t in [10, 128] (skip microscopic times)
    t = np.arange(1, mcs + 1)
    sel = t >= 10
    slope, _ = np.polyfit(np.log(t[sel]), np.log(mt[sel]), 1)
    exponent = -slope
    # β/νz = 0.125/2.1667 ≈ 0.0577; allow finite-size/statistics slack
    assert 0.035 < exponent < 0.085, exponent

    # off-critical control: far below Tc the decay must be much slower
    m_cold = Ising2D(nx=128, ny=128, kbt=1.5, backend="jnp")
    runner_c = jax.jit(
        sweep_mod.make_batch_runner(m_cold, mcs, 8, init_kind="allup")
    )
    series_c = jax.device_get(runner_c(rng.base_key(1)))
    m_cold_mean = np.asarray(series_c["m"], np.float64).mean(0)
    slope_c, _ = np.polyfit(
        np.log(t[sel]), np.log(m_cold_mean[sel]), 1
    )
    assert -slope_c < 0.01  # essentially flat (ordered phase)
