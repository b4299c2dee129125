"""Known-answer equilibrium physics on production-like lattices.

These complement the exact-enumeration tests (which are limited to tiny
lattices) with closed-form thermodynamics:

- Onsager's exact spontaneous magnetization of the 2D Ising model,
  m(T) = (1 - sinh⁻⁴(2β))^(1/8) for T < Tc;
- the XY spin-wave (equipartition) limit, e(T→0) = -2 + T/2 per site
  (one quadratic angle mode per site).
"""

import jax
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sweep_mod
from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D
from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

# fast/slow tier: whole file is statistical equilibrium cross-checks (minutes-class)
pytestmark = pytest.mark.slow


@pytest.mark.slow
def test_onsager_magnetization_below_tc():
    kbt = 2.0
    beta = 1.0 / kbt
    m_exact = (1.0 - np.sinh(2.0 * beta) ** -4) ** 0.125  # ≈ 0.9113
    m = Ising2D(nx=128, ny=128, kbt=kbt, backend="jnp")
    mcs, burn = 2000, 1000
    runner = jax.jit(sweep_mod.make_sample_runner(m, mcs, "allup"))
    series = jax.device_get(runner(rng.base_key(3)))
    m_mc = np.abs(np.asarray(series["m"], np.float64))[burn:].mean()
    assert m_mc == pytest.approx(m_exact, abs=0.005)


@pytest.mark.slow
def test_xy_spin_wave_energy_low_t():
    kbt = 0.1
    m = XY2D(nx=64, ny=64, kbt=kbt, backend="jnp")
    mcs, burn = 4000, 2000
    runner = jax.jit(sweep_mod.make_sample_runner(m, mcs, "allup"))
    series = jax.device_get(runner(rng.base_key(4)))
    e_mc = np.asarray(series["e"], np.float64)[burn:].mean()
    e_sw = -2.0 + kbt / 2.0
    # anharmonic corrections are O(T²); allow a small band
    assert e_mc == pytest.approx(e_sw, abs=0.01)
