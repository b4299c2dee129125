"""Helical-BC XY engine checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.models.xy2d_helical import (
    XY2DHelical,
)


@pytest.fixture(scope="module")
def model():
    return XY2DHelical(nx=5, ny=4, kbt=0.89)


def test_requires_odd_nx():
    with pytest.raises(ValueError):
        XY2DHelical(nx=4, ny=4, kbt=0.9)


def test_allup(model):
    st = model.init_state("allup")
    obs = {k: float(v) for k, v in model.observables(st).items()}
    assert obs["m"] == pytest.approx(1.0)
    assert obs["e"] == pytest.approx(-2.0)


def test_sweep_unit_norm_and_phases(model):
    st = model.init_state("random", rng.base_key(0))
    for t in range(3):
        st = jax.jit(model.sweep)(st, rng.sweep_key(rng.base_key(1), t))
    norms = np.hypot(np.asarray(st[0]), np.asarray(st[1]))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_over_relax_conserves_energy(model):
    st = model.init_state("random", rng.base_key(2))
    e0 = float(model.energy_sum(st))
    st2 = jax.jit(model.over_relax_sweep)(st)
    assert float(model.energy_sum(st2)) == pytest.approx(e0, abs=1e-2)
    assert not np.allclose(np.asarray(st2[0]), np.asarray(st[0]))


def test_phase_mask(model):
    """Only one parity class moves per phase."""
    st = model.init_state("random", rng.base_key(3))
    u_c = rng.uniform(rng.base_key(4), st[0].shape)
    u_a = jnp.zeros_like(st[0])  # always accept
    sx, sy = model._phase(st[0], st[1], 0, u_c, u_a)
    moved = ~np.isclose(np.asarray(sx), np.asarray(st[0]))
    assert not np.any(moved[1::2])
    assert np.any(moved[0::2])
