"""Additional XY protocol-machinery tests."""

import jax
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D


@pytest.fixture(scope="module")
def model():
    return XY2D(nx=16, ny=16, kbt=0.89)


def test_updown_random_rotation(model):
    st = model.init_state("random", rng.base_key(0))
    mx0, my0 = map(float, model.magne_sums(st))
    mabs0 = np.hypot(mx0, my0)
    # collect the sign over many keys: both orientations must occur,
    # and |m| is preserved with my == 0
    signs = []
    for k in range(20):
        st2 = jax.jit(
            model.rotate_magne_toward_xaxis_updown_randomly
        )(st, rng.base_key(k))
        mx, my = map(float, model.magne_sums(st2))
        assert abs(my) < 1e-3 * model.nsites
        assert abs(abs(mx) - mabs0) / mabs0 < 1e-4
        signs.append(np.sign(mx))
    assert +1 in signs and -1 in signs


def test_near_magne_prep():
    """The -m-field drive only reduces |m| (reference semantics,
    /root/reference/src/xy2d_periodic_gpu_m.f90:178-196), so the target
    must sit below the random-start |m|."""
    m = XY2D(nx=16, ny=16, kbt=0.89)
    st0 = m.init_state("random", rng.base_key(3))
    mx, my = map(float, m.magne_sums(st0))
    mabs0 = np.hypot(mx, my) / m.nsites
    target = 0.6 * mabs0
    st = jax.jit(
        lambda k: m.prep_small_magne(k, target, tol=0.25)
    )(rng.base_key(3))
    mx, my = map(float, m.magne_sums(st))
    mabs = np.hypot(mx, my) / m.nsites
    assert abs(mabs - target) / target <= 0.25 + 1e-6


def test_field_sweep_drives_magnetization(model):
    """Positive x-field must raise m_x; the reference acceptance
    u ≤ 1-exp(ΔE) accepts only strictly-downhill moves."""
    st = model.init_state("random", rng.base_key(5))
    mx0 = float(model.magne_sums(st)[0])
    st2 = model.field_sweep(st, rng.base_key(6), 2.0, 0.0)
    mx1 = float(model.magne_sums(st2)[0])
    assert mx1 > mx0
    full = model.full_vectors(st2)
    np.testing.assert_allclose(
        np.hypot(full[..., 0], full[..., 1]), 1.0, atol=1e-5
    )
