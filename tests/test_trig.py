"""ops/trig.py: the quarter-period polynomial must match float64
cos/sin at float32 roundoff level across the full period."""

import jax.numpy as jnp
import numpy as np

from cuda_fortran_mc_simulation_spin_tpu.ops import trig


def test_cos_sin_2pi_accuracy_and_norm():
    u = jnp.linspace(0.0, 1.0, 200001)[:-1].astype(jnp.float32)
    c, s = trig.cos_sin_2pi(u)
    u64 = np.asarray(u, np.float64)
    np.testing.assert_allclose(np.asarray(c), np.cos(2 * np.pi * u64),
                               atol=2e-7)
    np.testing.assert_allclose(np.asarray(s), np.sin(2 * np.pi * u64),
                               atol=2e-7)
    norm = np.hypot(np.asarray(c, np.float64), np.asarray(s, np.float64))
    np.testing.assert_allclose(norm, 1.0, atol=3e-7)


def test_exp_neg_accuracy():
    """exp_neg matches float64 e^-x to ~1e-7 relative over the
    acceptance-probability domain, and is exactly 1 at x = 0."""
    x = jnp.linspace(0.0, 30.0, 300001).astype(jnp.float32)
    got = np.asarray(trig.exp_neg(x), np.float64)
    want = np.exp(-np.asarray(x, np.float64))
    rel = np.max(np.abs(got - want) / want)
    assert rel < 3e-7
    assert float(trig.exp_neg(jnp.float32(0.0))) == 1.0


def test_cos_sin_2pi_exact_cardinals():
    """u = 0, 1/4, 1/2, 3/4 hit the quadrant selects exactly (r = 0)."""
    u = jnp.array([0.0, 0.25, 0.5, 0.75], jnp.float32)
    c, s = trig.cos_sin_2pi(u)
    np.testing.assert_allclose(np.asarray(c), [1.0, 0.0, -1.0, 0.0],
                               atol=2e-8)
    np.testing.assert_allclose(np.asarray(s), [0.0, 1.0, 0.0, -1.0],
                               atol=2e-8)


def test_cos_sin_2pi_negative_domain():
    """u ∈ (-1, 1) — xy2d_multisweep feeds negative int16-unit phase
    differences; floor + two's-complement `& 3` must act as a true
    mod-4 (pins the documented domain against a future 'simplification'
    to a truncating cast)."""
    u = jnp.linspace(-1.0, 1.0, 400003)[1:-1].astype(jnp.float32)
    c, s = trig.cos_sin_2pi(u)
    u64 = np.asarray(u, np.float64)
    np.testing.assert_allclose(np.asarray(c), np.cos(2 * np.pi * u64),
                               atol=2e-7)
    np.testing.assert_allclose(np.asarray(s), np.sin(2 * np.pi * u64),
                               atol=2e-7)
    # symmetry across 0: cos even, sin odd (±u can fold into different
    # quadrants at half-integer 4u, so equality holds to 1 ulp, not
    # bitwise)
    un = jnp.array([-0.125, -0.375, -0.625, -0.875], jnp.float32)
    cn, sn = trig.cos_sin_2pi(un)
    cp, sp = trig.cos_sin_2pi(-un)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(cp), atol=2e-7)
    np.testing.assert_allclose(np.asarray(sn), -np.asarray(sp), atol=2e-7)
