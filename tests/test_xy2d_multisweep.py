"""int16-angle representation for the XY VMEM multisweep kernel.

The kernel itself needs the TPU hardware PRNG (covered by the TPU-gated
suite, tests/test_tpu_kernels.py); these tests pin the angle codec the
protocol layer uses to enter/leave the kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_multisweep as ms

# fast/slow tier: whole file is opt-in negative-result engine (kept validated, not routed)
pytestmark = pytest.mark.slow


def _random_state(model, key):
    return model.init_state("random", key)


def test_angle_roundtrip_error():
    model = XY2D(nx=32, ny=32, kbt=0.89, backend="jnp")
    st = _random_state(model, rng.base_key(0))
    pa, pb = ms.state_to_angles(
        jax.tree.map(lambda x: x[None], st)
    )
    back = ms.angles_to_state(pa, pb)
    np.testing.assert_allclose(np.asarray(back.ax[0]),
                               np.asarray(st.ax), atol=2e-4)
    np.testing.assert_allclose(np.asarray(back.by[0]),
                               np.asarray(st.by), atol=2e-4)
    # |S| = 1 exactly-ish after the codec
    norms = np.hypot(np.asarray(back.ax), np.asarray(back.ay))
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_rotate_angles_is_exact_mod_2pi():
    k = jnp.array([[0, 16384, -32768, 32767]], dtype=jnp.int16)
    th = jnp.float32(np.pi / 2)  # +90° = +16384 angle units
    k2 = ms.rotate_angles(k, th)
    np.testing.assert_array_equal(
        np.asarray(k2, np.int32),
        np.asarray(jnp.array([[16384, -32768, -16384, -16385]],
                             jnp.int16), np.int32),
    )
    # rotating by θ then -θ is the identity, bitwise
    k3 = ms.rotate_angles(ms.rotate_angles(k, th), -th)
    np.testing.assert_array_equal(np.asarray(k3), np.asarray(k))


def test_rotate_angles_matches_component_rotation():
    model = XY2D(nx=32, ny=32, kbt=0.89, backend="jnp")
    st = _random_state(model, rng.base_key(1))
    stb = jax.tree.map(lambda x: x[None], st)
    pa, pb = ms.state_to_angles(stb)
    th = jnp.float32(0.7)
    rot_f32 = model.rotate(st, th)
    rot_ang = ms.angles_to_state(ms.rotate_angles(pa, th),
                                 ms.rotate_angles(pb, th))
    np.testing.assert_allclose(np.asarray(rot_ang.ax[0]),
                               np.asarray(rot_f32.ax), atol=3e-4)
    np.testing.assert_allclose(np.asarray(rot_ang.by[0]),
                               np.asarray(rot_f32.by), atol=3e-4)


def test_atan2_poly_accuracy():
    """The Mosaic-friendly polynomial atan2 must be accurate to well
    under the int16 angle quantum (1 unit = 9.6e-5 rad)."""
    r = np.random.default_rng(0)
    y = r.normal(size=8192).astype(np.float32)
    x = r.normal(size=8192).astype(np.float32)
    got = np.asarray(ms._atan2_units(jnp.asarray(y), jnp.asarray(x)),
                     np.float64)
    want = np.arctan2(y, x) * 65536.0 / (2.0 * np.pi)
    d = (got - want + 32768.0) % 65536.0 - 32768.0
    assert np.abs(d).max() < 0.2  # < 2e-5 rad


def test_fits_vmem_thresholds():
    assert ms.fits_vmem(1536, 768)           # the flagship 1536² shape
    assert not ms.fits_vmem(4096, 2048)      # 4096² does not fit
