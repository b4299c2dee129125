"""Pallas kernel unit tests.

The acceptance-threshold math is validated on CPU; kernel-vs-jnp
statistical equivalence needs real TPU hardware and runs there (gated) —
the driver's bench and entry() compile-check exercise the kernel on TPU
every round.
"""

import jax
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.ops import ising2d_pallas as isp


def test_accept_thresholds_u32_exact():
    beta = 1.0 / 2.26918531421
    t4, t8 = isp.accept_thresholds_u32(beta)
    assert 0 < t8 < t4 < 2**32
    # quantization granularity is 2^-32 (absolute)
    np.testing.assert_allclose(t4 / 2**32, np.exp(-4 * beta), atol=2**-32)
    np.testing.assert_allclose(t8 / 2**32, np.exp(-8 * beta), atol=2**-32)
    # beta -> 0: always accept
    t4, t8 = isp.accept_thresholds_u32(1e-12)
    assert t4 == t8 == 2**32 - 1
    # beta -> inf: never accept on uphill moves
    t4, t8 = isp.accept_thresholds_u32(1e3)
    assert t4 == t8 == 0


def test_pick_tile_rows():
    assert isp._pick_tile_rows(8192, 4096) == 128
    assert isp._pick_tile_rows(1024, 512) == 1024  # whole array fits budget
    assert isp._pick_tile_rows(96, 128) == 96
    with pytest.raises(ValueError):
        isp._pick_tile_rows(40, 1 << 20)  # 40 not a multiple of 32


def test_seeds_from_key_distinct_per_phase():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng

    k = rng.base_key(42)
    s0 = np.asarray(isp.seeds_from_key(k, 0))
    s1 = np.asarray(isp.seeds_from_key(k, 1))
    assert s0.shape == (2,) and s0.dtype == np.int32
    assert not np.array_equal(s0, s1)


@pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs TPU for Mosaic kernels"
)
def test_pallas_matches_jnp_statistically():
    """Same physics, independent random streams: relaxation curves at Tc
    must agree within ensemble error."""
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D

    mcs, nsamp = 30, 8
    curves = {}
    for backend in ("jnp", "pallas"):
        m = Ising2D(nx=256, ny=256, kbt=2.26918531421, backend=backend)
        runner = jax.jit(sw.make_sample_runner(m, mcs))
        rows = [
            np.asarray(
                jax.device_get(
                    runner(rng.sample_key(rng.base_key(0), i))
                )["m"],
                dtype=np.float64,
            )
            for i in range(nsamp)
        ]
        curves[backend] = np.stack(rows)
    mean_j = curves["jnp"].mean(0)
    mean_p = curves["pallas"].mean(0)
    sem = curves["jnp"].std(0, ddof=1) / np.sqrt(nsamp)
    assert np.all(np.abs(mean_j - mean_p) < 6 * sem + 1e-3)
