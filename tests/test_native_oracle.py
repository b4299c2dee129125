"""Native C++ exact-enumeration oracle: self-checks and MC validation
on lattices beyond Python-enumeration reach."""

import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.utils import native

# fast/slow tier: C++ oracle build + exact enumeration (minutes-class)
pytestmark = [
    pytest.mark.skipif(native.build() is None,
                       reason="g++ toolchain unavailable"),
    pytest.mark.slow,
]


def test_ising_oracle_against_python_enum():
    import itertools

    def py_ising(n, kbt):
        beta = 1.0 / kbt
        es, ms = [], []
        for bits in itertools.product([-1, 1], repeat=n * n):
            s = np.array(bits).reshape(n, n)
            es.append(-(s * (np.roll(s, -1, 0) + np.roll(s, -1, 1))).sum())
            ms.append(abs(s.sum()))
        es, ms = np.array(es, float), np.array(ms, float)
        w = np.exp(-beta * (es - es.min()))
        z = w.sum()
        return (es * w).sum() / z / (n * n), (ms * w).sum() / z / (n * n)

    e_py, m_py = py_ising(4, 2.6)
    e_c, m_c = native.ising2d_exact(4, 4, 1 / 2.6)
    assert e_c == pytest.approx(e_py, abs=1e-9)
    assert m_c == pytest.approx(m_py, abs=1e-9)


def test_oracle_rejects_oversize():
    with pytest.raises(ValueError):
        native.ising2d_exact(8, 8, 0.4)
    with pytest.raises(ValueError):
        native.clock_exact(6, 6, 6, 1.0)


@pytest.mark.slow
def test_ising_mc_vs_native_oracle_6x4():
    """24-site lattice: 16.7M states — only the native oracle gets the
    exact answer; the MC chain must reproduce it."""
    import jax

    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D

    kbt = 2.8
    e_exact, _ = native.ising2d_exact(6, 4, 1.0 / kbt)
    m = Ising2D(nx=6, ny=4, kbt=kbt, backend="jnp")
    runner = jax.jit(
        sw.make_sample_runner(m, mcs=60_000, init_kind="random")
    )
    series = jax.device_get(runner(rng.base_key(17)))
    e_mc = np.asarray(series["e"], np.float64)[5000:].mean()
    assert e_mc == pytest.approx(e_exact, abs=0.02)


@pytest.mark.slow
def test_clock_mc_vs_native_oracle_4x4_q3():
    import jax

    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D

    kbt = 1.1
    e_exact, _ = native.clock_exact(4, 4, 3, 1.0 / kbt)
    m = Clock2D(nx=4, ny=4, kbt=kbt, q=3, backend="jnp")
    runner = jax.jit(
        sw.make_sample_runner(m, mcs=60_000, init_kind="random")
    )
    series = jax.device_get(runner(rng.base_key(19)))
    e_mc = np.asarray(series["e"], np.float64)[5000:].mean()
    assert e_mc == pytest.approx(e_exact, abs=0.03)
