"""TPU-gated kernel equivalence tests (multisweep, clock, ising3d).

Skipped on CPU CI; run with SPINLAT_TEST_ON_TPU=1 on hardware."""

import jax
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs TPU for Mosaic kernels"
)


@requires_tpu
def test_ising2d_multisweep_physics():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import ising2d_multisweep

    m = Ising2D(nx=512, ny=512, kbt=2.26918531421)
    st = m.init_state("allup")
    st2, obs = ising2d_multisweep.multisweep(m, st, rng.base_key(0), 16)
    obs = jax.device_get(obs)
    # observable cross-check: final-sweep (m, e) must equal direct
    # reductions on the final state
    m_direct = float(m.magne_sum(st2)) / m.nsites
    e_direct = float(m.energy_sum(st2)) / m.nsites
    assert obs["m"][-1] == pytest.approx(m_direct, abs=1e-5)
    assert obs["e"][-1] == pytest.approx(e_direct, abs=1e-5)
    # decay from ordered start at Tc is monotone-ish and nontrivial
    assert 0.3 < obs["m"][-1] < 1.0
    assert np.all(np.diff(obs["m"]) < 0.05)
    full = m.full_lattice(st2)
    assert set(np.unique(full)) <= {-1, 1}


@requires_tpu
def test_ising2d_multisweep_matches_phase_kernel_statistically():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import ising2d_multisweep

    m = Ising2D(nx=256, ny=256, kbt=2.26918531421)
    mcs, nsamp = 20, 8

    # phase-kernel curves
    runner = jax.jit(sw.make_sample_runner(m, mcs))
    phase_curves = np.stack([
        np.asarray(jax.device_get(
            runner(rng.sample_key(rng.base_key(0), i)))["m"], np.float64)
        for i in range(nsamp)
    ])

    # multisweep curves
    @jax.jit
    def ms_run(key):
        st = m.init_state("allup")
        _, obs = ising2d_multisweep.multisweep(m, st, key, mcs)
        return obs["m"]

    ms_curves = np.stack([
        np.asarray(jax.device_get(
            ms_run(rng.sample_key(rng.base_key(1), i))), np.float64)
        for i in range(nsamp)
    ])
    # both means are noisy (independent streams): combined sd is
    # sqrt(2)·sem, and sem itself is an 8-sample estimate — use a wide
    # gate (a 24-sample arbitration run showed ≤1.4σ agreement).
    sem = phase_curves.std(0, ddof=1) / np.sqrt(nsamp)
    diff = np.abs(phase_curves.mean(0) - ms_curves.mean(0))
    assert np.all(diff < 9 * sem + 5e-3)


@requires_tpu
def test_clock_multisweep_physics():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import clock_multisweep

    m = Clock2D(nx=512, ny=512, kbt=0.91, q=6)
    st = m.init_state("allup")
    st2, obs = clock_multisweep.multisweep(m, st, rng.base_key(0), 16)
    obs = jax.device_get(obs)
    mx_direct = float(m.magne_sums(st2)[0]) / m.nsites
    e_direct = float(m.energy_sum(st2)) / m.nsites
    assert obs["m"][-1] == pytest.approx(mx_direct, abs=1e-4)
    assert obs["e"][-1] == pytest.approx(e_direct, abs=1e-4)
    full = m.full_lattice(st2)
    assert full.min() >= 0 and full.max() < 6


@requires_tpu
def test_clock_pallas_matches_jnp_statistically():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D

    mcs, nsamp = 20, 8
    curves = {}
    for backend in ("jnp", "pallas"):
        m = Clock2D(nx=256, ny=256, kbt=0.91, q=6, backend=backend)
        runner = jax.jit(sw.make_sample_runner(m, mcs))
        curves[backend] = np.stack([
            np.asarray(jax.device_get(
                runner(rng.sample_key(rng.base_key(0), i)))["m"],
                np.float64)
            for i in range(nsamp)
        ])
    sem = curves["jnp"].std(0, ddof=1) / np.sqrt(nsamp)
    diff = np.abs(curves["jnp"].mean(0) - curves["pallas"].mean(0))
    assert np.all(diff < 6 * sem + 2e-3)


@requires_tpu
def test_xy_fused_measure_matches_jnp():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_measure_pallas

    model = XY2D(nx=256, ny=256, kbt=0.89)
    st = model.init_state("random", rng.base_key(0))
    snap = model.init_state("random", rng.base_key(1))
    obs = {
        k: float(v)
        for k, v in xy2d_measure_pallas.measure(model, st, snap).items()
    }
    n_inv = 1.0 / model.nsites
    mx, my = model.magne_sums(st)
    ref = {
        "mx": float(mx) * n_inv,
        "my": float(my) * n_inv,
        "e": float(model.energy_sum(st)) * n_inv,
        "A": float(model.autocorrelation_sum(st, snap)) * n_inv,
    }
    for k, v in ref.items():
        assert obs[k] == pytest.approx(v, abs=3e-4), k
    # batched shape
    stb = jax.tree.map(lambda x: jnp_stack3(x), st)
    snapb = jax.tree.map(lambda x: jnp_stack3(x), snap)
    obs_b = xy2d_measure_pallas.measure(model, stb, snapb)
    assert obs_b["e"].shape == (3,)
    np.testing.assert_allclose(
        np.asarray(obs_b["e"]), ref["e"], atol=3e-4
    )


def jnp_stack3(x):
    import jax.numpy as jnp

    return jnp.stack([x, x, x])


@requires_tpu
def test_ising_fused_measure_matches_jnp():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        ising2d_measure_pallas,
    )

    m = Ising2D(nx=256, ny=256, kbt=2.26918531421)
    st = m.init_state("random", rng.base_key(0))
    obs = {
        k: float(v)
        for k, v in ising2d_measure_pallas.measure(m, st).items()
    }
    assert obs["m"] == pytest.approx(
        float(m.magne_sum(st)) / m.nsites, abs=1e-6
    )
    assert obs["e"] == pytest.approx(
        float(m.energy_sum(st)) / m.nsites, abs=1e-6
    )


@requires_tpu
def test_clock_fused_measure_matches_jnp():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import clock_measure_pallas

    m = Clock2D(nx=256, ny=256, kbt=0.91, q=6)
    st = m.init_state("random", rng.base_key(0))
    obs = {
        k: float(v)
        for k, v in clock_measure_pallas.measure(m, st).items()
    }
    mx, my = m.magne_sums(st)
    assert obs["m"] == pytest.approx(float(mx) / m.nsites, abs=3e-4)
    assert obs["my"] == pytest.approx(float(my) / m.nsites, abs=3e-4)
    assert obs["e"] == pytest.approx(
        float(m.energy_sum(st)) / m.nsites, abs=3e-4
    )


@requires_tpu
def test_ising3d_pallas_matches_jnp_statistically():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    from cuda_fortran_mc_simulation_spin_tpu.models.ising3d import Ising3D

    mcs, nsamp = 15, 8
    curves = {}
    for backend in ("jnp", "pallas"):
        m = Ising3D(nx=256, ny=64, nz=32, kbt=4.511454583186711,
                    backend=backend)
        runner = jax.jit(sw.make_sample_runner(m, mcs))
        curves[backend] = np.stack([
            np.asarray(jax.device_get(
                runner(rng.sample_key(rng.base_key(0), i)))["m"],
                np.float64)
            for i in range(nsamp)
        ])
    sem = curves["jnp"].std(0, ddof=1) / np.sqrt(nsamp)
    diff = np.abs(curves["jnp"].mean(0) - curves["pallas"].mean(0))
    assert np.all(diff < 6 * sem + 2e-3)
