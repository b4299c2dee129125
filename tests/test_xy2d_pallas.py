"""XY Pallas kernel tests (TPU-gated; CPU CI covers the jnp oracle)."""

import jax
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs TPU for Mosaic kernels"
)


@requires_tpu
def test_xy_pallas_unit_norm_and_or_conservation():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    m = XY2D(nx=512, ny=512, kbt=0.89, backend="pallas")
    st = m.init_state("random", rng.base_key(0))
    st = jax.jit(m.sweep)(st, rng.base_key(1))
    full = m.full_vectors(st)
    np.testing.assert_allclose(
        np.hypot(full[..., 0], full[..., 1]), 1.0, atol=1e-5
    )
    e0 = float(m.energy_sum(st))
    st2 = jax.jit(m.over_relax_sweep)(st)
    e1 = float(m.energy_sum(st2))
    assert abs(e1 - e0) / m.nsites < 1e-5


@requires_tpu
def test_xy_pallas_or_measure_fused_matches_separate():
    """over_relax_sweep_measure (fused (m, my, e) in the color-1
    reflection kernel) == over_relax_sweep + the separate
    measure_plain pass: same state bitwise, same densities."""
    import jax.numpy as jnp

    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas

    m = XY2D(nx=512, ny=512, kbt=0.89, backend="pallas")
    st = jax.vmap(lambda k: m.init_state("random", k))(
        jax.random.split(rng.base_key(3), 2))
    st = jax.jit(m.sweep_batched)(st, rng.base_key(4))

    sep = jax.jit(m.over_relax_sweep_batched)(
        jax.tree.map(lambda p: p + 0, st))
    want = m.observables_batched(sep)
    fus, obs = jax.jit(m.over_relax_sweep_measure_batched)(st)
    for g, wv in zip(fus, sep):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(wv))
    for k in ("m", "my", "e"):
        np.testing.assert_allclose(np.asarray(obs[k]),
                                   np.asarray(want[k]),
                                   rtol=0, atol=5e-5)


@requires_tpu
def test_xy_pallas_matches_jnp_statistically():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    mcs, nsamp = 20, 8
    curves = {}
    for backend in ("jnp", "pallas"):
        m = XY2D(nx=256, ny=256, kbt=0.89, backend=backend)
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
    sem = curves["jnp"].std(0, ddof=1) / np.sqrt(nsamp)
    diff = np.abs(curves["jnp"].mean(0) - curves["pallas"].mean(0))
    assert np.all(diff < 6 * sem + 1e-3)
