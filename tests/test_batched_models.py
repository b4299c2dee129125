"""sweep_batched == vmapped per-replica sweeps (jnp path, all models)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D
from cuda_fortran_mc_simulation_spin_tpu.models.ising3d import Ising3D
from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D


def _batched_state(model, n=3, seed=0):
    keys = jax.vmap(
        lambda r: jax.random.fold_in(rng.base_key(seed), r)
    )(jnp.arange(n))
    return jax.vmap(lambda k: model.init_state("random", k))(keys), keys


@pytest.mark.parametrize("model", [
    Clock2D(nx=8, ny=8, kbt=0.91, q=6, backend="jnp"),
    Ising3D(nx=8, ny=4, nz=4, kbt=4.5, backend="jnp"),
    XY2D(nx=8, ny=8, kbt=0.89, backend="jnp"),
], ids=["clock", "ising3d", "xy2d"])
def test_sweep_batched_matches_vmap(model):
    state, _ = _batched_state(model)
    key = rng.base_key(42)
    out = model.sweep_batched(state, key)
    keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(jnp.arange(3))
    expect = jax.vmap(model.sweep_jnp)(state, keys)
    for got, exp in zip(jax.tree.leaves(out), jax.tree.leaves(expect)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))


def test_xy_over_relax_batched_matches_vmap():
    model = XY2D(nx=8, ny=8, kbt=0.89, backend="jnp")
    state, _ = _batched_state(model)
    out = model.over_relax_sweep_batched(state)
    expect = jax.vmap(model.over_relax_sweep_jnp)(state)
    for got, exp in zip(jax.tree.leaves(out), jax.tree.leaves(expect)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(exp), atol=1e-6
        )
