"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Validates SURVEY.md §5.7's requirement: a domain-sharded sweep must agree
with the single-device engine — identical physics, and *identical bits*
given the same per-shard key derivation (which is mesh-shape dependent,
so bitwise equality is checked shard-vs-shard at fixed mesh, and
statistical/structural equality across mesh shapes).
"""

import jax

import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D
from cuda_fortran_mc_simulation_spin_tpu.parallel import domain, mesh as mesh_mod


requires_8dev = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def model():
    return Ising2D(nx=16, ny=16, kbt=2.26918531421, backend="jnp")


@requires_8dev
@pytest.mark.multichip
@pytest.mark.parametrize("dp,ysh", [(1, 1), (1, 4), (2, 4), (4, 2), (8, 1)])
def test_sharded_step_runs_and_observables_match_state(model, dp, ysh):
    m = mesh_mod.make_mesh(dp, ysh)
    replicas = 2 * dp
    state = domain.replicated_init(model, m, replicas, "random",
                                   rng.base_key(0))
    step = domain.make_sharded_step(model, m)
    state2, obs = step(state, rng.base_key(1))
    obs = jax.device_get(obs)
    assert obs["m"].shape == (replicas,)
    # cross-check psum observables against direct reductions on the
    # gathered state
    for r in range(replicas):
        sub = jax.tree.map(lambda x: x[r], state2)
        m_direct = float(model.magne_sum(sub)) / model.nsites
        e_direct = float(model.energy_sum(sub)) / model.nsites
        assert obs["m"][r] == pytest.approx(m_direct, abs=1e-6)
        assert obs["e"][r] == pytest.approx(e_direct, abs=1e-6)


@requires_8dev
@pytest.mark.multichip
def test_sharded_matches_singleshard_bitwise(model):
    """y=1 sharded step must equal the unsharded jnp sweep bit-for-bit
    when fed the same derived key."""
    m1 = mesh_mod.make_mesh(1, 1)
    state = domain.replicated_init(model, m1, 1, "random", rng.base_key(3))
    step = domain.make_sharded_step(model, m1)
    key = rng.base_key(7)
    state2, _ = step(state, key)

    # replicate the shard-local key derivation: fold_in dp=0, y=0
    import jax.random as jr
    shard_key = jr.fold_in(jr.fold_in(key, 0), 0)
    single = jax.tree.map(lambda x: x[0], state)
    expect = model.sweep_jnp(single, shard_key)
    np.testing.assert_array_equal(
        np.asarray(state2.a[0]), np.asarray(expect.a)
    )
    np.testing.assert_array_equal(
        np.asarray(state2.b[0]), np.asarray(expect.b)
    )


@requires_8dev
@pytest.mark.multichip
@pytest.mark.parametrize("dp,ysh", [(1, 4), (2, 2)])
def test_sharded_clock_step(dp, ysh):
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D

    cm = Clock2D(nx=16, ny=16, kbt=0.91, q=6, backend="jnp")
    msh = mesh_mod.make_mesh(dp, ysh)
    state = domain.replicated_init(cm, msh, dp, "random", rng.base_key(2))
    step = domain.make_sharded_step(cm, msh)
    state2, obs = step(state, rng.base_key(3))
    obs = jax.device_get(obs)
    for r in range(dp):
        sub = jax.tree.map(lambda x: x[r], state2)
        e_direct = float(cm.energy_sum(sub)) / cm.nsites
        mx_direct = float(cm.magne_sums(sub)[0]) / cm.nsites
        assert obs["e"][r] == pytest.approx(e_direct, abs=1e-5)
        assert obs["m"][r] == pytest.approx(mx_direct, abs=1e-5)
    full = cm.full_lattice(jax.tree.map(lambda x: x[0], state2))
    assert full.min() >= 0 and full.max() < 6


@requires_8dev
@pytest.mark.multichip
@pytest.mark.parametrize("dp,ysh", [(1, 4), (2, 2)])
def test_sharded_xy_step(dp, ysh):
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    xm = XY2D(nx=16, ny=16, kbt=0.89, backend="jnp")
    msh = mesh_mod.make_mesh(dp, ysh)
    state = domain.replicated_init(xm, msh, dp, "random", rng.base_key(4))
    step = domain.make_sharded_step(xm, msh)
    state2, obs = step(state, rng.base_key(5))
    obs = jax.device_get(obs)
    for r in range(dp):
        sub = jax.tree.map(lambda x: x[r], state2)
        e_direct = float(xm.energy_sum(sub)) / xm.nsites
        assert obs["e"][r] == pytest.approx(e_direct, abs=1e-5)
    # unit norms preserved under the sharded sweep
    full = xm.full_vectors(jax.tree.map(lambda x: x[0], state2))
    np.testing.assert_allclose(
        np.hypot(full[..., 0], full[..., 1]), 1.0, atol=1e-5
    )


@requires_8dev
@pytest.mark.multichip
@pytest.mark.parametrize("dp,ysh", [(1, 4), (2, 2)])
def test_sharded_ising3d_step(dp, ysh):
    from cuda_fortran_mc_simulation_spin_tpu.models.ising3d import Ising3D

    im = Ising3D(nx=8, ny=8, nz=16, kbt=4.51152, backend="jnp")
    msh = mesh_mod.make_mesh(dp, ysh)
    state = domain.replicated_init(im, msh, dp, "random", rng.base_key(6))
    step = domain.make_sharded_step(im, msh)
    state2, obs = step(state, rng.base_key(7))
    obs = jax.device_get(obs)
    for r in range(dp):
        sub = jax.tree.map(lambda x: x[r], state2)
        e_direct = float(im.energy_sum(sub)) / im.nsites
        m_direct = float(im.magne_sum(sub)) / im.nsites
        assert obs["e"][r] == pytest.approx(e_direct, abs=1e-6)
        assert obs["m"][r] == pytest.approx(m_direct, abs=1e-6)
    full = im.full_lattice(jax.tree.map(lambda x: x[0], state2))
    assert set(np.unique(full)) <= {-1, 1}


@requires_8dev
@pytest.mark.multichip
def test_sharded_sample_runner(model):
    """Full multi-chip production driver: mcs histories for a replica
    batch sharded (dp × y), one jitted program."""
    msh = mesh_mod.make_mesh(2, 4)
    runner = domain.make_sharded_sample_runner(
        model, msh, mcs=5, replicas=4, init_kind="allup"
    )
    series = jax.device_get(runner(rng.base_key(6)))
    assert series["m"].shape == (4, 5)
    assert np.all(np.isfinite(series["e"]))
    # histories must differ across replicas
    assert not np.allclose(series["m"][0], series["m"][1])


@requires_8dev
@pytest.mark.multichip
def test_halo_stencil_matches_unsharded_stencil(model):
    """Domain-sharded neighbor sums must agree with roll-based sums:
    run one phase with uniforms==1 (never accept ⇒ state unchanged) and
    uniforms==0 at T→∞ (always accept ⇒ deterministic flip), then compare
    energies across mesh shapes."""
    hot = Ising2D(nx=16, ny=16, kbt=1e8, backend="jnp")
    results = {}
    for dp, ysh in [(1, 1), (1, 4), (1, 8)]:
        msh = mesh_mod.make_mesh(dp, ysh)
        state = domain.replicated_init(hot, msh, 1, "allup", rng.base_key(0))
        step = domain.make_sharded_step(hot, msh)
        st, obs = step(state, rng.base_key(5))
        # at T=∞ from allup, every site flips deterministically
        results[(dp, ysh)] = np.asarray(
            jax.tree.map(lambda x: np.asarray(x), st)
        , dtype=object)
        np.testing.assert_allclose(jax.device_get(obs["m"]), [-1.0])
        np.testing.assert_allclose(jax.device_get(obs["e"]), [-2.0])
