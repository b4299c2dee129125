"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Validates SURVEY.md §5.7/§4's requirements: a domain-sharded sweep must
preserve the physics (psum observables equal direct reductions on the
gathered state) and be *bitwise invariant to the mesh shape* — draws are
keyed by global replica/row ids (parallel/domain.py _site_uniforms), so
(1,1), (1,4) and (2,4) meshes produce identical trajectories per seed.
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
@pytest.mark.parametrize("model_name", ["ising2d", "clock", "xy2d",
                                        "ising3d"])
def test_mesh_shape_invariant_bitwise(model_name):
    """(1,1), (1,4), (2,4) meshes must produce bit-identical trajectories
    for the same seed (SURVEY.md §4): draws are keyed by global
    replica/row ids, not shard ids."""
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D
    from cuda_fortran_mc_simulation_spin_tpu.models.ising3d import Ising3D
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    mdl = {
        "ising2d": lambda: Ising2D(nx=16, ny=16, kbt=2.26918531421,
                                   backend="jnp"),
        "clock": lambda: Clock2D(nx=16, ny=16, kbt=0.91, q=6,
                                 backend="jnp"),
        "xy2d": lambda: XY2D(nx=16, ny=16, kbt=0.89, backend="jnp"),
        "ising3d": lambda: Ising3D(nx=8, ny=8, nz=16, kbt=4.51152,
                                   backend="jnp"),
    }[model_name]()

    states = {}
    for dp, ysh in [(1, 1), (1, 4), (2, 4)]:
        msh = mesh_mod.make_mesh(dp, ysh)
        state = domain.replicated_init(mdl, msh, 2, "random",
                                       rng.base_key(3))
        step = domain.make_sharded_step(mdl, msh)
        for t in (1, 2, 3):
            state, _ = step(state, rng.sweep_key(rng.base_key(7), t))
        states[(dp, ysh)] = jax.device_get(state)

    ref = states[(1, 1)]
    for shape, st in states.items():
        for leaf_ref, leaf in zip(jax.tree.leaves(ref),
                                  jax.tree.leaves(st)):
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(leaf_ref),
                err_msg=f"mesh {shape} diverged from (1,1)",
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
@pytest.mark.parametrize("model_name", ["ising2d", "clock", "xy2d"])
def test_mesh_2d_decomposition_bitwise(model_name):
    """The full (dx, dy) decomposition (SURVEY.md §5.7): meshes with an
    x axis — (1,2,2), (2,2,2) — produce trajectories bitwise identical
    to the (1,1) mesh.  Column-chunk keyed draws require local widths
    that are multiples of 128 lanes (production shapes always are)."""
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    mdl = {
        "ising2d": lambda: Ising2D(nx=512, ny=16, kbt=2.26918531421,
                                   backend="jnp"),
        "clock": lambda: Clock2D(nx=512, ny=16, kbt=0.91, q=6,
                                 backend="jnp"),
        "xy2d": lambda: XY2D(nx=512, ny=16, kbt=0.89, backend="jnp"),
    }[model_name]()

    states = {}
    obs_all = {}
    for shape in [(1, 1), (1, 2, 2), (2, 2, 2)]:
        msh = mesh_mod.make_mesh(*shape)
        state = domain.replicated_init(mdl, msh, 2, "random",
                                       rng.base_key(3))
        step = domain.make_sharded_step(mdl, msh)
        for t in (1, 2):
            state, obs = step(state, rng.sweep_key(rng.base_key(7), t))
        states[shape] = jax.device_get(state)
        obs_all[shape] = jax.device_get(obs)

    ref = states[(1, 1)]
    for shape, st in states.items():
        for leaf_ref, leaf in zip(jax.tree.leaves(ref),
                                  jax.tree.leaves(st)):
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(leaf_ref),
                err_msg=f"mesh {shape} diverged from (1,1)",
            )
    # psum over (y, x) observables match the single-device reductions
    np.testing.assert_allclose(obs_all[(1, 2, 2)]["e"],
                               obs_all[(1, 1)]["e"], atol=1e-5)
    np.testing.assert_allclose(obs_all[(2, 2, 2)]["m"],
                               obs_all[(1, 1)]["m"], atol=1e-5)


@requires_8dev
@pytest.mark.multichip
def test_mesh_2d_xy_over_relaxation():
    """OR sweeps with row AND column halos conserve energy on the
    (dx, dy) mesh."""
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    model = XY2D(nx=512, ny=16, kbt=0.89, backend="jnp")
    msh = mesh_mod.make_mesh(1, 2, 2)
    state = domain.replicated_init(model, msh, 2, "random",
                                   rng.base_key(0))
    sweep = domain._make_local_step(model, msh, n_over_relax=2,
                                    with_obs=False)
    step_or = jax.jit(lambda s, k: sweep(s, k, True))
    st = jax.device_get(step_or(state, rng.base_key(1)))
    # compare against the same Metropolis step without OR: energies
    # must agree (OR is microcanonical)
    sweep_plain = domain._make_local_step(model, msh, n_over_relax=2,
                                          with_obs=False)
    st_plain = jax.device_get(
        jax.jit(lambda s, k: sweep_plain(s, k, False))(
            state, rng.base_key(1))
    )
    for r in range(2):
        e_or = float(model.energy_sum(jax.tree.map(lambda x: x[r], st)))
        e_pl = float(model.energy_sum(
            jax.tree.map(lambda x: x[r], st_plain)))
        assert e_or == pytest.approx(e_pl, abs=2e-2)


@requires_8dev
@pytest.mark.multichip
def test_halo_stencil_deterministic_flip_across_mesh_shapes(model):
    """Known-answer halo check: at T→∞ from allup every site flips
    deterministically each phase (m=-1, e=-2 after one sweep), on every
    mesh shape, and the final states agree bitwise."""
    hot = Ising2D(nx=16, ny=16, kbt=1e8, backend="jnp")
    results = {}
    for dp, ysh in [(1, 1), (1, 4), (1, 8)]:
        msh = mesh_mod.make_mesh(dp, ysh)
        state = domain.replicated_init(hot, msh, 1, "allup", rng.base_key(0))
        step = domain.make_sharded_step(hot, msh)
        st, obs = step(state, rng.base_key(5))
        results[(dp, ysh)] = jax.device_get(st)
        # at T=∞ from allup, every site flips deterministically
        np.testing.assert_allclose(jax.device_get(obs["m"]), [-1.0])
        np.testing.assert_allclose(jax.device_get(obs["e"]), [-2.0])
    ref = results[(1, 1)]
    for shape, st in results.items():
        np.testing.assert_array_equal(np.asarray(st.a), np.asarray(ref.a),
                                      err_msg=f"mesh {shape}")
        np.testing.assert_array_equal(np.asarray(st.b), np.asarray(ref.b),
                                      err_msg=f"mesh {shape}")
