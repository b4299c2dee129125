"""f32-angle dense helical XY engine (ops/xy2d_helical_dense_angle).

Same Markov chain as the component engine in a different state
representation — pinned three ways:
  - interpret-mode kernels vs the module's jnp references, BITWISE;
  - Metropolis vs the COMPONENT engine's reference with aligned
    candidate mapping: identical decoded states, bitwise;
  - OR reflection vs the component engine's reflection (different
    rounding paths: atan2 polynomial vs two rsqrts; small-|h|
    sites amplify the component path's rounding) to 5e-5, with
    microcanonical energy conservation and exact |S| = 1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.models.xy2d_helical import (
    XY2DHelical,
)
from cuda_fortran_mc_simulation_spin_tpu.ops import trig
from cuda_fortran_mc_simulation_spin_tpu.ops import (
    xy2d_helical_dense as xhd,
)
from cuda_fortran_mc_simulation_spin_tpu.ops import (
    xy2d_helical_dense_angle as xha,
)


def _setup(nx=65, ny=32, nrep=2, seed=3):
    model = XY2DHelical(nx=nx, ny=ny, kbt=0.89)
    kt = jax.random.PRNGKey(seed)
    turns = jax.random.uniform(kt, (nrep, model.nsites), jnp.float32,
                               minval=-0.5, maxval=0.5)
    ang = xha.dense_pack(turns, ny, nx)
    comp_state = trig.cos_sin_2pi(turns)
    comp = xhd.pack_state(comp_state, ny, nx)
    nc = xha.dense_nc(nx)
    return model, turns, ang, comp, nc


def test_angle_phase_kernel_matches_reference_bitwise():
    model, _, ang, _, nc = _setup()
    ny = model.ny
    w = ang[0].shape[-1]
    ku = jax.random.PRNGKey(11)
    u_c = jax.random.uniform(ku, (2, ny, w), jnp.float32)
    u_a = jax.random.uniform(jax.random.fold_in(ku, 1), (2, ny, w),
                             jnp.float32)
    for color in (0, 1):
        got = xha._angle_phase(
            tuple(p + 0 for p in ang), jnp.zeros(2, jnp.int32),
            u_c, u_a, color=color, beta=float(model.beta), nrep=2,
            ny=ny, nc=nc, interpret=True)
        want = jax.vmap(
            lambda a, b, uc, ua, c=color: xha.angle_phase_reference(
                a, b, c, uc, ua, model.beta, nc)
        )(*ang, u_c, u_a)
        for g, wv in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(wv))


def test_angle_or_kernel_matches_reference_bitwise():
    model, _, ang, _, nc = _setup(seed=4)
    got, obs = xha._angle_or_phase(
        tuple(p + 0 for p in ang), color=1, nrep=2, ny=model.ny, nc=nc,
        measuring=True, interpret=True)
    want = jax.vmap(
        lambda a, b: xha.angle_or_reference(a, b, 1, nc)
    )(*ang)
    for g, wv in zip(got, want):
        # XLA may contract 2*phi - s into an FMA in one program and
        # not the other — 1-2 ulp on ~2% of sites (measured 1.8e-7);
        # the Metropolis phase (the acceptance-critical path) IS
        # bitwise (test above)
        np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                   rtol=0, atol=2.4e-7)
    # fused obs vs the module's whole-plane observables pass
    dens = xha.observables(model, got)
    n_inv = 1.0 / model.nsites
    np.testing.assert_allclose(np.asarray(obs[:, 0, 0]) * n_inv,
                               np.asarray(dens["m"]), rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(obs[:, 0, 2]) * n_inv,
                               np.asarray(dens["e"]), rtol=0, atol=2e-5)


def test_angle_metropolis_equals_component_engine_bitwise():
    """Candidate mapping aligned (angle uses u-0.5 as the stored turn,
    component decodes cos_sin_2pi(u-0.5)): the two representations
    produce IDENTICAL decoded states."""
    model, _, ang, comp, nc = _setup(seed=5)
    ny = model.ny
    w = ang[0].shape[-1]
    ku = jax.random.PRNGKey(12)
    u = jax.random.uniform(ku, (2, ny, w), jnp.float32)
    u_a = jax.random.uniform(jax.random.fold_in(ku, 1), (2, ny, w),
                             jnp.float32)
    ga = jax.vmap(
        lambda a, b, uc, ua: xha.angle_phase_reference(
            a, b, 0, uc, ua, model.beta, nc)
    )(*ang, u, u_a)
    gc = jax.vmap(
        lambda ax, ay, bx, by, uc, ua: xhd.dense_phase_reference(
            ax, ay, bx, by, 0, uc, ua, model.beta, nc)
    )(*comp, u - jnp.float32(0.5), u_a)
    dax, day = trig.cos_sin_2pi(ga[0])
    np.testing.assert_array_equal(np.asarray(dax), np.asarray(gc[0]))
    np.testing.assert_array_equal(np.asarray(day), np.asarray(gc[1]))
    # untouched color unchanged in both
    np.testing.assert_array_equal(np.asarray(ga[1]), np.asarray(ang[1]))


def test_angle_or_matches_component_reflection_and_conserves_energy():
    model, turns, ang, comp, nc = _setup(nx=65, ny=64, nrep=1, seed=6)
    flat = trig.cos_sin_2pi(turns)
    e0 = float(model.energy_sum((flat[0][0], flat[1][0])))
    pa = ang
    pc = comp
    for color in (0, 1):
        pa = jax.vmap(
            lambda a, b, c=color: xha.angle_or_reference(a, b, c, nc)
        )(*pa)
        pc = jax.vmap(
            lambda ax, ay, bx, by, c=color: xhd.dense_or_reference(
                ax, ay, bx, by, c, nc)
        )(*pc)
    gx, gy = xha.unpack_state(pa, model.ny, model.nx)
    cx, cy = xhd.unpack_state(pc, model.ny, model.nx)
    # sites with a small local field |h| amplify the COMPONENT
    # engine's rsqrt rounding (~1e-7/|h|); the angle path stays exact
    # there (measured: 1.4e-5 max on 0.1% of sites at |h| ~ 0.01)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(cx),
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(cy),
                               rtol=0, atol=5e-5)
    e1 = float(model.energy_sum((gx[0], gy[0])))
    assert abs(e1 - e0) < 3e-3 * model.nsites ** 0.5 + 1e-2, (e0, e1)
    # |S| = 1 to decode accuracy (no renormalization pass exists)
    np.testing.assert_allclose(
        np.hypot(np.asarray(gx, np.float64), np.asarray(gy, np.float64)),
        1.0, atol=2e-7)


def test_angle_pack_unpack_roundtrip():
    model, turns, ang, _, _ = _setup(seed=7)
    gx, gy = xha.unpack_state(ang, model.ny, model.nx)
    wx, wy = trig.cos_sin_2pi(turns)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx),
                               rtol=0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(wy),
                               rtol=0, atol=1e-7)


# ---------------------------------------------------------------------------
# routed-engine pins (ported from the component engine's suite when the
# f32-angle engine became the DEFAULT helical-XY routing — VERDICT r4 #1)
# ---------------------------------------------------------------------------

def _on_tpu():
    import jax

    return jax.default_backend() not in ("cpu",)


@pytest.mark.parametrize("color", [0, 1])
def test_angle_kernel_mosaic_matches_reference_on_tpu(color):
    """Compiled (Mosaic) angle kernel vs the jnp reference on chip:
    injected uniforms, 1-ulp value agreement, no decision flips."""
    if not _on_tpu():
        pytest.skip("needs the chip")
    model, _, ang, _, nc = _setup(seed=21 + color)
    ny = model.ny
    w = ang[0].shape[-1]
    ku = jax.random.PRNGKey(31 + color)
    uc = jax.random.uniform(ku, (2, ny, w), jnp.float32)
    ua = jax.random.uniform(jax.random.fold_in(ku, 1), (2, ny, w),
                            jnp.float32)
    got = xha._angle_phase(
        tuple(p + 0 for p in ang), jnp.zeros(2, jnp.int32),
        uc, ua, color=color, beta=float(model.beta), nrep=2,
        ny=ny, nc=nc)
    want = jax.vmap(
        lambda a, b, u1, u2: xha.angle_phase_reference(
            a, b, color, u1, u2, model.beta, nc)
    )(*ang, uc, ua)
    for g, wv in zip(got, want):
        ga, wa_ = np.asarray(g), np.asarray(wv)
        np.testing.assert_allclose(ga, wa_, rtol=0, atol=2e-7)
        assert (np.abs(ga - wa_) > 1e-5).sum() == 0


def test_angle_sweep_physics_on_tpu():
    """Hardware-PRNG angle sweeps: fused (m, my, e) equals the
    observables of the decoded state, and a short relaxation stays
    finite with |S| = 1 exactly (angles renormalize by construction)."""
    if not _on_tpu():
        pytest.skip("needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.core import rng

    model = XY2DHelical(nx=257, ny=256, kbt=0.895)
    st = jax.vmap(lambda k: model.init_state("allup", k))(
        jax.random.split(rng.base_key(1), 2))
    planes = xha.pack_state(st, model.ny, model.nx)
    key = rng.base_key(4)
    for t in range(3):
        planes, obs = xha.sweep_measure(model, planes,
                                        rng.sweep_key(key, t))
    gx, gy = xha.unpack_state(planes, model.ny, model.nx)
    want = jax.vmap(lambda a, b: model.observables((a, b)))(gx, gy)
    for k in ("m", "my", "e"):
        np.testing.assert_allclose(np.asarray(obs[k]),
                                   np.asarray(want[k]),
                                   rtol=0, atol=5e-5)
    norm = np.hypot(np.asarray(gx, np.float64),
                    np.asarray(gy, np.float64))
    np.testing.assert_allclose(norm, 1.0, atol=3e-7)


def test_angle_runner_dispatch_chunks_bitwise_on_tpu(monkeypatch):
    """The host-chunked helical runner ON ITS DEFAULT ENGINE (f32-angle)
    is bitwise identical across dispatch-chunk sizes — the same
    global-t-key argument as the component engine's pin, including an
    OR window crossing a chunk edge."""
    if not _on_tpu():
        pytest.skip("needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw

    monkeypatch.delenv("SPINLAT_XY_DENSE_ANGLE", raising=False)
    model = XY2DHelical(nx=257, ny=64, kbt=0.89)
    key = rng.sample_key(rng.base_key(9), 0)
    run1 = sw.make_helical_runner(model, mcs=5, batch=2)
    assert "f32-angle" in run1.engine, run1.engine
    assert getattr(run1, "host_chunked", False)
    out1 = jax.device_get(run1(key))
    run2 = sw.make_helical_runner(model, mcs=5, batch=2,
                                  xy_dispatch_chunk=2)
    out2 = jax.device_get(run2(key))
    for k in out1:
        np.testing.assert_array_equal(out1[k], out2[k])
    # OR schedule (cond/fori branch) across a chunk boundary
    run3 = sw.make_helical_runner(model, 6, 2, "allup", 1, 6)
    run4 = sw.make_helical_runner(model, 6, 2, "allup", 1, 6,
                                  xy_dispatch_chunk=4)
    o3 = jax.device_get(run3(key))
    o4 = jax.device_get(run4(key))
    for k in o3:
        np.testing.assert_array_equal(o3[k], o4[k])
    # opt-out env routes back to the component engine
    monkeypatch.setenv("SPINLAT_XY_DENSE_ANGLE", "0")
    run5 = sw.make_helical_runner(model, mcs=2, batch=2)
    assert "ragged dual-color" in run5.engine, run5.engine
