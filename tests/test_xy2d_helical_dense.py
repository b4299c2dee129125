"""Dense dual-color helical XY engine (ops/xy2d_helical_dense.py):
pack/unpack, dense-vs-flat bitwise equivalence given shared uniforms,
interpret-mode kernel vs the jnp oracle, OR energy conservation, and
observable agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import lattice, rng
from cuda_fortran_mc_simulation_spin_tpu.models.xy2d_helical import (
    XY2DHelical,
)
from cuda_fortran_mc_simulation_spin_tpu.ops import (
    trig,
    xy2d_helical_dense as xhd,
)

NX, NY = 65, 64
N = NX * NY


def _rand_state(key, lead=()):
    th = 2.0 * np.pi * jax.random.uniform(key, lead + (N,))
    return (jnp.cos(th).astype(jnp.float32),
            jnp.sin(th).astype(jnp.float32))


def _flat_phase_oracle(sx, sy, offset, u_cand, u_acc, beta, nx):
    """Flat masked helical phase in the dense engine's summation order
    and trig (bitwise target)."""
    up = jnp.roll(sx, nx)
    dn = jnp.roll(sx, -nx)
    lf = jnp.roll(sx, 1)
    rt = jnp.roll(sx, -1)
    hx = ((up + dn) + lf) + rt
    up = jnp.roll(sy, nx)
    dn = jnp.roll(sy, -nx)
    lf = jnp.roll(sy, 1)
    rt = jnp.roll(sy, -1)
    hy = ((up + dn) + lf) + rt
    cx, cy = trig.cos_sin_2pi(u_cand)
    de = -((cx - sx) * hx + (cy - sy) * hy)
    p = jnp.exp(jnp.float32(-beta) * jnp.maximum(de, 0.0))
    mask = lattice.helical_parity_mask(sx.shape[-1], offset)
    accept = mask & (u_acc < p)
    return jnp.where(accept, cx, sx), jnp.where(accept, cy, sy)


def test_pack_unpack_roundtrip():
    fx, fy = _rand_state(jax.random.PRNGKey(0), (2,))
    planes = xhd.pack_state((fx, fy), NY, NX)
    gx, gy = xhd.unpack_state(planes, NY, NX)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(fx))
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(fy))


@pytest.mark.parametrize("color", [0, 1])
def test_dense_reference_matches_flat_oracle(color):
    """dense_phase_reference == the flat masked phase, bitwise, given
    the same per-site uniforms."""
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(1 + color), 3)
    fx, fy = _rand_state(k0)
    u_cand = jax.random.uniform(k1, (N,), jnp.float32)
    u_acc = jax.random.uniform(k2, (N,), jnp.float32)
    beta = 1.0 / 0.895

    want = _flat_phase_oracle(fx, fy, color, u_cand, u_acc, beta, NX)

    planes = xhd.pack_state((fx, fy), NY, NX)
    uc_a, uc_b = xhd.dense_pack(u_cand, NY, NX)
    ua_a, ua_b = xhd.dense_pack(u_acc, NY, NX)
    uc = uc_a if color == 0 else uc_b
    ua = ua_a if color == 0 else ua_b
    out = xhd.dense_phase_reference(
        *planes, color, uc, ua, beta, xhd.dense_nc(NX))
    gx, gy = xhd.unpack_state(out, NY, NX)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(gy), np.asarray(want[1]))


@pytest.mark.parametrize("color", [0, 1])
def test_kernel_interpret_matches_reference(color):
    """Pallas dense kernel (interpret, injected uniforms) == the jnp
    dense oracle: bitwise with a stubbed (FMA-free) trig, and to 1 ulp
    with the real polynomial (only its FMA contraction may differ —
    the same methodology as test_shard_pallas)."""
    ks = jax.random.split(jax.random.PRNGKey(5 + color), 4)
    R = 2
    fx, fy = _rand_state(ks[0], (R,))
    planes = xhd.pack_state((fx, fy), NY, NX)
    w = planes[0].shape[-1]
    uc = jax.random.uniform(ks[1], (R, NY, w), jnp.float32)
    ua = jax.random.uniform(ks[2], (R, NY, w), jnp.float32)
    beta = 1.0 / 0.895
    nc = xhd.dense_nc(NX)

    def run_both():
        # the updated color's planes are donated — fresh copies per call
        got = xhd._dense_phase(
            tuple(p + 0 for p in planes), jnp.zeros((2,), jnp.int32),
            uc, ua, color=color,
            beta=beta, nrep=R, ny=NY, nc=nc, interpret=True)
        want = jax.vmap(
            lambda a, b, c, d, u1, u2: xhd.dense_phase_reference(
                a, b, c, d, color, u1, u2, beta, nc)
        )(*planes, uc, ua)
        return got, want

    orig = trig.cos_sin_2pi
    trig.cos_sin_2pi = lambda u: (1.0 - u, u)
    try:
        xhd._dense_phase.clear_cache()
        got, want = run_both()
        for g, wv in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g),
                                          np.asarray(wv))
    finally:
        trig.cos_sin_2pi = orig
        xhd._dense_phase.clear_cache()

    got, want = run_both()
    for g, wv in zip(got, want):
        ga, wa_ = np.asarray(g), np.asarray(wv)
        np.testing.assert_allclose(ga, wa_, rtol=0, atol=2e-7)
        # decision flips (value-scale diffs) must be absent
        assert (np.abs(ga - wa_) > 1e-5).sum() == 0


@pytest.mark.parametrize("color", [0, 1])
def test_or_kernel_interpret_matches_reference(color):
    ks = jax.random.split(jax.random.PRNGKey(9 + color), 2)
    R = 2
    fx, fy = _rand_state(ks[0], (R,))
    planes = xhd.pack_state((fx, fy), NY, NX)
    nc = xhd.dense_nc(NX)
    got = xhd._dense_or_phase(tuple(p + 0 for p in planes),
                              color=color, nrep=R, ny=NY,
                              nc=nc, interpret=True)
    want = jax.vmap(
        lambda a, b, c, d: xhd.dense_or_reference(a, b, c, d, color,
                                                  nc)
    )(*planes)
    # no accept decisions in OR — pure value agreement to ~1 ulp
    # (interpret-mode FMA contraction of the reflection chain differs)
    for g, wv in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wv),
                                   rtol=0, atol=4e-7)


def test_or_measure_interpret_matches_separate_observables():
    """over_relax_sweep_measure (fused (m, my, e) in the second OR
    color phase) == over_relax_sweep followed by the separate
    observables() pass — same final planes, same densities."""
    model = XY2DHelical(nx=NX, ny=NY, kbt=0.895)
    fx, fy = _rand_state(jax.random.PRNGKey(31), (2,))
    planes = xhd.pack_state((fx, fy), NY, NX)
    nc = xhd.dense_nc(NX)

    p_sep = xhd._dense_or_phase(tuple(p + 0 for p in planes),
                                color=0, nrep=2, ny=NY, nc=nc,
                                interpret=True)
    p_sep = xhd._dense_or_phase(p_sep, color=1, nrep=2, ny=NY, nc=nc,
                                interpret=True)
    want = xhd.observables(model, p_sep)

    p_fus = xhd._dense_or_phase(tuple(p + 0 for p in planes),
                                color=0, nrep=2, ny=NY, nc=nc,
                                interpret=True)
    p_fus, obs = xhd._dense_or_phase(p_fus, color=1, measuring=True,
                                     nrep=2, ny=NY, nc=nc,
                                     interpret=True)
    n_inv = 1.0 / model.nsites
    for g, wv in zip(p_fus, p_sep):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(wv))
    np.testing.assert_allclose(np.asarray(obs[:, 0, 0]) * n_inv,
                               np.asarray(want["m"]), rtol=0,
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(obs[:, 0, 1]) * n_inv,
                               np.asarray(want["my"]), rtol=0,
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(obs[:, 0, 2]) * n_inv,
                               np.asarray(want["e"]), rtol=0,
                               atol=5e-5)


def test_or_reference_conserves_energy_and_norm():
    """Over-relaxation: |S|=1 after renorm and energy is conserved to
    f32 accuracy (the reflection is microcanonical,
    /root/reference/src/xy2d_gpu_m.f90:177-213)."""
    model = XY2DHelical(nx=NX, ny=NY, kbt=0.895)
    fx, fy = _rand_state(jax.random.PRNGKey(12))
    planes = xhd.pack_state((fx, fy), NY, NX)
    nc = xhd.dense_nc(NX)
    e0 = float(model.energy_sum((fx, fy)))
    for color in (0, 1):
        planes = xhd.dense_or_reference(*planes, color, nc)
    gx, gy = xhd.unpack_state(planes, NY, NX)
    e1 = float(model.energy_sum((gx, gy)))
    norm = np.hypot(np.asarray(gx, np.float64),
                    np.asarray(gy, np.float64))
    np.testing.assert_allclose(norm, 1.0, atol=1e-5)
    assert abs(e1 - e0) < 3e-3 * N ** 0.5 + 1e-2


def test_dense_observables_match_model():
    model = XY2DHelical(nx=NX, ny=NY, kbt=0.895)
    fx, fy = _rand_state(jax.random.PRNGKey(15), (2,))
    planes = xhd.pack_state((fx, fy), NY, NX)
    got = xhd.observables(model, planes)
    want = jax.vmap(lambda a, b: model.observables((a, b)))(fx, fy)
    for k in ("m", "my", "e"):
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]),
                                   rtol=0, atol=5e-5)


def _on_tpu() -> bool:
    import os
    return jax.default_backend() != "cpu" or bool(
        os.environ.get("SPINLAT_TEST_ON_TPU"))


@pytest.mark.parametrize("color", [0, 1])
def test_kernel_mosaic_matches_reference_on_tpu(color):
    """Compiled (Mosaic) dense kernel vs the jnp oracle on chip:
    injected uniforms, 1-ulp value agreement, no decision flips."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("needs the chip")
    ks = jax.random.split(jax.random.PRNGKey(21 + color), 4)
    R = 2
    fx, fy = _rand_state(ks[0], (R,))
    planes = xhd.pack_state((fx, fy), NY, NX)
    w = planes[0].shape[-1]
    uc = jax.random.uniform(ks[1], (R, NY, w), jnp.float32)
    ua = jax.random.uniform(ks[2], (R, NY, w), jnp.float32)
    beta = 1.0 / 0.895
    nc = xhd.dense_nc(NX)
    got = xhd._dense_phase(
        tuple(p + 0 for p in planes), jnp.zeros((2,), jnp.int32),
        uc, ua, color=color, beta=beta, nrep=R, ny=NY, nc=nc)
    want = jax.vmap(
        lambda a, b, c, d, u1, u2: xhd.dense_phase_reference(
            a, b, c, d, color, u1, u2, beta, nc)
    )(*planes, uc, ua)
    for g, wv in zip(got, want):
        ga, wa_ = np.asarray(g), np.asarray(wv)
        np.testing.assert_allclose(ga, wa_, rtol=0, atol=2e-7)
        assert (np.abs(ga - wa_) > 1e-5).sum() == 0


def test_dense_sweep_physics_on_tpu():
    """Hardware-PRNG dense sweeps: fused (m, my, e) equals the
    observables of the unpacked state, and a short relaxation stays
    finite/normalized."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("needs the chip")
    model = XY2DHelical(nx=257, ny=256, kbt=0.895)
    st = jax.vmap(lambda k: model.init_state("allup", k))(
        jax.random.split(rng.base_key(1), 2))
    planes = xhd.pack_state(st, model.ny, model.nx)
    key = rng.base_key(4)
    for t in range(3):
        planes, obs = xhd.sweep_measure(model, planes,
                                        rng.sweep_key(key, t))
    gx, gy = xhd.unpack_state(planes, model.ny, model.nx)
    want = jax.vmap(lambda a, b: model.observables((a, b)))(gx, gy)
    for k in ("m", "my", "e"):
        np.testing.assert_allclose(np.asarray(obs[k]),
                                   np.asarray(want[k]),
                                   rtol=0, atol=5e-5)
    norm = np.hypot(np.asarray(gx, np.float64),
                    np.asarray(gy, np.float64))
    np.testing.assert_allclose(norm, 1.0, atol=1e-5)


def test_helical_runner_dispatch_chunks_bitwise_on_tpu():
    """The host-chunked XY helical runner (one device dispatch per MCS
    chunk — required at the committed 10001x10000 geometry, where a
    monolithic 1e4-MCS scan trips the device worker's execution
    deadline) is bitwise identical to a single-dispatch run: sweep keys
    are pure functions of the global sweep index."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw

    model = XY2DHelical(nx=257, ny=64, kbt=0.89)
    key = rng.sample_key(rng.base_key(9), 0)
    run1 = sw.make_helical_runner(model, mcs=5, batch=2)
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
