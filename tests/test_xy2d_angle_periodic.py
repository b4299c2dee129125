"""Tests for the f32-angle periodic XY engine (ops/xy2d_pallas_angle).

Validation strategy mirrors tests/test_xy2d_padded.py: interpret-mode
kernels on CPU with injected uniforms, padded-vs-aligned bitwise seam
pins, cross-engine consistency against the component engine
(ops/xy2d_pallas) under matched candidate angles, OR energy
conservation, and fused-obs exactness vs recomputation from the
unpacked state.  Reference workloads:
/root/reference/src/xy2d_periodic_gpu_m.f90:353-439.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D, XYState
from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas as xp
from cuda_fortran_mc_simulation_spin_tpu.ops import (
    xy2d_pallas_angle as xa,
)


def _rand_state(model, key, nrep=1):
    return jax.vmap(lambda k: model.init_state("random", k))(
        jax.random.split(key, nrep))


def _uniforms(key, shape):
    ku = jax.random.PRNGKey(key)
    u_cand = jax.random.uniform(ku, shape, jnp.float32)
    u_acc = jax.random.uniform(jax.random.fold_in(ku, 1), shape,
                               jnp.float32)
    return u_cand, u_acc


def test_angle_padded_full_tile_matches_aligned_bitwise():
    """half=128 planes padded by a full extra zero tile (W=256,
    valid_half=128) run the seam-substituted code path — results must
    be BITWISE the aligned angle kernel's (natural roll wrap)."""
    model = XY2D(nx=256, ny=16, kbt=0.9, backend="jnp")
    ny, half = model.color_shape
    st = _rand_state(model, rng.base_key(0), 2)
    a, b = xa.pack_angles(st)
    u_cand, u_acc = _uniforms(5, (2, ny, 2 * half))

    kw = dict(beta=float(model.beta), nrep=2, ny=ny, interpret=True)
    ap = jnp.pad(a, [(0, 0), (0, 0), (0, half)])
    bp = jnp.pad(b, [(0, 0), (0, 0), (0, half)])
    want_a = xa._angle_metro_phase(
        a, b, jnp.zeros(2, jnp.int32), color=0, half=half,
        u_cand=u_cand[..., :half], u_acc=u_acc[..., :half], **kw)
    got_a = xa._angle_metro_phase(
        ap, bp, jnp.zeros(2, jnp.int32), color=0, half=2 * half,
        valid_half=half, u_cand=u_cand, u_acc=u_acc, **kw)
    np.testing.assert_array_equal(np.asarray(got_a[..., :half]),
                                  np.asarray(want_a))
    np.testing.assert_array_equal(np.asarray(got_a[..., half:]), 0.0)

    # OR phase (color 1) + fused obs: bitwise state, obs equal up to
    # the pad-masked sum order (same adds, masked vs sliced operands)
    kw.pop("beta")
    w_b, w_obs = xa._angle_or_phase(
        b, want_a, color=1, half=half, measuring=True, **kw)
    g_b, g_obs = xa._angle_or_phase(
        bp, got_a, color=1, half=2 * half, valid_half=half,
        measuring=True, **kw)
    np.testing.assert_array_equal(np.asarray(g_b[..., :half]),
                                  np.asarray(w_b))
    np.testing.assert_allclose(np.asarray(g_obs[:, 0, :3]),
                               np.asarray(w_obs[:, 0, :3]),
                               rtol=0, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(g_b[..., half:]), 0.0)


@pytest.mark.parametrize("half_mode", ["aligned", "ragged"])
def test_angle_metro_matches_component_engine(half_mode):
    """Same Markov chain as the component engine: with candidate
    angles matched (component candidate u vs angle candidate u−½ →
    feed the angle engine u' = (u+½) mod 1), the two engines make the
    same decisions and the decoded angle state tracks the component
    state to polynomial-rounding tolerance."""
    nx = 256 if half_mode == "aligned" else 42
    model = XY2D(nx=nx, ny=16, kbt=0.9, backend="jnp")
    ny, half = model.color_shape
    w = xp.pad_width(half) if half_mode == "ragged" else half
    vh = half if w != half else 0
    st = _rand_state(model, rng.base_key(1), 1)
    stp = xp.pad_planes(st, half) if vh else st
    a, b = xa.pack_angles(st, half if vh else None)
    u_cand, u_acc = _uniforms(9, (1, ny, w))
    u_cand_angle = jnp.mod(u_cand + 0.5, 1.0)

    kwc = dict(beta=float(model.beta), nrep=1, ny=ny, half=w,
               valid_half=vh, interpret=True)
    cx, cy = xp._metropolis_phase(
        stp.ax, stp.ay, stp.bx, stp.by, jnp.zeros(2, jnp.int32),
        color=0, u_cand=u_cand, u_acc=u_acc, **kwc)
    ga = xa._angle_metro_phase(
        a, b, jnp.zeros(2, jnp.int32), color=0,
        u_cand=u_cand_angle, u_acc=u_acc, **kwc)
    dx, dy = xa.unpack_angles((ga, b), half if vh else None)[:2]
    np.testing.assert_allclose(np.asarray(dx[0]),
                               np.asarray(cx[0, :, :half] if vh
                                          else cx[0]),
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(dy[0]),
                               np.asarray(cy[0, :, :half] if vh
                                          else cy[0]),
                               rtol=0, atol=5e-5)


def test_angle_or_conserves_energy_and_norm():
    """OR sweeps conserve total energy (f32 tolerance) and keep
    |S| = 1 exactly by construction."""
    model = XY2D(nx=128, ny=32, kbt=0.9, backend="jnp")
    ny, half = model.color_shape
    st = _rand_state(model, rng.base_key(2), 1)
    planes = xa.pack_angles(st)
    e0 = float(model.energy_sum(
        XYState(*(p[0] for p in xa.unpack_angles(planes)))))
    kw = dict(nrep=1, ny=ny, half=half, interpret=True)
    a, b = planes
    for _ in range(5):
        a = xa._angle_or_phase(a, b, color=0, **kw)
        b = xa._angle_or_phase(b, a, color=1, **kw)
    stf = XYState(*(p[0] for p in xa.unpack_angles((a, b))))
    ef = float(model.energy_sum(stf))
    assert abs(ef - e0) < 2e-2 * model.nsites ** 0.5 + 1e-2
    norm = np.asarray(stf.ax) ** 2 + np.asarray(stf.ay) ** 2
    np.testing.assert_allclose(norm, 1.0, rtol=0, atol=3e-7)


def test_angle_fused_obs_match_recompute():
    """Fused (m, my, e) from the measuring kernels equal densities
    recomputed from the unpacked final state."""
    model = XY2D(nx=84, ny=16, kbt=0.9, backend="jnp")
    ny, half = model.color_shape
    w = xp.pad_width(half)
    st = _rand_state(model, rng.base_key(3), 2)
    planes = xa.pack_angles(st, half)
    kw = dict(nrep=2, ny=ny, half=w, valid_half=half, interpret=True)
    a, b = planes
    a = xa._angle_or_phase(a, b, color=0, **kw)
    b, obs = xa._angle_or_phase(b, a, color=1, measuring=True, **kw)
    stf = xa.unpack_angles((a, b), half)
    n_inv = 1.0 / model.nsites

    def per_rep(r):
        s1 = XYState(*(p[r] for p in stf))
        mx, my = model.magne_sums(s1)
        return (float(mx) * n_inv, float(my) * n_inv,
                float(model.energy_sum(s1)) * n_inv)

    for r in range(2):
        mx, my, e = per_rep(r)
        np.testing.assert_allclose(float(obs[r, 0, 0]) * n_inv, mx,
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(float(obs[r, 0, 1]) * n_inv, my,
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(float(obs[r, 0, 2]) * n_inv, e,
                                   rtol=0, atol=1e-5)


def test_angle_pack_unpack_roundtrip():
    """pack -> unpack recovers the component state to polynomial
    tolerance; pads are exact zeros."""
    model = XY2D(nx=42, ny=16, kbt=0.9, backend="jnp")
    _, half = model.color_shape
    st = _rand_state(model, rng.base_key(4), 1)
    planes = xa.pack_angles(st, half)
    for p in planes:
        np.testing.assert_array_equal(np.asarray(p[..., half:]), 0.0)
    back = xa.unpack_angles(planes, half)
    for got, want in zip(back, st):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=1e-6)


def test_angle_runner_wiring(monkeypatch):
    """make_xy_padded_runner routes through the angle engine under
    SPINLAT_XY_PERIODIC_ANGLE=1 (faked sweeps — the kernels are pinned
    by the phase tests above; hardware PRNG has no CPU interpret):
    schedule shape, engine tag, angle-plane carry."""
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw

    monkeypatch.setenv("SPINLAT_XY_PERIODIC_ANGLE", "1")

    def obs_of(planes):
        a, b = planes
        return {"m": jnp.mean(a, (1, 2)), "my": jnp.mean(b, (1, 2)),
                "e": jnp.mean(a - b, (1, 2))}

    def fake_sweep(model, planes, key):
        a, b = planes
        r = jax.random.uniform(key, a.shape, jnp.float32)
        return a + r, b - r

    def fake_sweep_measure(model, planes, key):
        planes = fake_sweep(model, planes, key)
        return planes, obs_of(planes)

    def fake_or(model, planes):
        a, b = planes
        return b, a

    def fake_or_measure(model, planes):
        planes = fake_or(model, planes)
        return planes, obs_of(planes)

    monkeypatch.setattr(xa, "sweep_angle", fake_sweep)
    monkeypatch.setattr(xa, "sweep_measure_angle", fake_sweep_measure)
    monkeypatch.setattr(xa, "or_sweep_angle", fake_or)
    monkeypatch.setattr(xa, "or_sweep_measure_angle", fake_or_measure)

    model = XY2D(nx=42, ny=16, kbt=0.9, backend="jnp")
    key = rng.sample_key(rng.base_key(3), 0)
    runner = sw.make_xy_padded_runner(
        model, 6, 2, "allup", n_over_relax=1, mcs_over_relax=4)
    assert "f32-angle" in runner.engine
    out = jax.device_get(jax.jit(runner)(key))
    assert out["m"].shape == (2, 6)
    assert np.all(np.isfinite(out["m"]))


def test_angle_default_routing(monkeypatch):
    """Default routing (no env override): angle engine exactly on
    OR-free schedules (r5b A/B: 1.49x Metropolis-only, 0.955x with
    OR); SPINLAT_XY_PERIODIC_ANGLE overrides both ways."""
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw

    model = XY2D(nx=42, ny=16, kbt=0.9, backend="jnp")
    monkeypatch.delenv("SPINLAT_XY_PERIODIC_ANGLE", raising=False)
    r_metro = sw.make_xy_padded_runner(model, 2, 1, "allup")
    assert "f32-angle" in r_metro.engine
    r_or = sw.make_xy_padded_runner(model, 2, 1, "allup",
                                    n_over_relax=1, mcs_over_relax=2)
    assert "f32-angle" not in r_or.engine
    monkeypatch.setenv("SPINLAT_XY_PERIODIC_ANGLE", "0")
    assert "f32-angle" not in sw.make_xy_padded_runner(
        model, 2, 1, "allup").engine
    monkeypatch.setenv("SPINLAT_XY_PERIODIC_ANGLE", "1")
    assert "f32-angle" in sw.make_xy_padded_runner(
        model, 2, 1, "allup", n_over_relax=1,
        mcs_over_relax=2).engine


def test_angle_snap_measure_matches_phase_and_obs():
    """Angle phase-b + fused (mx, my, e, A): state bitwise equal to
    the plain angle phase kernel given shared uniforms; fused obs
    equal the whole-lattice recompute on the unpacked final state
    (A = sum cos 2pi(theta_t - theta_0) == component-space dot)."""
    model = XY2D(nx=42, ny=16, kbt=0.9, backend="jnp")
    ny, half = model.color_shape
    st = _rand_state(model, rng.base_key(7), 2)
    snap = _rand_state(model, rng.base_key(8), 2)
    planes = xa.pack_angles(st, half)
    snaps = xa.pack_angles(snap, half)
    w = planes[0].shape[-1]
    u_cand, u_acc = _uniforms(9, (2, ny, w))
    kw = dict(beta=float(model.beta), nrep=2, ny=ny, half=w,
              valid_half=half, interpret=True)
    a, b = planes
    sa, sb = snaps
    got_b, obs = xa._angle_metro_snap_phase(
        b, a, sb, sa, jnp.zeros(2, jnp.int32), u_cand=u_cand,
        u_acc=u_acc, **kw)
    want_b = xa._angle_metro_phase(
        b, a, jnp.zeros(2, jnp.int32), color=1, u_cand=u_cand,
        u_acc=u_acc, **kw)
    np.testing.assert_array_equal(np.asarray(got_b),
                                  np.asarray(want_b))
    fin = xa.unpack_angles((a, got_b), half)
    snap_unp = xa.unpack_angles(snaps, half)
    n_inv = 1.0 / model.nsites
    mx_w = jax.vmap(lambda s: model.magne_sums(s)[0])(fin) * n_inv
    my_w = jax.vmap(lambda s: model.magne_sums(s)[1])(fin) * n_inv
    e_w = jax.vmap(model.energy_sum)(fin) * n_inv
    a_w = jax.vmap(model.autocorrelation_sum)(fin, snap_unp) * n_inv
    np.testing.assert_allclose(np.asarray(obs[:, 0, 0]) * n_inv,
                               np.asarray(mx_w), rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(obs[:, 0, 1]) * n_inv,
                               np.asarray(my_w), rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(obs[:, 0, 2]) * n_inv,
                               np.asarray(e_w), rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(obs[:, 0, 3]) * n_inv,
                               np.asarray(a_w), rtol=0, atol=2e-5)


@pytest.mark.parametrize("prep,n_or", [("rotate_first", 0),
                                       ("fix1mcs", 0),
                                       ("rotate_first", 1)])
def test_angle_disorder_runner_wiring(monkeypatch, prep, n_or):
    """_xy_disorder_padded_runner on the ANGLE route (faked angle
    sweeps): schedule branches produce finite series of the right
    shape and host-chunked == monolithic bitwise; the engine stamp
    helper routes angle by default exactly on OR-free schedules."""
    from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        protocols as proto,
    )

    monkeypatch.setenv("SPINLAT_XY_PERIODIC_ANGLE", "1")

    def fake_sweep(model, planes, key):
        a, b = planes
        r = jax.random.uniform(key, a.shape, jnp.float32)
        return a + 0.25 * r, b - 0.125 * r

    def fake_snap(model, planes, snaps, key):
        planes = fake_sweep(model, planes, key)
        a, b = planes
        sa, _ = snaps
        return planes, {"mx": jnp.mean(a, (1, 2)),
                        "my": jnp.mean(b, (1, 2)),
                        "e": jnp.mean(a - b, (1, 2)),
                        "A": jnp.mean(a * sa, (1, 2))}

    monkeypatch.setattr(xa, "sweep_angle", fake_sweep)
    monkeypatch.setattr(xa, "sweep_measure_snap_angle", fake_snap)
    monkeypatch.setattr(xa, "or_sweep_angle",
                        lambda model, planes: planes[::-1])

    model = XY2D(nx=42, ny=16, kbt=0.9, backend="jnp")
    cfg = RunConfig(model="xy2d", nx=42, ny=16, kbt=0.9, mcs=6,
                    tot_sample=2, replicas=2, n_over_relax=n_or,
                    mcs_over_relax=4 if n_or else 0)
    key = rng.sample_key(rng.base_key(12), 0)
    mono = jax.device_get(jax.jit(proto._xy_disorder_padded_runner(
        model, cfg, prep, 2))(key))
    assert mono["mx"].shape == (2, 6)
    for k in ("mx", "my", "e", "A"):
        assert np.all(np.isfinite(np.asarray(mono[k])))

    import cuda_fortran_mc_simulation_spin_tpu.engine.sweep as sw_mod
    monkeypatch.setattr(sw_mod, "_sweeps_per_dispatch",
                        lambda *a, **k: 3)
    chunked_runner = proto._xy_disorder_padded_runner(model, cfg,
                                                      prep, 2)
    assert getattr(chunked_runner, "host_chunked", False)
    chunked = jax.device_get(chunked_runner(key))
    for k in mono:
        np.testing.assert_array_equal(np.asarray(mono[k]),
                                      np.asarray(chunked[k]))

    # default routing rule (no env): angle iff OR-free
    monkeypatch.delenv("SPINLAT_XY_PERIODIC_ANGLE")
    assert proto._xy_padded_disorder_angle(cfg) == (n_or == 0)


def test_aligned_or_free_routes_angle_runner(monkeypatch):
    """Aligned widths (nx/2 % 128 == 0) route the padded-runner
    machinery (unpadded, f32-angle) exactly on OR-free schedules
    (r5d A/B: 1.60x); OR schedules and SPINLAT_XY_PERIODIC_ANGLE=0
    keep the fused component batch runner."""
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("SPINLAT_XY_PERIODIC_ANGLE", raising=False)
    aligned = XY2D(nx=4096, ny=4096, kbt=0.89)
    assert sw.xy_padded_eligible(aligned, {})
    assert not sw.xy_padded_eligible(aligned, {"n_over_relax": 1})
    monkeypatch.setenv("SPINLAT_XY_PERIODIC_ANGLE", "0")
    assert not sw.xy_padded_eligible(aligned, {})
    # unaligned widths stay eligible for any schedule
    unaligned = XY2D(nx=4000, ny=4000, kbt=0.89)
    assert sw.xy_padded_eligible(unaligned, {"n_over_relax": 1})
    # engine stamp: unpadded aligned run says plain Pallas (f32-angle)
    monkeypatch.delenv("SPINLAT_XY_PERIODIC_ANGLE", raising=False)
    model = XY2D(nx=256, ny=16, kbt=0.9, backend="jnp")
    r = sw.make_xy_padded_runner(model, 2, 1, "allup")
    assert r.engine == "xy2d periodic Pallas (f32-angle)"
