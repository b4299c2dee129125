"""Lane-padded periodic XY engine (ops/xy2d_pallas padded API).

The committed geometries whose color width nx/2 is no lane multiple
(10000² -> 5000, 4000² -> 2000; /root/reference/app/
xy2d_periodic_gpu_relaxation.f90:7-13, /root/reference/scripts/
fpm_run_xy2d_periodic_over_relaxation.sh) previously fell back to the
~16x slower jnp sweeps.  Pads are zero and never accept a flip; the
x-wrap is substituted at the real seam — pinned here bitwise against
the aligned kernel (full-tile pad) and against the jnp phase oracle
(ragged width), all in interpret mode on CPU.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D, XYState
from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas as xp


def _rand_state(model, key, nrep=1):
    st = jax.vmap(lambda k: model.init_state("random", k))(
        jax.random.split(key, nrep))
    return st


def _pads_zero(st, half):
    for p in st:
        np.testing.assert_array_equal(np.asarray(p[..., half:]), 0.0)


def test_padded_full_tile_pad_matches_aligned_bitwise():
    """half=128 planes padded by a full extra zero tile (W=256,
    valid_half=128) run the seam-substituted code path — results must
    be BITWISE the aligned kernel's (natural roll wrap)."""
    model = XY2D(nx=256, ny=16, kbt=0.9, backend="jnp")
    ny, half = model.color_shape
    st = _rand_state(model, rng.base_key(0), 2)
    ku = jax.random.PRNGKey(5)
    u_cand = jax.random.uniform(ku, (2, ny, 2 * half), jnp.float32)
    u_acc = jax.random.uniform(jax.random.fold_in(ku, 1),
                               (2, ny, 2 * half), jnp.float32)

    kw = dict(beta=float(model.beta), nrep=2, ny=ny, interpret=True)
    pads = [(0, 0), (0, 0), (0, half)]
    stp = XYState(*(jnp.pad(p, pads) for p in st))
    want_ax, want_ay = xp._metropolis_phase(
        st.ax, st.ay, st.bx, st.by, jnp.zeros(2, jnp.int32),
        color=0, half=half, u_cand=u_cand[..., :half],
        u_acc=u_acc[..., :half], **kw)
    got_ax, got_ay = xp._metropolis_phase(
        stp.ax, stp.ay, stp.bx, stp.by, jnp.zeros(2, jnp.int32),
        color=0, half=2 * half, valid_half=half, u_cand=u_cand,
        u_acc=u_acc, **kw)
    np.testing.assert_array_equal(np.asarray(got_ax[..., :half]),
                                  np.asarray(want_ax))
    np.testing.assert_array_equal(np.asarray(got_ay[..., :half]),
                                  np.asarray(want_ay))
    np.testing.assert_array_equal(np.asarray(got_ax[..., half:]), 0.0)

    # OR phase (color 1) + fused obs: bitwise state, exact obs match
    kw.pop("beta")
    w_bx, w_by, w_obs = xp._over_relax_phase(
        st.bx, st.by, want_ax, want_ay, color=1, half=half,
        measuring=True, **kw)
    g_bx, g_by, g_obs = xp._over_relax_phase(
        stp.bx, stp.by, got_ax, got_ay, color=1, half=2 * half,
        valid_half=half, measuring=True, **kw)
    np.testing.assert_array_equal(np.asarray(g_bx[..., :half]),
                                  np.asarray(w_bx))
    np.testing.assert_array_equal(np.asarray(g_by[..., :half]),
                                  np.asarray(w_by))
    np.testing.assert_array_equal(np.asarray(g_obs[:, 0, :3]),
                                  np.asarray(w_obs[:, 0, :3]))
    np.testing.assert_array_equal(np.asarray(g_bx[..., half:]), 0.0)


@pytest.mark.parametrize("color", [0, 1])
def test_padded_ragged_vs_jnp_phase(color):
    """Ragged width (nx=42 -> half=21, W=128): the padded Metropolis
    phase agrees with the model's jnp phase oracle given shared
    uniforms; pads stay zero."""
    model = XY2D(nx=42, ny=16, kbt=0.9, backend="jnp")
    ny, half = model.color_shape
    w = xp.pad_width(half)
    st = _rand_state(model, rng.base_key(1), 1)
    ku = jax.random.PRNGKey(9)
    u_cand = jax.random.uniform(ku, (1, ny, w), jnp.float32)
    u_acc = jax.random.uniform(jax.random.fold_in(ku, 2),
                               (1, ny, w), jnp.float32)
    stp = xp.pad_planes(st, half)
    sx, sy, ox, oy = ((stp.ax, stp.ay, stp.bx, stp.by) if color == 0
                      else (stp.bx, stp.by, stp.ax, stp.ay))
    gx, gy = xp._metropolis_phase(
        sx, sy, ox, oy, jnp.zeros(2, jnp.int32), color=color,
        beta=float(model.beta), nrep=1, ny=ny, half=w, valid_half=half,
        u_cand=u_cand, u_acc=u_acc, interpret=True)

    jsx, jsy, jox, joy = ((st.ax, st.ay, st.bx, st.by) if color == 0
                          else (st.bx, st.by, st.ax, st.ay))
    wx, wy = model._phase(jsx[0], jsy[0], jox[0], joy[0], color,
                          u_cand[0, :, :half], u_acc[0, :, :half])
    np.testing.assert_allclose(np.asarray(gx[0, :, :half]),
                               np.asarray(wx), rtol=0, atol=4e-7)
    np.testing.assert_allclose(np.asarray(gy[0, :, :half]),
                               np.asarray(wy), rtol=0, atol=4e-7)
    np.testing.assert_array_equal(np.asarray(gx[..., half:]), 0.0)
    np.testing.assert_array_equal(np.asarray(gy[..., half:]), 0.0)


def test_padded_or_ragged_energy_conserved_and_obs():
    """Ragged OR sweep: microcanonical energy conservation on the real
    sites, |S|=1, pads zero, fused obs == whole-lattice recompute."""
    model = XY2D(nx=42, ny=16, kbt=0.9, backend="jnp")
    ny, half = model.color_shape
    st = _rand_state(model, rng.base_key(2), 2)
    stp = xp.pad_planes(st, half)
    e0 = np.asarray(jax.vmap(model.energy_sum)(st))
    os.environ["SPINLAT_XY_PADDED_INTERPRET"] = "1"
    try:
        out, obs = xp.padded_or_sweep_measure(model, stp)
    finally:
        del os.environ["SPINLAT_XY_PADDED_INTERPRET"]
    _pads_zero(out, half)
    unp = xp.unpad_planes(out, half)
    e1 = np.asarray(jax.vmap(model.energy_sum)(unp))
    np.testing.assert_allclose(e1, e0, rtol=0,
                               atol=3e-3 * model.nsites ** 0.5 + 1e-2)
    for r in range(2):
        full = model.full_vectors(XYState(*(p[r] for p in unp)))
        np.testing.assert_allclose(np.hypot(full[..., 0], full[..., 1]),
                                   1.0, atol=1e-5)
    want = jax.vmap(model.observables)(unp)
    for k in ("m", "my", "e"):
        np.testing.assert_allclose(np.asarray(obs[k]),
                                   np.asarray(want[k]),
                                   rtol=0, atol=2e-5)


def test_padded_runner_schedule_and_chunked_bitwise(monkeypatch):
    """make_xy_padded_runner with FAKED kernels (hardware PRNG has no
    CPU interpret): the OR/Metropolis schedule branches produce the
    expected series shape and host-chunked == monolithic bitwise (the
    kernels themselves are pinned by the phase tests above; the real
    runner is exercised on hardware by the production sessions)."""
    def fake_phase(st, key):
        r = jax.random.uniform(key, st.ax.shape, jnp.float32)
        return XYState(st.ax + r, st.ay - 0.5 * r,
                       st.bx * jnp.float32(0.9), st.by + 1.0)

    def obs_of(st):
        return {"m": jnp.mean(st.ax, (1, 2)),
                "my": jnp.mean(st.ay, (1, 2)),
                "e": jnp.mean(st.bx, (1, 2))}

    def fake_sweep(model, st, key):
        return fake_phase(st, key)

    def fake_sweep_measure(model, st, key):
        st = fake_phase(st, key)
        return st, obs_of(st)

    def fake_or(model, st):
        return XYState(st.ay, st.ax, st.by, st.bx)

    def fake_or_measure(model, st):
        st = fake_or(model, st)
        return st, obs_of(st)

    monkeypatch.setattr(xp, "padded_sweep", fake_sweep)
    monkeypatch.setattr(xp, "padded_sweep_measure", fake_sweep_measure)
    monkeypatch.setattr(xp, "padded_or_sweep", fake_or)
    monkeypatch.setattr(xp, "padded_or_sweep_measure", fake_or_measure)

    model = XY2D(nx=42, ny=16, kbt=0.9, backend="jnp")
    key = rng.sample_key(rng.base_key(3), 0)
    mk = lambda: sw.make_xy_padded_runner(  # noqa: E731
        model, 6, 2, "allup", n_over_relax=1, mcs_over_relax=4)
    mono = jax.tree.map(np.asarray, jax.device_get(jax.jit(mk())(key)))
    assert mono["m"].shape == (2, 6)
    assert np.all(np.isfinite(mono["m"]))

    monkeypatch.setattr(
        sw, "_sweeps_per_dispatch", lambda *a, **k: 4)
    chunked_runner = mk()
    assert getattr(chunked_runner, "host_chunked", False)
    chunked = jax.tree.map(np.asarray,
                           jax.device_get(chunked_runner(key)))
    for k in mono:
        np.testing.assert_array_equal(mono[k], chunked[k])


def test_padded_eligibility_gate(monkeypatch):
    """Gate: periodic XY2D, non-multiple-of-128 half, TPU backend."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert sw.xy_padded_eligible(XY2D(nx=42, ny=16, kbt=0.9))
    # aligned widths keep the existing aligned path on OR schedules
    # (OR-free aligned routes the f32-angle runner since r5d —
    # see test_xy2d_angle_periodic.test_aligned_or_free_routes_angle)
    assert not sw.xy_padded_eligible(XY2D(nx=256, ny=16, kbt=0.9),
                                     {"n_over_relax": 1})
    # explicit jnp backend opts out
    assert not sw.xy_padded_eligible(
        XY2D(nx=42, ny=16, kbt=0.9, backend="jnp"))
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not sw.xy_padded_eligible(XY2D(nx=42, ny=16, kbt=0.9))


requires_tpu = pytest.mark.skipif(
    jax.default_backend() == "cpu" and not os.environ.get(
        "SPINLAT_TEST_ON_TPU"),
    reason="needs TPU for Mosaic kernels",
)


@requires_tpu
def test_padded_mosaic_matches_interpret_on_tpu():
    """Padded Metropolis Mosaic == interpret BITWISE with shared
    uniforms; padded OR state bitwise, fused obs to f32 reduction-order
    accuracy (first run measured 1.3e-6 rel, scripts/tpu_session_r4g)."""
    model = XY2D(nx=522, ny=256, kbt=0.89, backend="jnp")
    ny, half = model.color_shape
    w = xp.pad_width(half)
    st = _rand_state(model, rng.base_key(0), 2)
    stp = xp.pad_planes(st, half)
    ku = jax.random.PRNGKey(5)
    u_c = jax.random.uniform(ku, (2, ny, w), jnp.float32)
    u_a = jax.random.uniform(jax.random.fold_in(ku, 1), (2, ny, w),
                             jnp.float32)
    kw = dict(beta=float(model.beta), nrep=2, ny=ny, half=w,
              valid_half=half, u_cand=u_c, u_acc=u_a)
    got = xp._metropolis_phase(stp.ax, stp.ay, stp.bx, stp.by,
                               jnp.zeros(2, jnp.int32), color=0, **kw)
    want = xp._metropolis_phase(stp.ax, stp.ay, stp.bx, stp.by,
                                jnp.zeros(2, jnp.int32), color=0,
                                interpret=True, **kw)
    for g, wv in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(wv))

    kwo = dict(nrep=2, ny=ny, half=w, valid_half=half, measuring=True)
    g = xp._over_relax_phase(stp.bx, stp.by, got[0], got[1], color=1,
                             **kwo)
    wv = xp._over_relax_phase(stp.bx, stp.by, got[0], got[1], color=1,
                              interpret=True, **kwo)
    for a, b in zip(g[:2], wv[:2]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(g[2]), np.asarray(wv[2]),
                               rtol=3e-6, atol=0)
    np.testing.assert_array_equal(np.asarray(g[0][..., half:]), 0.0)


# ---------------------------------------------------------------------------
# padded DISORDER path (VERDICT r4 #4): fused snapshot measurement and
# the protocol runner on lane-padded planes
# ---------------------------------------------------------------------------

def test_padded_snap_measure_matches_phase_and_obs():
    """padded phase-b + fused (mx, my, e, A): state bitwise equal to
    the plain padded phase kernel given shared uniforms; pads stay
    zero; fused obs equal the whole-lattice recompute on the unpadded
    final state (incl. A against the snapshot)."""
    model = XY2D(nx=42, ny=16, kbt=0.9, backend="jnp")
    ny, half = model.color_shape
    st = _rand_state(model, rng.base_key(7), 2)
    snap = _rand_state(model, rng.base_key(8), 2)
    stp = xp.pad_planes(st, half)
    snp = xp.pad_planes(snap, half)
    w = stp.ax.shape[-1]
    ku = jax.random.PRNGKey(9)
    u_cand = jax.random.uniform(ku, (2, ny, w), jnp.float32)
    u_acc = jax.random.uniform(jax.random.fold_in(ku, 1),
                               (2, ny, w), jnp.float32)
    kw = dict(beta=float(model.beta), nrep=2, ny=ny, half=w,
              valid_half=half, interpret=True)
    got_bx, got_by, obs = xp._metropolis_phase_b_measure(
        stp.bx, stp.by, stp.ax, stp.ay, snp.ax, snp.ay, snp.bx,
        snp.by, jnp.zeros(2, jnp.int32), u_cand=u_cand, u_acc=u_acc,
        **kw)
    want_bx, want_by = xp._metropolis_phase(
        stp.bx, stp.by, stp.ax, stp.ay, jnp.zeros(2, jnp.int32),
        color=1, u_cand=u_cand, u_acc=u_acc, **kw)
    np.testing.assert_array_equal(np.asarray(got_bx),
                                  np.asarray(want_bx))
    np.testing.assert_array_equal(np.asarray(got_by),
                                  np.asarray(want_by))
    fin = XYState(stp.ax, stp.ay, got_bx, got_by)
    _pads_zero(fin, half)
    unp = xp.unpad_planes(fin, half)
    snap_unp = xp.unpad_planes(snp, half)
    n_inv = 1.0 / model.nsites
    mx_w = jax.vmap(lambda s: model.magne_sums(s)[0])(unp) * n_inv
    my_w = jax.vmap(lambda s: model.magne_sums(s)[1])(unp) * n_inv
    e_w = jax.vmap(model.energy_sum)(unp) * n_inv
    a_w = jax.vmap(model.autocorrelation_sum)(unp, snap_unp) * n_inv
    np.testing.assert_allclose(np.asarray(obs[:, 0, 0]) * n_inv,
                               np.asarray(mx_w), rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(obs[:, 0, 1]) * n_inv,
                               np.asarray(my_w), rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(obs[:, 0, 2]) * n_inv,
                               np.asarray(e_w), rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(obs[:, 0, 3]) * n_inv,
                               np.asarray(a_w), rtol=0, atol=2e-5)


def _fake_padded_disorder_kernels(monkeypatch):
    """Deterministic stand-ins (hardware PRNG has no CPU interpret).
    Pins the COMPONENT engine (the angle engine routes by default on
    OR-free schedules; its wiring is tested in
    test_xy2d_angle_periodic)."""
    monkeypatch.setenv("SPINLAT_XY_PERIODIC_ANGLE", "0")

    def fake_phase(st, key):
        r = jax.random.uniform(key, st.ax.shape, jnp.float32)
        return XYState(st.ax + r, st.ay - 0.5 * r,
                       st.bx * jnp.float32(0.9), st.by + 1.0)

    def obs_of(st, snap):
        return {"mx": jnp.mean(st.ax, (1, 2)),
                "my": jnp.mean(st.ay, (1, 2)),
                "e": jnp.mean(st.bx, (1, 2)),
                "A": jnp.mean(st.ax * snap.ax, (1, 2))}

    monkeypatch.setattr(
        xp, "padded_sweep", lambda model, st, key: fake_phase(st, key))
    monkeypatch.setattr(
        xp, "padded_sweep_measure_snap",
        lambda model, st, snap, key:
            (lambda s: (s, obs_of(s, snap)))(fake_phase(st, key)))
    monkeypatch.setattr(
        xp, "padded_or_sweep",
        lambda model, st: XYState(st.ay, st.ax, st.by, st.bx))


@pytest.mark.parametrize("prep,n_or", [("rotate_first", 0),
                                       ("fix1mcs", 0),
                                       ("rotate_first", 1),
                                       ("fix1mcs", 1)])
def test_padded_disorder_runner_schedules_chunked_bitwise(
        monkeypatch, prep, n_or):
    """_xy_disorder_padded_runner over its schedule branches (fused
    no-OR path, fix1mcs rotation at t=1, OR + unpadded re-measure):
    series shapes/finiteness, and host-chunked == monolithic bitwise
    (global-t keys)."""
    from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        protocols as proto,
    )

    _fake_padded_disorder_kernels(monkeypatch)
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


def test_padded_disorder_eligibility(monkeypatch):
    """Gate: lane-unaligned periodic XY on TPU; resident/aligned/mesh
    keep their existing routes."""
    from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        protocols as proto,
    )

    cfg = RunConfig(model="xy2d", nx=4000, ny=4000, kbt=0.89, mcs=4,
                    tot_sample=1)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert proto._xy_disorder_padded_eligible(
        cfg, XY2D(nx=4000, ny=4000, kbt=0.89), "rotate_first")
    # aligned width: existing fused aligned path
    assert not proto._xy_disorder_padded_eligible(
        cfg, XY2D(nx=4096, ny=4096, kbt=0.89), "rotate_first")
    # correlation tracking keeps the jnp fallback
    cfg_corr = RunConfig(model="xy2d", nx=4000, ny=4000, kbt=0.89,
                         mcs=4, tot_sample=1, track_correlation=True)
    assert not proto._xy_disorder_padded_eligible(
        cfg_corr, XY2D(nx=4000, ny=4000, kbt=0.89), "rotate_first")
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not proto._xy_disorder_padded_eligible(
        cfg, XY2D(nx=4000, ny=4000, kbt=0.89), "rotate_first")
