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
def test_xy_fused_measure_plain_matches_jnp():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_measure_pallas

    model = XY2D(nx=256, ny=256, kbt=0.89)
    st = model.init_state("random", rng.base_key(7))
    obs = {k: float(v)
           for k, v in xy2d_measure_pallas.measure_plain(model, st).items()}
    n_inv = 1.0 / model.nsites
    mx, my = model.magne_sums(st)
    assert obs["mx"] == pytest.approx(float(mx) * n_inv, abs=3e-4)
    assert obs["my"] == pytest.approx(float(my) * n_inv, abs=3e-4)
    assert obs["e"] == pytest.approx(
        float(model.energy_sum(st)) * n_inv, abs=3e-4)
    # model-level batched dispatch
    stb = jax.tree.map(jnp_stack3, st)
    ob = model.observables_batched(stb)
    assert ob["m"].shape == (3,)
    np.testing.assert_allclose(np.asarray(ob["e"]), obs["e"], atol=3e-4)


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
def test_xy_multisweep_cold_known_answer():
    """β=10⁴ from allup: only candidates within |δθ| ≲ √(16.6/β/2)
    ≈ 0.03 rad can ever be accepted (continuous spectrum — unlike Ising
    there is no bitwise-absorbing state), so mx=1, my=0, e=-2, A=1 to
    measurement rounding and every angle stays within ~400 units of 0."""
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        xy2d_multisweep as ms,
    )

    m = XY2D(nx=256, ny=256, kbt=1e-4)
    st = jax.tree.map(lambda x: x[None], m.init_state("allup"))
    pa, pb = ms.state_to_angles(st)
    pa2, pb2, obs = ms.multisweep(m, pa, pb, pa, pb, rng.base_key(0), 8)
    obs = jax.device_get(obs)
    np.testing.assert_allclose(obs["mx"], 1.0, atol=1e-5)
    np.testing.assert_allclose(obs["my"], 0.0, atol=1e-5)
    np.testing.assert_allclose(obs["e"], -2.0, atol=1e-5)
    np.testing.assert_allclose(obs["A"], 1.0, atol=1e-5)
    for p in (pa2, pb2):
        k = np.asarray(jax.device_get(p), np.int32)
        assert np.abs(k).max() <= 400


@requires_tpu
def test_xy_multisweep_measurement_cross_check():
    """Fused in-kernel (mx, my, e, A) of the final sweep must equal
    direct jnp reductions on the final returned state."""
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        xy2d_multisweep as ms,
    )

    m = XY2D(nx=256, ny=256, kbt=0.89)
    st = jax.tree.map(
        lambda x: x[None], m.init_state("random", rng.base_key(0))
    )
    pa, pb = ms.state_to_angles(st)
    sa, sb = pa, pb
    pa2, pb2, obs = ms.multisweep(m, pa, pb, sa, sb, rng.base_key(1), 6)
    obs = {k: float(np.asarray(jax.device_get(v))[0, -1])
           for k, v in obs.items()}
    fin = ms.angles_to_state(pa2, pb2)
    fin1 = jax.tree.map(lambda x: x[0], fin)
    snap1 = jax.tree.map(lambda x: x[0], ms.angles_to_state(sa, sb))
    n_inv = 1.0 / m.nsites
    mx, my = m.magne_sums(fin1)
    assert obs["mx"] == pytest.approx(float(mx) * n_inv, abs=3e-4)
    assert obs["my"] == pytest.approx(float(my) * n_inv, abs=3e-4)
    assert obs["e"] == pytest.approx(
        float(m.energy_sum(fin1)) * n_inv, abs=3e-4)
    assert obs["A"] == pytest.approx(
        float(m.autocorrelation_sum(fin1, snap1)) * n_inv, abs=3e-4)


@requires_tpu
def test_xy_multisweep_or_conserves_energy():
    """Over-relaxation is microcanonical: with the Metropolis phases
    disabled (or_only), e(t) must stay constant over pure-OR sweeps from
    a random start."""
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        xy2d_multisweep as ms,
    )

    m = XY2D(nx=256, ny=256, kbt=0.89)
    st = jax.tree.map(
        lambda x: x[None], m.init_state("random", rng.base_key(2))
    )
    pa, pb = ms.state_to_angles(st)
    _, _, obs = ms.multisweep(m, pa, pb, pa, pb, rng.base_key(3), 8,
                              n_or=1, or_only=True)
    e = np.asarray(jax.device_get(obs["e"]))[0]
    np.testing.assert_allclose(e, e[0], atol=2e-3)


@requires_tpu
def test_xy_multisweep_matches_f32_path_statistically():
    """From-disorder m(t)/e(t)/A(t) curves from the int16-angle kernel
    agree with the f32 phase-kernel path within ensemble noise."""
    from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import protocols
    from cuda_fortran_mc_simulation_spin_tpu.models import build_model

    import os

    mcs, nsamp = 16, 12
    curves = {}
    for name, force_ms in (("f32", False), ("angle", True)):
        cfg = RunConfig(model="xy2d", nx=256, ny=256, kbt=0.89, mcs=mcs,
                        tot_sample=nsamp, init_state="random")
        model = build_model(cfg)
        if force_ms:
            os.environ["SPINLAT_XY_ANGLE_MS"] = "1"
            try:
                assert protocols._xy_multisweep_eligible(cfg, model,
                                                         "rotate_first")
            finally:
                os.environ.pop("SPINLAT_XY_ANGLE_MS", None)
            runner = jax.jit(protocols._xy_disorder_multisweep_runner(
                model, cfg, "rotate_first", 1))
        else:
            runner = jax.jit(protocols._xy_disorder_runner(
                model, cfg, "rotate_first"))
        base = rng.base_key(cfg.seed, cfg.stream)
        rows = []
        for s in range(nsamp):
            series = jax.device_get(runner(rng.sample_key(base, s)))
            a = np.asarray(series["A"], np.float64).reshape(-1)
            rows.append(a)
        curves[name] = np.stack(rows)
    sem = curves["f32"].std(0, ddof=1) / np.sqrt(nsamp)
    diff = np.abs(curves["f32"].mean(0) - curves["angle"].mean(0))
    assert np.all(diff < 6 * sem + 3e-3)


@requires_tpu
def test_xy_sweep_measure_fused_matches_separate():
    """Phase-b-fused (mx, my, e, A) must equal direct reductions on the
    state the fused sweep returns."""
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas

    m = XY2D(nx=256, ny=256, kbt=0.89)
    st = jax.tree.map(
        lambda x: x[None], m.init_state("random", rng.base_key(0))
    )
    snap = jax.tree.map(
        lambda x: x[None], m.init_state("random", rng.base_key(1))
    )
    st2, obs = xy2d_pallas.sweep_measure(m, st, snap, rng.base_key(2))
    obs = {k: float(np.asarray(jax.device_get(v))[0])
           for k, v in obs.items()}
    fin = jax.tree.map(lambda x: x[0], st2)
    snap1 = jax.tree.map(lambda x: x[0], snap)
    n_inv = 1.0 / m.nsites
    mx, my = m.magne_sums(fin)
    assert obs["mx"] == pytest.approx(float(mx) * n_inv, abs=3e-4)
    assert obs["my"] == pytest.approx(float(my) * n_inv, abs=3e-4)
    assert obs["e"] == pytest.approx(
        float(m.energy_sum(fin)) * n_inv, abs=3e-4)
    assert obs["A"] == pytest.approx(
        float(m.autocorrelation_sum(fin, snap1)) * n_inv, abs=3e-4)


@requires_tpu
def test_helical_ising_multisweep_cross_check():
    """Fused helical multisweep: in-kernel (m, e) of the final sweep must
    equal exact integer reductions on the returned flat state, and the
    NER decay must statistically match the jnp helical engine."""
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d_helical import (
        Ising2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.ops import helical_pallas as hp

    m = Ising2DHelical(nx=129, ny=128, kbt=2.26918531421)
    st = m.init_state("allup")
    st2, obs = hp.ising_multisweep(m, st, rng.base_key(0), 12)
    obs = jax.device_get(obs)
    m_direct = float(m.magne_sum(st2)) / m.nsites
    e_direct = float(m.energy_sum(st2)) / m.nsites
    assert obs["m"][-1] == pytest.approx(m_direct, abs=1e-6)
    assert obs["e"][-1] == pytest.approx(e_direct, abs=1e-6)
    full = np.asarray(jax.device_get(st2))
    assert set(np.unique(full)) <= {-1, 1}

    # statistical match vs the jnp helical engine
    nsamp, mcs = 8, 12
    curves = []
    for i in range(nsamp):
        _, o = hp.ising_multisweep(
            m, m.init_state("allup"),
            rng.sample_key(rng.base_key(1), i), mcs,
        )
        curves.append(np.asarray(jax.device_get(o["m"]), np.float64))
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    runner = jax.jit(sw.make_sample_runner(m, mcs))
    jnp_curves = np.stack([
        np.asarray(jax.device_get(
            runner(rng.sample_key(rng.base_key(2), i)))["m"], np.float64)
        for i in range(nsamp)
    ])
    sem = jnp_curves.std(0, ddof=1) / np.sqrt(nsamp)
    diff = np.abs(jnp_curves.mean(0) - np.stack(curves).mean(0))
    assert np.all(diff < 9 * sem + 5e-3)


@requires_tpu
def test_helical_ising_ner_exponent_at_tc():
    """The reference's flagship physics on its committed geometry: NER
    decay m(t) ~ t^(-β/νz) at Tc on 1001×1000 (β/νz = 0.0577).  A 128-
    sample run on the fused helical kernel measured 0.0612; keep a
    cheaper 32-sample gate with a wide window."""
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d_helical import (
        Ising2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.ops import helical_pallas as hp

    hm = Ising2DHelical(nx=1001, ny=1000, kbt=2.26918531421)
    R, MCS, CALLS = 8, 100, 4
    curves = []
    for c in range(CALLS):
        flat = jax.vmap(lambda k: hm.init_state("allup", k))(
            jax.random.split(rng.sample_key(rng.base_key(20), c), R)
        )
        _, obs = hp.ising_multisweep(
            hm, flat, rng.sample_key(rng.base_key(21), c), MCS
        )
        curves.append(np.asarray(jax.device_get(obs["m"]), np.float64))
    m_t = np.concatenate(curves, axis=0).mean(0)
    t = np.arange(1, MCS + 1)
    sel = t >= 10
    slope = np.polyfit(np.log(t[sel]), np.log(m_t[sel]), 1)[0]
    assert 0.03 < -slope < 0.09, slope


@requires_tpu
def test_helical_clock_multisweep_cross_check():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.clock_helical import (
        Clock2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.ops import helical_pallas as hp

    m = Clock2DHelical(nx=129, ny=128, kbt=0.80, q=6)
    st = m.init_state("allup")
    st2, obs = hp.clock_multisweep(m, st, rng.base_key(0), 10)
    obs = jax.device_get(obs)
    mx, my = m.magne_sums(st2)
    assert obs["m"][-1] == pytest.approx(
        float(mx) / m.nsites, abs=3e-4)
    assert obs["my"][-1] == pytest.approx(
        float(my) / m.nsites, abs=3e-4)
    assert obs["e"][-1] == pytest.approx(
        float(m.energy_sum(st2)) / m.nsites, abs=3e-4)
    full = np.asarray(jax.device_get(st2))
    assert full.min() >= 0 and full.max() < 6


@requires_tpu
def test_helical_xy_packed_sweep_and_or():
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d_helical import (
        XY2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.ops import helical_pallas as hp

    m = XY2DHelical(nx=129, ny=128, kbt=0.89)
    st = m.init_state("random", rng.base_key(0))
    stb = (st[0][None], st[1][None])
    sx, sy = hp.xy_pack_state(stb, m.ny, m.nx)
    sx, sy = hp.xy_sweep_packed(m, sx, sy, rng.base_key(1))
    obs = {k: float(np.asarray(jax.device_get(v))[0])
           for k, v in hp.xy_observables_packed(m, sx, sy).items()}
    flat = hp.xy_unpack_state(sx, sy, m.nx)
    flat1 = (flat[0][0], flat[1][0])
    ref = jax.device_get(m.observables(flat1))
    for k in ("m", "my", "e"):
        assert obs[k] == pytest.approx(float(ref[k]), abs=3e-4), k
    # unit norms preserved; pads still zero
    norms = np.hypot(np.asarray(flat1[0]), np.asarray(flat1[1]))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    # OR conserves energy
    e0 = float(ref["e"])
    sx, sy = hp.xy_over_relax_sweep_packed(m, sx, sy)
    e1 = float(np.asarray(jax.device_get(
        hp.xy_observables_packed(m, sx, sy)["e"]))[0])
    assert e1 == pytest.approx(e0, abs=2e-3)


@requires_tpu
def test_from_disorder_fused_batched_matches_unbatched():
    """The production from-disorder path (batched, measurement fused
    into phase b) must statistically match the unbatched f32 runner's
    A(t) curves."""
    from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.engine import protocols
    from cuda_fortran_mc_simulation_spin_tpu.models import build_model

    mcs, nsamp = 12, 16
    cfg = RunConfig(model="xy2d", nx=256, ny=256, kbt=0.89, mcs=mcs,
                    tot_sample=nsamp, init_state="random")
    model = build_model(cfg)

    runner_u = jax.jit(protocols._xy_disorder_runner(
        model, cfg, "rotate_first"))
    base = rng.base_key(cfg.seed, cfg.stream)
    un = np.stack([
        np.asarray(jax.device_get(
            runner_u(rng.sample_key(base, s)))["A"], np.float64)
        for s in range(nsamp)
    ])

    runner_b = jax.jit(protocols._xy_disorder_batched_runner(
        model, cfg, "rotate_first", 4))
    rows = []
    for c in range(nsamp // 4):
        series = jax.device_get(
            runner_b(rng.sample_key(rng.base_key(99), c)))
        rows.append(np.asarray(series["A"], np.float64))
    ba = np.concatenate(rows, axis=0)

    sem = un.std(0, ddof=1) / np.sqrt(nsamp)
    diff = np.abs(un.mean(0) - ba.mean(0))
    assert np.all(diff < 6 * sem + 3e-3), diff


@requires_tpu
def test_sharded_halo_phase_compiles_on_tpu():
    """The halo-aware Pallas phase kernel must compile with Mosaic and
    run inside shard_map on a (1,1) mesh on real hardware (multi-chip
    correctness is covered by the CPU interpret tests)."""
    import os

    import jax.numpy as jnp

    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import ising2d_pallas
    from cuda_fortran_mc_simulation_spin_tpu.parallel import (
        domain,
        mesh as mesh_mod,
    )

    model = Ising2D(nx=256, ny=256, kbt=2.26918531421)
    assert model.resolved_backend == "pallas"
    msh = mesh_mod.make_mesh(1, 1)
    state = domain.replicated_init(model, msh, 2, "random",
                                   rng.base_key(0))
    assert ising2d_pallas.shard_pallas_ok(tuple(state.a.shape[:1])
                                          + tuple(state.a.shape[1:]))
    step = domain.make_sharded_step(model, msh)
    state2, obs = step(state, rng.base_key(1))
    obs = jax.device_get(obs)
    for r in range(2):
        sub = jax.tree.map(lambda x: x[r], state2)
        assert obs["m"][r] == pytest.approx(
            float(model.magne_sum(sub)) / model.nsites, abs=1e-6)
        assert obs["e"][r] == pytest.approx(
            float(model.energy_sum(sub)) / model.nsites, abs=1e-6)
    # states actually moved (the kernel isn't a no-op)
    assert not np.array_equal(np.asarray(state2.a), np.asarray(state.a))

    # clock and XY sharded phases also route to their halo kernels
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    cm = Clock2D(nx=256, ny=256, kbt=0.91, q=6)
    cst = domain.replicated_init(cm, msh, 2, "random", rng.base_key(2))
    cst2, cobs = domain.make_sharded_step(cm, msh)(cst, rng.base_key(3))
    cobs = jax.device_get(cobs)
    sub = jax.tree.map(lambda x: x[0], cst2)
    assert cobs["e"][0] == pytest.approx(
        float(cm.energy_sum(sub)) / cm.nsites, abs=3e-4)

    xm = XY2D(nx=256, ny=256, kbt=0.89)
    xst = domain.replicated_init(xm, msh, 2, "random", rng.base_key(4))
    xst2, xobs = domain.make_sharded_step(xm, msh)(xst, rng.base_key(5))
    xobs = jax.device_get(xobs)
    sub = jax.tree.map(lambda x: x[0], xst2)
    assert xobs["e"][0] == pytest.approx(
        float(xm.energy_sum(sub)) / xm.nsites, abs=3e-4)
    norms = np.hypot(np.asarray(xst2.ax), np.asarray(xst2.ay))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


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


@requires_tpu
def test_sharded_halo_cols_phase_on_tpu_bitwise():
    """The x-sharded (column-halo) kernels must compile with Mosaic and,
    when fed the periodic wrap columns with col0=0 (same PRNG stream as
    the y-only kernel), produce BITWISE the same phase — the lane-roll
    edge fixups are exact."""
    import jax.numpy as jnp

    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        clock_pallas,
        ising2d_pallas,
        xy2d_pallas,
    )

    offs2 = jnp.array([0, 0], jnp.int32)
    offs3 = jnp.array([0, 0, 0], jnp.int32)

    # Ising
    m = Ising2D(nx=256, ny=256, kbt=2.26918531421)
    st = jax.vmap(lambda k: m.init_state("random", k))(
        jax.random.split(rng.base_key(0), 2))
    a, b = st.a, st.b
    hu, hd = b[:, -1:], b[:, :1]
    seeds = ising2d_pallas.seeds_from_key(rng.base_key(1), 0)
    want = ising2d_pallas.sharded_phase(
        a, b, hu, hd, seeds, offs2, color=0, beta=float(m.beta))
    got = ising2d_pallas.sharded_phase(
        a, b, hu, hd, seeds, offs3, color=0, beta=float(m.beta),
        halo_lf=b[:, :, -1:], halo_rt=b[:, :, :1])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # clock
    cm = Clock2D(nx=256, ny=256, kbt=0.91, q=6)
    cst = jax.vmap(lambda k: cm.init_state("random", k))(
        jax.random.split(rng.base_key(2), 2))
    x, o = cst.a, cst.b
    want = clock_pallas.sharded_phase(
        x, o, o[:, -1:], o[:, :1], seeds, offs2,
        color=0, q=6, beta=float(cm.beta))
    got = clock_pallas.sharded_phase(
        x, o, o[:, -1:], o[:, :1], seeds, offs3,
        color=0, q=6, beta=float(cm.beta),
        halo_lf=o[:, :, -1:], halo_rt=o[:, :, :1])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # XY Metropolis + OR
    xm = XY2D(nx=256, ny=256, kbt=0.89)
    xst = jax.vmap(lambda k: xm.init_state("random", k))(
        jax.random.split(rng.base_key(3), 2))
    ax, ay, bx, by = xst
    halos_x = (bx[:, -1:], bx[:, :1])
    halos_y = (by[:, -1:], by[:, :1])
    cols_x = (bx[:, :, -1:], bx[:, :, :1])
    cols_y = (by[:, :, -1:], by[:, :, :1])
    want = xy2d_pallas.sharded_phase(
        ax, ay, bx, by, halos_x, halos_y, seeds, offs2,
        color=0, beta=float(xm.beta))
    got = xy2d_pallas.sharded_phase(
        ax, ay, bx, by, halos_x, halos_y, seeds, offs3,
        color=0, beta=float(xm.beta), cols_x=cols_x, cols_y=cols_y)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    want = xy2d_pallas.sharded_or_phase(
        ax, ay, bx, by, halos_x, halos_y, offs2, color=0)
    got = xy2d_pallas.sharded_or_phase(
        ax, ay, bx, by, halos_x, halos_y, offs3, color=0,
        cols_x=cols_x, cols_y=cols_y)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@requires_tpu
def test_ising3d_sharded_halo_phase_on_tpu():
    """The z-sharded 3-D halo kernel compiles with Mosaic inside
    shard_map on a (1,1) mesh: fused (m, e) match direct reductions."""
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.ising3d import Ising3D
    from cuda_fortran_mc_simulation_spin_tpu.parallel import (
        domain,
        mesh as mesh_mod,
    )

    model = Ising3D(nx=256, ny=64, nz=16, kbt=4.51152)
    assert model.resolved_backend == "pallas"
    msh = mesh_mod.make_mesh(1, 1)
    state = domain.replicated_init(model, msh, 2, "random",
                                   rng.base_key(0))
    step = domain.make_sharded_step(model, msh)
    state2, obs = step(state, rng.base_key(1))
    obs = jax.device_get(obs)
    for r in range(2):
        sub = jax.tree.map(lambda x: x[r], state2)
        assert obs["m"][r] == pytest.approx(
            float(model.magne_sum(sub)) / model.nsites, abs=1e-6)
        assert obs["e"][r] == pytest.approx(
            float(model.energy_sum(sub)) / model.nsites, abs=1e-6)
    assert not np.array_equal(np.asarray(state2.a), np.asarray(state.a))
