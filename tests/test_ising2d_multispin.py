"""Bit-packed multispin Ising kernel (ops/ising2d_multispin.py):
pack/unpack, packed-vs-canonical stencil equivalence, Bernoulli-chain
statistics, and interpret-mode kernel vs the jnp packed oracle."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import lattice, rng
from cuda_fortran_mc_simulation_spin_tpu.ops import ising2d_multispin as msb

NY, HALF = 512, 128  # 16 word rows x 128 lanes


def _rand_plane(key, shape):
    return (jax.random.bernoulli(key, 0.5, shape).astype(jnp.int8) * 2
            - 1)


def test_pack_roundtrip():
    p = _rand_plane(rng.base_key(0), (3, NY, HALF))
    w = msb.pack_color(p)
    assert w.shape == (3, NY // 32, HALF) and w.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(msb.unpack_color(w)),
                                  np.asarray(p))


@pytest.mark.parametrize("color", [0, 1])
def test_packed_reference_matches_canonical_stencil(color):
    """packed_phase_reference == the canonical unpacked decision
    (core/lattice.neighbor_sums) given the same Bernoulli planes."""
    ka, kb, k4, k8 = jax.random.split(rng.base_key(1), 4)
    a = _rand_plane(ka, (NY, HALF))
    b = _rand_plane(kb, (NY, HALF))
    b4u = jax.random.bernoulli(k4, 0.3, (NY, HALF))
    b8u = jax.random.bernoulli(k8, 0.05, (NY, HALF))

    x, o = (a, b) if color == 0 else (b, a)
    nsum = lattice.neighbor_sums(o, color, accum_dtype=jnp.int32)
    half_de = x.astype(jnp.int32) * nsum
    accept = (half_de <= 0) | jnp.where(half_de == 2, b4u, b8u)
    want = jnp.where(accept, -x, x)

    got = msb.packed_phase_reference(
        msb.pack_color(x), msb.pack_color(o), color,
        msb.pack_color(b4u.astype(jnp.int8) * 2 - 1),
        msb.pack_color(b8u.astype(jnp.int8) * 2 - 1),
    )
    np.testing.assert_array_equal(np.asarray(msb.unpack_color(got)),
                                  np.asarray(want))


@pytest.mark.parametrize("color", [0, 1])
def test_phase_kernel_interpret_matches_reference(color):
    """Pallas kernel (interpret mode, injected planes) is bitwise the
    jnp packed oracle."""
    ka, kb, k4, k8 = jax.random.split(rng.base_key(2), 4)
    R = 2
    wa = msb.pack_color(_rand_plane(ka, (R, NY, HALF)))
    wb = msb.pack_color(_rand_plane(kb, (R, NY, HALF)))
    b4 = jax.random.bits(k4, (R, NY // 32, HALF), dtype=jnp.uint32
                         ).astype(jnp.int32)
    b8 = jax.random.bits(k8, (R, NY // 32, HALF), dtype=jnp.uint32
                         ).astype(jnp.int32)
    x, o = (wa, wb) if color == 0 else (wb, wa)
    got = msb.phase_packed_with_bits(x, o, b4, b8, color=color,
                                     interpret=True)
    want = jax.vmap(
        lambda xw, ow, p4, p8: msb.packed_phase_reference(
            xw, ow, color, p4, p8)
    )(x, o, b4, b8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_chain_digits_and_probability():
    """The LSB->MSB random chain realizes P(bit)=p at 2^-k resolution."""
    for p in (0.25, 0.6875, np.exp(-4 * 0.4407)):
        d = msb.chain_digits(p, 12)
        assert abs(sum(b * 2 ** -(i + 1) for i, b in enumerate(d)) - p) \
            <= 2 ** -12
    # statistics: mean over 2^21 bits within 5 sigma
    keys = iter(jax.random.split(rng.base_key(3), 64))

    def gen():
        return jax.random.bits(next(keys), (512, 128), dtype=jnp.uint32)

    p = float(np.exp(-4 * 0.4407))
    b = msb._bern_plane((512, 128), msb.chain_digits(p), gen)
    cnt = sum(int(jnp.sum((b >> np.uint32(k)) & jnp.uint32(1)))
              for k in range(32))
    n = 512 * 128 * 32
    sigma = (p * (1 - p) / n) ** 0.5
    assert abs(cnt / n - p) < 5 * sigma


def _on_tpu() -> bool:
    return jax.default_backend() != "cpu" or bool(
        os.environ.get("SPINLAT_TEST_ON_TPU"))


@pytest.mark.parametrize("color", [0, 1])
def test_phase_kernel_mosaic_matches_reference(color):
    """Compiled (Mosaic) kernel with injected planes is bitwise the jnp
    packed oracle — the on-chip counterpart of the interpret test."""
    if not _on_tpu():
        pytest.skip("needs the chip (Mosaic compile)")
    ka, kb, k4, k8 = jax.random.split(rng.base_key(7), 4)
    R = 2
    wa = msb.pack_color(_rand_plane(ka, (R, NY, HALF)))
    wb = msb.pack_color(_rand_plane(kb, (R, NY, HALF)))
    b4 = jax.random.bits(k4, (R, NY // 32, HALF), dtype=jnp.uint32
                         ).astype(jnp.int32)
    b8 = jax.random.bits(k8, (R, NY // 32, HALF), dtype=jnp.uint32
                         ).astype(jnp.int32)
    x, o = (wa, wb) if color == 0 else (wb, wa)
    got = msb.phase_packed_with_bits(x, o, b4, b8, color=color)
    want = jax.vmap(
        lambda xw, ow, p4, p8: msb.packed_phase_reference(
            xw, ow, color, p4, p8)
    )(x, o, b4, b8)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_multispin_onsager_magnetization():
    """Equilibrium |m| at kbt=2.0 on the packed engine matches
    Onsager's exact m = (1 - sinh^-4(2β))^(1/8) ≈ 0.9113."""
    if not _on_tpu():
        pytest.skip("hardware PRNG path needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D

    kbt = 2.0
    m_exact = (1.0 - np.sinh(2.0 / kbt) ** -4) ** 0.125
    L = 512
    model = Ising2D(nx=L, ny=L, kbt=kbt)
    wa = msb.pack_color(jnp.ones((1, L, L // 2), jnp.int8))
    wb = msb.pack_color(jnp.ones((1, L, L // 2), jnp.int8))
    mcs, burn = 2000, 1000

    @jax.jit
    def run(wa, wb, key):
        def body(c, t):
            wa, wb = msb.sweep_packed(model, c[0], c[1],
                                      rng.sweep_key(key, t))
            m = (msb.popcount_sum(wa) + msb.popcount_sum(wb)
                 ) * 2 - L * L
            return (wa, wb), m
        _, ms = jax.lax.scan(body, (wa, wb), jnp.arange(mcs))
        return ms

    ms = np.asarray(jax.device_get(run(wa, wb, rng.base_key(8))),
                    np.float64) / (L * L)
    m_mc = np.abs(ms)[burn:].mean()
    assert m_mc == pytest.approx(m_exact, abs=0.005)


def test_sweep_measure_packed_matches_state_observables():
    """Fused (m, e) from the phase-b kernel equal the observables
    computed from the unpacked final state."""
    if not _on_tpu():
        pytest.skip("hardware PRNG path needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D

    model = Ising2D(nx=2 * HALF, ny=NY, kbt=2.26918531421)
    st = jax.vmap(lambda k: model.init_state("random", k))(
        jax.random.split(rng.base_key(9), 2))
    wa, wb = msb.pack_color(st.a), msb.pack_color(st.b)
    wa, wb, obs = msb.sweep_measure_packed(model, wa, wb,
                                           rng.base_key(10))
    final = type(st)(msb.unpack_color(wa), msb.unpack_color(wb))
    n_inv = 1.0 / model.nsites
    for r in range(2):
        s1 = type(st)(final.a[r], final.b[r])
        m_want = float(model.magne_sum(s1)) * n_inv
        e_want = float(model.energy_sum(s1)) * n_inv
        np.testing.assert_allclose(float(obs["m"][r]), m_want,
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(float(obs["e"][r]), e_want,
                                   rtol=0, atol=1e-6)


def test_multispin_matches_phase_kernel_statistically():
    """m(t) ensemble means from the multispin runner agree with the
    int8 phase-kernel runner (independent streams, wide gate — same
    methodology as the multisweep cross-check in test_tpu_kernels)."""
    if not _on_tpu():
        pytest.skip("hardware PRNG path needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D

    m = Ising2D(nx=256, ny=256, kbt=2.26918531421)
    mcs, nsamp = 20, 8
    runner = jax.jit(sw.make_sample_runner(m, mcs))
    phase_curves = np.stack([
        np.asarray(jax.device_get(
            runner(rng.sample_key(rng.base_key(0), i)))["m"], np.float64)
        for i in range(nsamp)
    ])
    ms_runner = jax.jit(sw.make_multispin_runner(m, mcs, nsamp))
    ms_curves = np.asarray(
        jax.device_get(ms_runner(rng.base_key(1))["m"]), np.float64)
    sem = phase_curves.std(0, ddof=1) / np.sqrt(nsamp)
    diff = np.abs(phase_curves.mean(0) - ms_curves.mean(0))
    assert np.all(diff < 9 * sem + 5e-3)


def test_protocol_routes_multispin(monkeypatch):
    """run_relaxation on a packable Ising2D shape selects the multispin
    runner (and completes end-to-end)."""
    if not _on_tpu():
        pytest.skip("hardware PRNG path needs the chip")
    import io

    from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        protocols,
        sweep as sw,
    )

    called = {}
    orig = sw.make_multispin_runner

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(sw, "make_multispin_runner", spy)
    cfg = RunConfig(model="ising2d", nx=256, ny=256,
                    kbt=2.26918531421, mcs=4, tot_sample=2, replicas=2)
    out = io.StringIO()
    protocols.run_relaxation(cfg, out=out, err=io.StringIO())
    assert called.get("yes"), "multispin runner was not routed"
    rows = [l for l in out.getvalue().splitlines()
            if l and not l.startswith("#")]
    assert len(rows) == 4


@pytest.mark.parametrize("color", [0, 1])
def test_packed_sharded_reference_matches_halo_stencil(color):
    """packed_sharded_phase_reference == the canonical halo-stencil
    decision (lattice.neighbor_sums_halo) given the same planes."""
    ka, kb, k4, k8, kh = jax.random.split(rng.base_key(30), 5)
    x = _rand_plane(ka, (NY, HALF))
    o = _rand_plane(kb, (NY, HALF))
    hup = _rand_plane(kh, (1, HALF))        # row above the block
    hdn = _rand_plane(jax.random.fold_in(kh, 1), (1, HALF))
    b4u = jax.random.bernoulli(k4, 0.3, (NY, HALF))
    b8u = jax.random.bernoulli(k8, 0.05, (NY, HALF))
    nsum = lattice.neighbor_sums_halo(
        o.astype(jnp.int32), hup.astype(jnp.int32),
        hdn.astype(jnp.int32), color)
    half_de = x.astype(jnp.int32) * nsum
    accept = (half_de <= 0) | jnp.where(half_de == 2, b4u, b8u)
    want = jnp.where(accept, -x, x)
    got = msb.packed_sharded_phase_reference(
        msb.pack_color(x), msb.pack_color(o), color,
        msb.pack_color(b4u.astype(jnp.int8) * 2 - 1),
        msb.pack_color(b8u.astype(jnp.int8) * 2 - 1),
        (hup > 0).astype(jnp.int32), (hdn > 0).astype(jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(msb.unpack_color(got)),
                                  np.asarray(want))


@pytest.mark.parametrize("color", [0, 1])
def test_sharded_phase_packed_interpret_matches_reference(color):
    ka, kb, k4, k8, kh = jax.random.split(rng.base_key(31), 5)
    R = 2
    x = msb.pack_color(_rand_plane(ka, (R, NY, HALF)))
    o = msb.pack_color(_rand_plane(kb, (R, NY, HALF)))
    hup = (jax.random.bernoulli(kh, 0.5, (R, 1, HALF))
           ).astype(jnp.int32)
    hdn = (jax.random.bernoulli(jax.random.fold_in(kh, 1), 0.5,
                                (R, 1, HALF))).astype(jnp.int32)
    b4 = jax.random.bits(k4, (R, NY // 32, HALF), dtype=jnp.uint32
                         ).astype(jnp.int32)
    b8 = jax.random.bits(k8, (R, NY // 32, HALF), dtype=jnp.uint32
                         ).astype(jnp.int32)
    got = msb.sharded_phase_packed(
        x, o, hup, hdn, jnp.zeros((2,), jnp.int32),
        jnp.zeros((2,), jnp.int32), color=color, beta=0.44,
        b4=b4, b8=b8, interpret=True,
    )
    want = jax.vmap(
        lambda xw, ow, p4, p8, h1, h2: msb.packed_sharded_phase_reference(
            xw, ow, color, p4, p8, h1, h2)
    )(x, o, b4, b8, hup, hdn)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _virtual_mesh_or_skip(dp, y):
    from cuda_fortran_mc_simulation_spin_tpu.parallel import mesh as mm

    if len(jax.devices()) < dp * y:
        pytest.skip("needs a virtual multi-device mesh (conftest)")
    return mm.make_mesh(dp, y)


def test_sharded_packed_runner_mesh_shape_invariant(monkeypatch):
    """Full packed sharded runner (interpret mode): (1,1) and (2,2)
    meshes produce bit-identical (m, e) series — global word-row keyed
    chains + boundary-bit halo exchange."""
    monkeypatch.setenv("SPINLAT_SHARD_PALLAS_INTERPRET", "1")
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D
    from cuda_fortran_mc_simulation_spin_tpu.parallel import domain

    model = Ising2D(nx=2 * HALF, ny=NY, kbt=2.26918531421,
                    backend="jnp")
    series = {}
    for dp, y in ((1, 1), (2, 2)):
        mesh = _virtual_mesh_or_skip(dp, y)
        assert domain._shard_packed_mode(model, mesh, 4)[0]
        run = domain.make_sharded_sample_runner(model, mesh, mcs=3,
                                                replicas=4)
        series[(dp, y)] = jax.device_get(run(rng.base_key(33)))
    for k in ("m", "e"):
        np.testing.assert_array_equal(
            np.asarray(series[(1, 1)][k]), np.asarray(series[(2, 2)][k]))


def test_sharded_packed_runner_absorbing_low_t(monkeypatch):
    """T→0 on the packed sharded runner: chains are all-zero, the
    ordered start stays absorbed (m ≡ 1, e ≡ -2) on a (2,2) mesh."""
    monkeypatch.setenv("SPINLAT_SHARD_PALLAS_INTERPRET", "1")
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D
    from cuda_fortran_mc_simulation_spin_tpu.parallel import domain

    model = Ising2D(nx=2 * HALF, ny=NY, kbt=0.05, backend="jnp")
    mesh = _virtual_mesh_or_skip(2, 2)
    run = domain.make_sharded_sample_runner(model, mesh, mcs=2,
                                            replicas=4)
    out = jax.device_get(run(rng.base_key(34)))
    np.testing.assert_allclose(np.asarray(out["m"]), 1.0, atol=0)
    np.testing.assert_allclose(np.asarray(out["e"]), -2.0, atol=0)


def test_multisweep_packed_matches_state_observables():
    """Final-sweep fused (m, e) from the VMEM-resident packed
    multisweep equal direct reductions on the final state, and the
    runner's resident path is exercised at an ensemble shape."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("hardware PRNG path needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D

    model = Ising2D(nx=2 * HALF, ny=NY, kbt=2.26918531421)
    st = jax.vmap(lambda k: model.init_state("random", k))(
        jax.random.split(rng.base_key(60), 2))
    wa, wb = msb.pack_color(st.a), msb.pack_color(st.b)
    wa, wb, obs = msb.multisweep_packed(model, wa, wb,
                                        rng.base_key(61), 8)
    final = type(st)(msb.unpack_color(wa), msb.unpack_color(wb))
    n_inv = 1.0 / model.nsites
    for r in range(2):
        s1 = type(st)(final.a[r], final.b[r])
        np.testing.assert_allclose(
            float(obs["m"][r, -1]),
            float(model.magne_sum(s1)) * n_inv, rtol=0, atol=1e-6)
        np.testing.assert_allclose(
            float(obs["e"][r, -1]),
            float(model.energy_sum(s1)) * n_inv, rtol=0, atol=1e-6)

    # absorbing at T->0 through the runner's resident path
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw

    cold = Ising2D(nx=2 * HALF, ny=NY, kbt=0.05)
    runner = jax.jit(sw.make_multispin_runner(cold, 4, 2))
    out = jax.device_get(runner(rng.base_key(62)))
    np.testing.assert_allclose(np.asarray(out["m"]), 1.0, atol=0)
    np.testing.assert_allclose(np.asarray(out["e"]), -2.0, atol=0)


@pytest.mark.slow
def test_multispin_ner_exponent_at_tc():
    """NER decay m(t) ~ t^(-β/νz) at Tc (β/νz = 0.0577) on the packed
    headline engine at 1024² — the reference's flagship physics
    (/root/reference/app/ising2d_gpu_relaxation.f90:34-51) on the
    multispin kernel, wide gate (32 samples × 100 MCS)."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("hardware PRNG path needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D

    m = Ising2D(nx=1024, ny=1024, kbt=2.26918531421)
    R, MCS, CALLS = 8, 100, 4
    runner = jax.jit(sw.make_multispin_runner(m, MCS, R))
    curves = [
        np.asarray(jax.device_get(
            runner(rng.sample_key(rng.base_key(50), c))["m"]),
            np.float64)
        for c in range(CALLS)
    ]
    m_t = np.concatenate(curves, axis=0).mean(0)
    t = np.arange(1, MCS + 1)
    sel = t >= 10
    slope = np.polyfit(np.log(t[sel]), np.log(m_t[sel]), 1)[0]
    assert 0.03 < -slope < 0.09, slope


def test_sharded_packed_runner_on_chip():
    """Hardware-PRNG packed sharded runner on a (1,1) mesh: absorbing
    at T→0 and sane decay at Tc."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D
    from cuda_fortran_mc_simulation_spin_tpu.parallel import (
        domain,
        mesh as mm,
    )

    mesh = mm.make_mesh(1, 1)
    cold = Ising2D(nx=2 * HALF, ny=NY, kbt=0.05)
    assert domain._shard_packed_mode(cold, mesh, 2)[0]
    run = domain.make_sharded_sample_runner(cold, mesh, mcs=2,
                                            replicas=2)
    out = jax.device_get(run(rng.base_key(35)))
    np.testing.assert_allclose(np.asarray(out["m"]), 1.0, atol=0)
    np.testing.assert_allclose(np.asarray(out["e"]), -2.0, atol=0)

    hot = Ising2D(nx=512, ny=512, kbt=2.26918531421)
    run2 = domain.make_sharded_sample_runner(hot, mesh, mcs=16,
                                             replicas=2)
    out2 = jax.device_get(run2(rng.base_key(36)))
    m = np.asarray(out2["m"], np.float64)
    assert 0.3 < m[:, -1].mean() < 1.0
    assert np.all(np.isfinite(np.asarray(out2["e"])))


def test_sweep_packed_absorbing_at_low_t():
    """β large: chains are all-zero, so only ΔE ≤ 0 flips happen; the
    all-up state is absorbing (same invariant the int8 engine's tests
    use)."""
    if jax.default_backend() == "cpu" and not os.environ.get(
            "SPINLAT_TEST_ON_TPU"):
        pytest.skip("hardware PRNG path needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D

    model = Ising2D(nx=2 * HALF, ny=NY, kbt=0.05)
    wa = msb.pack_color(jnp.ones((1, NY, HALF), jnp.int8))
    wb = msb.pack_color(jnp.ones((1, NY, HALF), jnp.int8))
    for t in range(3):
        wa, wb = msb.sweep_packed(model, wa, wb, rng.sweep_key(
            rng.base_key(4), t))
    assert int(jnp.sum(msb.unpack_color(wa))) == NY * HALF
    assert int(jnp.sum(msb.unpack_color(wb))) == NY * HALF


def test_sharded_packed_granule_keying_tile_split_invariance_on_tpu():
    """Hardware-PRNG chains are keyed per global 8-word-row granule,
    so a y-split into local blocks with a DIFFERENT tile size
    (_pick_typ(96)=32 vs _pick_typ(48)=24) produces bitwise the same
    phase as the unsplit block — the unconditional mesh-shape
    invariance guarantee (round 2 keyed per tile, which broke for
    unequal-tile shardings)."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("hardware PRNG path")
    R, G, HALF2 = 1, 96, 256
    ka, kb = jax.random.split(rng.base_key(77))
    x = msb.pack_color(_rand_plane(ka, (R, G * 32, HALF2)))
    o = msb.pack_color(_rand_plane(kb, (R, G * 32, HALF2)))
    seeds = jnp.array([123, 7], jnp.int32)

    def hup01(start):
        row = (start - 1) % G
        return ((o[:, row:row + 1, :].astype(jnp.uint32)
                 >> jnp.uint32(31)) & jnp.uint32(1)).astype(jnp.int32)

    def hdn01(start, n):
        row = (start + n) % G
        return (o[:, row:row + 1, :] & 1).astype(jnp.int32)

    assert msb._pick_typ(G) != msb._pick_typ(G // 2)
    full = msb.sharded_phase_packed(
        x, o, hup01(0), hdn01(0, G), seeds,
        jnp.zeros((2,), jnp.int32), color=0, beta=0.44)
    parts = []
    for s in (0, G // 2):
        offs = jnp.array([0, s], jnp.int32)
        parts.append(msb.sharded_phase_packed(
            x[:, s:s + G // 2], o[:, s:s + G // 2],
            hup01(s), hdn01(s, G // 2), seeds, offs,
            color=0, beta=0.44))
    got = jnp.concatenate(parts, axis=1)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(got))


def test_sharded_packed_x_split_invariance_hw_on_tpu():
    """Hardware-PRNG chains generate the full GLOBAL lane width per
    granule and x-shards slice their window, so a lane split is bitwise
    identical to the unsplit phase — the x-axis leg of the unified
    keying's unconditional mesh-shape invariance, on the real chip
    (the interpret-mode x-split test covers the CPU fallback)."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("hardware PRNG path")
    R, G, HALF2 = 1, 32, 512
    ka, kb = jax.random.split(rng.base_key(79))
    x = msb.pack_color(_rand_plane(ka, (R, G * 32, HALF2)))
    o = msb.pack_color(_rand_plane(kb, (R, G * 32, HALF2)))
    seeds = jnp.array([123, 7], jnp.int32)
    hup01 = ((o[:, G - 1:G, :].astype(jnp.uint32)
              >> jnp.uint32(31)) & jnp.uint32(1)).astype(jnp.int32)
    hdn01 = (o[:, 0:1, :] & 1).astype(jnp.int32)
    full = msb.sharded_phase_packed(
        x, o, hup01, hdn01, seeds, jnp.zeros((2,), jnp.int32),
        color=0, beta=0.44)
    w = HALF2 // 2
    parts = []
    for c0 in (0, w):
        offs = jnp.array([0, 0, c0], jnp.int32)
        sl = slice(c0, c0 + w)
        parts.append(msb.sharded_phase_packed(
            x[:, :, sl], o[:, :, sl],
            hup01[:, :, sl], hdn01[:, :, sl], seeds, offs,
            color=0, beta=0.44, w_total=HALF2,
            halo_lf=o[:, :, (c0 - 1) % HALF2:(c0 - 1) % HALF2 + 1],
            halo_rt=o[:, :, (c0 + w) % HALF2:(c0 + w) % HALF2 + 1]))
    got = jnp.concatenate(parts, axis=2)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(got))


def test_tiled_obs_matches_accumulated_on_tpu():
    """tiled_obs mode (giant-lattice path): per-tile int32 partials sum
    to exactly the accumulated (m, e) of the same phase (same seeds →
    same hardware-PRNG stream → identical flips)."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("hardware PRNG path")
    R = 2
    ka, kb = jax.random.split(rng.base_key(78))
    wa = msb.pack_color(_rand_plane(ka, (R, 4096, 512)))
    wb = msb.pack_color(_rand_plane(kb, (R, 4096, 512)))
    seeds = jnp.array([5, 9], jnp.int32)
    # nyp=128 -> typ=32 -> 4 tiles: exercises the multi-row obs block
    kw = dict(color=1, beta=0.44, nrep=R, nyp=128, half=512,
              measuring=True)
    # the x operand is donated (input_output_aliases) — fresh copy per
    # call
    out1, obs_acc = msb._metropolis_phase_packed(
        wb + 0, wa, seeds, **kw)
    out2, obs_tiled = msb._metropolis_phase_packed(
        wb + 0, wa, seeds, tiled_obs=True, **kw)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    got = np.asarray(obs_tiled).sum(axis=1)
    want = np.asarray(obs_acc)[:, 0]
    np.testing.assert_array_equal(got[:, :2], want[:, :2])


def test_sharded_packed_runner_x_split_invariant(monkeypatch):
    """(1,2,2) mesh (x-axis split of the PACKED engine — exchanged
    boundary word columns) is bitwise identical to the (1,1) mesh:
    chains are keyed per global (replica, 8-word-row granule) with
    full-width generation, so neither y- nor x-splits change the stream."""
    monkeypatch.setenv("SPINLAT_SHARD_PALLAS_INTERPRET", "1")
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D
    from cuda_fortran_mc_simulation_spin_tpu.parallel import domain
    from cuda_fortran_mc_simulation_spin_tpu.parallel import mesh as mm

    if len(jax.devices()) < 4:
        pytest.skip("needs a virtual multi-device mesh (conftest)")
    model = Ising2D(nx=512, ny=512, kbt=2.26918531421, backend="jnp")
    series = {}
    for dp, y, x in ((1, 1, 1), (1, 2, 2)):
        mesh = mm.make_mesh(dp, y, x)
        assert domain._shard_packed_mode(model, mesh, 2)[0] == "2d", (
            "packed mode must engage on the x-split mesh")
        run = domain.make_sharded_sample_runner(model, mesh, mcs=3,
                                                replicas=2)
        series[(dp, y, x)] = jax.device_get(run(rng.base_key(35)))
    for k in ("m", "e"):
        np.testing.assert_array_equal(
            np.asarray(series[(1, 1, 1)][k]),
            np.asarray(series[(1, 2, 2)][k]))


def test_unified_keying_one_config_one_trajectory_on_tpu():
    """SURVEY.md §7's bit-reproducibility-across-sharding, closed: with
    every packed-Ising2D path on the SAME global-granule keying
    (_granule_chain_planes) and the same global-t seed-pair derivation,
    one config + seed yields ONE trajectory across
      (a) the routed single-chip resident multisweep,
      (b) the single-chip streaming phase kernels, and
      (c) a (1,1)-mesh sharded run (packed halo kernels)
    — asserted BITWISE on m/e series, at T→0 and at Tc.  (This replaces
    the round-4 divergence pin: the keyings have converged by design.)
    Mesh-shape invariance of (c) across (dp, y, x) splits is covered by
    the invariance tests above and on the virtual CPU mesh."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("hardware PRNG path")
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import ising2d_multispin
    from cuda_fortran_mc_simulation_spin_tpu.parallel import domain
    from cuda_fortran_mc_simulation_spin_tpu.parallel import mesh as mm

    def all_three(kbt):
        model = Ising2D(nx=512, ny=512, kbt=kbt)
        key = rng.base_key(91)
        resident = sweep.make_multispin_runner(model, 4, 2)
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(ising2d_multispin, "multisweep_fits_vmem",
                       lambda *a: False)
            streaming = sweep.make_multispin_runner(model, 4, 2)
        sharded = domain.make_sharded_sample_runner(
            Ising2D(nx=512, ny=512, kbt=kbt, backend="jnp"),
            mm.make_mesh(1, 1), mcs=4, replicas=2)
        outs = [jax.device_get(r(key))
                for r in (resident, streaming, sharded)]
        r1 = jax.device_get(resident(key))
        for k in ("m", "e"):
            np.testing.assert_array_equal(outs[0][k], r1[k])  # determ.
            np.testing.assert_array_equal(outs[0][k], outs[1][k])
            np.testing.assert_array_equal(outs[0][k], outs[2][k])
        return outs[0]

    cold = all_three(0.05)
    np.testing.assert_allclose(np.asarray(cold["m"]), 1.0, atol=0)
    all_three(2.26918531421)
