"""Bit-sliced packed q=6 clock engine (ops/clock_multispin.py).

Validation ladder:
1. pack/unpack roundtrip (CRT split/merge);
2. packed phase vs a per-site integer oracle (full-lattice numpy,
   exact 2·cos bond table) given injected consistent proposal/chain
   planes — bitwise, both colors;
3. Pallas kernel (interpret) vs the jnp packed oracle — bitwise;
4. proposal thermometer and chain-plane statistics;
5. physics: absorbing states, equilibrium energy cross-check vs the
   int8 jnp engine, fused (m, e) vs direct observables.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.core.lattice import (
    merge_checkerboard,
    split_checkerboard,
)
from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D
from cuda_fortran_mc_simulation_spin_tpu.ops import clock_multispin as cm

# 2*cos(2*pi*d/6) for d = 0..5 — exact integers
TWOCOS = np.array([2, 1, -1, -2, -1, 1], dtype=np.int64)


def _random_state(key, ny=64, nx=64):
    full = jax.random.randint(key, (ny, nx), 0, 6, dtype=jnp.int32)
    return full.astype(jnp.int8)


def _rand_plane(key, shape):
    return jax.random.bits(key, shape, dtype=jnp.uint32).astype(jnp.int32)


def _consistent_proposal_planes(key, ny, half):
    """(ρ, rt1, rt2) packed planes derived from per-site r ∈ [1, 5]."""
    nyp = ny // 32
    r = jax.random.randint(key, (ny, half), 1, 6, dtype=jnp.int32)
    rho = (r & 1).astype(jnp.int8)
    rt1 = (r % 3 == 1).astype(jnp.int8)
    rt2 = (r % 3 == 2).astype(jnp.int8)

    def packbits(bits8):
        b = bits8.astype(jnp.uint32).reshape(nyp, 32, half)
        w = jnp.zeros((nyp, half), jnp.uint32)
        for k in range(32):
            w = w | (b[:, k, :] << np.uint32(k))
        return w.astype(jnp.int32)

    return (packbits(rho), packbits(rt1), packbits(rt2)), np.asarray(r)


def _unpack_bit_plane(w, ny, half):
    wu = np.asarray(w).astype(np.uint32)
    rows = [((wu >> np.uint32(k)) & 1).astype(np.int64)
            for k in range(32)]
    return np.stack(rows, axis=-2).reshape(ny, half)


def _phase_oracle_full(full, color, r_sites, bsites, beta_gates):
    """Per-site integer Metropolis phase on the full (ny, nx) lattice.

    r_sites, bsites[k]: per-COLOR-ARRAY-site (ny, half) proposal offsets
    and chain bits; beta_gates unused (decisions carried by bsites).
    Returns the updated full lattice.
    """
    ny, nx = full.shape
    up = np.roll(full, 1, axis=0)
    dn = np.roll(full, -1, axis=0)
    lf = np.roll(full, 1, axis=1)
    rt = np.roll(full, -1, axis=1)
    xg, yg = np.meshgrid(np.arange(nx), np.arange(ny))
    mask = ((xg + yg) & 1) == color
    # scatter color-array fields to full-lattice positions
    r_full = np.zeros_like(full)
    b_full = [np.zeros_like(full) for _ in bsites]
    # color c site (y, 2i + p') with p' depending on color/parity
    for y in range(ny):
        p = y & 1
        xs = (2 * np.arange(nx // 2)
              + (p if color == 0 else 1 - p))
        r_full[y, xs] = r_sites[y]
        for k in range(len(bsites)):
            b_full[k][y, xs] = bsites[k][y]
    new = full.copy()
    cand = (full + r_full) % 6
    d_cur = np.zeros_like(full)
    d_new = np.zeros_like(full)
    for nbr in (up, dn, lf, rt):
        d_cur += TWOCOS[(full - nbr) % 6]
        d_new += TWOCOS[(cand - nbr) % 6]
    D = d_cur - d_new  # = 2*dE
    m = np.clip(D, 0, None)
    g = [(m >> 0) & 1, (m >> 1) & 1, (m >> 2) & 1,
         ((m >> 3) & 1) | ((m >> 4) & 1), (m >> 4) & 1]
    passes = np.ones_like(full, dtype=bool)
    for k in range(5):
        passes &= (g[k] == 0) | (b_full[k] == 1)
    accept = (D <= 0) | passes
    upd = mask & accept
    new[upd] = cand[upd]
    return new


def test_pack_unpack_roundtrip():
    full = _random_state(jax.random.PRNGKey(0))
    a, b = split_checkerboard(full)
    for plane in (a, b):
        packed = cm.pack_clock_color(plane)
        back = cm.unpack_clock_color(*packed)
        np.testing.assert_array_equal(np.asarray(back),
                                      np.asarray(plane))


@pytest.mark.parametrize("color", [0, 1])
def test_packed_phase_vs_integer_oracle(color):
    """packed_phase_reference == per-site integer Metropolis, bitwise,
    given the same (consistent) injected planes."""
    key = jax.random.PRNGKey(3 + color)
    ks = jax.random.split(key, 8)
    ny = nx = 64
    half = nx // 2
    full = _random_state(ks[0], ny, nx)
    a, b = split_checkerboard(full)
    wa = cm.pack_clock_color(a)
    wb = cm.pack_clock_color(b)

    (rho, rt1, rt2), r_sites = _consistent_proposal_planes(
        ks[1], ny, half)
    chains = [_rand_plane(k, wa[0].shape) for k in ks[2:7]]
    planes8 = (rho, rt1, rt2, *chains)

    if color == 0:
        out = cm.packed_phase_reference(wa, wb, 0, planes8)
        got_color = cm.unpack_clock_color(*out)
        got_full = merge_checkerboard(got_color, b)
    else:
        out = cm.packed_phase_reference(wb, wa, 1, planes8)
        got_color = cm.unpack_clock_color(*out)
        got_full = merge_checkerboard(a, got_color)

    b_sites = [_unpack_bit_plane(c, ny, half) for c in chains]
    want_full = _phase_oracle_full(
        np.asarray(full, np.int64), color, r_sites,
        [bs for bs in b_sites], None)
    np.testing.assert_array_equal(np.asarray(got_full, np.int64),
                                  want_full)


def test_kernel_interpret_vs_oracle_bitwise():
    """Pallas kernel (interpret) == jnp packed oracle given the same
    injected planes, both colors, batched."""
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 12)
    ny, nx, nrep = 256, 256, 2
    half = nx // 2
    states = [
        split_checkerboard(_random_state(ks[i], ny, nx))
        for i in range(nrep)
    ]
    a = jnp.stack([s[0] for s in states])
    b = jnp.stack([s[1] for s in states])
    wa = cm.pack_clock_color(a)
    wb = cm.pack_clock_color(b)
    shape = wa[0].shape
    planes8 = tuple(_rand_plane(k, shape) for k in ks[nrep:nrep + 8])
    # mask rt2 where rt1 set so (rt1, rt2) stays a valid Z3 encoding
    rho, rt1, rt2 = planes8[:3]
    rt2 = rt2 & ~rt1
    # exclude r = 0 (rt1=rt2=0 and rho=0 would be a null proposal that
    # the engine never generates): force rho there
    rho = rho | ~(rt1 | rt2)
    planes8 = (rho, rt1, rt2) + planes8[3:]

    seeds = jnp.zeros((2,), jnp.int32)
    for color, (x, o) in (((0), (wa, wb)), ((1), (wb, wa))):
        got = cm.phase_packed(x, o, seeds, color=color, beta=1.1,
                              inject=planes8, interpret=True)
        want = jax.vmap(
            lambda xs, xt0, xt1, os_, ot0, ot1, p0, p1, p2, p3, p4,
                   p5, p6, p7: cm.packed_phase_reference(
                (xs, xt0, xt1), (os_, ot0, ot1), color,
                (p0, p1, p2, p3, p4, p5, p6, p7))
        )(*x, *o, *planes8)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_draw_planes_statistics():
    """Proposal categories ≈ their rounded-symmetric probabilities and
    chain planes ≈ their target Bernoulli rates."""
    beta = 1.25
    digit5 = cm.accept_digit_planes(beta)
    key = jax.random.PRNGKey(42)
    cnt = [0]

    def gen():
        cnt[0] += 1
        return jax.random.bits(
            jax.random.fold_in(key, cnt[0]), (256, 256),
            dtype=jnp.uint32)

    rho, rt1, rt2, b1, b2, b4, b8a, b8b = cm.draw_planes(
        (256, 256), gen, digit5)
    nbits = 256 * 256 * 32

    def frac(p):
        return sum(
            int(np.asarray(jnp.sum(
                ((p >> np.uint32(k)) & jnp.uint32(1)).astype(jnp.int32)
            ))) for k in range(32)
        ) / nbits

    # encoding never produces (rt1 & rt2)
    assert not bool(np.asarray(jnp.any(rt1 & rt2)))
    # r distribution: P(rho) = 3/5-ish (r odd: 1,3,5), P(rt1) = 2/5
    assert abs(frac(rho) - 3 / 5) < 3e-3
    assert abs(frac(rt1) - 2 / 5) < 3e-3
    assert abs(frac(rt2) - 2 / 5) < 3e-3
    for plane, k in ((b1, 1), (b2, 2), (b4, 4), (b8a, 8), (b8b, 8)):
        p_target = float(np.exp(-0.5 * k * beta))
        assert abs(frac(plane) - p_target) < 4e-3, (k, frac(plane))


def _pack_full(full):
    a, b = split_checkerboard(full)
    return cm.pack_clock_color(a[None]), cm.pack_clock_color(b[None])


def test_absorbing_states():
    """β→∞ from the ordered state: no move ever accepted (all chains
    empty); β→0: everything decorrelates from allup."""
    model_cold = Clock2D(nx=256, ny=256, kbt=1e-4, q=6, backend="jnp")
    full0 = jnp.zeros((256, 256), jnp.int8)
    wa, wb = _pack_full(full0)
    key = rng.base_key(7)
    for t in range(3):
        wa, wb = cm.sweep_packed6(model_cold, wa, wb,
                                  rng.sweep_key(key, t))
    assert int(np.asarray(jnp.sum(jnp.abs(wa[0])))) == 0
    assert int(np.asarray(jnp.sum(jnp.abs(wb[1])))) == 0
    got = cm.unpack_clock_color(*wa)
    np.testing.assert_array_equal(np.asarray(got), 0)

    model_hot = Clock2D(nx=256, ny=256, kbt=1e6, q=6, backend="jnp")
    wa, wb = _pack_full(full0)
    wa, wb, obs = cm.sweep_measure_packed6(model_hot, wa, wb,
                                           rng.sweep_key(key, 100))
    for t in range(101, 105):
        wa, wb, obs = cm.sweep_measure_packed6(model_hot, wa, wb,
                                               rng.sweep_key(key, t))
    assert abs(float(obs["m"][0])) < 0.02


def test_fused_obs_match_direct():
    """Fused (m, e) from the measuring phase == model.observables on
    the unpacked state (both exact in halves)."""
    model = Clock2D(nx=256, ny=256, kbt=0.9, q=6, backend="jnp")
    full = _random_state(jax.random.PRNGKey(5), 256, 256)
    wa, wb = _pack_full(full)
    key = rng.base_key(3)
    wa, wb, obs = cm.sweep_measure_packed6(model, wa, wb,
                                           rng.sweep_key(key, 1))
    state = cm.unpack_state(wa, wb, False)
    want = model.observables(state)
    assert abs(float(obs["m"][0]) - float(want["m"])) < 2e-6
    assert abs(float(obs["e"][0]) - float(want["e"])) < 2e-6


@pytest.mark.slow
def test_equilibrium_energy_vs_int8_engine():
    """⟨e⟩ at kbt=2.0 from the packed engine matches the int8 jnp
    engine within combined statistical error (different RNG streams —
    statistical agreement, the ising2d_multispin contract)."""
    kbt, n, therm, meas = 2.0, 256, 60, 60
    model = Clock2D(nx=n, ny=n, kbt=kbt, q=6, backend="jnp")
    key = rng.base_key(17)

    # packed engine
    wa, wb = _pack_full(jnp.zeros((n, n), jnp.int8))
    es = []
    for t in range(therm + meas):
        wa, wb, obs = cm.sweep_measure_packed6(model, wa, wb,
                                               rng.sweep_key(key, t))
        if t >= therm:
            es.append(float(obs["e"][0]))
    e_packed = float(np.mean(es))

    # int8 engine
    state = model.init_state("allup")
    es8 = []
    key2 = rng.base_key(18)
    for t in range(therm + meas):
        state = model.sweep(state, rng.sweep_key(key2, t))
        if t >= therm:
            es8.append(float(model.observables(state)["e"]))
    e_int8 = float(np.mean(es8))

    # fluctuation scale ~ 1/sqrt(N_meas * N): generous band
    assert abs(e_packed - e_int8) < 0.02, (e_packed, e_int8)


# ---------------------------------------------------------------------------
# TPU-gated (hardware PRNG / Mosaic) tests
# ---------------------------------------------------------------------------

import os


def _on_tpu() -> bool:
    return jax.default_backend() != "cpu" or bool(
        os.environ.get("SPINLAT_TEST_ON_TPU"))


def test_kernel_mosaic_vs_oracle_bitwise_on_tpu():
    """Compiled (Mosaic) kernel == jnp packed oracle, bitwise, given
    the same injected planes."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("needs the chip")
    key = jax.random.PRNGKey(21)
    ks = jax.random.split(key, 12)
    ny, nx, nrep = 256, 256, 2
    states = [
        split_checkerboard(_random_state(ks[i], ny, nx))
        for i in range(nrep)
    ]
    a = jnp.stack([s[0] for s in states])
    b = jnp.stack([s[1] for s in states])
    wa = cm.pack_clock_color(a)
    wb = cm.pack_clock_color(b)
    shape = wa[0].shape
    planes8 = tuple(_rand_plane(k, shape) for k in ks[nrep:nrep + 8])
    rho, rt1, rt2 = planes8[:3]
    rt2 = rt2 & ~rt1
    rho = rho | ~(rt1 | rt2)
    planes8 = (rho, rt1, rt2) + planes8[3:]
    seeds = jnp.zeros((2,), jnp.int32)
    for color, (x, o) in ((0, (wa, wb)), (1, (wb, wa))):
        got = cm.phase_packed(tuple(p + 0 for p in x), o, seeds,
                              color=color, beta=1.1, inject=planes8)
        want = jax.vmap(
            lambda xs, xt0, xt1, os_, ot0, ot1, p0, p1, p2, p3, p4,
                   p5, p6, p7: cm.packed_phase_reference(
                (xs, xt0, xt1), (os_, ot0, ot1), color,
                (p0, p1, p2, p3, p4, p5, p6, p7))
        )(*x, *o, *planes8)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_fused_obs_on_chip_match_direct():
    """Hardware-PRNG measuring phase: fused (m, e) == model
    observables on the unpacked state."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("needs the chip")
    model = Clock2D(nx=512, ny=512, kbt=0.9, q=6)
    full = _random_state(jax.random.PRNGKey(6), 512, 512)
    a, b = split_checkerboard(full)
    wa = cm.pack_clock_color(a[None])
    wb = cm.pack_clock_color(b[None])
    key = rng.base_key(9)
    wa, wb, obs = cm.sweep_measure_packed6(model, wa, wb,
                                           rng.sweep_key(key, 1))
    state = cm.unpack_state(wa, wb, False)
    want = jax.vmap(lambda _: model.observables(state))(jnp.arange(1))
    assert abs(float(obs["m"][0]) - float(want["m"][0])) < 3e-6
    assert abs(float(obs["e"][0]) - float(want["e"][0])) < 3e-6


def test_packed_vs_int8_relaxation_curves_on_tpu():
    """m(t) NER curves from the packed engine match the int8 engine's
    ensemble mean within statistical error (allup start, kbt=0.9)."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw

    n, mcs, nsamp = 256, 30, 24
    m_int8 = Clock2D(nx=n, ny=n, kbt=0.9, q=6)
    runner8 = jax.jit(sw.make_batch_runner(m_int8, mcs, nsamp))
    c8 = np.asarray(jax.device_get(
        runner8(rng.base_key(2))["m"]), np.float64)
    runner_p = jax.jit(sw.make_clock_multispin_runner(m_int8, mcs,
                                                      nsamp))
    cp = np.asarray(jax.device_get(
        runner_p(rng.base_key(3))["m"]), np.float64)
    sem = (c8.std(0, ddof=1) + cp.std(0, ddof=1)) / np.sqrt(nsamp)
    diff = np.abs(c8.mean(0) - cp.mean(0))
    assert np.all(diff < 8 * sem + 5e-3), (diff.max(), sem.max())


def test_protocol_routes_clock_multispin(monkeypatch):
    """run_relaxation on a packable q=6 clock shape selects the packed
    clock runner (and completes end-to-end)."""
    if not _on_tpu():
        pytest.skip("hardware PRNG path needs the chip")
    import io

    from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
    from cuda_fortran_mc_simulation_spin_tpu.engine import (
        protocols,
        sweep as sw,
    )

    called = {}
    orig = sw.make_clock_multispin_runner

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(sw, "make_clock_multispin_runner", spy)
    cfg = RunConfig(model="clock", nx=256, ny=256, q=6, kbt=0.9,
                    mcs=4, tot_sample=2, replicas=2)
    out = io.StringIO()
    protocols.run_relaxation(cfg, out=out, err=io.StringIO())
    assert called.get("yes"), "clock multispin runner was not routed"
    rows = [l for l in out.getvalue().splitlines()
            if l and not l.startswith("#")]
    assert len(rows) == 4


# ---------------------------------------------------------------------------
# domain-sharded packed clock (shard_map path)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("color", [0, 1])
def test_sharded_phase6_interpret_matches_reference(color):
    """Sharded packed clock phase (interpret, injected planes) ==
    the jnp sharded oracle, bitwise."""
    key = jax.random.PRNGKey(31 + color)
    ks = jax.random.split(key, 14)
    ny, nx, nrep = 256, 256, 2
    states = [
        split_checkerboard(_random_state(ks[i], ny, nx))
        for i in range(nrep)
    ]
    a = jnp.stack([s[0] for s in states])
    b = jnp.stack([s[1] for s in states])
    wa = cm.pack_clock_color(a)
    wb = cm.pack_clock_color(b)
    shape = wa[0].shape
    planes8 = tuple(_rand_plane(k, shape) for k in ks[2:10])
    rho, rt1, rt2 = planes8[:3]
    rt2 = rt2 & ~rt1
    rho = rho | ~(rt1 | rt2)
    planes8 = (rho, rt1, rt2) + planes8[3:]
    # boundary-site planes: random valid clock states
    hstates = jax.random.randint(ks[10], (6, nrep, 1, nx // 2), 0, 6)
    hup = tuple((hstates[i] % 2 if i == 0 else
                 (hstates[i] % 3 == 1) if i == 1 else
                 (hstates[i] % 3 == 2)).astype(jnp.int32)
                for i in range(3))
    hdn = tuple((hstates[i + 3] % 2 if i == 0 else
                 (hstates[i + 3] % 3 == 1) if i == 1 else
                 (hstates[i + 3] % 3 == 2)).astype(jnp.int32)
                for i in range(3))
    seeds = jnp.zeros((2,), jnp.int32)
    offs = jnp.zeros((2,), jnp.int32)
    x, o = ((wa, wb) if color == 0 else (wb, wa))
    got = cm.sharded_phase_packed6(
        tuple(p + 0 for p in x), o, hup, hdn, seeds, offs,
        color=color, beta=1.1, inject=planes8, interpret=True)
    want = jax.vmap(
        lambda xs, xt0, xt1, os_, ot0, ot1, p0, p1, p2, p3, p4, p5,
               p6, p7, h0, h1, h2, g0, g1, g2:
        cm.packed_sharded_phase_reference6(
            (xs, xt0, xt1), (os_, ot0, ot1), color,
            (p0, p1, p2, p3, p4, p5, p6, p7),
            (h0, h1, h2), (g0, g1, g2))
    )(*x, *o, *planes8, *hup, *hdn)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("color", [0, 1])
def test_sharded_phase6_cols_interpret_matches_reference(color):
    """Sharded packed clock phase WITH column halos (x-split variant,
    interpret, injected planes) == the jnp sharded oracle, bitwise."""
    key = jax.random.PRNGKey(61 + color)
    ks = jax.random.split(key, 18)
    ny, nx, nrep = 256, 256, 2
    states = [
        split_checkerboard(_random_state(ks[i], ny, nx))
        for i in range(nrep)
    ]
    a = jnp.stack([s[0] for s in states])
    b = jnp.stack([s[1] for s in states])
    wa = cm.pack_clock_color(a)
    wb = cm.pack_clock_color(b)
    shape = wa[0].shape
    planes8 = tuple(_rand_plane(k, shape) for k in ks[2:10])
    rho, rt1, rt2 = planes8[:3]
    rt2 = rt2 & ~rt1
    rho = rho | ~(rt1 | rt2)
    planes8 = (rho, rt1, rt2) + planes8[3:]
    hstates = jax.random.randint(ks[10], (6, nrep, 1, nx // 2), 0, 6)
    hup = tuple((hstates[i] % 2 if i == 0 else
                 (hstates[i] % 3 == 1) if i == 1 else
                 (hstates[i] % 3 == 2)).astype(jnp.int32)
                for i in range(3))
    hdn = tuple((hstates[i + 3] % 2 if i == 0 else
                 (hstates[i + 3] % 3 == 1) if i == 1 else
                 (hstates[i + 3] % 3 == 2)).astype(jnp.int32)
                for i in range(3))
    # boundary word columns: random packed words per plane
    nyw = shape[1]
    hlf = tuple(_rand_plane(k, (nrep, nyw, 1)) for k in ks[11:14])
    hrt = tuple(_rand_plane(k, (nrep, nyw, 1)) for k in ks[14:17])
    seeds = jnp.zeros((2,), jnp.int32)
    offs = jnp.zeros((3,), jnp.int32)
    x, o = ((wa, wb) if color == 0 else (wb, wa))
    got = cm.sharded_phase_packed6(
        tuple(p + 0 for p in x), o, hup, hdn, seeds, offs,
        color=color, beta=1.1, halo_lf=hlf, halo_rt=hrt,
        inject=planes8, interpret=True)
    want = jax.vmap(
        lambda xs, xt0, xt1, os_, ot0, ot1, p0, p1, p2, p3, p4, p5,
               p6, p7, h0, h1, h2, g0, g1, g2, l0, l1, l2, r0, r1, r2:
        cm.packed_sharded_phase_reference6(
            (xs, xt0, xt1), (os_, ot0, ot1), color,
            (p0, p1, p2, p3, p4, p5, p6, p7),
            (h0, h1, h2), (g0, g1, g2),
            (l0, l1, l2), (r0, r1, r2))
    )(*x, *o, *planes8, *hup, *hdn, *hlf, *hrt)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def _virtual_mesh_or_skip(dp, y):
    from cuda_fortran_mc_simulation_spin_tpu.parallel import mesh as mm

    if len(jax.devices()) < dp * y:
        pytest.skip("needs a virtual multi-device mesh (conftest)")
    return mm.make_mesh(dp, y)


@pytest.mark.slow
def test_sharded_packed6_runner_mesh_shape_invariant(monkeypatch):
    """Full packed clock sharded runner (interpret mode): (1,1) and
    (2,2) meshes produce bit-identical (m, e) series."""
    monkeypatch.setenv("SPINLAT_SHARD_PALLAS_INTERPRET", "1")
    from cuda_fortran_mc_simulation_spin_tpu.parallel import domain

    model = Clock2D(nx=256, ny=512, kbt=0.9, q=6, backend="jnp")
    series = {}
    for dp, y in ((1, 1), (2, 2)):
        mesh = _virtual_mesh_or_skip(dp, y)
        assert domain._shard_packed_mode(model, mesh, 4)[0] == "clock6"
        run = domain.make_sharded_sample_runner(model, mesh, mcs=3,
                                                replicas=4)
        series[(dp, y)] = jax.device_get(run(rng.base_key(36)))
    for k in ("m", "e"):
        np.testing.assert_array_equal(
            np.asarray(series[(1, 1)][k]), np.asarray(series[(2, 2)][k]))


@pytest.mark.slow
def test_sharded_packed6_runner_x_split_invariant(monkeypatch):
    """(1,2,2) mesh (x-axis split of the PACKED clock engine —
    exchanged boundary word columns per plane) is bitwise identical to
    the (1,1) mesh: chains are keyed per global (replica, 8-word-row granule) with
    full-width generation, so neither y- nor x-splits change the stream."""
    monkeypatch.setenv("SPINLAT_SHARD_PALLAS_INTERPRET", "1")
    from cuda_fortran_mc_simulation_spin_tpu.parallel import domain
    from cuda_fortran_mc_simulation_spin_tpu.parallel import mesh as mm

    if len(jax.devices()) < 4:
        pytest.skip("needs a virtual multi-device mesh (conftest)")
    model = Clock2D(nx=512, ny=512, kbt=0.9, q=6, backend="jnp")
    series = {}
    for dp, y, x in ((1, 1, 1), (1, 2, 2)):
        mesh = mm.make_mesh(dp, y, x)
        assert domain._shard_packed_mode(model, mesh, 2)[0] == "clock6", (
            "packed clock mode must engage on the x-split mesh")
        run = domain.make_sharded_sample_runner(model, mesh, mcs=3,
                                                replicas=2)
        series[(dp, y, x)] = jax.device_get(run(rng.base_key(62)))
    for k in ("m", "e"):
        np.testing.assert_array_equal(
            np.asarray(series[(1, 1, 1)][k]),
            np.asarray(series[(1, 2, 2)][k]))


@pytest.mark.slow
def test_clock_unified_keying_single_chip_equals_mesh(monkeypatch):
    """One config, ONE trajectory (SURVEY.md §7), CPU-runnable leg: the
    routed single-chip packed clock runner and a (1,1)-mesh sharded run
    both consume the unified granule streams
    (ops/multispin_rng.granule_planes_interpret on CPU) with the same
    global-t seed pairs and the same fold_in replica init keys — their
    m/e series are bitwise identical.  Combined with the mesh-shape /
    x-split invariance tests, any mesh shape equals the routed
    single-chip run.  (The hardware leg of the same statement is
    test_ising2d_multispin.test_unified_keying_one_config_one_
    trajectory_on_tpu.)"""
    monkeypatch.setenv("SPINLAT_SHARD_PALLAS_INTERPRET", "1")
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    from cuda_fortran_mc_simulation_spin_tpu.parallel import domain
    from cuda_fortran_mc_simulation_spin_tpu.parallel import mesh as mm

    model = Clock2D(nx=256, ny=512, kbt=0.9, q=6, backend="jnp")
    for kind in ("random",):
        runner = sw.make_clock_multispin_runner(model, 2, 2, kind)
        out1 = jax.device_get(runner(rng.base_key(55)))
        sharded = domain.make_sharded_sample_runner(
            model, mm.make_mesh(1, 1), mcs=2, replicas=2,
            init_kind=kind)
        out2 = jax.device_get(sharded(rng.base_key(55)))
        for k in ("m", "e"):
            np.testing.assert_array_equal(np.asarray(out1[k]),
                                          np.asarray(out2[k]))


def test_sharded_packed6_runner_absorbing_low_t(monkeypatch):
    """T→0 packed clock sharded runner: ordered start stays absorbed
    (m ≡ 1, e ≡ -2) on a (2,2) mesh."""
    monkeypatch.setenv("SPINLAT_SHARD_PALLAS_INTERPRET", "1")
    from cuda_fortran_mc_simulation_spin_tpu.parallel import domain

    model = Clock2D(nx=256, ny=512, kbt=1e-4, q=6, backend="jnp")
    mesh = _virtual_mesh_or_skip(2, 2)
    run = domain.make_sharded_sample_runner(model, mesh, mcs=2,
                                            replicas=4)
    out = jax.device_get(run(rng.base_key(37)))
    np.testing.assert_allclose(np.asarray(out["m"]), 1.0, atol=0)
    np.testing.assert_allclose(np.asarray(out["e"]), -2.0, atol=0)


def test_sharded_packed6_x_split_parts_match_full_on_tpu():
    """Hardware path: one y-periodic block phase == the concatenation
    of its two x-halves run with exchanged column halos (Mosaic
    compiles the has_cols branch; full-width granule generation with
    the (col0, w_total) lane window makes the streams identical, so
    the phase is bitwise invariant to the x-split)."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("hardware PRNG path")
    R, ny, half = 1, 256, 512
    ka, kb = jax.random.split(jax.random.PRNGKey(81))
    x3 = cm.pack_clock_color(_random_state(ka, ny, half)[None])
    o3 = cm.pack_clock_color(_random_state(kb, ny, half)[None])
    seeds = jnp.array([11, 3], jnp.int32)

    def h3(planes):
        # periodic y wrap from the block itself, as site bit planes
        ups, dns = [], []
        for p in planes:
            u = p.astype(jnp.uint32)
            dns.append((u[:, :1, :] & jnp.uint32(1)).astype(jnp.int32))
            ups.append(((u[:, -1:, :] >> jnp.uint32(31))
                        & jnp.uint32(1)).astype(jnp.int32))
        return tuple(ups), tuple(dns)

    hup, hdn = h3(o3)
    full = cm.sharded_phase_packed6(
        tuple(p + 0 for p in x3), o3, hup, hdn, seeds,
        jnp.zeros((2,), jnp.int32), color=0, beta=1.1)
    w = half  # lanes per color array == half sites
    parts = []
    for s in (0, w // 2):
        sl = slice(s, s + w // 2)
        lf = tuple(p[:, :, (s - 1) % w:(s - 1) % w + 1] for p in o3)
        rt = tuple(p[:, :, (s + w // 2) % w:(s + w // 2) % w + 1]
                   for p in o3)
        parts.append(cm.sharded_phase_packed6(
            tuple(p[:, :, sl] + 0 for p in x3),
            tuple(p[:, :, sl] for p in o3),
            tuple(h[:, :, sl] for h in hup),
            tuple(h[:, :, sl] for h in hdn),
            seeds, jnp.array([0, 0, s], jnp.int32),
            color=0, beta=1.1, halo_lf=lf, halo_rt=rt, w_total=w))
    for k in range(3):
        got = jnp.concatenate([parts[0][k], parts[1][k]], axis=2)
        np.testing.assert_array_equal(np.asarray(full[k]),
                                      np.asarray(got))


# ---------------------------------------------------------------------------
# padded packed engine — literal 2000x2000 / 1000x1000 committed
# geometries on the unchanged kernel (clock_multispin.py padded section)
# ---------------------------------------------------------------------------

def test_padded_spec_committed_geometries():
    """The two literal committed clock geometries pad at ~95% / ~78%
    occupancy; aligned shapes return None (plain engine)."""
    assert (cm.padded_spec(2000, 1000)
            == cm.PadSpec(2000, 1000, 63, 16, 64, 1024))
    assert (cm.padded_spec(1000, 500)
            == cm.PadSpec(1000, 500, 32, 8, 40, 512))
    assert cm.padded_spec(256, 128) is None
    assert cm.clock_padded_packable(
        Clock2D(nx=2000, ny=2000, kbt=0.8, q=6, backend="jnp"))
    assert cm.clock_padded_packable(
        Clock2D(nx=1000, ny=1000, kbt=0.91, q=6, backend="jnp"))
    assert not cm.clock_padded_packable(
        Clock2D(nx=256, ny=256, kbt=0.9, q=6, backend="jnp"))
    # odd ny / q != 6 are not servable
    assert cm.padded_spec(73, 30) is None
    assert not cm.clock_padded_packable(
        Clock2D(nx=60, ny=72, kbt=0.9, q=8, backend="jnp"))


def _consistent_proposal_planes_padded(key, spec):
    """Padded-shape proposal planes + the real-region per-site r."""
    ny_pad = spec.nyp * 32
    r = jax.random.randint(key, (ny_pad, spec.halfp), 1, 6,
                           dtype=jnp.int32)
    rho = (r & 1).astype(jnp.int8)
    rt1 = (r % 3 == 1).astype(jnp.int8)
    rt2 = (r % 3 == 2).astype(jnp.int8)

    def packbits(bits8):
        b = bits8.astype(jnp.uint32).reshape(spec.nyp, 32, spec.halfp)
        w = jnp.zeros((spec.nyp, spec.halfp), jnp.uint32)
        for k in range(32):
            w = w | (b[:, k, :] << np.uint32(k))
        return w.astype(jnp.int32)

    planes = (packbits(rho), packbits(rt1), packbits(rt2))
    return planes, np.asarray(r)[:spec.ny, :spec.half]


def _unpack_bit_plane_padded(w, spec):
    full = _unpack_bit_plane(w, spec.nyp * 32, spec.halfp)
    return full[:spec.ny, :spec.half]


@pytest.mark.parametrize("color", [0, 1])
def test_padded_phase_vs_integer_oracle(color):
    """Padded phase (refresh + unchanged plane algebra) == per-site
    integer Metropolis with true periodic wrap, bitwise, real region."""
    key = jax.random.PRNGKey(23 + color)
    ks = jax.random.split(key, 8)
    ny, nx = 72, 60
    half = nx // 2
    spec = cm.padded_spec(ny, half)
    full = _random_state(ks[0], ny, nx)
    a, b = split_checkerboard(full)
    wa = cm.pack_clock_color_padded(a, spec)
    wb = cm.pack_clock_color_padded(b, spec)

    planes3, r_sites = _consistent_proposal_planes_padded(ks[1], spec)
    chains = [_rand_plane(k, wa[0].shape) for k in ks[2:7]]
    planes8 = planes3 + tuple(chains)

    if color == 0:
        out = cm.packed_phase_reference(
            wa, cm.refresh_padded(wb, spec), 0, planes8)
        got_color = cm.unpack_clock_color_padded(*out, spec)
        got_full = merge_checkerboard(got_color, b)
    else:
        out = cm.packed_phase_reference(
            wb, cm.refresh_padded(wa, spec), 1, planes8)
        got_color = cm.unpack_clock_color_padded(*out, spec)
        got_full = merge_checkerboard(a, got_color)

    b_sites = [_unpack_bit_plane_padded(c, spec) for c in chains]
    want_full = _phase_oracle_full(
        np.asarray(full, np.int64), color, r_sites, b_sites, None)
    np.testing.assert_array_equal(np.asarray(got_full, np.int64),
                                  want_full)


def test_padded_matches_plain_on_aligned_shape():
    """Forced padding of an aligned shape reproduces the plain packed
    phase bitwise given the same per-site injected randoms — pins the
    refresh algebra (y-wrap words, pad lanes) against the aligned
    engine."""
    ny = nx = 256
    half = nx // 2
    spec = cm.PadSpec(ny, half, ny // 32, 0, ny // 32 * 2, half * 2)
    key = jax.random.PRNGKey(31)
    ks = jax.random.split(key, 8)
    full = _random_state(ks[0], ny, nx)
    a, b = split_checkerboard(full)

    # per-site randoms over the padded site space
    planes3_p, _ = _consistent_proposal_planes_padded(ks[1], spec)
    chain_bits = [
        jax.random.bernoulli(k, 0.5, (spec.nyp * 32, spec.halfp))
        .astype(jnp.int8) for k in ks[2:7]
    ]

    def pack_region(bits, nyw, halfw):
        b8 = bits[:nyw * 32, :halfw]
        bb = b8.astype(jnp.uint32).reshape(nyw, 32, halfw)
        w = jnp.zeros((nyw, halfw), jnp.uint32)
        for k in range(32):
            w = w | (bb[:, k, :] << np.uint32(k))
        return w.astype(jnp.int32)

    # plain planes = real region of the padded site randoms
    prop_bits = [
        _unpack_bit_plane(p, spec.nyp * 32, spec.halfp)
        for p in planes3_p
    ]
    planes8_plain = tuple(
        pack_region(jnp.asarray(pb, jnp.int8), ny // 32, half)
        for pb in prop_bits
    ) + tuple(pack_region(cb, ny // 32, half) for cb in chain_bits)
    planes8_pad = planes3_p + tuple(
        pack_region(cb, spec.nyp, spec.halfp) for cb in chain_bits)

    wa_p = cm.pack_clock_color(a)
    wb_p = cm.pack_clock_color(b)
    wa_d = cm.pack_clock_color_padded(a, spec)
    wb_d = cm.pack_clock_color_padded(b, spec)

    plain = cm.packed_phase_reference(wa_p, wb_p, 0, planes8_plain)
    padded = cm.packed_phase_reference(
        wa_d, cm.refresh_padded(wb_d, spec), 0, planes8_pad)
    got = cm.unpack_clock_color_padded(*padded, spec)
    want = cm.unpack_clock_color(*plain)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_padded_absorbing_and_obs():
    """β→∞ ordered stays ordered through the padded sweep; masked
    (m, e) == model.observables on the unpacked state (exact)."""
    from cuda_fortran_mc_simulation_spin_tpu.models.base import (
        CheckerboardState,
    )
    ny, nx = 72, 60
    spec = cm.padded_spec(ny, nx // 2)
    cold = Clock2D(nx=nx, ny=ny, kbt=1e-4, q=6, backend="jnp")
    z = jnp.zeros((1, ny, nx // 2), jnp.int8)
    wa = cm.pack_clock_color_padded(z, spec)
    wb = cm.pack_clock_color_padded(z, spec)
    key = rng.base_key(17)
    for t in range(3):
        wa, wb = cm.sweep_packed6_padded(cold, spec, wa, wb,
                                         rng.sweep_key(key, t))
    np.testing.assert_array_equal(
        np.asarray(cm.unpack_clock_color_padded(*wa, spec)), 0)

    warm = Clock2D(nx=nx, ny=ny, kbt=0.9, q=6, backend="jnp")
    full = _random_state(jax.random.PRNGKey(2), ny, nx)
    a, b = split_checkerboard(full)
    wa = cm.pack_clock_color_padded(a[None], spec)
    wb = cm.pack_clock_color_padded(b[None], spec)
    for t in range(3):
        wa, wb, obs = cm.sweep_measure_packed6_padded(
            warm, spec, wa, wb, rng.sweep_key(key, 10 + t))
    state = CheckerboardState(
        cm.unpack_clock_color_padded(*wa, spec)[0],
        cm.unpack_clock_color_padded(*wb, spec)[0],
    )
    want = warm.observables(state)
    assert abs(float(obs["m"][0]) - float(want["m"])) < 2e-6
    assert abs(float(obs["e"][0]) - float(want["e"])) < 2e-6


@pytest.mark.slow
def test_padded_runner_series():
    """make_clock_multispin_runner serves a padded shape end-to-end
    (interpret path) with finite (batch, mcs) series."""
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    model = Clock2D(nx=60, ny=72, kbt=0.9, q=6, backend="jnp")
    run = sw.make_clock_multispin_runner(model, mcs=3, batch=2,
                                         init_kind="allup")
    series = run(rng.sample_key(rng.base_key(5), 0))
    assert series["m"].shape == (2, 3)
    assert series["e"].shape == (2, 3)
    assert np.isfinite(np.asarray(series["m"])).all()
    # allup start: first-sweep magnetization stays near 1 at this kbt
    assert float(series["m"][0][0]) > 0.7


def test_padded_fused_obs_matches_masked_interpret():
    """The in-kernel masked (2m, 2e) sums (obs_mask operand, interpret
    mode) equal obs_packed6_masked recomputed from the phase outputs —
    exactly (both are int32 popcount sums over real sites)."""
    ny, nx, nrep = 72, 60, 2
    half = nx // 2
    spec = cm.padded_spec(ny, half)
    key = jax.random.PRNGKey(71)
    ks = jax.random.split(key, 11)
    states = [split_checkerboard(_random_state(ks[i], ny, nx))
              for i in range(nrep)]
    a = jnp.stack([s[0] for s in states])
    b = jnp.stack([s[1] for s in states])
    wa = cm.pack_clock_color_padded(a, spec)
    wb = cm.pack_clock_color_padded(b, spec)
    wa_r = cm.refresh_padded(wa, spec)
    shape = wa[0].shape
    planes8 = tuple(_rand_plane(k, shape) for k in ks[2:10])
    rho, rt1, rt2 = planes8[:3]
    rt2 = rt2 & ~rt1
    rho = rho | ~(rt1 | rt2)
    planes8 = (rho, rt1, rt2) + planes8[3:]
    seeds = jnp.zeros((2,), jnp.int32)
    got_planes, obs = cm.phase_packed(
        tuple(p + 0 for p in wb), wa_r, seeds, color=1, beta=0.9,
        inject=planes8, interpret=True, measuring=True,
        obs_mask=cm.pad_mask(spec))
    m2, e2 = cm.obs_packed6_masked(wa_r, got_planes, spec)
    np.testing.assert_array_equal(np.asarray(obs[:, 0, 0]),
                                  np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(obs[:, 0, 1]),
                                  np.asarray(e2))


def test_padded_fused_obs_on_chip_matches_masked():
    """Hardware path: sweep_measure_packed6_padded's fused masked obs
    == obs_packed6_masked recomputed from the returned planes, exactly
    (same states — the fused sums are the same popcounts in-kernel)."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("needs the chip")
    ny, nx = 2000, 2000
    spec = cm.padded_spec(ny, nx // 2)
    model = Clock2D(nx=nx, ny=ny, kbt=0.9, q=6)
    full = _random_state(jax.random.PRNGKey(72), ny, nx)
    a, b = split_checkerboard(full)
    wa = cm.pack_clock_color_padded(a[None], spec)
    wb = cm.pack_clock_color_padded(b[None], spec)
    key = rng.base_key(73)
    for t in range(2):
        wa, wb, obs = cm.sweep_measure_packed6_padded(
            model, spec, wa, wb, rng.sweep_key(key, t))
    m2, e2 = cm.obs_packed6_masked(wa, wb, spec)
    half_n_inv = 0.5 / model.nsites
    np.testing.assert_array_equal(
        np.asarray(obs["m"]),
        np.asarray(m2.astype(jnp.float32) * jnp.float32(half_n_inv)))
    np.testing.assert_array_equal(
        np.asarray(obs["e"]),
        np.asarray(e2.astype(jnp.float32) * jnp.float32(half_n_inv)))


def test_padded_kernel_mosaic_vs_oracle_bitwise_on_tpu():
    """Mosaic kernel on padded planes == jnp packed oracle, bitwise
    (injected planes) — the padded layout exercises partial-word tiles."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("needs the chip")
    ny, nx, nrep = 2000, 2000, 1
    half = nx // 2
    spec = cm.padded_spec(ny, half)
    key = jax.random.PRNGKey(41)
    ks = jax.random.split(key, 10)
    full = _random_state(ks[0], ny, nx)
    a, b = split_checkerboard(full)
    wa = cm.pack_clock_color_padded(a[None], spec)
    wb = cm.pack_clock_color_padded(b[None], spec)
    shape = wa[0].shape
    planes8 = tuple(_rand_plane(k, shape) for k in ks[1:9])
    rho, rt1, rt2 = planes8[:3]
    rt2 = rt2 & ~rt1
    rho = rho | ~(rt1 | rt2)
    planes8 = (rho, rt1, rt2) + planes8[3:]
    seeds = jnp.zeros((2,), jnp.int32)
    ob = cm.refresh_padded(wb, spec)
    got = cm.phase_packed(wa, ob, seeds, color=0, beta=1.25,
                          inject=planes8)
    want = jax.vmap(
        lambda xs, xt0, xt1, os_, ot0, ot1, p0, p1, p2, p3, p4,
               p5, p6, p7: cm.packed_phase_reference(
            (xs, xt0, xt1), (os_, ot0, ot1), 0,
            (p0, p1, p2, p3, p4, p5, p6, p7))
    )(*wa, *ob, *planes8)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
