"""Bit-sliced packed q=4 clock engine (ops/clock4_multispin.py).

Same validation ladder as the q=6 engine (tests/test_clock_multispin
.py): pack/unpack roundtrip; packed phase vs a per-site integer oracle
(exact integer cos bond table) given injected consistent planes —
bitwise, both colors; Pallas kernel (interpret) vs the jnp packed
oracle — bitwise; proposal/chain statistics; absorbing states;
equilibrium energy cross-check vs the int8 jnp engine; fused (m, e) vs
direct observables; padded (non-aligned) shapes.
"""

import os

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
from cuda_fortran_mc_simulation_spin_tpu.ops import clock4_multispin as c4
from cuda_fortran_mc_simulation_spin_tpu.ops import clock_multispin as cm

# cos(2*pi*d/4) for d = 0..3 — exact integers
COS4 = np.array([1, 0, -1, 0], dtype=np.int64)


def _random_state(key, ny=64, nx=64):
    full = jax.random.randint(key, (ny, nx), 0, 4, dtype=jnp.int32)
    return full.astype(jnp.int8)


def _rand_plane(key, shape):
    return jax.random.bits(key, shape, dtype=jnp.uint32).astype(jnp.int32)


def _consistent_proposal_planes(key, ny, half):
    """(r0, r1) packed planes derived from per-site r ∈ [1, 3]."""
    nyp = ny // 32
    r = jax.random.randint(key, (ny, half), 1, 4, dtype=jnp.int32)

    def packbits(bits8):
        b = bits8.astype(jnp.uint32).reshape(nyp, 32, half)
        w = jnp.zeros((nyp, half), jnp.uint32)
        for k in range(32):
            w = w | (b[:, k, :] << np.uint32(k))
        return w.astype(jnp.int32)

    return (packbits((r & 1).astype(jnp.int8)),
            packbits((r >> 1).astype(jnp.int8))), np.asarray(r)


def _unpack_bit_plane(w, ny, half):
    wu = np.asarray(w).astype(np.uint32)
    rows = [((wu >> np.uint32(k)) & 1).astype(np.int64)
            for k in range(32)]
    return np.stack(rows, axis=-2).reshape(ny, half)


def _phase_oracle_full(full, color, r_sites, bsites):
    """Per-site integer Metropolis q=4 phase on the full (ny, nx)
    lattice.  r_sites, bsites[k]: per-COLOR-ARRAY-site (ny, half)
    proposal offsets and chain bits.  Returns the updated lattice."""
    ny, nx = full.shape
    up = np.roll(full, 1, axis=0)
    dn = np.roll(full, -1, axis=0)
    lf = np.roll(full, 1, axis=1)
    rt = np.roll(full, -1, axis=1)
    xg, yg = np.meshgrid(np.arange(nx), np.arange(ny))
    mask = ((xg + yg) & 1) == color
    r_full = np.zeros_like(full)
    b_full = [np.zeros_like(full) for _ in bsites]
    for y in range(ny):
        p = y & 1
        xs = (2 * np.arange(nx // 2)
              + (p if color == 0 else 1 - p))
        r_full[y, xs] = r_sites[y]
        for k in range(len(bsites)):
            b_full[k][y, xs] = bsites[k][y]
    new = full.copy()
    cand = (full + r_full) % 4
    d_cur = np.zeros_like(full)
    d_new = np.zeros_like(full)
    for nbr in (up, dn, lf, rt):
        d_cur += COS4[(full - nbr) % 4]
        d_new += COS4[(cand - nbr) % 4]
    D = d_cur - d_new  # = dE (integer at q=4)
    m = np.clip(D, 0, None)
    g = [(m >> 0) & 1, (m >> 1) & 1, (m >> 2) & 1, (m >> 3) & 1]
    passes = np.ones_like(full, dtype=bool)
    for k in range(4):
        passes &= (g[k] == 0) | (b_full[k] == 1)
    accept = (D <= 0) | passes
    upd = mask & accept
    new[upd] = cand[upd]
    return new


def test_pack_unpack_roundtrip():
    full = _random_state(jax.random.PRNGKey(0))
    a, b = split_checkerboard(full)
    for plane in (a, b):
        packed = c4.pack_clock4_color(plane)
        back = c4.unpack_clock4_color(*packed)
        np.testing.assert_array_equal(np.asarray(back),
                                      np.asarray(plane))


@pytest.mark.parametrize("color", [0, 1])
def test_packed_phase_vs_integer_oracle(color):
    """packed_phase_reference4 == per-site integer Metropolis, bitwise,
    given the same (consistent) injected planes."""
    key = jax.random.PRNGKey(3 + color)
    ks = jax.random.split(key, 7)
    ny = nx = 64
    half = nx // 2
    full = _random_state(ks[0], ny, nx)
    a, b = split_checkerboard(full)
    wa = c4.pack_clock4_color(a)
    wb = c4.pack_clock4_color(b)

    (r0, r1), r_sites = _consistent_proposal_planes(ks[1], ny, half)
    chains = [_rand_plane(k, wa[0].shape) for k in ks[2:6]]
    planes6 = (r0, r1, *chains)

    if color == 0:
        out = c4.packed_phase_reference4(wa, wb, 0, planes6)
        got_full = merge_checkerboard(c4.unpack_clock4_color(*out), b)
    else:
        out = c4.packed_phase_reference4(wb, wa, 1, planes6)
        got_full = merge_checkerboard(a, c4.unpack_clock4_color(*out))

    b_sites = [_unpack_bit_plane(c, ny, half) for c in chains]
    want_full = _phase_oracle_full(
        np.asarray(full, np.int64), color, r_sites, b_sites)
    np.testing.assert_array_equal(np.asarray(got_full, np.int64),
                                  want_full)


def _valid_inject(ks, shape):
    planes6 = tuple(_rand_plane(k, shape) for k in ks)
    r0, r1 = planes6[:2]
    # exclude r = 0 (null proposal the engine never generates)
    r0 = r0 | ~(r0 | r1)
    return (r0, r1) + planes6[2:]


def test_kernel_interpret_vs_oracle_bitwise():
    """Pallas kernel (interpret) == jnp packed oracle given the same
    injected planes, both colors, batched."""
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 8)
    ny, nx, nrep = 256, 256, 2
    states = [
        split_checkerboard(_random_state(ks[i], ny, nx))
        for i in range(nrep)
    ]
    a = jnp.stack([s[0] for s in states])
    b = jnp.stack([s[1] for s in states])
    wa = c4.pack_clock4_color(a)
    wb = c4.pack_clock4_color(b)
    planes6 = _valid_inject(ks[2:8], wa[0].shape)

    seeds = jnp.zeros((2,), jnp.int32)
    for color, (x, o) in ((0, (wa, wb)), (1, (wb, wa))):
        got = c4.phase_packed4(x, o, seeds, color=color, beta=1.1,
                               inject=planes6, interpret=True)
        want = jax.vmap(
            lambda xb0, xb1, ob0, ob1, p0, p1, p2, p3, p4, p5:
            c4.packed_phase_reference4(
                (xb0, xb1), (ob0, ob1), color,
                (p0, p1, p2, p3, p4, p5))
        )(*x, *o, *planes6)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_draw_planes_statistics():
    """Proposal categories ≈ their rounded-symmetric probabilities and
    chain planes ≈ their target Bernoulli rates."""
    beta = 0.9
    digit4 = c4.accept_digit_planes4(beta)
    key = jax.random.PRNGKey(42)
    cnt = [0]

    def gen():
        cnt[0] += 1
        return jax.random.bits(
            jax.random.fold_in(key, cnt[0]), (256, 256),
            dtype=jnp.uint32)

    r0, r1, b1, b2, b4, b8 = c4.draw_planes4((256, 256), gen, digit4)
    nbits = 256 * 256 * 32

    def frac(p):
        return sum(
            int(np.asarray(jnp.sum(
                ((p >> np.uint32(k)) & jnp.uint32(1)).astype(jnp.int32)
            ))) for k in range(32)
        ) / nbits

    # r ∈ {1,2,3} uniform-ish: P(r odd) = 2/3, P(r >= 2) = 2/3
    assert abs(frac(r0) - 2 / 3) < 3e-3
    assert abs(frac(r1) - 2 / 3) < 3e-3
    # r = 0 never occurs
    assert bool(np.asarray(jnp.all(r0 | r1)))
    for plane, k in ((b1, 1), (b2, 2), (b4, 4), (b8, 8)):
        p_target = float(np.exp(-k * beta))
        assert abs(frac(plane) - p_target) < 4e-3, (k, frac(plane))


def _pack_full(full):
    a, b = split_checkerboard(full)
    return c4.pack_clock4_color(a[None]), c4.pack_clock4_color(b[None])


def test_absorbing_states():
    """β→∞ from the ordered state: no move ever accepted; β→0:
    everything decorrelates from allup."""
    model_cold = Clock2D(nx=256, ny=256, kbt=1e-4, q=4, backend="jnp")
    full0 = jnp.zeros((256, 256), jnp.int8)
    wa, wb = _pack_full(full0)
    key = rng.base_key(7)
    for t in range(3):
        wa, wb = c4.sweep_packed4(model_cold, wa, wb,
                                  rng.sweep_key(key, t))
    got = c4.unpack_clock4_color(*wa)
    np.testing.assert_array_equal(np.asarray(got), 0)

    model_hot = Clock2D(nx=256, ny=256, kbt=1e6, q=4, backend="jnp")
    wa, wb = _pack_full(full0)
    obs = None
    for t in range(100, 105):
        wa, wb, obs = c4.sweep_measure_packed4(model_hot, wa, wb,
                                               rng.sweep_key(key, t))
    assert abs(float(obs["m"][0])) < 0.02


def test_fused_obs_match_direct():
    """Fused (m, e) from the measuring phase == model.observables on
    the unpacked state (both exact integers over N)."""
    model = Clock2D(nx=256, ny=256, kbt=1.1, q=4, backend="jnp")
    full = _random_state(jax.random.PRNGKey(5), 256, 256)
    wa, wb = _pack_full(full)
    key = rng.base_key(3)
    wa, wb, obs = c4.sweep_measure_packed4(model, wa, wb,
                                           rng.sweep_key(key, 1))
    state = c4.unpack_state4(wa, wb, False)
    want = model.observables(state)
    assert abs(float(obs["m"][0]) - float(want["m"])) < 2e-6
    assert abs(float(obs["e"][0]) - float(want["e"])) < 2e-6


@pytest.mark.slow
def test_equilibrium_energy_vs_int8_engine():
    """⟨e⟩ at kbt=1.5 from the packed engine matches the int8 jnp
    engine within combined statistical error (different RNG streams —
    statistical agreement, the ising2d_multispin contract)."""
    kbt, n, therm, meas = 1.5, 256, 60, 60
    model = Clock2D(nx=n, ny=n, kbt=kbt, q=4, backend="jnp")
    key = rng.base_key(17)

    wa, wb = _pack_full(jnp.zeros((n, n), jnp.int8))
    es = []
    for t in range(therm + meas):
        wa, wb, obs = c4.sweep_measure_packed4(model, wa, wb,
                                               rng.sweep_key(key, t))
        if t >= therm:
            es.append(float(obs["e"][0]))
    e_packed = float(np.mean(es))

    state = model.init_state("allup")
    es8 = []
    key2 = rng.base_key(18)
    for t in range(therm + meas):
        state = model.sweep(state, rng.sweep_key(key2, t))
        if t >= therm:
            es8.append(float(model.observables(state)["e"]))
    e_int8 = float(np.mean(es8))

    assert abs(e_packed - e_int8) < 0.02, (e_packed, e_int8)


# ---------------------------------------------------------------------------
# padded engine (shape machinery shared with the q=6 module)
# ---------------------------------------------------------------------------

def test_padded_gates():
    assert c4.clock4_packable(
        Clock2D(nx=256, ny=256, kbt=1.1, q=4, backend="jnp"))
    assert not c4.clock4_packable(
        Clock2D(nx=256, ny=256, kbt=1.1, q=6, backend="jnp"))
    assert c4.clock4_padded_packable(
        Clock2D(nx=2000, ny=2000, kbt=1.1, q=4, backend="jnp"))
    assert not c4.clock4_padded_packable(
        Clock2D(nx=256, ny=256, kbt=1.1, q=4, backend="jnp"))


@pytest.mark.parametrize("color", [0, 1])
def test_padded_phase_vs_integer_oracle(color):
    """Padded q=4 phase (refresh + unchanged plane algebra) == per-site
    integer Metropolis with true periodic wrap, bitwise, real region."""
    key = jax.random.PRNGKey(23 + color)
    ks = jax.random.split(key, 7)
    ny, nx = 72, 60
    half = nx // 2
    spec = cm.padded_spec(ny, half)
    full = _random_state(ks[0], ny, nx)
    a, b = split_checkerboard(full)
    wa = c4.pack_clock4_color_padded(a, spec)
    wb = c4.pack_clock4_color_padded(b, spec)

    ny_pad = spec.nyp * 32
    r = jax.random.randint(ks[1], (ny_pad, spec.halfp), 1, 4,
                           dtype=jnp.int32)

    def packbits(bits8):
        bb = bits8.astype(jnp.uint32).reshape(spec.nyp, 32, spec.halfp)
        w = jnp.zeros((spec.nyp, spec.halfp), jnp.uint32)
        for k in range(32):
            w = w | (bb[:, k, :] << np.uint32(k))
        return w.astype(jnp.int32)

    planes2 = (packbits((r & 1).astype(jnp.int8)),
               packbits((r >> 1).astype(jnp.int8)))
    r_sites = np.asarray(r)[:ny, :half]
    chains = [_rand_plane(k, wa[0].shape) for k in ks[2:6]]
    planes6 = planes2 + tuple(chains)

    if color == 0:
        out = c4.packed_phase_reference4(
            wa, cm.refresh_padded(wb, spec), 0, planes6)
        got = c4.unpack_clock4_color_padded(*out, spec)
        got_full = merge_checkerboard(got, b)
    else:
        out = c4.packed_phase_reference4(
            wb, cm.refresh_padded(wa, spec), 1, planes6)
        got = c4.unpack_clock4_color_padded(*out, spec)
        got_full = merge_checkerboard(a, got)

    b_sites = [
        _unpack_bit_plane(c, spec.nyp * 32, spec.halfp)[:ny, :half]
        for c in chains
    ]
    want_full = _phase_oracle_full(
        np.asarray(full, np.int64), color, r_sites, b_sites)
    np.testing.assert_array_equal(np.asarray(got_full, np.int64),
                                  want_full)


def test_padded_absorbing_and_obs():
    """β→∞ ordered stays ordered through the padded q=4 sweep; masked
    (m, e) == model.observables on the unpacked state (exact)."""
    from cuda_fortran_mc_simulation_spin_tpu.models.base import (
        CheckerboardState,
    )
    ny, nx = 72, 60
    spec = cm.padded_spec(ny, nx // 2)
    cold = Clock2D(nx=nx, ny=ny, kbt=1e-4, q=4, backend="jnp")
    z = jnp.zeros((1, ny, nx // 2), jnp.int8)
    wa = c4.pack_clock4_color_padded(z, spec)
    wb = c4.pack_clock4_color_padded(z, spec)
    key = rng.base_key(17)
    for t in range(3):
        wa, wb = c4.sweep_packed4_padded(cold, spec, wa, wb,
                                         rng.sweep_key(key, t))
    np.testing.assert_array_equal(
        np.asarray(c4.unpack_clock4_color_padded(*wa, spec)), 0)

    warm = Clock2D(nx=nx, ny=ny, kbt=1.1, q=4, backend="jnp")
    full = _random_state(jax.random.PRNGKey(2), ny, nx)
    a, b = split_checkerboard(full)
    wa = c4.pack_clock4_color_padded(a[None], spec)
    wb = c4.pack_clock4_color_padded(b[None], spec)
    obs = None
    for t in range(3):
        wa, wb, obs = c4.sweep_measure_packed4_padded(
            warm, spec, wa, wb, rng.sweep_key(key, 10 + t))
    state = CheckerboardState(
        c4.unpack_clock4_color_padded(*wa, spec)[0],
        c4.unpack_clock4_color_padded(*wb, spec)[0],
    )
    want = warm.observables(state)
    assert abs(float(obs["m"][0]) - float(want["m"])) < 2e-6
    assert abs(float(obs["e"][0]) - float(want["e"])) < 2e-6


@pytest.mark.slow
def test_runner_series_q4():
    """make_clock_multispin_runner serves q=4 (aligned and padded)
    end-to-end (interpret path) with finite (batch, mcs) series."""
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    for nx, ny in ((256, 256), (60, 72)):
        model = Clock2D(nx=nx, ny=ny, kbt=1.0, q=4, backend="jnp")
        run = sw.make_clock_multispin_runner(model, mcs=3, batch=2,
                                             init_kind="allup")
        series = run(rng.sample_key(rng.base_key(5), 0))
        assert series["m"].shape == (2, 3)
        assert np.isfinite(np.asarray(series["m"])).all()
        # allup start below Tc(q=4)≈1.135: m stays high after 1 sweep
        assert float(series["m"][0][0]) > 0.6


# ---------------------------------------------------------------------------
# sharded engine (inside shard_map on the virtual mesh)
# ---------------------------------------------------------------------------

def _sharded_halo_planes(key, nrep, half):
    """Random boundary-state digit planes (b0, b1) for hup/hdn."""
    hs = jax.random.randint(key, (2, nrep, 1, half), 0, 4)
    return tuple(
        tuple(((hs[j] >> k) & 1).astype(jnp.int32) for k in range(2))
        for j in range(2)
    )


@pytest.mark.parametrize("color", [0, 1])
def test_sharded_phase4_interpret_matches_reference(color):
    """Sharded packed q=4 phase (interpret, injected planes) == the jnp
    sharded oracle, bitwise — synthetic edge words from exchanged
    boundary digit planes."""
    key = jax.random.PRNGKey(71 + color)
    ks = jax.random.split(key, 10)
    ny, nx, nrep = 256, 256, 2
    states = [
        split_checkerboard(_random_state(ks[i], ny, nx))
        for i in range(nrep)
    ]
    a = jnp.stack([s[0] for s in states])
    b = jnp.stack([s[1] for s in states])
    wa = c4.pack_clock4_color(a)
    wb = c4.pack_clock4_color(b)
    planes6 = _valid_inject(ks[2:8], wa[0].shape)
    hup, hdn = _sharded_halo_planes(ks[8], nrep, nx // 2)
    seeds = jnp.zeros((2,), jnp.int32)
    offs = jnp.zeros((2,), jnp.int32)
    x, o = ((wa, wb) if color == 0 else (wb, wa))
    got = c4.sharded_phase_packed4(
        tuple(p + 0 for p in x), o, hup, hdn, seeds, offs,
        color=color, beta=1.1, inject=planes6, interpret=True)
    want = jax.vmap(
        lambda xb0, xb1, ob0, ob1, p0, p1, p2, p3, p4, p5,
               h0, h1, g0, g1:
        c4.packed_sharded_phase_reference4(
            (xb0, xb1), (ob0, ob1), color,
            (p0, p1, p2, p3, p4, p5), (h0, h1), (g0, g1))
    )(*x, *o, *planes6, *hup, *hdn)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("color", [0, 1])
def test_sharded_phase4_cols_interpret_matches_reference(color):
    """Sharded packed q=4 phase WITH column halos (x-split variant,
    interpret, injected planes) == the jnp sharded oracle, bitwise."""
    key = jax.random.PRNGKey(81 + color)
    ks = jax.random.split(key, 14)
    ny, nx, nrep = 256, 256, 2
    states = [
        split_checkerboard(_random_state(ks[i], ny, nx))
        for i in range(nrep)
    ]
    a = jnp.stack([s[0] for s in states])
    b = jnp.stack([s[1] for s in states])
    wa = c4.pack_clock4_color(a)
    wb = c4.pack_clock4_color(b)
    planes6 = _valid_inject(ks[2:8], wa[0].shape)
    hup, hdn = _sharded_halo_planes(ks[8], nrep, nx // 2)
    nyw = wa[0].shape[1]
    hlf = tuple(_rand_plane(k, (nrep, nyw, 1)) for k in ks[9:11])
    hrt = tuple(_rand_plane(k, (nrep, nyw, 1)) for k in ks[11:13])
    seeds = jnp.zeros((2,), jnp.int32)
    offs = jnp.zeros((3,), jnp.int32)
    x, o = ((wa, wb) if color == 0 else (wb, wa))
    got = c4.sharded_phase_packed4(
        tuple(p + 0 for p in x), o, hup, hdn, seeds, offs,
        color=color, beta=1.1, halo_lf=hlf, halo_rt=hrt,
        inject=planes6, interpret=True)
    want = jax.vmap(
        lambda xb0, xb1, ob0, ob1, p0, p1, p2, p3, p4, p5,
               h0, h1, g0, g1, l0, l1, r0, r1:
        c4.packed_sharded_phase_reference4(
            (xb0, xb1), (ob0, ob1), color,
            (p0, p1, p2, p3, p4, p5), (h0, h1), (g0, g1),
            (l0, l1), (r0, r1))
    )(*x, *o, *planes6, *hup, *hdn, *hlf, *hrt)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def _virtual_mesh_or_skip(dp, y, x=1):
    from cuda_fortran_mc_simulation_spin_tpu.parallel import mesh as mm

    if len(jax.devices()) < dp * y * x:
        pytest.skip("needs a virtual multi-device mesh (conftest)")
    return mm.make_mesh(dp, y, x)


@pytest.mark.slow
def test_sharded_packed4_runner_mesh_shape_invariant(monkeypatch):
    """Full packed q=4 sharded runner (interpret mode): (1,1) and (2,2)
    meshes produce bit-identical (m, e) series."""
    monkeypatch.setenv("SPINLAT_SHARD_PALLAS_INTERPRET", "1")
    from cuda_fortran_mc_simulation_spin_tpu.parallel import domain

    model = Clock2D(nx=256, ny=512, kbt=0.9, q=4, backend="jnp")
    series = {}
    for dp, y in ((1, 1), (2, 2)):
        mesh = _virtual_mesh_or_skip(dp, y)
        assert domain._shard_packed_mode(model, mesh, 4)[0] == "clock4"
        run = domain.make_sharded_sample_runner(model, mesh, mcs=3,
                                                replicas=4)
        series[(dp, y)] = jax.device_get(run(rng.base_key(46)))
    for k in ("m", "e"):
        np.testing.assert_array_equal(
            np.asarray(series[(1, 1)][k]), np.asarray(series[(2, 2)][k]))


@pytest.mark.slow
def test_sharded_packed4_runner_x_split_invariant(monkeypatch):
    """(1,2,2) mesh (x-axis split of the PACKED q=4 engine) is bitwise
    identical to the (1,1) mesh — granule+chunk PRNG keying."""
    monkeypatch.setenv("SPINLAT_SHARD_PALLAS_INTERPRET", "1")
    from cuda_fortran_mc_simulation_spin_tpu.parallel import domain

    model = Clock2D(nx=512, ny=512, kbt=0.9, q=4, backend="jnp")
    series = {}
    for dp, y, x in ((1, 1, 1), (1, 2, 2)):
        mesh = _virtual_mesh_or_skip(dp, y, x)
        assert domain._shard_packed_mode(model, mesh, 2)[0] == "clock4", (
            "packed q=4 mode must engage on the x-split mesh")
        run = domain.make_sharded_sample_runner(model, mesh, mcs=3,
                                                replicas=2)
        series[(dp, y, x)] = jax.device_get(run(rng.base_key(72)))
    for k in ("m", "e"):
        np.testing.assert_array_equal(
            np.asarray(series[(1, 1, 1)][k]),
            np.asarray(series[(1, 2, 2)][k]))


def test_sharded_packed4_runner_absorbing_low_t(monkeypatch):
    """T→0 packed q=4 sharded runner: ordered start stays absorbed
    (m ≡ 1, e ≡ -2) on a (2,2) mesh."""
    monkeypatch.setenv("SPINLAT_SHARD_PALLAS_INTERPRET", "1")
    from cuda_fortran_mc_simulation_spin_tpu.parallel import domain

    model = Clock2D(nx=256, ny=512, kbt=1e-4, q=4, backend="jnp")
    mesh = _virtual_mesh_or_skip(2, 2)
    run = domain.make_sharded_sample_runner(model, mesh, mcs=2,
                                            replicas=4)
    out = jax.device_get(run(rng.base_key(47)))
    np.testing.assert_allclose(np.asarray(out["m"]), 1.0, atol=0)
    np.testing.assert_allclose(np.asarray(out["e"]), -2.0, atol=0)


# ---------------------------------------------------------------------------
# TPU-gated (hardware PRNG / Mosaic) tests
# ---------------------------------------------------------------------------

def _on_tpu() -> bool:
    return jax.default_backend() != "cpu" or bool(
        os.environ.get("SPINLAT_TEST_ON_TPU"))


def test_kernel_mosaic_vs_oracle_bitwise_on_tpu():
    """Compiled (Mosaic) q=4 kernel == jnp packed oracle, bitwise,
    given the same injected planes."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("needs the chip")
    key = jax.random.PRNGKey(21)
    ks = jax.random.split(key, 8)
    ny, nx, nrep = 256, 256, 2
    states = [
        split_checkerboard(_random_state(ks[i], ny, nx))
        for i in range(nrep)
    ]
    a = jnp.stack([s[0] for s in states])
    b = jnp.stack([s[1] for s in states])
    wa = c4.pack_clock4_color(a)
    wb = c4.pack_clock4_color(b)
    planes6 = _valid_inject(ks[2:8], wa[0].shape)
    seeds = jnp.zeros((2,), jnp.int32)
    for color, (x, o) in ((0, (wa, wb)), (1, (wb, wa))):
        got = c4.phase_packed4(tuple(p + 0 for p in x), o, seeds,
                               color=color, beta=1.1, inject=planes6)
        want = jax.vmap(
            lambda xb0, xb1, ob0, ob1, p0, p1, p2, p3, p4, p5:
            c4.packed_phase_reference4(
                (xb0, xb1), (ob0, ob1), color,
                (p0, p1, p2, p3, p4, p5))
        )(*x, *o, *planes6)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_fused_obs_on_chip_match_direct():
    """Hardware-PRNG measuring phase: fused (m, e) == model
    observables on the unpacked state."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("needs the chip")
    model = Clock2D(nx=512, ny=512, kbt=1.1, q=4)
    full = _random_state(jax.random.PRNGKey(6), 512, 512)
    a, b = split_checkerboard(full)
    wa = c4.pack_clock4_color(a[None])
    wb = c4.pack_clock4_color(b[None])
    key = rng.base_key(9)
    wa, wb, obs = c4.sweep_measure_packed4(model, wa, wb,
                                           rng.sweep_key(key, 1))
    state = c4.unpack_state4(wa, wb, False)
    want = jax.vmap(lambda _: model.observables(state))(jnp.arange(1))
    assert abs(float(obs["m"][0]) - float(want["m"][0])) < 3e-6
    assert abs(float(obs["e"][0]) - float(want["e"][0])) < 3e-6


def test_packed4_vs_int8_relaxation_curves_on_tpu():
    """m(t) NER curves from the packed q=4 engine match the int8
    engine's ensemble mean within statistical error (allup start,
    kbt=1.0 < Tc(q=4))."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw

    n, mcs, nsamp = 256, 30, 24
    m_int8 = Clock2D(nx=n, ny=n, kbt=1.0, q=4)
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
