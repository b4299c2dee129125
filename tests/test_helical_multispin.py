"""Flat even/odd bit-packed helical Ising engine
(ops/helical_multispin.py): shift primitives, oracle equivalence vs
the brute-force helical stencil, and physics on the chip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.ops import (
    helical_multispin as hms,
)

NX, NY = 129, 64          # nall = 8256, M = 4128
M = NX * NY // 2


def _on_tpu() -> bool:
    return jax.default_backend() != "cpu" or bool(
        os.environ.get("SPINLAT_TEST_ON_TPU"))


def _rand_flat(key, shape):
    return (jax.random.bernoulli(key, 0.5, shape).astype(jnp.int8) * 2
            - 1)


def test_pack_flat_roundtrip():
    f = _rand_flat(rng.base_key(0), (3, M))
    w = hms.pack_flat(f, M)
    assert w.shape[-2:] == (hms.grid_rows(M), 128)
    np.testing.assert_array_equal(np.asarray(hms.unpack_flat(w, M)),
                                  np.asarray(f))


@pytest.mark.parametrize("d", [0, 1, -1, 31, 32, 33, -64, 500, -501,
                               2047, -2048, 4127])
def test_shift_mod_matches_flat_roll(d):
    """Packed modular bit-shift == jnp.roll on the flat vector."""
    f = _rand_flat(rng.base_key(1), (M,))
    w = hms.pack_flat(f, M)
    got = hms.unpack_flat(
        hms._shift_mod_impl(w, d, M, hms._jnp_roll).astype(jnp.int32),
        M)
    want = jnp.roll(f, -d)   # out(j) = f[(j + d) mod M]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("color", [0, 1])
def test_packed_phase_matches_flat_oracle(color):
    """Packed phase reference == the flat ±1 helical decision, which
    itself is checked against the brute-force helical stencil."""
    from cuda_fortran_mc_simulation_spin_tpu.core import lattice

    ka, kb, k4, k8 = jax.random.split(rng.base_key(2), 4)
    a = _rand_flat(ka, (M,))
    b = _rand_flat(kb, (M,))
    b4u = jax.random.bernoulli(k4, 0.3, (M,))
    b8u = jax.random.bernoulli(k8, 0.05, (M,))
    offs_a, offs_b = hms.helical_offsets(NX)
    x, o, offs = ((a, b, offs_a) if color == 0 else (b, a, offs_b))

    want = hms.flat_phase_reference(x, o, offs, b4u, b8u)

    # cross-check the flat oracle against the brute-force full-lattice
    # helical stencil (core/lattice.helical_neighbor_sums)
    full = hms.merge_flat(a, b)
    nsum_full = lattice.helical_neighbor_sums(
        full.astype(jnp.int32), NX)
    nsum_color = nsum_full[color::2]
    o32 = o.astype(jnp.int32)
    nsum_offs = sum(jnp.roll(o32, -d) for d in offs)
    np.testing.assert_array_equal(np.asarray(nsum_offs),
                                  np.asarray(nsum_color))

    got = hms.unpack_flat(
        hms.packed_helical_phase_reference(
            hms.pack_flat(x, M), hms.pack_flat(o, M), offs,
            hms.pack_flat(b4u.astype(jnp.int8) * 2 - 1, M),
            hms.pack_flat(b8u.astype(jnp.int8) * 2 - 1, M), M),
        M)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("color", [0, 1])
def test_phase_kernel_interpret_matches_reference(color):
    """Pallas phase with injected planes (interpret mode on CPU, Mosaic
    on TPU) is bitwise the jnp packed oracle — covers the in-kernel
    _pltpu_roll shift path."""
    ka, kb, k4, k8 = jax.random.split(rng.base_key(8), 4)
    R = 2
    rows = hms.grid_rows(M)
    x = hms.pack_flat(_rand_flat(ka, (R, M)), M)
    o = hms.pack_flat(_rand_flat(kb, (R, M)), M)
    b4 = jax.random.bits(k4, (R, rows, 128), dtype=jnp.uint32
                         ).astype(jnp.int32)
    b8 = jax.random.bits(k8, (R, rows, 128), dtype=jnp.uint32
                         ).astype(jnp.int32)
    offs = hms.helical_offsets(NX)[color]
    interpret = jax.default_backend() == "cpu"
    got = hms.phase_packed_with_bits(x, o, b4, b8, offs=offs, m=M,
                                     interpret=interpret)
    want = jax.vmap(
        lambda xw, ow, p4, p8: hms.packed_helical_phase_reference(
            xw, ow, offs, p4, p8, M)
    )(x, o, b4, b8)
    # pads may differ (reference shifts see pad garbage differently);
    # compare the valid sites
    np.testing.assert_array_equal(
        np.asarray(jax.vmap(lambda w: hms.unpack_flat(w, M))(got)),
        np.asarray(jax.vmap(lambda w: hms.unpack_flat(w, M))(want)),
    )


@pytest.mark.slow
def test_helical_multispin_ner_exponent_at_tc():
    """NER decay m(t) ~ t^(-β/νz) at Tc on the packed flat engine at
    the reference's committed 1001×1000 geometry (wide gate)."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("hardware PRNG path needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d_helical import (
        Ising2DHelical,
    )

    model = Ising2DHelical(nx=1001, ny=1000, kbt=2.26918531421)
    m_half = model.nsites // 2
    R, MCS, CALLS = 8, 100, 4
    curves = []
    for c in range(CALLS):
        up = jnp.ones((R, m_half), jnp.int8)
        wa, wb = hms.pack_flat(up, m_half), hms.pack_flat(up, m_half)
        _, _, obs = hms.multisweep(
            model, wa, wb, rng.sample_key(rng.base_key(7), c), MCS)
        curves.append(np.asarray(jax.device_get(obs["m"]), np.float64))
    m_t = np.concatenate(curves, axis=0).mean(0)
    t = np.arange(1, MCS + 1)
    sel = t >= 10
    slope = np.polyfit(np.log(t[sel]), np.log(m_t[sel]), 1)[0]
    assert 0.03 < -slope < 0.09, slope


def test_helical_runner_routes_multispin(monkeypatch):
    """make_helical_runner selects the packed flat engine for a
    servable Ising helical shape and completes end-to-end."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("helical runner routing is TPU-only")
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d_helical import (
        Ising2DHelical,
    )

    called = {}
    orig = hms.multisweep

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(hms, "multisweep", spy)
    model = Ising2DHelical(nx=NX, ny=NY, kbt=2.26918531421)
    runner = jax.jit(sw.make_helical_runner(model, mcs=4, batch=2))
    out = jax.device_get(runner(rng.base_key(6)))
    assert called.get("yes")
    assert out["m"].shape == (2, 4)
    assert np.all(np.isfinite(out["e"]))


def test_multisweep_physics_on_chip():
    """Hardware run: absorbing at T→0, fused (m, e) equal direct
    reductions on the unpacked final state at Tc."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("hardware PRNG path needs the chip")
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d_helical import (
        Ising2DHelical,
    )

    cold = Ising2DHelical(nx=NX, ny=NY, kbt=0.05)
    R = 2
    up = jnp.ones((R, M), jnp.int8)
    wa, wb = hms.pack_flat(up, M), hms.pack_flat(up, M)
    wa, wb, obs = hms.multisweep(cold, wa, wb, rng.base_key(3), 3)
    np.testing.assert_allclose(np.asarray(obs["m"]), 1.0, atol=0)
    np.testing.assert_allclose(np.asarray(obs["e"]), -2.0, atol=0)

    hot = Ising2DHelical(nx=NX, ny=NY, kbt=2.26918531421)
    st = _rand_flat(rng.base_key(4), (R, NX * NY))
    a, b = hms.split_flat(st)
    wa, wb = hms.pack_flat(a, M), hms.pack_flat(b, M)
    wa, wb, obs = hms.multisweep(hot, wa, wb, rng.base_key(5), 4)
    full = hms.merge_flat(hms.unpack_flat(wa, M), hms.unpack_flat(wb, M))
    n_inv = 1.0 / hot.nsites
    for r in range(R):
        m_want = float(jnp.sum(full[r].astype(jnp.int32))) * n_inv
        e_want = float(hot.energy_sum(full[r])) * n_inv
        np.testing.assert_allclose(float(obs["m"][r, -1]), m_want,
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(float(obs["e"][r, -1]), e_want,
                                   rtol=0, atol=1e-6)
