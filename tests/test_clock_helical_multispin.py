"""Bit-sliced packed q=6 clock engine on the helical layout
(ops/clock_helical_multispin.py).

Validation ladder (mirrors test_clock_multispin + test_helical_multispin):
1. pack/unpack roundtrip (CRT split on the flat color vectors);
2. packed jnp phase vs a per-site integer oracle on the flat color
   vectors (exact 2·cos bond table) given consistent injected planes —
   bitwise, both colors;
3. Pallas phase kernel (interpret on CPU / Mosaic on TPU) vs the jnp
   packed oracle — bitwise on valid sites;
4. fused-obs bit formulas (m, my, e) vs direct model reductions on the
   merged unpacked state — exact;
5. on chip: absorbing state, fused obs vs the jnp obs reference,
   equilibrium energy vs the masked int8 engine, runner routing.
"""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.models.clock_helical import (
    Clock2DHelical,
)
from cuda_fortran_mc_simulation_spin_tpu.ops import (
    clock_helical_multispin as chm,
)

NX, NY = 129, 64          # nall = 8256, M = 4128
M = NX * NY // 2


def _needs_chip() -> bool:
    # the Mosaic kernels have no interpret fallback in these tests
    return jax.default_backend() == "cpu"


def _rand_states(key, shape):
    return jax.random.randint(key, shape, 0, 6, dtype=jnp.int32).astype(
        jnp.int8)


def _consistent_planes(key, m):
    """(ρ, rt1, rt2, B₁..B₈b) packed planes derived from per-site
    r ∈ [1,5] and 5 chain bits, plus the flat-domain values."""
    kr, kc = jax.random.split(key)
    r = jax.random.randint(kr, (m,), 1, 6, dtype=jnp.int32)
    chains = jax.random.bernoulli(kc, 0.4, (5, m))
    planes = (
        chm._pack_bits_flat(r & 1, m),
        chm._pack_bits_flat((r % 3 == 1).astype(jnp.int32), m),
        chm._pack_bits_flat((r % 3 == 2).astype(jnp.int32), m),
        *[chm._pack_bits_flat(chains[k].astype(jnp.int32), m)
          for k in range(5)],
    )
    return planes, r, [chains[k] for k in range(5)]


def test_pack_unpack_roundtrip():
    f = _rand_states(rng.base_key(0), (3, M))
    planes = chm.pack_clock_flat(f, M)
    assert planes[0].shape[-2:] == (chm.grid_rows(M), 128)
    np.testing.assert_array_equal(
        np.asarray(chm.unpack_clock_flat(*planes, M)), np.asarray(f))


@pytest.mark.parametrize("color", [0, 1])
def test_packed_phase_matches_flat_oracle(color):
    """jnp packed phase == the per-site integer helical decision."""
    ka, kb, kp = jax.random.split(rng.base_key(1), 3)
    a = _rand_states(ka, (M,))
    b = _rand_states(kb, (M,))
    offs_a, offs_b = chm.helical_offsets(NX)
    x, o, offs = ((a, b, offs_a) if color == 0 else (b, a, offs_b))
    planes8, r, chains = _consistent_planes(kp, M)

    want = chm.flat_phase6_reference(x, o, offs, r, chains)
    got3 = chm.packed_helical_phase6_reference(
        chm.pack_clock_flat(x, M), chm.pack_clock_flat(o, M),
        offs, planes8, M)
    got = chm.unpack_clock_flat(*got3, M)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("color", [0, 1])
def test_phase_kernel_matches_reference(color):
    """Pallas phase with injected planes (interpret on CPU, Mosaic on
    TPU) is bitwise the jnp packed oracle on valid sites."""
    ka, kb, kp = jax.random.split(rng.base_key(2), 3)
    R = 2
    rows = chm.grid_rows(M)
    x3 = chm.pack_clock_flat(_rand_states(ka, (R, M)), M)
    o3 = chm.pack_clock_flat(_rand_states(kb, (R, M)), M)
    keys = jax.random.split(kp, 8)
    planes8 = tuple(
        jax.random.bits(k, (R, rows, 128), dtype=jnp.uint32
                        ).astype(jnp.int32)
        for k in keys
    )
    offs = chm.helical_offsets(NX)[color]
    interpret = jax.default_backend() == "cpu"
    got3 = chm.phase_packed_with_bits(x3, o3, planes8, offs=offs, m=M,
                                      interpret=interpret)
    want3 = jax.vmap(
        lambda xs, xt0, xt1, os_, ot0, ot1, *p8:
        chm.packed_helical_phase6_reference(
            (xs, xt0, xt1), (os_, ot0, ot1), offs, p8, M)
    )(*x3, *o3, *planes8)
    np.testing.assert_array_equal(
        np.asarray(jax.vmap(lambda s, t0, t1: chm.unpack_clock_flat(
            s, t0, t1, M))(*got3)),
        np.asarray(jax.vmap(lambda s, t0, t1: chm.unpack_clock_flat(
            s, t0, t1, M))(*want3)),
    )


def test_obs_reference_matches_model_reductions():
    """(2m, 2e, my2) bit formulas == direct trig reductions on the
    merged state — exact (all quantities are integer multiples of
    1/2 resp. √3/2)."""
    model = Clock2DHelical(nx=NX, ny=NY, kbt=0.9, q=6)
    f = _rand_states(rng.base_key(3), (model.nsites,))
    a, b = chm.split_flat(f)
    wa3 = chm.pack_clock_flat(a, M)
    wb3 = chm.pack_clock_flat(b, M)
    m2, e2, my2 = chm.obs_packed6_reference(wa3, wb3, NX, M)
    mx_want, my_want = model.magne_sums(f)
    e_want = model.energy_sum(f)
    np.testing.assert_allclose(float(m2) * 0.5, float(mx_want),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(float(my2) * chm._SQRT3_2,
                               float(my_want), rtol=0, atol=1e-3)
    np.testing.assert_allclose(float(e2) * 0.5, float(e_want),
                               rtol=0, atol=1e-3)


def test_fits_gate():
    assert chm.fits(Clock2DHelical(nx=501, ny=500, kbt=0.8, q=6))
    assert not chm.fits(Clock2DHelical(nx=501, ny=500, kbt=0.8, q=5))
    assert not chm.fits(Clock2DHelical(nx=501, ny=501, kbt=0.8, q=6))


# ---------------------------------------------------------------------------
# chip-only: the multisweep kernel (hardware PRNG)
# ---------------------------------------------------------------------------

def test_multisweep_absorbing_and_fused_obs_on_chip():
    if _needs_chip():
        pytest.skip("hardware PRNG path needs the chip")
    cold = Clock2DHelical(nx=NX, ny=NY, kbt=0.02, q=6)
    R = 2
    zeros = jnp.zeros((R, M), jnp.int8)
    wa3 = chm.pack_clock_flat(zeros, M)
    wb3 = chm.pack_clock_flat(zeros, M)
    wa3, wb3, obs = chm.multisweep(cold, wa3, wb3, rng.base_key(4), 3)
    np.testing.assert_allclose(np.asarray(obs["m"]), 1.0, atol=0)
    np.testing.assert_allclose(np.asarray(obs["my"]), 0.0, atol=0)
    np.testing.assert_allclose(np.asarray(obs["e"]), -2.0, atol=0)

    hot = Clock2DHelical(nx=NX, ny=NY, kbt=0.9, q=6)
    st = _rand_states(rng.base_key(5), (R, hot.nsites))
    a, b = chm.split_flat(st)
    wa3 = chm.pack_clock_flat(a, M)
    wb3 = chm.pack_clock_flat(b, M)
    wa3, wb3, obs = chm.multisweep(hot, wa3, wb3, rng.base_key(6), 4)
    m2, e2, my2 = jax.vmap(
        lambda *p: chm.obs_packed6_reference(p[:3], p[3:], NX, M)
    )(*wa3, *wb3)
    n_inv = 1.0 / hot.nsites
    np.testing.assert_allclose(
        np.asarray(obs["m"][:, -1]),
        np.asarray(m2, np.float64) * 0.5 * n_inv, rtol=0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(obs["e"][:, -1]),
        np.asarray(e2, np.float64) * 0.5 * n_inv, rtol=0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(obs["my"][:, -1]),
        np.asarray(my2, np.float64) * chm._SQRT3_2 * n_inv,
        rtol=0, atol=1e-6)


def test_equilibrium_energy_vs_masked_engine_on_chip():
    """Late-time ⟨e⟩ agrees between the packed and the masked int8
    helical engines at the committed temperature."""
    if _needs_chip():
        pytest.skip("hardware PRNG path needs the chip")
    model = Clock2DHelical(nx=NX, ny=NY, kbt=0.9, q=6)
    R, WARM, MEAS = 16, 300, 200
    zeros = jnp.zeros((R, M), jnp.int8)
    wa3 = chm.pack_clock_flat(zeros, M)
    wb3 = chm.pack_clock_flat(zeros, M)
    wa3, wb3, obs = chm.multisweep(
        model, wa3, wb3, rng.base_key(7), WARM + MEAS)
    e_packed = float(np.asarray(obs["e"][:, WARM:], np.float64).mean())

    from cuda_fortran_mc_simulation_spin_tpu.ops import helical_pallas

    flat = jnp.zeros((R, model.nsites), jnp.int8)
    _, obs8 = helical_pallas.clock_multisweep(
        model, flat, rng.base_key(8), WARM + MEAS)
    e_int8 = float(np.asarray(obs8["e"][:, WARM:], np.float64).mean())
    assert abs(e_packed - e_int8) < 0.01, (e_packed, e_int8)


def test_helical_runner_routes_packed_clock(monkeypatch):
    if _needs_chip():
        pytest.skip("helical runner routing is TPU-only")
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw

    called = {}
    orig = chm.multisweep

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(chm, "multisweep", spy)
    model = Clock2DHelical(nx=NX, ny=NY, kbt=0.9, q=6)
    assert sw.helical_pallas_eligible(model)
    runner = sw.make_helical_runner(model, mcs=4, batch=2)
    out = jax.device_get(runner(rng.base_key(9)))
    assert called.get("yes")
    assert out["m"].shape == (2, 4)
    assert out["my"].shape == (2, 4)
    assert np.all(np.isfinite(out["e"]))
