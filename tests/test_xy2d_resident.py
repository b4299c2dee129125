"""VMEM-resident periodic XY multisweep (ops/xy2d_resident.py):
padded-plane stencil/oracle equivalence vs the canonical XY2D phase,
Pallas interpret/Mosaic bitwise checks, and chip-gated physics +
protocol routing for the reference's literal 1500² from-disorder
geometry (/root/reference/app/
xy2d_periodic_gpu_relaxation_from_disorder.f90:9-15)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
from cuda_fortran_mc_simulation_spin_tpu.ops import (
    xy2d_resident as xr,
)


def _on_tpu() -> bool:
    return jax.default_backend() != "cpu" or bool(
        os.environ.get("SPINLAT_TEST_ON_TPU"))


def _rand_state(model, key):
    return model.init_state("random", key)


# 20 lanes valid inside a 128-wide plane — exercises the pad/seam path
# the literal 750-lane geometry needs; ny=12 is even but not mult of 8
NX, NY = 40, 12


@pytest.mark.parametrize("color", [0, 1])
@pytest.mark.parametrize("dims", [(NX, NY), (16, 8)])
def test_phase_reference_matches_model_phase(dims, color):
    """Padded-plane oracle == XY2D._phase bitwise on the valid lanes
    given shared uniforms."""
    nx, ny = dims
    half = nx // 2
    model = XY2D(nx=nx, ny=ny, kbt=0.89, backend="jnp")
    st = _rand_state(model, rng.base_key(0))
    kc, ka = jax.random.split(rng.base_key(1))
    u_cand = rng.uniform(kc, (ny, half))
    u_acc = rng.uniform(ka, (ny, half))

    sx, sy, ox, oy = ((st.ax, st.ay, st.bx, st.by) if color == 0
                      else (st.bx, st.by, st.ax, st.ay))
    want_x, want_y = model._phase(sx, sy, ox, oy, color, u_cand, u_acc)

    w = xr.plane_width(half)
    pad = lambda p: jnp.pad(p, ((0, 0), (0, w - half)))  # noqa: E731
    got_x, got_y = xr.phase_reference(
        pad(sx), pad(sy), pad(ox), pad(oy), color, pad(u_cand),
        pad(u_acc), model.beta, half)
    np.testing.assert_array_equal(np.asarray(got_x[:, :half]),
                                  np.asarray(want_x))
    np.testing.assert_array_equal(np.asarray(got_y[:, :half]),
                                  np.asarray(want_y))
    # pad lanes unchanged (they never accept)
    np.testing.assert_array_equal(np.asarray(got_x[:, half:]),
                                  np.asarray(pad(sx)[:, half:]))


@pytest.mark.parametrize("color", [0, 1])
def test_phase_kernel_matches_reference(color):
    """Pallas phase with injected uniforms (interpret on CPU, Mosaic on
    TPU) == the jnp padded oracle: bitwise with a stubbed (FMA-free)
    trig, and to 1 ulp with no decision flips with the real polynomial
    (the test_xy2d_helical_dense methodology — only the candidate
    trig's FMA contraction may differ between paths)."""
    from cuda_fortran_mc_simulation_spin_tpu.ops import trig

    half = NX // 2
    w = xr.plane_width(half)
    model = XY2D(nx=NX, ny=NY, kbt=0.89, backend="jnp")
    R = 2
    keys = jax.random.split(rng.base_key(2), 4)
    sts = [_rand_state(model, k) for k in keys[:R]]
    planes = [jnp.stack([getattr(s, n) for s in sts])
              for n in ("ax", "ay", "bx", "by")]
    planes = xr.pad_planes(planes, half)
    u_cand = rng.uniform(keys[2], (R, NY, w))
    u_acc = rng.uniform(keys[3], (R, NY, w))
    ax, ay, bx, by = planes
    sx, sy, ox, oy = ((ax, ay, bx, by) if color == 0
                      else (bx, by, ax, ay))

    def run_both():
        # inputs 0/1 are donated (aliased to the outputs) — fresh
        # copies per call
        got = xr.phase_with_bits(
            sx + 0, sy + 0, ox, oy, u_cand, u_acc, color=color,
            beta=model.beta, nc=half,
            interpret=jax.default_backend() == "cpu")
        want = jax.vmap(
            lambda a, b, c, d, e, f: xr.phase_reference(
                a, b, c, d, color, e, f, model.beta, half)
        )(sx, sy, ox, oy, u_cand, u_acc)
        return got, want

    orig = trig.cos_sin_2pi
    trig.cos_sin_2pi = lambda u: (1.0 - u, u)
    try:
        got, want = run_both()
        for g, wv in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g),
                                          np.asarray(wv))
    finally:
        trig.cos_sin_2pi = orig

    got, want = run_both()
    for g, wv in zip(got, want):
        ga, wa_ = np.asarray(g), np.asarray(wv)
        np.testing.assert_allclose(ga, wa_, rtol=0, atol=2e-7)
        # decision flips (value-scale diffs) must be absent
        assert (np.abs(ga - wa_) > 1e-5).sum() == 0


def test_observables_match_model():
    """Padded-plane {mx, my, e} == XY2D.observables; autocorr == the
    model's autocorrelation_sum."""
    model = XY2D(nx=NX, ny=NY, kbt=0.89, backend="jnp")
    st = _rand_state(model, rng.base_key(3))
    st2 = _rand_state(model, rng.base_key(4))
    half = NX // 2
    planes = xr.pad_planes(tuple(st), half)
    planes_b = tuple(p[None] for p in planes)
    obs = xr.observables(model, planes_b)
    want = model.observables(st)
    np.testing.assert_allclose(float(obs["mx"][0]), float(want["m"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(obs["my"][0]), float(want["my"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(obs["e"][0]), float(want["e"]),
                               rtol=1e-6, atol=1e-6)

    snaps_b = tuple(p[None] for p in xr.pad_planes(tuple(st2), half))
    a = xr.autocorr(model, planes_b, snaps_b)
    want_a = model.autocorrelation_sum(st, st2) / model.nsites
    np.testing.assert_allclose(float(a[0]), float(want_a), rtol=1e-5,
                               atol=1e-6)


def test_fits_gates():
    assert xr.fits(XY2D(nx=1500, ny=1500, kbt=0.89))          # literal
    assert xr.fits(XY2D(nx=2000, ny=2000, kbt=0.89),
                   snapshot=False)
    assert not xy_fits_10000()


def xy_fits_10000():
    return xr.fits(XY2D(nx=10000, ny=10000, kbt=0.89))


# -- chip-gated ---------------------------------------------------------------

def test_multisweep_obs_exact_on_chip():
    """Hardware: per-sweep fused (mx, my, e, A) at the final sweep ==
    direct recomputation from the returned planes."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("hardware PRNG path needs the chip")
    model = XY2D(nx=NX, ny=NY, kbt=0.89, backend="jnp")
    half = NX // 2
    R = 2
    sts = [_rand_state(model, k)
           for k in jax.random.split(rng.base_key(5), R)]
    planes = tuple(
        jnp.stack([getattr(s, n) for s in sts])
        for n in ("ax", "ay", "bx", "by"))
    planes = xr.pad_planes(planes, half)
    snaps = planes
    out, obs = xr.multisweep(model, planes, snaps, rng.base_key(6), 5)
    want = xr.observables(model, out)
    np.testing.assert_allclose(np.asarray(obs["mx"][:, -1]),
                               np.asarray(want["mx"]), rtol=0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(obs["my"][:, -1]),
                               np.asarray(want["my"]), rtol=0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(obs["e"][:, -1]),
                               np.asarray(want["e"]), rtol=0,
                               atol=1e-4)
    want_a = xr.autocorr(model, out, snaps)
    np.testing.assert_allclose(np.asarray(obs["A"][:, -1]),
                               np.asarray(want_a), rtol=0, atol=1e-5)
    # spins stay unit-norm
    ax, ay, _, _ = out
    norm = np.asarray(ax[:, :, :half]) ** 2 + np.asarray(
        ay[:, :, :half]) ** 2
    np.testing.assert_allclose(norm, 1.0, atol=1e-5)


def test_from_disorder_resident_routing_on_chip(monkeypatch):
    """The from-disorder protocol routes to the resident engine on
    chip and its ensemble means agree with the jnp phase engine within
    combined error bars (independent RNG streams)."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("resident routing is TPU-only")
    import io

    from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
    from cuda_fortran_mc_simulation_spin_tpu.engine import protocols

    cfg = RunConfig(model="xy2d", nx=24, ny=24, kbt=0.89, mcs=12,
                    tot_sample=16, init_state="random", seed=3,
                    replicas=4)
    err = io.StringIO()
    out = io.StringIO()
    accs = protocols.run_from_disorder(cfg, out, err)
    assert "xy2d_resident" in err.getvalue()
    m1 = accs["op_abs"].mean1()
    v1 = accs["op_abs"].var1()

    monkeypatch.setenv("SPINLAT_XY_RESIDENT", "0")
    err2, out2 = io.StringIO(), io.StringIO()
    accs2 = protocols.run_from_disorder(cfg, out2, err2)
    assert "xy2d_resident" not in err2.getvalue()
    m2 = accs2["op_abs"].mean1()
    v2 = accs2["op_abs"].var1()
    sig = np.sqrt((v1 + v2) / cfg.tot_sample) + 1e-9
    assert np.all(np.abs(m1 - m2) < 6 * sig + 0.05)
