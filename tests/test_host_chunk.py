"""Host-level dispatch chunking (engine/sweep.py _host_chunk_runner).

The device worker enforces a per-dispatch execution deadline, so
runners whose single dispatch is estimated to exceed the budget split
the MCS scan into host-level chunks.  Sweep keys are pure functions of
the global sweep/chunk index, so chunked trajectories must be BITWISE
identical to the monolithic scan — pinned on CPU for the packed clock
runners (interpret fallback) and a synthetic carry, and on hardware
for the Ising packed runners (TPU-gated; no interpret path).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.engine import protocols
from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D
from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D


def _series(runner, key):
    return jax.tree.map(np.asarray, jax.device_get(runner(key)))


def _force_chunking(monkeypatch, sweeps_per_dispatch, nsites, batch):
    # rate such that _sweeps_per_dispatch() == sweeps_per_dispatch
    rate = batch * nsites * sweeps_per_dispatch / sw._DISPATCH_BUDGET_S
    monkeypatch.setattr(sw, "_EST_PACKED_RATE", {
        "ising2d": rate, "ising3d": rate, "clock": rate,
    })


def test_host_chunk_runner_mechanics():
    """Synthetic engine: the host loop passes global t0, static sizes,
    threads the carry, and concatenates series on the sweep axis."""
    seen = []

    def init_fn(key):
        return jnp.int32(0)

    def chunk_fn(carry, key, t0, size):
        seen.append((int(t0), size))
        ts = t0 + jnp.arange(1, size + 1)
        return carry + size, {"t": jnp.broadcast_to(ts, (2, size))}

    run = sw._host_chunk_runner(init_fn, chunk_fn, mcs=10,
                                dispatch_chunk=4)
    assert run.host_chunked
    out = run(rng.base_key(0))
    assert seen == [(0, 4), (4, 4), (8, 2)]
    np.testing.assert_array_equal(
        np.asarray(out["t"]), np.broadcast_to(np.arange(1, 11), (2, 10)))


@pytest.mark.parametrize("q,nx,ny", [(6, 256, 256), (4, 256, 256),
                                     (6, 60, 72)])
@pytest.mark.slow
def test_clock_chunked_bitwise(monkeypatch, q, nx, ny):
    """Packed clock runner (q=6, q=4, padded), interpret path: chunked
    == monolithic, bitwise."""
    model = Clock2D(nx=nx, ny=ny, kbt=0.9, q=q, backend="jnp")
    key = rng.sample_key(rng.base_key(13), 0)
    mono = _series(sw.make_clock_multispin_runner(model, 9, 2), key)

    _force_chunking(monkeypatch, 4, model.nsites, 2)
    chunked_runner = sw.make_clock_multispin_runner(model, 9, 2)
    assert getattr(chunked_runner, "host_chunked", False)
    chunked = _series(chunked_runner, key)
    for k in mono:
        np.testing.assert_array_equal(mono[k], chunked[k])


def test_wrap_runner_host_chunked_not_jitted():
    """_wrap_runner leaves host-chunked runners un-jitted (a jit would
    fuse the host loop back into one program) and squeezes batch 1."""
    calls = []

    def runner(key):
        calls.append(1)
        return {"m": jnp.zeros((1, 3))}

    runner.host_chunked = True
    wrapped = protocols._wrap_runner(runner, 1)
    out = wrapped(rng.base_key(1))
    assert out["m"].shape == (3,)
    assert calls  # the raw python function ran (not traced-only)


# ---------------------------------------------------------------------------
# TPU-gated: the Ising packed runners have no interpret fallback
# ---------------------------------------------------------------------------

def _on_tpu() -> bool:
    return jax.default_backend() != "cpu" or bool(
        os.environ.get("SPINLAT_TEST_ON_TPU"))


@pytest.mark.parametrize("spd", [64, 130])
def test_ising2d_resident_chunked_bitwise_on_tpu(monkeypatch, spd):
    """Resident multisweep path: host chunks group whole 64-sweep
    kernel invocations; the remainder invocation stays global-indexed."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("packed Ising runners need the chip")
    model = Ising2D(nx=256, ny=256, kbt=2.3)
    key = rng.sample_key(rng.base_key(11), 0)
    mono = _series(jax.jit(sw.make_multispin_runner(model, 200, 2)),
                   key)

    _force_chunking(monkeypatch, spd, model.nsites, 2)
    chunked_runner = sw.make_multispin_runner(model, 200, 2)
    assert getattr(chunked_runner, "host_chunked", False)
    chunked = _series(chunked_runner, key)
    for k in mono:
        np.testing.assert_array_equal(mono[k], chunked[k])


def test_ising2d_stream_chunked_bitwise_on_tpu(monkeypatch):
    """Streaming phase-pair path (beyond the VMEM multisweep cap is
    where it routes in production; forced here via the vmem gate)."""
    if not _on_tpu() or jax.default_backend() == "cpu":
        pytest.skip("packed Ising runners need the chip")
    from cuda_fortran_mc_simulation_spin_tpu.ops import ising2d_multispin

    monkeypatch.setattr(ising2d_multispin, "multisweep_fits_vmem",
                        lambda ny, half: False)
    model = Ising2D(nx=256, ny=256, kbt=2.3)
    key = rng.sample_key(rng.base_key(12), 0)
    mono = _series(jax.jit(sw.make_multispin_runner(model, 20, 2)), key)

    _force_chunking(monkeypatch, 7, model.nsites, 2)
    chunked_runner = sw.make_multispin_runner(model, 20, 2)
    assert getattr(chunked_runner, "host_chunked", False)
    chunked = _series(chunked_runner, key)
    for k in mono:
        np.testing.assert_array_equal(mono[k], chunked[k])


# ---------------------------------------------------------------------------
# Helical runners (make_helical_runner tails): the kernel is faked with
# a pure-jnp stand-in so the RUNNER structure — global invocation-index
# keying, carry threading across host dispatches, padded-tail
# truncation — is pinned bitwise on CPU (the real kernels are
# TPU-only; their physics is pinned by the TPU-gated suites).
# ---------------------------------------------------------------------------

def _fake_masked_ms(model, state, key, sweeps):
    r = jax.random.fold_in(key, 7)
    bump = jax.random.bits(r, state.shape, dtype=jnp.uint8).astype(
        state.dtype)
    new = (state + bump) % model.q
    base = jax.random.uniform(r, (state.shape[0], sweeps))
    s = jnp.sum(state, axis=1).astype(jnp.float32)
    return new, {"m": base + s[:, None], "e": base * 2.0}


def test_helical_masked_runner_chunked_bitwise(monkeypatch):
    from cuda_fortran_mc_simulation_spin_tpu.models.clock_helical import (
        Clock2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.ops import helical_pallas as hp

    monkeypatch.setattr(hp, "clock_multisweep", _fake_masked_ms)
    # force the masked route (the packed clock branch would otherwise
    # claim this q=6 shape and run a real Pallas kernel on CPU)
    monkeypatch.setenv("SPINLAT_CLOCK_HELICAL_PACKED", "0")
    model = Clock2DHelical(nx=17, ny=16, kbt=0.9, q=6)
    key = rng.sample_key(rng.base_key(5), 0)

    mono = _series(
        sw.make_helical_runner(model, 10, 3, chunk=4), key)
    assert mono["m"].shape == (3, 10)

    rates = dict(sw._EST_PACKED_RATE)
    rates["clock_helical"] = 3 * model.nsites * 4 / sw._DISPATCH_BUDGET_S
    monkeypatch.setattr(sw, "_EST_PACKED_RATE", rates)
    chunked_runner = sw.make_helical_runner(model, 10, 3, chunk=4)
    assert getattr(chunked_runner, "host_chunked", False)
    chunked = _series(chunked_runner, key)
    for k in mono:
        np.testing.assert_array_equal(mono[k], chunked[k])


def _fake_packed_ms(model, wa, wb, key, sweeps):
    r = jax.random.fold_in(key, 3)
    wa2 = wa ^ jax.random.bits(r, wa.shape, dtype=jnp.uint32).astype(
        wa.dtype)
    batch = wa.shape[0]
    base = jax.random.uniform(r, (batch, sweeps))
    s = jnp.sum(wa.astype(jnp.float32),
                axis=tuple(range(1, wa.ndim)))
    return wa2, wb ^ jnp.ones_like(wb), {"m": base + s[:, None],
                                         "e": base}


def test_helical_packed_runner_chunked_bitwise(monkeypatch):
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d_helical import (
        Ising2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        helical_multispin as hms,
    )

    model = Ising2DHelical(nx=257, ny=256, kbt=2.27)
    if not hms.fits(model):
        pytest.skip("packed helical gate excludes this shape")
    monkeypatch.setattr(hms, "multisweep", _fake_packed_ms)
    monkeypatch.setenv("SPINLAT_HELICAL_PACKED", "1")
    key = rng.sample_key(rng.base_key(11), 0)

    mono = _series(sw.make_helical_runner(model, 10, 2, chunk=4), key)
    assert mono["m"].shape == (2, 10)

    rates = dict(sw._EST_PACKED_RATE)
    rates["ising2d_helical_packed"] = (
        2 * model.nsites * 4 / sw._DISPATCH_BUDGET_S)
    monkeypatch.setattr(sw, "_EST_PACKED_RATE", rates)
    chunked_runner = sw.make_helical_runner(model, 10, 2, chunk=4)
    assert getattr(chunked_runner, "host_chunked", False)
    chunked = _series(chunked_runner, key)
    for k in mono:
        np.testing.assert_array_equal(mono[k], chunked[k])


def _fake_clock_packed_ms(model, wa3, wb3, key, sweeps):
    r = jax.random.fold_in(key, 5)
    bump = jax.random.bits(r, wa3[0].shape, dtype=jnp.uint32).astype(
        wa3[0].dtype)
    wa3 = tuple(w ^ bump for w in wa3)
    batch = wa3[0].shape[0]
    base = jax.random.uniform(r, (batch, sweeps))
    s = jnp.sum(wa3[0].astype(jnp.float32),
                axis=tuple(range(1, wa3[0].ndim)))
    return wa3, wb3, {"m": base + s[:, None], "e": base,
                      "my": base * 0.5}


def test_clock_helical_packed_runner_chunked_bitwise(monkeypatch):
    """The packed clock helical branch threads its nested
    (3-tuple, 3-tuple) carry across host dispatches bitwise."""
    from cuda_fortran_mc_simulation_spin_tpu.models.clock_helical import (
        Clock2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        clock_helical_multispin as chm,
    )

    model = Clock2DHelical(nx=257, ny=256, kbt=0.9, q=6)
    assert chm.fits(model)
    monkeypatch.setattr(chm, "multisweep", _fake_clock_packed_ms)
    monkeypatch.setenv("SPINLAT_CLOCK_HELICAL_PACKED", "1")
    key = rng.sample_key(rng.base_key(13), 0)

    mono = _series(sw.make_helical_runner(model, 10, 2, chunk=4), key)
    assert mono["m"].shape == (2, 10)
    assert mono["my"].shape == (2, 10)

    rates = dict(sw._EST_PACKED_RATE)
    rates["clock_helical_packed"] = (
        2 * model.nsites * 4 / sw._DISPATCH_BUDGET_S)
    monkeypatch.setattr(sw, "_EST_PACKED_RATE", rates)
    chunked_runner = sw.make_helical_runner(model, 10, 2, chunk=4)
    assert getattr(chunked_runner, "host_chunked", False)
    chunked = _series(chunked_runner, key)
    for k in mono:
        np.testing.assert_array_equal(mono[k], chunked[k])


def test_generic_sample_runner_chunked_bitwise(monkeypatch):
    """make_sample_runner host-chunks when the estimated dispatch
    exceeds the budget (the xy2d periodic 10000^2 x 1e4-MCS monolithic
    scan crashed the device worker, r4d/r4e logs) — chunked ==
    monolithic bitwise, incl. an OR window crossing a chunk edge."""
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    model = XY2D(nx=16, ny=16, kbt=0.9, backend="jnp")
    key = rng.sample_key(rng.base_key(7), 0)
    mk = lambda: sw.make_sample_runner(  # noqa: E731
        model, 9, "random", n_over_relax=1, mcs_over_relax=5)
    mono_runner = mk()
    assert not getattr(mono_runner, "host_chunked", False)
    mono = _series(jax.jit(mono_runner), key)

    monkeypatch.setattr(
        sw, "_EST_GENERIC_RATE",
        4 * model.nsites / sw._DISPATCH_BUDGET_S)  # 4 sweeps/dispatch
    chunked_runner = mk()
    assert getattr(chunked_runner, "host_chunked", False)
    chunked = _series(chunked_runner, key)
    for k in mono:
        assert mono[k].shape == (9,)
        np.testing.assert_array_equal(mono[k], chunked[k])


def test_generic_batch_runner_chunked_bitwise(monkeypatch):
    """make_batch_runner: same chunked == monolithic bitwise pin."""
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    model = XY2D(nx=16, ny=16, kbt=0.9, backend="jnp")
    key = rng.sample_key(rng.base_key(8), 0)
    mk = lambda: sw.make_batch_runner(  # noqa: E731
        model, 9, 3, "random", n_over_relax=1, mcs_over_relax=5)
    mono_runner = mk()
    assert not getattr(mono_runner, "host_chunked", False)
    mono = _series(jax.jit(mono_runner), key)

    monkeypatch.setattr(
        sw, "_EST_GENERIC_RATE",
        3 * 4 * model.nsites / sw._DISPATCH_BUDGET_S)
    chunked_runner = mk()
    assert getattr(chunked_runner, "host_chunked", False)
    chunked = _series(chunked_runner, key)
    for k in mono:
        assert mono[k].shape == (3, 9)
        np.testing.assert_array_equal(mono[k], chunked[k])
