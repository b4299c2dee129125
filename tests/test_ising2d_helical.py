"""Helical-BC Ising engine: reference-layout parity checks."""

import itertools

import jax
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.models.ising2d_helical import (
    Ising2DHelical,
)


def test_requires_odd_nx():
    with pytest.raises(ValueError):
        Ising2DHelical(nx=8, ny=8, kbt=2.5)
    Ising2DHelical(nx=9, ny=8, kbt=2.5)


def test_energy_matches_bruteforce():
    m = Ising2DHelical(nx=5, ny=4, kbt=2.5)
    flat = np.asarray(m.init_state("random", rng.base_key(1)), np.int64)
    n = m.nsites
    e = -sum(
        int(flat[i]) * (int(flat[(i + 1) % n]) + int(flat[(i + 5) % n]))
        for i in range(n)
    )
    assert int(m.energy_sum(m.init_state("random", rng.base_key(1)))) == e


def test_phase_updates_only_one_parity():
    m = Ising2DHelical(nx=5, ny=4, kbt=1e8)  # T=inf: all proposals accept
    flat = m.init_state("allup")
    u = np.zeros(m.nsites, np.float32)
    import jax.numpy as jnp
    out = np.asarray(m._phase(flat, 0, jnp.asarray(u)))
    # only even indices flipped
    assert np.all(out[0::2] == -1)
    assert np.all(out[1::2] == 1)


@pytest.mark.slow
def test_equilibrium_vs_exact_enumeration():
    nx, ny, kbt = 3, 4, 2.6
    n = nx * ny
    es = []
    for bits in itertools.product([-1, 1], repeat=n):
        s = np.array(bits)
        e = -sum(
            int(s[i]) * (int(s[(i + 1) % n]) + int(s[(i + nx) % n]))
            for i in range(n)
        )
        es.append(e)
    es = np.array(es, np.float64)
    w = np.exp(-(es - es.min()) / kbt)
    e_exact = float((es * w).sum() / w.sum() / n)

    m = Ising2DHelical(nx=nx, ny=ny, kbt=kbt)
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(key):
        def body(flat, t):
            flat = m.sweep(flat, rng.sweep_key(key, t))
            return flat, m.observables(flat)["e"]

        _, series = lax.scan(
            body, m.init_state("random", key), jnp.arange(1, 50_001)
        )
        return series

    series = np.asarray(jax.device_get(run(rng.base_key(3))), np.float64)
    assert series[5000:].mean() == pytest.approx(e_exact, abs=0.03)
