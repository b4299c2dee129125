"""Helical-BC clock engine checks (reference's 501×500 geometry class)."""

import io

import jax
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
from cuda_fortran_mc_simulation_spin_tpu.core import rng, tables
from cuda_fortran_mc_simulation_spin_tpu.engine import protocols
from cuda_fortran_mc_simulation_spin_tpu.models.clock_helical import (
    Clock2DHelical,
)


def test_requires_odd_nx():
    with pytest.raises(ValueError):
        Clock2DHelical(nx=8, ny=8, kbt=0.9, q=6)


def test_allup_observables():
    m = Clock2DHelical(nx=5, ny=4, kbt=0.9, q=6)
    obs = {k: float(v) for k, v in m.observables(
        m.init_state("allup")).items()}
    assert obs["m"] == pytest.approx(1.0)
    assert obs["e"] == pytest.approx(-2.0)


def test_energy_matches_bruteforce():
    m = Clock2DHelical(nx=5, ny=4, kbt=0.9, q=6)
    flat = np.asarray(m.init_state("random", rng.base_key(1)), np.int64)
    n = m.nsites
    tab = tables.clock_unit_vectors(6)
    c, s = tab[flat, 0], tab[flat, 1]
    e = -sum(
        c[i] * (c[(i + 1) % n] + c[(i + 5) % n])
        + s[i] * (s[(i + 1) % n] + s[(i + 5) % n])
        for i in range(n)
    )
    got = float(m.energy_sum(m.init_state("random", rng.base_key(1))))
    assert got == pytest.approx(e, rel=1e-5)


def test_sweep_domain_and_parity():
    m = Clock2DHelical(nx=5, ny=4, kbt=1e8, q=6)
    flat = m.init_state("random", rng.base_key(2))
    before = np.asarray(flat)
    out = np.asarray(jax.jit(m.sweep)(flat, rng.base_key(3)))
    assert out.min() >= 0 and out.max() < 6
    # at T=inf everything accepts and the candidate never equals current
    assert np.all(out != before)


def test_relaxation_protocol_routes_odd_clock():
    cfg = RunConfig(model="clock", nx=5, ny=4, q=6, kbt=0.91, mcs=3,
                    tot_sample=2, use_pallas=False)
    out = io.StringIO()
    protocols.run_relaxation(cfg, out, io.StringIO())
    rows = [l for l in out.getvalue().splitlines()
            if not l.startswith("#")]
    assert len(rows) == 3 and len(rows[0].split()) == 10
