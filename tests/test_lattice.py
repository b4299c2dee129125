"""Checkerboard codec and stencil correctness vs brute-force numpy."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import lattice


def _random_full(ny, nx, seed=0, feat=()):
    rng = np.random.default_rng(seed)
    return rng.integers(-5, 6, size=(ny, nx, *feat)).astype(np.int32)


@pytest.mark.parametrize("ny,nx", [(4, 4), (6, 8), (10, 6)])
def test_split_merge_roundtrip(ny, nx):
    full = _random_full(ny, nx)
    a, b = lattice.split_checkerboard(jnp.asarray(full))
    back = np.asarray(lattice.merge_checkerboard(a, b))
    np.testing.assert_array_equal(back, full)


def test_split_color_assignment():
    ny, nx = 6, 8
    full = np.arange(ny * nx).reshape(ny, nx).astype(np.int32)
    a, b = map(np.asarray, lattice.split_checkerboard(jnp.asarray(full)))
    for y in range(ny):
        for i in range(nx // 2):
            assert a[y, i] == full[y, 2 * i + (y & 1)]
            assert b[y, i] == full[y, 2 * i + 1 - (y & 1)]


def _brute_neighbor_sums(full):
    return (
        np.roll(full, 1, axis=0)
        + np.roll(full, -1, axis=0)
        + np.roll(full, 1, axis=1)
        + np.roll(full, -1, axis=1)
    )


@pytest.mark.parametrize("ny,nx", [(4, 4), (6, 8), (8, 12)])
def test_neighbor_sums_match_bruteforce(ny, nx):
    full = _random_full(ny, nx, seed=1)
    a, b = lattice.split_checkerboard(jnp.asarray(full))
    ns_full = _brute_neighbor_sums(full)
    ns_a_expect, ns_b_expect = map(
        np.asarray, lattice.split_checkerboard(jnp.asarray(ns_full))
    )
    ns_a = np.asarray(lattice.neighbor_sums(b, 0))
    ns_b = np.asarray(lattice.neighbor_sums(a, 1))
    np.testing.assert_array_equal(ns_a, ns_a_expect)
    np.testing.assert_array_equal(ns_b, ns_b_expect)


def test_neighbor_sums_with_feature_axis():
    ny, nx = 6, 8
    full = _random_full(ny, nx, seed=2, feat=(2,)).astype(np.float32)
    a, b = lattice.split_checkerboard(jnp.asarray(full))
    ns_full = _brute_neighbor_sums(full)
    ns_a_expect, _ = map(
        np.asarray, lattice.split_checkerboard(jnp.asarray(ns_full))
    )
    ns_a = np.asarray(lattice.neighbor_sums(b, 0))
    np.testing.assert_allclose(ns_a, ns_a_expect, rtol=1e-6)


@pytest.mark.parametrize("ny,nx", [(4, 4), (6, 8)])
def test_right_down_neighbors(ny, nx):
    full = _random_full(ny, nx, seed=3)
    a, b = lattice.split_checkerboard(jnp.asarray(full))
    right_full = np.roll(full, -1, axis=1)
    down_full = np.roll(full, -1, axis=0)
    r_a_e, r_b_e = map(
        np.asarray, lattice.split_checkerboard(jnp.asarray(right_full))
    )
    d_a_e, d_b_e = map(
        np.asarray, lattice.split_checkerboard(jnp.asarray(down_full))
    )
    ra, da, rb, db = map(np.asarray, lattice.right_down_neighbors(a, b))
    np.testing.assert_array_equal(ra, r_a_e)
    np.testing.assert_array_equal(da, d_a_e)
    np.testing.assert_array_equal(rb, r_b_e)
    np.testing.assert_array_equal(db, d_b_e)


def test_helical_neighbor_sums():
    nx, ny = 5, 4
    nall = nx * ny
    rng = np.random.default_rng(4)
    flat = rng.integers(-3, 4, size=nall).astype(np.int32)
    got = np.asarray(lattice.helical_neighbor_sums(jnp.asarray(flat), nx))
    expect = np.empty_like(flat)
    for i in range(nall):
        expect[i] = (
            flat[(i + 1) % nall]
            + flat[(i - 1) % nall]
            + flat[(i + nx) % nall]
            + flat[(i - nx) % nall]
        )
    np.testing.assert_array_equal(got, expect)


def test_lattice_spec_validation():
    with pytest.raises(ValueError):
        lattice.LatticeSpec(7, 8)
    with pytest.raises(ValueError):
        lattice.LatticeSpec(8, 7)
    lattice.LatticeSpec(8, 8)
