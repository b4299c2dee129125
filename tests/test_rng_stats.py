"""Counter-based RNG streams and statistics utilities."""

import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.core import rng, stats

# fast/slow tier: whole file is chi-square RNG batteries (minutes-class)
pytestmark = pytest.mark.slow


def test_stream_separation():
    """Keys for distinct (seed, stream, sample, sweep, phase) coordinates
    must differ — the declarative replacement of skip_curand offsets."""
    import jax

    seen = set()
    for seed in (42, 43):
        for stream in (0, 1):
            base = rng.base_key(seed, stream)
            for sample in (0, 1, 7):
                for t in (1, 2):
                    for phase in (0, 1):
                        k = rng.phase_key(
                            rng.sweep_key(rng.sample_key(base, sample), t),
                            phase,
                        )
                        seen.add(tuple(np.asarray(jax.random.key_data(k))))
    assert len(seen) == 2 * 2 * 3 * 2 * 2


def test_init_prepare_keys_never_alias_sweep_keys():
    """Regression: init used to be fold_in(sample_key, 1000), colliding
    bitwise with the t=1000 sweep key — at t=1000 the Metropolis uniforms
    replayed the initial-state draws (every reference workload has
    mcs >= 1000).  Purpose-domain keys must be disjoint from every sweep
    index."""
    import jax

    def data(k):
        return tuple(np.asarray(jax.random.key_data(k)))

    sk = rng.sample_key(rng.base_key(42), 3)
    forbidden = {data(rng.init_key(sk)), data(rng.prepare_key(sk))}
    assert len(forbidden) == 2
    sweep_keys = {data(rng.sweep_key(sk, t)) for t in range(0, 4097)}
    assert len(sweep_keys) == 4097
    assert not (forbidden & sweep_keys)


def test_uniform_range_and_determinism():
    k = rng.base_key(1)
    u1 = np.asarray(rng.uniform(k, (1000,)))
    u2 = np.asarray(rng.uniform(k, (1000,)))
    np.testing.assert_array_equal(u1, u2)
    assert u1.min() >= 0.0 and u1.max() < 1.0
    assert 0.4 < u1.mean() < 0.6


def test_bits_to_uniform():
    import jax.numpy as jnp

    bits = jnp.asarray([0, 2**31, 2**32 - 1], dtype=jnp.uint32)
    u = np.asarray(rng.bits_to_uniform(bits))
    assert u[0] == 0.0
    assert abs(u[1] - 0.5) < 1e-6
    assert u[2] < 1.0


def test_derive_seed_scalar_distinct():
    vals = {
        int(rng.derive_seed_scalar(42, s, t, p))
        for s in range(4) for t in range(4) for p in range(2)
    }
    assert len(vals) == 32


def test_kahan_precision():
    """Compensated moment sums track numpy's pairwise summation over a
    long stream of offset values.  (The accumulators hold observable
    *densities*, O(1) magnitudes, where moment-based variance is sound;
    this exercises 10^4 sequential folds.)"""
    acc = stats.VarianceKahan(())
    vals = 100.0 + np.sin(np.arange(10_000))
    for v in vals:
        acc.add_data(np.float64(v))
    np.testing.assert_allclose(acc.mean(), vals.mean(), rtol=1e-14)
    np.testing.assert_allclose(acc.var(), vals.var(ddof=1), rtol=1e-9)
    np.testing.assert_allclose(
        acc.square_mean(), (vals ** 2).mean(), rtol=1e-14
    )


def test_varcov_batch_fold_equals_loop():
    a = stats.VarianceCovarianceKahan((5,))
    b = stats.VarianceCovarianceKahan((5,))
    rng_np = np.random.default_rng(0)
    v1 = rng_np.normal(size=(8, 5))
    v2 = rng_np.normal(size=(8, 5))
    a.add_data(v1, v2)                       # batch fold
    for r1, r2 in zip(v1, v2):               # scalar-series folds
        b.add_data(r1, r2)
    np.testing.assert_allclose(a.mean1(), b.mean1())
    np.testing.assert_allclose(a.cov(), b.cov())
    assert a.num_sample() == b.num_sample() == 8
