"""utils + halo unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cuda_fortran_mc_simulation_spin_tpu.parallel.halo import (
    exchange_halo_rows,
)
from cuda_fortran_mc_simulation_spin_tpu.utils import timing


def test_throughput_report():
    t = timing.Throughput(seconds=0.5, sweeps=100, sites=1000, replicas=4)
    assert t.sweeps_per_sec == 800.0
    assert t.flips_per_sec == 800_000.0
    assert "800" in t.report()


def test_measure_returns_best_of():
    calls = []

    def fn(x):
        calls.append(1)
        return x + 1

    out = timing.measure(fn, jnp.ones((4,)), sweeps=2, sites=4,
                         warmup=1, reps=3)
    assert len(calls) == 4  # warmup + reps
    assert out.seconds > 0


def test_profile_noop():
    with timing.profile(None):
        pass  # must not raise


def test_exchange_halo_rows_single_shard():
    """axis_size=1: halos are the block's own wrap rows (no ppermute)."""
    x = jnp.arange(24, dtype=jnp.float32).reshape(6, 4)
    up, dn = exchange_halo_rows(x, "y", 1)
    np.testing.assert_array_equal(np.asarray(up), np.asarray(x[-1:]))
    np.testing.assert_array_equal(np.asarray(dn), np.asarray(x[:1]))
    # row_axis=1 with a leading replica dim
    xb = x[None]
    up, dn = exchange_halo_rows(xb, "y", 1, row_axis=1)
    assert up.shape == (1, 1, 4)
    np.testing.assert_array_equal(np.asarray(up[0]), np.asarray(x[-1:]))


def test_exchange_halo_rows_on_mesh():
    if len(jax.devices()) < 4:
        import pytest
        pytest.skip("needs 4 devices")
    from jax.sharding import PartitionSpec as P
    from cuda_fortran_mc_simulation_spin_tpu.parallel import mesh as mm

    msh = mm.make_mesh(1, 4)
    global_rows = jnp.arange(8, dtype=jnp.float32).reshape(8, 1) * jnp.ones(
        (8, 4)
    )

    def local(x):
        up, dn = exchange_halo_rows(x, "y", 4, row_axis=1)
        return up, dn

    ups, dns = jax.jit(jax.shard_map(
        local, mesh=msh,
        in_specs=P(None, "y", None),
        out_specs=P(None, "y", None),
        check_vma=False,
    ))(global_rows[None])
    ups = np.asarray(ups[0])   # (4, 4): each shard's up-halo row
    dns = np.asarray(dns[0])
    # shard k owns rows [2k, 2k+1]; up halo = row (2k-1) mod 8,
    # dn halo = row (2k+2) mod 8
    np.testing.assert_array_equal(ups[:, 0], [7, 1, 3, 5])
    np.testing.assert_array_equal(dns[:, 0], [2, 4, 6, 0])
