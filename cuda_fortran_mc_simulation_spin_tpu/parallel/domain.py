"""Multi-chip lattice domain decomposition (dp × y mesh).

Shards the lattice's row dimension across the ``y`` mesh axis with
`ppermute` halo exchange (parallel/halo.py), and an independent-replica
axis across ``dp`` — the two parallelism strategies that are meaningful
for this workload (SURVEY.md §2.4: the reference has no tensor/pipeline/
expert parallelism to promote; replicas are pure DP, the lattice-domain
axis is the spatial analog of sequence parallelism).

State layout: each color array carries a leading replica axis —
``(R, ny, nx//2)`` sharded ``P("dp", "y", None)``.  One call to the
returned step function advances every replica by one MCS and returns
per-replica observables (psum over the ``y`` axis), all inside a single
jitted shard_map program: the only cross-chip traffic per sweep is two
boundary rows per phase over ICI plus scalar reductions.

Scaling note: lattice extent beyond one chip's HBM was the reference's
hard wall (max committed 10000² on one GPU,
/root/reference/app/xy2d_periodic_gpu_relaxation.f90:9); here ny scales
linearly with the mesh's y extent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuda_fortran_mc_simulation_spin_tpu.core import rng
from cuda_fortran_mc_simulation_spin_tpu.models.base import CheckerboardState
from cuda_fortran_mc_simulation_spin_tpu.parallel.halo import (
    exchange_halo_rows,
)


def replicated_init(model, mesh: Mesh, replicas: int, kind: str,
                    key: jax.Array) -> CheckerboardState:
    """Build an (R, ny, half) state sharded over (dp, y)."""
    keys = jr.split(key, replicas)
    state = jax.vmap(lambda k: model.init_state(kind, k))(keys)
    spec = P("dp", "y", None)
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec)), state
    )


def make_sharded_step(model, mesh: Mesh):
    """Jitted (state, key) -> (state, {m: (R,), e: (R,)}) over the mesh."""
    ysh = mesh.shape["y"]
    ny, half = model.color_shape
    if ny % (2 * ysh) != 0:
        raise ValueError(
            f"ny={ny} must be divisible by 2*y_shards={2 * ysh} so local "
            "blocks start on even global rows (checkerboard parity)"
        )
    n_inv = 1.0 / model.nsites

    def local_step(a, b, key):
        # a, b: (R_loc, ny_loc, half) int8
        shard_key = jr.fold_in(
            jr.fold_in(key, lax.axis_index("dp")), lax.axis_index("y")
        )

        def phase(x, o, color, pkey):
            hu, hd = exchange_halo_rows(o, "y", ysh, row_axis=1)  # (R,1,half)
            u = rng.uniform(pkey, x.shape)
            upd = jax.vmap(
                lambda x1, o1, hu1, hd1, u1: model._phase(
                    x1, o1, color, u1, halos=(hu1, hd1)
                )
            )
            return upd(x, o, hu, hd, u)

        a = phase(a, b, 0, rng.phase_key(shard_key, 0))
        b = phase(b, a, 1, rng.phase_key(shard_key, 1))

        # per-replica observables, reduced over the y shards
        m_loc = jnp.sum(a, axis=(1, 2), dtype=jnp.int32) + jnp.sum(
            b, axis=(1, 2), dtype=jnp.int32
        )
        e_loc = _local_bond_energy(a, b, ysh)
        m = lax.psum(m_loc, "y").astype(jnp.float32) * n_inv
        e = lax.psum(e_loc, "y").astype(jnp.float32) * n_inv
        return a, b, m, e

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("dp", "y", None), P("dp", "y", None), P()),
        out_specs=(P("dp", "y", None), P("dp", "y", None), P("dp"), P("dp")),
        check_vma=False,
    )

    @jax.jit
    def step(state: CheckerboardState, key: jax.Array):
        a, b, m, e = sharded(state.a, state.b, key)
        return CheckerboardState(a, b), {"m": m, "e": e}

    return step


def _local_bond_energy(a, b, ysh):
    """-Σ s·(s_right + s_down) over the local block, per replica.

    Right bonds are row-local; down bonds of the last local row couple
    into the next shard's first row (halo).
    """
    ny_loc = a.shape[1]
    odd = (jnp.arange(ny_loc) & 1).astype(bool).reshape(1, ny_loc, 1)
    hu_b, hd_b = exchange_halo_rows(b, "y", ysh, row_axis=1)
    hu_a, hd_a = exchange_halo_rows(a, "y", ysh, row_axis=1)
    right_a = jnp.where(odd, jnp.roll(b, -1, axis=2), b)
    down_a = jnp.concatenate([b[:, 1:], hd_b], axis=1)
    right_b = jnp.where(odd, a, jnp.roll(a, -1, axis=2))
    down_b = jnp.concatenate([a[:, 1:], hd_a], axis=1)
    ai = a.astype(jnp.int32)
    bi = b.astype(jnp.int32)
    ea = jnp.sum(
        ai * (right_a + down_a).astype(jnp.int32), axis=(1, 2),
        dtype=jnp.int32,
    )
    eb = jnp.sum(
        bi * (right_b + down_b).astype(jnp.int32), axis=(1, 2),
        dtype=jnp.int32,
    )
    return -(ea + eb)
