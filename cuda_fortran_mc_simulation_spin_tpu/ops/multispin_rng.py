"""Unified hardware-PRNG keying for every bit-packed engine.

One scheme, shared by the packed Ising2D and clock-family kernels in
all their execution modes (single-chip streaming phases, VMEM-resident
multisweeps, and the (dp, y[, x])-sharded halo kernels):

  random planes for word rows [8g, 8g+8) of phase (sample, t, phase)
  = the hardware-PRNG stream seeded by
      (s0, s1 ^ (wrow_g*K_row + rep_g*K_rep))
  where (s0, s1) = seeds_from_key(sweep_key(sample_key, t), phase)
  (ops/ising2d_pallas.seeds_from_key) and (rep_g, wrow_g) are the
  GLOBAL replica and word-row indices of the 8-word-row granule.

Each granule generates the full GLOBAL lane width ``w_total`` and
slices the local window [col0, col0+w): y-shards consume exactly their
own granules (no redundancy); x-shards redundantly generate whole rows
so the stream never depends on the x decomposition.  Because granules
never straddle tile or shard boundaries (tile heights and local plane
heights are multiples of 8 word rows), trajectories are invariant to
the mesh shape, the tile size, and x-axis splits — and a routed
single-chip run is bitwise identical to any mesh-sharded run of the
same config (SURVEY.md §7's bit-reproducibility-across-sharding;
replaces the round-4 split of per-tile vs per-(granule, 128-lane-chunk)
keying, whose per-chunk reseeds were too fine for single-chip tiles).

The reference's analog is a single sequential XORWOW stream partitioned
by generator offset (/root/reference/src/ising3d_gpu_m.f90:72-77);
keying draws by their logical coordinates gives the same disjointness
declaratively and makes resume/sharding replay-free.

``granule_planes_interpret`` is the CPU fallback mirroring the same
structure with threefry draws (different bits, same statistics and the
same invariance properties) for interpret-mode tests on the virtual
mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

# golden-ratio-family odd constants mixing the granule coordinates into
# the hardware-PRNG seed
ROW_TAG_MUL = -1640531527
REP_TAG_MUL = 0x3C6EF35F


def granule_planes(s0, s1, rep_g, wrow0, nrows, w, w_total, col0, draw):
    """Tuple of (nrows, w) uint32 random planes from granule-keyed
    hardware-PRNG streams (see module docstring).

    ``draw(shape, gen)`` produces the engine's per-granule plane tuple
    from fresh ``gen()`` words — e.g. two Bernoulli chains for Ising2D,
    the 8-plane (proposal, chain) set for q=6 clock.  Must be called
    inside a Pallas TPU kernel."""
    per_granule = []
    for g in range(nrows // 8):
        tag = ((wrow0 + g * 8) * jnp.int32(ROW_TAG_MUL)
               + rep_g * jnp.int32(REP_TAG_MUL))
        pltpu.prng_seed(s0, s1 ^ tag)

        def gen():
            return pltpu.bitcast(
                pltpu.prng_random_bits((8, w_total)), jnp.uint32)

        planes = draw((8, w_total), gen)
        if w != w_total:
            planes = tuple(
                jax.lax.dynamic_slice(p, (jnp.int32(0), col0), (8, w))
                for p in planes
            )
        per_granule.append(planes)
    if len(per_granule) == 1:
        return per_granule[0]
    return tuple(
        jnp.concatenate([pg[k] for pg in per_granule], axis=0)
        for k in range(len(per_granule[0]))
    )


def granule_planes_interpret(seeds, rep0, wrow0, col0, nrep, nyp, half,
                             w_total, draw):
    """CPU fallback: tuple of (nrep, nyp, half) uint32 plane stacks
    from threefry streams keyed per (global replica, global 8-word-row
    granule), full-width generation with the local lane window sliced
    out — the same structure (and invariance properties) as
    :func:`granule_planes`; the bits differ from the on-chip hardware
    PRNG (same statistics).

    ``draw(shape, gen)`` as above; ``gen`` here is a counter-keyed
    threefry draw under the granule key."""
    base = jax.random.fold_in(
        jax.random.PRNGKey(seeds[0].astype(jnp.uint32)), seeds[1]
    )

    def per_rep(r):
        kr = jax.random.fold_in(base, rep0 + r)

        def per_gran(g):
            kg = jax.random.fold_in(kr, wrow0 + g * 8)
            cnt = [0]

            def gen():
                cnt[0] += 1
                return jax.random.bits(
                    jax.random.fold_in(kg, cnt[0]), (8, w_total),
                    dtype=jnp.uint32)

            planes = draw((8, w_total), gen)
            return tuple(
                jax.lax.dynamic_slice(p, (0, col0), (8, half))
                for p in planes
            )

        stacks = jax.vmap(per_gran)(jnp.arange(nyp // 8))
        return tuple(s.reshape(nyp, half) for s in stacks)

    reps = jax.vmap(per_rep)(jnp.arange(nrep))
    return tuple(reps)
