"""Counter-based random streams.

The reference consumes one sequential XORWOW stream (cuRAND host API,
seed 42) and partitions it across jobs by fast-forwarding the generator
offset: ``skip_curand(n_skip * N * (mcs+1) * tot_sample)`` →
``curandSetGeneratorOffset`` (/root/reference/src/ising3d_gpu_m.f90:72-77,
used in /root/reference/app/xy2d_periodic_gpu_relaxation.f90:21).

The TPU-native replacement is declarative: every random draw is keyed by
its logical coordinates ``(seed, stream, sample, sweep, phase)`` via
threefry ``fold_in`` chains.  Stream disjointness across jobs, samples,
sweeps and checkerboard phases holds by construction; resuming at
``(sample, t)`` needs no replay.  ``stream`` plays the role of the
reference's ``n_skip`` ensemble-splitting parameter.

The Pallas kernels use the per-core hardware PRNG instead
(``pltpu.prng_seed`` / ``prng_random_bits``), seeded from 32-bit hashes
of the same coordinates — different bits than the jnp path, identical
statistics, fully deterministic.  The bit-packed engines (Ising 2D/3D,
clock q∈{3,4,6}) all key their streams by GLOBAL granule coordinates
(ops/multispin_rng): one config + seed yields ONE bitwise trajectory
across the routed single-chip engines (resident multisweep, streaming
phases) and every (dp, y[, x]) mesh sharding — SURVEY.md §7's
bit-reproducibility-across-sharding.  The XY engines remain keyed per
(engine, tile): their observables are f32 sums whose reduction order is
engine-specific, so cross-engine bitwise equality is not meaningful
there; each XY engine is individually deterministic and the sharded XY
path is mesh-shape invariant via its own granule keying
(parallel/domain._site_uniforms).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.random as jr


def base_key(seed: int, stream: int = 0) -> jax.Array:
    """Root key for one run. ``stream`` ≅ the reference's `n_skip` slot."""
    return jr.fold_in(jr.PRNGKey(seed), stream)


def sample_key(key: jax.Array, sample: jax.Array | int) -> jax.Array:
    return jr.fold_in(key, sample)


# Purpose domains under a sample key.  Sweep-t keys live one tree level
# below the _DOM_SWEEP child, so an init/prepare key can never collide
# with the key of any sweep index t (previously init = fold_in(k, 1000)
# was bit-identical to the t=1000 sweep key, replaying the initial-state
# uniforms as Metropolis candidates at t=1000 in every mcs >= 1000 run).
# Disjointness across purposes holds by construction: at each tree node
# the child indices used for distinct purposes are distinct integers.
_DOM_SWEEP, _DOM_INIT, _DOM_PREPARE = 0, 1, 2


def sweep_key(key: jax.Array, t: jax.Array | int) -> jax.Array:
    """Key for sweep t of the history keyed by ``key``."""
    return jr.fold_in(jr.fold_in(key, _DOM_SWEEP), t)


def init_key(key: jax.Array) -> jax.Array:
    """Key for the initial-state draw of the history keyed by ``key``."""
    return jr.fold_in(key, _DOM_INIT)


def prepare_key(key: jax.Array) -> jax.Array:
    """Key for post-init preparation draws (finite-magne etc.)."""
    return jr.fold_in(key, _DOM_PREPARE)


def phase_key(key: jax.Array, phase: int) -> jax.Array:
    return jr.fold_in(key, phase)


def uniform(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """U[0,1) — the reference's curandGenerate yields U(0,1]."""
    return jr.uniform(key, shape, dtype=dtype)


def derive_seed_scalar(
    seed: jax.Array | int,
    sample: jax.Array | int,
    t: jax.Array | int,
    phase: jax.Array | int,
) -> jax.Array:
    """32-bit mixed seed for the Pallas hardware PRNG.

    A small splitmix-style integer hash of the logical draw coordinates —
    cheap enough to compute inside a scan body, collision-resistant enough
    for stream separation.
    """
    def mix(h, v):
        h = (h ^ jnp.uint32(v)) * jnp.uint32(0x9E3779B1)
        h = h ^ (h >> 15)
        h = h * jnp.uint32(0x85EBCA77)
        return h ^ (h >> 13)

    h = jnp.uint32(seed) * jnp.uint32(0x9E3779B1) + jnp.uint32(0x165667B1)
    h = mix(h, jnp.asarray(sample, jnp.uint32))
    h = mix(h, jnp.asarray(t, jnp.uint32))
    h = mix(h, jnp.asarray(phase, jnp.uint32))
    return h.astype(jnp.int32)


def bits_to_uniform(bits: jax.Array) -> jax.Array:
    """uint32 random bits -> f32 uniform in [0, 1).

    Uses the top 24 bits so the float is exactly representable;
    matches the acceptance-test resolution of the reference's f64
    uniforms well beyond statistical noise.
    """
    return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24)
    )
