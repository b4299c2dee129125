"""TPU-native spin-lattice Monte Carlo framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
osada-yum/CUDA_Fortran_MC_simulation_spin (CUDA Fortran, single GPU):
non-equilibrium-relaxation (NER) Monte Carlo for classical spin lattice
models — 2D/3D Ising, q-state clock, 2D XY — with checkerboard Metropolis
updates, over-relaxation, LUT-driven acceptance, streaming Kahan ensemble
statistics, and the reference's full NER protocol suite.

TPU-first design decisions (none of these are translations of the CUDA code):

- Canonical lattice storage is *dual checkerboard arrays* of shape
  (ny, nx//2): each Metropolis phase is a dense update of one color array
  reading the other, so no lanes are masked out.  (The reference reaches
  the same conclusion in its fastest variants:
  `src/clock/clock_dual_lattice_yhalf_tableall_m.f90`,
  `src/xy2d_periodic_yhalf_gpu_m.f90`.)
- RNG is counter-based (threefry in the jnp path, per-tile hardware PRNG
  in the Pallas path), keyed by (seed, sample, sweep, phase) instead of a
  sequential XORWOW stream — giving declarative stream-splitting
  (the reference's `skip_curand`) and exact resumability.
- A full Monte Carlo history runs inside one `jax.jit`-ed `lax.scan`;
  host↔device traffic is one small observable array per sample.
- Replica parallelism is `jax.vmap`; multi-chip is `shard_map` over a
  `jax.sharding.Mesh` (replica axis = pure DP; lattice-domain sharding
  with `ppermute` halo exchange over ICI).
"""

__version__ = "0.1.0"

from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig  # noqa: F401
