"""Model interface.

Every spin model is a frozen dataclass of *static* parameters exposing
pure functions over an immutable state pytree:

    init_state(kind, key)      -> state
    sweep(state, key, t)       -> state          # one full MCS (both colors)
    observables(state)         -> dict[str, f32 scalar]

This replaces the reference's per-model derived types with type-bound
mutating procedures (e.g. `ising2d_gpu` /root/reference/src/
ising2d_gpu_m.f90:12-42) — functional states are what `jit`, `scan`,
`vmap` and `shard_map` compose over.

States are NamedTuples of arrays so they vmap/shard transparently.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Protocol

import jax


class SpinModel(Protocol):
    nx: int
    ny: int
    kbt: float

    @property
    def nsites(self) -> int: ...

    def init_state(self, kind: str, key: jax.Array) -> Any: ...

    def sweep(self, state: Any, key: jax.Array) -> Any: ...

    def observables(self, state: Any) -> dict[str, jax.Array]: ...


class CheckerboardState(NamedTuple):
    """Two-color lattice state (see core/lattice.py)."""

    a: jax.Array  # color 0, shape (ny, nx//2) [+ feature dims]
    b: jax.Array  # color 1, same shape
