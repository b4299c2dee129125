"""Device mesh construction.

The reference is strictly single-process single-GPU (SURVEY.md §2.5);
its only parallel structures are intra-device.  Multi-chip execution here
is first-class: a `jax.sharding.Mesh` with

- ``dp``  — replica axis: independent MC histories (pure data parallelism;
  the multi-chip promotion of the reference's replica engines,
  /root/reference/src/clock_gpu_multi_m.f90:66,
  /root/reference/src/xy2d_periodic_samples_gpu_m.f90:56);
- ``y``   — lattice-domain axis: the lattice's row dimension is sharded
  across chips with `ppermute` halo exchange over ICI (the promotion of
  the reference's intra-device halo kernels; SURVEY.md §5.7).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int = 1, y: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * y
    if n > len(devices):
        raise ValueError(
            f"mesh dp={dp} × y={y} needs {n} devices, have {len(devices)}"
        )
    dev = np.asarray(devices[:n]).reshape(dp, y)
    return Mesh(dev, ("dp", "y"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)
