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


def make_mesh(dp: int = 1, y: int = 1, x: int = 1, devices=None) -> Mesh:
    """(dp, y[, x]) mesh: replicas × lattice rows × lattice columns.

    x=1 (default) builds the 2-axis mesh; x>1 adds the second spatial
    dimension of the (dx, dy) decomposition (SURVEY.md §5.7) with
    column halo exchange over ICI."""
    devices = devices if devices is not None else jax.devices()
    n = dp * y * x
    if n > len(devices):
        raise ValueError(
            f"mesh dp={dp} × y={y} × x={x} needs {n} devices, "
            f"have {len(devices)}"
        )
    if x == 1:
        dev = np.asarray(devices[:n]).reshape(dp, y)
        return Mesh(dev, ("dp", "y"))
    dev = np.asarray(devices[:n]).reshape(dp, y, x)
    return Mesh(dev, ("dp", "y", "x"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1)
