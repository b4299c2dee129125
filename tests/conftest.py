"""Test harness: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh (real multi-chip TPU
hardware is not available in CI); Pallas kernels run in interpreter mode
on CPU.  Must run before the first `import jax`.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
