"""Test harness: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh (real multi-chip TPU
hardware is not available in CI); the TPU/axon plugin registers itself at
interpreter start via sitecustomize and forces jax_platforms="axon,cpu",
so we must override the *config* (not just the env var) before any
backend is initialized.
"""

import os

if os.environ.get("SPINLAT_TEST_ON_TPU") != "1":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
