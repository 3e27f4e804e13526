"""Test env: CPU backend with 8 virtual devices, float64 enabled for MC parity.

The session environment registers an axon (remote TPU tunnel) PJRT plugin from
``sitecustomize`` at interpreter startup and pins ``jax_platforms=axon``. Backends
initialize lazily, so flipping the config here (before any computation) moves all
tests onto the local CPU with 8 virtual devices for sharding tests.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
