"""Test harness: force an 8-virtual-device CPU platform.

The axon TPU plugin force-prepends itself to ``jax_platforms`` even when
``JAX_PLATFORMS=cpu`` is set, so the platform must be pinned via
``jax.config`` before any backend is initialized.  The 8 virtual CPU
devices let multi-device sharding tests exercise real collectives without
a pod (SURVEY §4).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
