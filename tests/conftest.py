"""Test configuration: force a virtual 8-device CPU mesh.

Tests must run without TPU hardware; sharding tests need multiple devices.
This must execute before the first ``import jax`` anywhere in the test
process, which pytest guarantees for a root conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
