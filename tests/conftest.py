"""Test configuration: force a virtual 8-device CPU mesh.

Tests must run without TPU hardware; sharding tests need multiple devices.
Two steps are required, in order, before any test imports jax:

1. extend XLA_FLAGS before the first jax import so the CPU client is built
   with 8 virtual devices;
2. ``jax.config.update("jax_platforms", "cpu")`` — the environment's TPU
   plugin (axon sitecustomize) force-overrides the JAX_PLATFORMS env var at
   interpreter start, so the env var alone is NOT enough; the config update
   after import wins.
"""

import os

# persistent compilation cache: the CPU backend honours this, so the
# compile-heavy tests (full-model jits, 50-65 s each on this 1-core host)
# only pay compilation on their first-ever run
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/litepi_jax")
)

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
