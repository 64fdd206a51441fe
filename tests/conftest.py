"""Test configuration: force an 8-device virtual CPU platform.

Sharding/DP logic is exercised on a virtual 8-device CPU mesh (the driver
separately dry-run-compiles the multi-chip path); Pallas kernels use
interpret mode on CPU.

Note: this environment's sitecustomize registers the axon TPU backend and
force-sets ``jax_platforms="axon,cpu"`` at interpreter startup, so plain
``JAX_PLATFORMS=cpu`` env vars are overridden — the config must be updated
*after* import, before any backend is used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
