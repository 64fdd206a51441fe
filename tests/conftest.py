"""Test configuration: force an 8-device virtual CPU platform.

Sharding/DP logic is exercised on a virtual 8-device CPU mesh (the driver
separately dry-run-compiles the multi-chip path); kernels use interpret mode
on CPU. Must run before the first ``import jax`` anywhere in the test
session, hence the env mutation at module import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
