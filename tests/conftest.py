"""Test harness config: run JAX on CPU with 8 virtual devices.

This is the standard JAX way to exercise multi-chip sharding logic without
real hardware (the driver separately dry-runs the multi-chip path).
Must run before the first `import jax` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
