"""Test configuration: force an 8-device virtual CPU mesh.

Sharding/parallelism tests run against 8 virtual CPU devices, the JAX
analogue of a fake multi-chip cluster (no TPU needed in CI).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
