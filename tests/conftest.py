"""Test configuration: force CPU with 8 virtual devices.

Must run before jax initializes a backend — pytest imports conftest first,
so setting the env here is sufficient as long as tests import jax lazily or
via this process. The 8-device CPU mesh lets sharding tests validate
multi-chip layouts without TPU hardware (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
