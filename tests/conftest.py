"""Test configuration: force the CPU backend with 8 virtual devices.

The container's sitecustomize registers a TPU ('axon') PJRT backend and
imports jax before any test code runs, so env vars alone are too late.
Instead we flip jax's platform config and clear the cached backends; the
CPU client then initializes fresh and picks up
``--xla_force_host_platform_device_count=8``. The 8-device CPU mesh lets
sharding tests validate multi-chip layouts without TPU hardware
(SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend.backend as _jeb
    _jeb.clear_backends()
except Exception:
    pass

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
