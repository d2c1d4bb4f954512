"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Sharding/context-parallel tests run on virtual CPU devices
(SURVEY §4: XLA_FLAGS=--xla_force_host_platform_device_count=8), so the full
multi-chip path is exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
