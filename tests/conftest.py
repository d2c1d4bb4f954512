"""Test configuration: force an 8-device CPU mesh before any computation.

Sharding/context-parallel tests run on virtual CPU devices (SURVEY §4), so
the full multi-chip path is exercised without TPU hardware.

NOTE: the "axon" TPU plugin in this image ignores the ``JAX_PLATFORMS`` env
var, and pytest plugins may import jax before this conftest runs — so we use
``jax.config`` directly (works any time before backend initialization).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu" and len(devs) == 8, (
        f"tests must run on 8 virtual CPU devices, got {devs}"
    )
