"""Test configuration: CPU-only JAX with 8 virtual devices.

The reference has no test suite (SURVEY.md §4); this is the fresh TPU-era
strategy: unit tests run on CPU, and multi-device sharding tests run against
8 fake CPU devices (``--xla_force_host_platform_device_count=8``), the "fake
backend" the reference lacks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend via jax.config,
# which overrides JAX_PLATFORMS; override it back before any backend init
# so tests run on the local CPU with 8 virtual devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _clear_gin():
    from genrec_tpu.configlib import gin
    gin.clear_config()
    yield
    gin.clear_config()
