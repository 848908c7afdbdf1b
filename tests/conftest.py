"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(Mesh / shard_map / ppermute ring) are exercised without TPU hardware —
the JAX-standard "fake backend" (SURVEY.md §4). Must be set before jax
imports anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU plugin and forces
# jax_platforms back to it; override again so tests run on the virtual
# 8-device CPU backend regardless.
jax.config.update("jax_platforms", "cpu")

# float64 available for oracle-grade comparisons; library code requests
# float32 explicitly so default behavior is unchanged.
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
