"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware; sharding tests run on the host-platform
device-count trick (the TPU analog of the reference's mock backends,
SURVEY.md §4). Must run before jax initialises its backend, hence env setup at
import time.
"""

import os

# Force CPU: the session environment routes jax to a real TPU via a tunnel
# (sitecustomize calls jax.config.update("jax_platforms", "axon,cpu") at
# interpreter start, overriding JAX_PLATFORMS), so the env var alone is not
# enough — re-update the config before any backend initialises.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs
