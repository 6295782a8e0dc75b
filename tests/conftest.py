"""Test configuration: force an 8-virtual-device CPU platform.

This is the standard JAX fake-cluster trick (SURVEY.md section 4): tests exercise the
same `jax.sharding.Mesh`/`pjit` code paths that run on a real TPU pod, but on 8
virtual CPU devices, so the suite runs anywhere. Must run before jax initializes a
backend; the axon/TPU plugin pre-registers itself via sitecustomize, so we also
override `jax_platforms` explicitly.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual CPU devices, got {len(devices)}"
    return devices
