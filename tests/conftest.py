"""Test config: force CPU backend with 8 virtual devices BEFORE jax initializes.

Mirrors the reference CI strategy (SURVEY.md §4): tiny inputs, CPU-runnable, with
multi-device sharding exercised on a virtual 8-device host mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may point at a real TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
