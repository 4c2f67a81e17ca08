"""Test config: force CPU backend with 8 virtual devices BEFORE jax initializes.

Mirrors the reference CI strategy (SURVEY.md §4): tiny inputs, CPU-runnable, with
multi-device sharding exercised on a virtual 8-device host mesh.

Gotcha: the session env sets JAX_PLATFORMS=axon (real TPU), and the jaxtyping
pytest plugin imports jax before this conftest runs — so env vars alone are too
late; we must update jax.config directly (backends are still uninitialized at
collection time).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses and late readers
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", f"tests must run on CPU, got {jax.default_backend()}"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
