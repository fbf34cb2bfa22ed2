"""Test configuration: run everything on a virtual 8-device CPU mesh.

The JAX-native way to test multi-chip sharding without hardware
(SURVEY.md §4): force the host platform and split it into 8 devices before
any backend initializes.  Note the environment ships a sitecustomize that
prepends the `axon` TPU platform to ``JAX_PLATFORMS`` — setting the env var
is not enough, the config must be updated after import (before first use).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
