"""Test configuration: force CPU with 8 virtual devices so mesh/sharding
tests run without TPU hardware (SURVEY §4.3).

Must run before jax initializes; note the environment pre-sets
JAX_PLATFORMS=axon (the TPU tunnel), so we *override*, not setdefault —
two processes sharing the tunnel deadlock, and unit tests must not depend
on real hardware anyway.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize imports jax at interpreter startup and
# registers the axon TPU plugin, freezing JAX_PLATFORMS before this file
# runs — so the env var alone is ignored; the config update is not.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
