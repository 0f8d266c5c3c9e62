"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware by forcing
the XLA host platform to expose 8 devices. Must run before jax imports.
"""

import os

# The axon sitecustomize pins JAX_PLATFORMS=axon, so the env var alone is
# not enough — override through jax.config before any backend is created.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
