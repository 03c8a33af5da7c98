"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before the first ``import jax`` anywhere in the test
process so sharding tests exercise real multi-device compilation paths.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin in this image pre-sets jax_platforms, overriding the
# env var; force CPU through the config API (must happen before any backend
# initialization).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert len(jax.devices()) == 8, "expected 8 virtual devices for sharding tests"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
