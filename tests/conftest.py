"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware isn't available in CI; per SURVEY.md §4 the sharding
tests run on a virtual device mesh via
``--xla_force_host_platform_device_count`` (the standard JAX recipe for
testing pjit/shard_map layouts without real chips).

This must run before jax initializes its backends, hence module-level here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU-tunnel site hook (axon) force-selects its platform
# through jax.config, which overrides JAX_PLATFORMS from the env — override
# it back so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", False)  # NaN inputs are part of the contract

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(66)  # reference harness seed, src/bin/common.rs:9


@pytest.fixture(scope="session")
def uniform_data(rng):
    """Seeded uniform[0,1) data like the reference eval harness
    (src/bin/common.rs:43-53), scaled down for test speed."""
    return rng.random((512, 32), dtype=np.float32)
