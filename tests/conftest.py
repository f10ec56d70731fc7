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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = _flags

# Every jit-compiled XLA:CPU executable keeps JIT code mappings alive for
# the life of the process; this suite compiles thousands of programs and
# blows through the kernel's default vm.max_map_count (65530) about 60%
# of the way in, after which mmap fails and XLA segfaults or deadlocks
# inside backend_compile_and_load (diagnosed by watching
# /proc/<pid>/maps hit the limit exactly as the suite froze). Raise the
# limit when we can; otherwise shed compiled programs whenever the map
# count nears the ceiling (jax.clear_caches() unmaps dead executables at
# the cost of recompiling shared programs).


def _map_count_limit() -> int:
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read())
    except OSError:
        return 65530


def _raise_map_count_limit() -> None:
    if _map_count_limit() >= 262144:
        return
    try:  # needs root; best-effort
        with open("/proc/sys/vm/max_map_count", "w") as f:
            f.write("1048576")
    except OSError:
        pass


_raise_map_count_limit()

import jax  # noqa: E402

# The environment's TPU-tunnel site hook (axon) force-selects its platform
# through jax.config, which overrides JAX_PLATFORMS from the env — override
# it back so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", False)  # NaN inputs are part of the contract

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _shed_jit_mappings():
    """Fallback when the map-count limit couldn't be raised: drop compiled
    programs once the process nears the mmap ceiling (see module
    docstring above — exhaustion segfaults XLA mid-compile)."""
    yield
    limit = _map_count_limit()
    try:
        with open("/proc/self/maps", "rb") as f:
            used = sum(1 for _ in f)
    except OSError:
        return
    if used > limit * 3 // 4:
        jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(66)  # reference harness seed, src/bin/common.rs:9


@pytest.fixture(scope="session")
def uniform_data(rng):
    """Seeded uniform[0,1) data like the reference eval harness
    (src/bin/common.rs:43-53), scaled down for test speed."""
    return rng.random((512, 32), dtype=np.float32)
