"""Test config: force CPU backend with 8 virtual devices.

SURVEY.md §4.5: multi-chip paths are tested on a fake 8-device CPU mesh
(`--xla_force_host_platform_device_count=8`), identically to how they
run on a real slice. Must run before the first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: XLA-CPU conv autotuning dominates test
# wall-time on first compile; cache across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
