"""Test config: force CPU backend with 8 virtual devices.

SURVEY.md §4.5: multi-chip paths are tested on a fake 8-device CPU mesh
(`--xla_force_host_platform_device_count=8`), identically to how they
run on a real slice.

The axon TPU plugin's sitecustomize registers + initializes JAX
backends at interpreter start, freezing the CPU device count at 1
before any conftest code can run, so the interpreter must be re-exec'd
once with the hook disabled and the device flag in place. The re-exec
happens inside `pytest_configure` with pytest's global fd-capture
stopped — exec'ing during conftest import leaves fd 1 pointing at the
parent's capture tempfile and the child's entire output vanishes.
"""

import os
import sys

_SENTINEL = "_MYDET_TEST_REEXEC"


def pytest_configure(config):
    if _SENTINEL in os.environ:
        return
    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()  # restore real stdout/stderr fds
    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # falsy -> sitecustomize skips register()
    # NOTE: deliberately ONE cpu device here. Multiple virtual CPU
    # devices make every executable launch 10x slower on this 1-core
    # host (measured 2.5 s/step -> 29.5 s/step); the multi-device
    # sharding checks run in their own 8-device subprocess
    # (tests/test_sharding.py -> tests/sharding_checks.py).
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)


if _SENTINEL in os.environ:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    # NOTE: no persistent compilation cache here — XLA:CPU AOT cache
    # entries record machine features that mismatch this host and the
    # loader warns "could lead to execution errors such as SIGILL"
    # (observed as hard aborts mid-test). Compile fresh every run.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
