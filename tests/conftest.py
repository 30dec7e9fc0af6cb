"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run against CPU "fake backend" devices via
``--xla_force_host_platform_device_count`` (the JAX equivalent of a fake
process group), per the test strategy in SURVEY.md §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/amyolo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
