"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run against CPU "fake backend" devices (the JAX
equivalent of a fake process group), per the test strategy in SURVEY.md §4.

The axon TPU sitecustomize registers its PJRT plugin at interpreter start
and exports ``JAX_PLATFORMS=axon``; backends are still *uninitialized* at
conftest import, so config updates here win as long as they happen before
any device access — hence config-based (env vars are too late for
``jax_num_cpu_devices`` once XLA_FLAGS were parsed differently).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/amyolo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
