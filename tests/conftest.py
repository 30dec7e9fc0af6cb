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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
