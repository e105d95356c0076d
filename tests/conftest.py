"""Test configuration: run all tests on a fake 8-device CPU backend.

This is the TPU-native analogue of a fake cluster (the reference has no test
suite at all — see SURVEY.md §4): multi-chip sharding logic is validated on
XLA's host-platform virtual devices.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
