"""Test configuration: run all tests on a fake 8-device CPU backend.

This is the TPU-native analogue of a fake cluster (the reference has no test
suite at all — see SURVEY.md §4): multi-chip sharding logic is validated on
XLA's host-platform virtual devices.

NOTE: this environment's ``axon`` TPU plugin force-rewrites ``jax_platforms``
to "axon,cpu" at import, ignoring the JAX_PLATFORMS env var — so the override
must go through ``jax.config.update`` AFTER importing jax.  CPU is required
for both speed and f32 numerics (TPU matmuls default to bf16, which breaks
golden comparisons against torch CPU).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
