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


# ---------------------------------------------------------------------------
# fast/slow split: the full suite is ~55 min on this 1-core box, so the
# per-commit loop is `pytest tests/ -q -m "not slow"` (core: ops goldens,
# losses/metrics, config/data, model shapes — target <10 min) and the slow
# set (e2e, torch-oracle parity, multi-device equality, learnability) runs
# before a push / end of a work block.  Total coverage is unchanged:
# `pytest tests/ -q` still runs everything.
# ---------------------------------------------------------------------------

SLOW_MODULES = {
    "test_train_e2e",          # full trainer loops, many jits
    "test_main_e2e",           # on-disk data tree -> main() -> inference()
    "test_reference_parity",   # torch-oracle forwards/grads/trajectories
    "test_parallel",           # 8-device sharded==unsharded + 2-proc cluster
    "test_learnability",       # multi-step convergence checks
    "test_torch_import",       # round-trips through live reference modules
    "test_distill_cache",      # trainer-loop cache replay
    "test_graft_entry",        # full multichip dryruns
    "test_train_trajectory",   # K-step torch-oracle trajectory parity
}

# individually slow tests (>50 s each on this box) inside otherwise-fast
# modules — they run trainer loops / multi-bucket compiles
SLOW_TESTS = {
    "test_scan_steps_with_buckets",
    "test_train_step_compiles_per_bucket_and_learns_shapes",
    "test_multiscale_joint_training",
    "test_teacher_grads_finite",
    "test_scan_path_logs_full_train_metrics",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running e2e/parity/multi-device tests "
        "(deselect with -m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = getattr(item, "module", None)
        if ((mod is not None and mod.__name__.split(".")[-1] in SLOW_MODULES)
                or item.originalname in SLOW_TESTS
                or item.name in SLOW_TESTS):
            item.add_marker(pytest.mark.slow)
