"""Driver-contract tests for __graft_entry__.dryrun_multichip.

Round-1 failure mode (VERDICT.md Missing #1): the driver calls the FUNCTION
in-process under a 1-device platform; it must self-provision a virtual mesh
in a subprocess rather than assert."""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft


def test_dryrun_inprocess_when_devices_available():
    # conftest provisions 8 virtual CPU devices -> in-process path
    assert jax.device_count() >= 8
    graft.dryrun_multichip(8, modes=("student",))


def test_dryrun_self_provisions_in_subprocess():
    # More devices than the parent has -> must re-exec with a bigger
    # virtual CPU platform and succeed (the driver's axon scenario).
    need = jax.device_count() * 2
    graft.dryrun_multichip(need, modes=("teacher",))


def test_dryrun_subprocess_propagates_failure(monkeypatch):
    with pytest.raises(RuntimeError, match="subprocess failed"):
        graft.dryrun_multichip(jax.device_count() * 2, modes=("nosuchmode",))
