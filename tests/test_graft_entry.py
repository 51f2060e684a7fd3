"""Driver-contract test: the multi-chip dry run must pass hermetically.

This is the round-2 gate (VERDICT "Next round" #1): dryrun_multichip spawns a
fresh interpreter with JAX_PLATFORMS=cpu before backend init, so it must
succeed even if the TPU terminal/client in the outer process are mismatched.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.mark.heavy
def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)  # raises on failure


@pytest.mark.heavy
def test_dryrun_multichip_survives_poisoned_env(monkeypatch):
    """Even with a hostile JAX_PLATFORMS in the caller env, the subprocess
    must force CPU (this is exactly what broke MULTICHIP_r01)."""
    monkeypatch.setenv("JAX_PLATFORMS", "nonexistent_platform")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(4)
