"""Driver-contract tests for __graft_entry__.

The round-1 failure mode was dryrun_multichip() asserting on device count
instead of provisioning the virtual mesh itself; these tests pin the fixed
contract: the function must succeed regardless of how many devices the
already-initialized runtime has.
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft  # noqa: E402


@pytest.mark.slow  # the driver re-runs this contract every round
def test_dryrun_multichip_inline():
    # conftest provisions 8 virtual CPU devices -> runs the impl inline
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_reexec():
    # more devices than the runtime has -> must self-provision in a
    # subprocess (the driver-style invocation that failed in round 1)
    assert len(jax.devices()) < 16
    graft.dryrun_multichip(16)


@pytest.mark.slow  # the driver compile-checks entry() every round
def test_entry_compiles():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-2:] == (480, 864)
