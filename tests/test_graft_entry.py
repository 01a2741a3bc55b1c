"""Driver-contract tests for ``__graft_entry__``.

The driver compile-checks ``entry()`` single-chip and runs
``dryrun_multichip(n)`` with N virtual CPU devices.  Pinning both here means
the contract can never silently regress (round-1 lesson: the dryrun died on
the axon backend because it never forced the CPU mesh itself).
"""
import os
import sys

import jax
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    z, spec_hat, logit = out
    assert z.shape[1] == 6
    assert spec_hat.shape == args[0].shape
    assert all(bool(jax.numpy.isfinite(o).all()) for o in out)


def test_dryrun_multichip_inprocess():
    # conftest pins jax_platforms=cpu + 8 virtual devices, so this exercises
    # the in-process path — exactly what the driver's environment needs to
    # reproduce via the subprocess path below.  Tiny shapes only (quick
    # lane); the flagship-shape case runs in the slow test below.
    graft.dryrun_multichip(8, flagship=False)


@pytest.mark.slow
def test_dryrun_multichip_inprocess_flagship():
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_subprocess_path(monkeypatch):
    # Simulate the driver's environment: no usable XLA_FLAGS device count, so
    # dryrun_multichip must re-exec itself into a pinned CPU-mesh subprocess.
    monkeypatch.setenv("XLA_FLAGS", "")
    monkeypatch.delenv("_RANKAAE_DRYRUN_INNER", raising=False)
    graft.dryrun_multichip(4)


def test_dryrun_multichip_subprocess_failure_raises(monkeypatch):
    monkeypatch.setenv("XLA_FLAGS", "")
    monkeypatch.delenv("_RANKAAE_DRYRUN_INNER", raising=False)
    monkeypatch.setattr(sys, "executable", "/bin/false")
    with pytest.raises(RuntimeError, match="dryrun_multichip subprocess"):
        graft.dryrun_multichip(2)
