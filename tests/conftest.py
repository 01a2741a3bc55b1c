"""Test configuration.

Tests run on a virtual 8-device CPU mesh — the "fake multi-chip" harness the
reference never had (SURVEY.md §4): multi-trial sharding is validated without
TPU hardware.  Must be set before jax is imported anywhere.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize force-prepends the axon TPU platform to
# JAX_PLATFORMS, so the env var alone cannot select CPU; the config API can.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: repeat suite runs skip recompiling the trainer
# programs (the dominant test cost).
jax.config.update("jax_compilation_cache_dir", "/tmp/rankaae_test_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_csv(tmp_path_factory):
    """A small schema-exact synthetic dataset shared across the session."""
    from rankaae_tpu.data.synthetic import make_synthetic_xanes_csv

    path = tmp_path_factory.mktemp("data") / "synthetic_xanes.csv"
    make_synthetic_xanes_csv(str(path), n_rows=800, dim=256, seed=7)
    return str(path)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def import_reference_sc():
    """Import the REFERENCE sc package (/root/reference), evicting the repo's
    import-compat shim (also named ``sc``) from sys.modules if present —
    needed both for direct oracle imports and for unpickling reference
    checkpoints (pickle resolves classes via sys.modules)."""
    import importlib
    import sys

    for name in list(sys.modules):
        if name == "sc" or name.startswith("sc."):
            mod = sys.modules[name]
            file = getattr(mod, "__file__", "") or ""
            if "/root/repo" in file:
                del sys.modules[name]
    # FORCE /root/reference ahead of any /root/repo entry: other imports
    # (e.g. scripts/parity_experiment.py) prepend /root/repo after a prior
    # call put /root/reference on the path, and a fresh ``import sc`` would
    # then cache the repo SHIM as the parent package — making pickle
    # resolve ``sc.clustering.model.*`` to the shim's re-exported flax
    # classes (observed: polluted torch_export round-trips).
    if "/root/reference" in sys.path:
        sys.path.remove("/root/reference")
    sys.path.insert(0, "/root/reference")
    mod = importlib.import_module("sc")
    assert "/root/reference" in (getattr(mod, "__file__", "") or ""), (
        f"import_reference_sc resolved the wrong sc package: {mod.__file__}")
    return mod
