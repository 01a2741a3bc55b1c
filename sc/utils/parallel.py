"""Shim for ``sc.utils.parallel`` — the reference's ipcluster lifecycle
helpers (``/root/reference/sc/utils/parallel.py:5-42``).

rankaae_tpu has no ipyparallel cluster: all trials train inside ONE process
as a vmapped+sharded axis over the TPU mesh (``rankaae_tpu.parallel.trials``),
so there is nothing to start, stop, or kill.  The reference signatures are
kept as logged no-ops so orchestration scripts importing them keep working.
"""
import logging

_log = logging.getLogger(__name__)


def ipcluster(action, n=8, ipypar_path=".ipypar"):
    """Reference signature (``parallel.py:5``).  No-op: there is no
    ipcluster; trials run vmapped on the TPU mesh in-process."""
    assert action in ["start", "stop"]
    _log.info(
        "sc.utils.parallel.ipcluster(%r, n=%d, profile_dir=%r): no-op — "
        "rankaae_tpu trains trials as a vmapped mesh axis in-process",
        action, n, ipypar_path,
    )


def kill_ipypar_pcocesses(user="zliang"):
    """Reference signature — including its typo (``parallel.py:28``).
    No-op: no engine processes exist to kill."""
    _log.info(
        "sc.utils.parallel.kill_ipypar_pcocesses(user=%r): no-op — "
        "no ipyparallel engines exist", user,
    )
