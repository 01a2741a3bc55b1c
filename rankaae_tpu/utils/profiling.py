"""Profiling and debugging helpers.

The reference's observability is minimal — torch parallel-info dump and
wall-clock timers (SURVEY.md §5 tracing row), plus globally-enabled autograd
anomaly detection (``trainer.py:11``, always on and costly).  TPU analogs:

* :func:`trace` — ``jax.profiler`` trace context (TensorBoard-viewable) plus
  a wall-clock phase timer.
* :func:`enable_nan_debugging` — opt-in ``jax_debug_nans`` (the jit-time
  analog of anomaly detection; opt-in because it disables async dispatch).
* :class:`PhaseTimer` — named wall-clock phases with a summary, preserving
  the reference's per-trial "Time used" reporting style.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Persistent XLA compilation cache: repeat invocations of the same
    program (bench runs, re-trainings, report stages) skip the multi-minute
    TPU compile entirely.  Verified working on the axon TPU platform."""
    import os

    cache_dir = cache_dir or os.path.expanduser("~/.cache/rankaae_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def enable_nan_debugging(enable: bool = True) -> None:
    """Opt-in NaN detection in every jitted computation — the analog of the
    reference's always-on ``torch.autograd.set_detect_anomaly(True)``."""
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def trace(logdir: Optional[str] = None, label: str = "trace"):
    """Profile a block: XLA-level trace to ``logdir`` (if given) + wall time."""
    start = time.time()
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield
    elapsed = time.time() - start
    print(f"[{label}] {elapsed:.2f}s" + (f" (trace -> {logdir})" if logdir else ""))


class PhaseTimer:
    """Named wall-clock phases: ``with timer.phase('compile'): ...``."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        start = time.time()
        yield
        self.times[name] = self.times.get(name, 0.0) + (time.time() - start)

    def summary(self) -> str:
        total = sum(self.times.values())
        lines = [f"{k}: {v:.2f}s ({v / max(total, 1e-9):.0%})"
                 for k, v in self.times.items()]
        return " | ".join(lines) + f" | total: {total:.2f}s"
