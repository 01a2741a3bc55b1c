"""Multi-host scaling hooks.

The workload is embarrassingly parallel over trials (SURVEY.md §2.8): one
v5e chip already trains 32+ trials concurrently, and a single v5e-8 slice
covers any realistic sweep, so multi-host is out of scope for the shipped
configs.  When a sweep ever exceeds one slice, the recipe is:

1. ``initialize()`` (below) on every host — wraps
   ``jax.distributed.initialize`` so ``jax.devices()`` spans the full
   multi-slice topology;
2. build ``trial_mesh(jax.devices())`` — the trial axis now spans hosts;
   trials still exchange zero bytes during training, so the DCN link only
   carries the initial broadcast of the (tiny) dataset and the final metric
   gather;
3. ``run_trials`` works unchanged (each host feeds its addressable shard of
   the stacked trial state).

No collectives ride DCN in steady state — this is the same communication
shape as the reference's ipyparallel fan-out, at slice scale.
"""
from __future__ import annotations

from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Thin wrapper over ``jax.distributed.initialize`` (auto-detects the
    environment when arguments are omitted, e.g. on Cloud TPU pods)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
