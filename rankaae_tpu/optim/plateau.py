"""ReduceLROnPlateau as traced scan state.

torch semantics (the reference instantiates one per optimizer:
``sc/clustering/trainer.py:400-408``, mode="min", threshold=0.01 relative,
cooldown=0, min_lr=0, eps=1e-8), re-expressed as a pure state transition so
it lives inside the jitted epoch scan instead of breaking it with host sync:

* best init = +inf
* improvement: metric < best * (1 - threshold)
* on improvement: best = metric, bad-epoch counter reset
* otherwise counter += 1; when counter > patience: lr *= factor (skipped if
  the change is below eps, matching torch's update-suppression), counter = 0.

All seven schedulers see the same combined metric each epoch
(``trainer.py:303-304``) so their (best, counter) trajectories are identical,
but the eps-gating depends on each optimizer's absolute lr — state is kept
per optimizer.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PlateauState(NamedTuple):
    lr: jnp.ndarray           # current learning rate (f32 scalar)
    best: jnp.ndarray         # best metric seen (f32 scalar)
    num_bad: jnp.ndarray      # epochs without improvement (int32 scalar)


def plateau_init(lr: float) -> PlateauState:
    return PlateauState(
        lr=jnp.asarray(lr, jnp.float32),
        best=jnp.asarray(jnp.inf, jnp.float32),
        num_bad=jnp.zeros((), jnp.int32),
    )


def plateau_update(
    state: PlateauState,
    metric: jnp.ndarray,
    factor: float,
    patience: int,
    threshold: float = 0.01,
    eps: float = 1e-8,
) -> PlateauState:
    is_better = metric < state.best * (1.0 - threshold)
    best = jnp.where(is_better, metric, state.best)
    num_bad = jnp.where(is_better, 0, state.num_bad + 1)

    reduce = num_bad > patience
    new_lr = state.lr * factor
    # torch skips the update when the reduction is below eps
    new_lr = jnp.where(state.lr - new_lr > eps, new_lr, state.lr)
    lr = jnp.where(reduce, new_lr, state.lr)
    num_bad = jnp.where(reduce, 0, num_bad)
    return PlateauState(lr=lr, best=best, num_bad=num_bad)
