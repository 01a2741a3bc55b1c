"""First-order optimizers with torch semantics and *runtime* learning rates.

The reference uses 7 independent torch optimizers over overlapping parameter
subsets, each with its own lr = ratio * lr_base, all driven by per-optimizer
``ReduceLROnPlateau`` schedulers (``sc/clustering/trainer.py:333-408``;
registry ``sc/utils/parameter.py:34-39``: Adam, AdamW, AdaBound, RAdam).

Design: unlike optax's baked-in schedules, ``update`` takes the learning rate
as a traced argument, because ReduceLROnPlateau is *state* (driven by the
running combined metric inside the jitted epoch scan), not a precomputable
schedule.  States are plain pytrees -> trivially vmappable over the trial
axis.

Semantics matched to torch / torch_optimizer:

* Adam: L2 weight decay folded into the gradient before moments.
* AdamW: decoupled decay ``p -= lr * wd * p``.
* RAdam (torch_optimizer): variance rectification, L2-style decay applied
  as ``p -= lr * wd * p`` *before* the rectified step (torch_optimizer
  RAdam quirk: decay uses the group's lr, decoupled).
* AdaBound (torch_optimizer): Adam step with the effective per-element lr
  clipped to [lower, upper] bounds that converge to ``final_lr`` as
  t -> inf; final_lr scales with lr / base_lr.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class MomentState(NamedTuple):
    count: jnp.ndarray      # scalar int32 step counter
    mu: Any                 # first-moment pytree (like params)
    nu: Any                 # second-moment pytree


def _zeros_like_tree(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def moment_init(params) -> MomentState:
    return MomentState(
        count=jnp.zeros((), jnp.int32),
        mu=_zeros_like_tree(params),
        nu=_zeros_like_tree(params),
    )


@dataclasses.dataclass(frozen=True)
class Optimizer:
    """A (init, update) pair. ``update(grads, state, params, lr)`` returns
    (new_params, new_state).  All hyperparameters except lr are static."""

    init: Callable[[Any], MomentState]
    update: Callable[[Any, MomentState, Any, jnp.ndarray], Tuple[Any, MomentState]]


def _adam_moments(grads, state, b1, b2):
    count = state.count + 1
    mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
    t = count.astype(jnp.float32)
    bc1 = 1 - b1**t
    bc2 = 1 - b2**t
    return MomentState(count, mu, nu), bc1, bc2


def make_adam(b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0) -> Optimizer:
    def update(grads, state, params, lr):
        if weight_decay:
            grads = jax.tree_util.tree_map(lambda g, p: g + weight_decay * p, grads, params)
        state, bc1, bc2 = _adam_moments(grads, state, b1, b2)

        def step(p, m, v):
            mhat = m / bc1
            vhat = v / bc2
            return p - lr * mhat / (jnp.sqrt(vhat) + eps)

        new_params = jax.tree_util.tree_map(step, params, state.mu, state.nu)
        return new_params, state

    return Optimizer(moment_init, update)


def make_adamw(b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0) -> Optimizer:
    def update(grads, state, params, lr):
        state, bc1, bc2 = _adam_moments(grads, state, b1, b2)

        def step(p, m, v):
            mhat = m / bc1
            vhat = v / bc2
            return p - lr * weight_decay * p - lr * mhat / (jnp.sqrt(vhat) + eps)

        new_params = jax.tree_util.tree_map(step, params, state.mu, state.nu)
        return new_params, state

    return Optimizer(moment_init, update)


def make_radam(b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0) -> Optimizer:
    rho_inf = 2.0 / (1.0 - b2) - 1.0

    def update(grads, state, params, lr):
        state, bc1, bc2 = _adam_moments(grads, state, b1, b2)
        t = state.count.astype(jnp.float32)
        beta2_t = b2**t
        rho_t = rho_inf - 2.0 * t * beta2_t / (1.0 - beta2_t)
        rect = jnp.sqrt(
            jnp.clip(
                ((rho_t - 4.0) * (rho_t - 2.0) * rho_inf)
                / ((rho_inf - 4.0) * (rho_inf - 2.0) * jnp.maximum(rho_t, 4.001)),
                0.0,
            )
        )
        use_rect = rho_t > 5.0

        def step(p, m, v):
            if weight_decay:
                p = p - lr * weight_decay * p
            mhat = m / bc1
            adaptive = rect * mhat / (jnp.sqrt(v / bc2) + eps)
            plain = mhat
            return p - lr * jnp.where(use_rect, adaptive, plain)

        new_params = jax.tree_util.tree_map(step, params, state.mu, state.nu)
        return new_params, state

    return Optimizer(moment_init, update)


def make_adabound(
    b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
    final_lr=0.1, gamma=1e-3, base_lr=1e-3,
) -> Optimizer:
    """torch_optimizer.AdaBound defaults; ``base_lr`` = the configured initial
    lr (bounds scale with lr / base_lr as the plateau scheduler shrinks lr)."""

    def update(grads, state, params, lr):
        if weight_decay:
            grads = jax.tree_util.tree_map(lambda g, p: g + weight_decay * p, grads, params)
        state, bc1, bc2 = _adam_moments(grads, state, b1, b2)
        t = state.count.astype(jnp.float32)
        flr = final_lr * lr / base_lr
        lower = flr * (1.0 - 1.0 / (gamma * t + 1.0))
        upper = flr * (1.0 + 1.0 / (gamma * t))
        step_size = lr * jnp.sqrt(bc2) / bc1

        def step(p, m, v):
            eff = jnp.clip(step_size / (jnp.sqrt(v) + eps), lower, upper)
            return p - eff * m

        new_params = jax.tree_util.tree_map(step, params, state.mu, state.nu)
        return new_params, state

    return Optimizer(moment_init, update)


def flat_optimizer(inner: Optimizer) -> Optimizer:
    """Run ``inner`` over ONE raveled parameter vector instead of per-leaf.

    The training program executes its optimizer arithmetic once per tree
    leaf (~10 ops x ~150 leaf-updates per batch across the 7 optimizers);
    on TPU those tiny ops cost per-op issue/pipeline overhead, not FLOPs —
    measured as the dominant share of the batch-step op count
    (PERF_NOTES_r05.md).  Raveling the subset collapses each optimizer's
    update to ~10 vector ops + cheap slices XLA fuses into the consumers.

    Numerically IDENTICAL to the per-leaf form: every optimizer step here
    is elementwise, and concatenation does not change values.  Moment
    states become single vectors (mid-run ``trial_state.mpk`` checkpoints
    are structure-incompatible across the knob; saved model bundles carry
    no optimizer state and are unaffected).
    """
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        return inner.init(flat)

    def update(grads, state, params, lr):
        gflat, _ = ravel_pytree(grads)
        pflat, unravel = ravel_pytree(params)
        new_flat, new_state = inner.update(gflat, state, pflat, lr)
        return unravel(new_flat), new_state

    return Optimizer(init, update)


OPTIMIZERS: Dict[str, Callable[..., Optimizer]] = {
    "Adam": make_adam,
    "AdamW": make_adamw,
    "RAdam": make_radam,
    "AdaBound": make_adabound,
}


def make_optimizer(name: str, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0,
                   **kw) -> Optimizer:
    if name not in OPTIMIZERS:
        raise ValueError(f"Unknown optimizer {name!r}; choose from {sorted(OPTIMIZERS)}")
    return OPTIMIZERS[name](b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay, **kw)
