"""Checkpointing: model bundles the report layer can reload.

The reference pickles whole torch ``nn.Module`` objects keyed
"Encoder"/"Decoder"/"Style Discriminator" (``trainer.py:281-283,309-313``)
and has **no resume path** (SURVEY.md §5).  Here a bundle is a msgpack of
pure pytrees (params + batch_stats per role) plus the config needed to
rebuild the modules — smaller, portable, and enough to resume (net-new
capability: ``load_model_bundle`` returns everything ``RankAAETrainer``
needs to continue).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np
from flax import serialization

from rankaae_tpu.utils.config import TrainConfig

BUNDLE_VERSION = 1


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_model_bundle(
    path: str,
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    cfg: TrainConfig,
    extra: Dict[str, Any] | None = None,
) -> str:
    """Write ``<path>`` (msgpack) + ``<path>.json`` (config manifest)."""
    payload = {
        "version": BUNDLE_VERSION,
        "params": _to_host(params),
        "batch_stats": _to_host(batch_stats),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    manifest = {"version": BUNDLE_VERSION, "config": cfg.to_dict()}
    if extra:
        manifest["extra"] = extra
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=1)
    return path


def load_model_bundle(path: str) -> Tuple[Dict[str, Any], Dict[str, Any], TrainConfig, Dict]:
    """Returns (params, batch_stats, cfg, extra)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    with open(path + ".json") as f:
        manifest = json.load(f)
    cfg = TrainConfig(**manifest["config"])
    return payload["params"], payload["batch_stats"], cfg, manifest.get("extra", {})


def save_train_state(path: str, state) -> str:
    """Serialize a full TrainState (params, batch stats, all 7 optimizer
    moments, plateau schedulers, rng, best tracking) for resume.  The pytree
    structure is NOT stored — restore against a template from
    ``RankAAETrainer.init_state`` (same config)."""
    leaves = jax.tree_util.tree_leaves(state)
    payload = {str(i): np.asarray(leaf) for i, leaf in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    return path


def load_train_state(path: str, template):
    """Restore a TrainState saved by :func:`save_train_state` into the
    structure of ``template`` (a fresh ``init_state`` of the same config)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    treedef = jax.tree_util.tree_structure(template)
    path_leaves = jax.tree_util.tree_flatten_with_path(template)[0]
    t_leaves = [leaf for _, leaf in path_leaves]
    is_hp = [any(getattr(k, "name", None) == "hparams" for k in kp)
             for kp, _ in path_leaves]
    if len(payload) == len(t_leaves) - sum(is_hp) and sum(is_hp):
        # Legacy checkpoint predating TrainState.hparams (runtime noise/alpha
        # knobs): its leaves are every non-hparams leaf in template order.
        # Backfill hparams from the template, whose init_state already set
        # them from the config.
        leaves, j = [], 0
        for hp, want in zip(is_hp, t_leaves):
            if hp:
                leaves.append(np.asarray(want))
            else:
                leaves.append(payload[str(j)])
                j += 1
    elif len(payload) != len(t_leaves):
        raise ValueError(
            f"checkpoint has {len(payload)} leaves, template has "
            f"{len(t_leaves)} — config mismatch?"
        )
    else:
        leaves = [payload[str(i)] for i in range(len(t_leaves))]
    for got, want in zip(leaves, t_leaves):
        if tuple(got.shape) != tuple(np.shape(want)):
            raise ValueError(
                f"leaf shape mismatch: checkpoint {got.shape} vs template "
                f"{np.shape(want)} — config mismatch?"
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)
