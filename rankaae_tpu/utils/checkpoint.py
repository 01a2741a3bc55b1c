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


#: train-state checkpoint format version.  v2 stores leaves under their
#: pytree KEYPATH (plus this marker) so restore is unambiguous: a leaf is
#: matched by name, never by positional coincidence, and fields added to
#: ``TrainState`` later backfill from the template instead of shifting
#: every subsequent leaf.  Marker-less payloads are the legacy index-keyed
#: v1 format (only then is count-based interpretation attempted).
STATE_FORMAT_VERSION = 2
_STATE_MARKER = "__rankaae_state_format__"

#: TrainState fields that may be absent from an older checkpoint and are
#: safe to backfill from a fresh ``init_state`` template (they were added
#: after the v1 format shipped; their template values are the correct
#: "nothing tracked yet" initializers).  Grouped by the generation that
#: introduced them — a legacy index-keyed checkpoint is missing a SUFFIX of
#: these generations (newest first), never an arbitrary subset.
_BACKFILL_GENERATIONS = (
    ("best_recon", "best_recon_epoch",
     "best_recon_params", "best_recon_batch_stats"),
    ("hparams",),
)
_BACKFILL_FIELDS = tuple(f for gen in _BACKFILL_GENERATIONS for f in gen)


def _keystr(kp) -> str:
    return jax.tree_util.keystr(kp)


_EXTRA_PREFIX = "__extra__"


def save_train_state(path: str, state, extra: Dict[str, int] | None = None) -> str:
    """Serialize a full TrainState (params, batch stats, all 7 optimizer
    moments, plateau schedulers, rng, best tracking) for resume.  Leaves are
    stored under their pytree keypaths (format v2); restore against a
    template from ``RankAAETrainer.init_state`` (same config).

    ``extra``: scalar metadata stored INSIDE the same file (e.g. the epoch
    the state corresponds to) so state and metadata can never disagree
    after a crash between separate file writes.  The write is atomic
    (tmp + rename)."""
    path_leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    payload = {_keystr(kp): np.asarray(leaf) for kp, leaf in path_leaves}
    if len(payload) != len(path_leaves):  # pragma: no cover - structural bug
        raise ValueError("duplicate keypaths in TrainState")
    payload[_STATE_MARKER] = np.asarray(STATE_FORMAT_VERSION, np.int32)
    for k, v in (extra or {}).items():
        payload[_EXTRA_PREFIX + k] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)
    return path


def _in_backfill_field(kp) -> bool:
    return any(getattr(k, "name", None) in _BACKFILL_FIELDS for k in kp)


def load_train_state(path: str, template, return_extra: bool = False):
    """Restore a TrainState saved by :func:`save_train_state` into the
    structure of ``template`` (a fresh ``init_state`` of the same config).

    v2 payloads restore by keypath: unknown checkpoint keys are an error
    (config mismatch), template leaves missing from the checkpoint are
    allowed only for :data:`_BACKFILL_FIELDS` (fields newer than the
    checkpoint), whose template values are kept.  Marker-less payloads take
    the legacy index-keyed path, with the same backfill-fields rule.

    ``return_extra=True`` returns ``(state, extra)`` with the scalar
    metadata stored by ``save_train_state(..., extra=...)`` (empty dict for
    older checkpoints)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    extra = {k[len(_EXTRA_PREFIX):]: payload.pop(k).item()
             for k in [k for k in payload if k.startswith(_EXTRA_PREFIX)]}
    treedef = jax.tree_util.tree_structure(template)
    path_leaves = jax.tree_util.tree_flatten_with_path(template)[0]
    t_leaves = [leaf for _, leaf in path_leaves]

    version = payload.pop(_STATE_MARKER, None)
    if version is not None:
        known = {_keystr(kp) for kp, _ in path_leaves}
        unknown = sorted(set(payload) - known)
        if unknown:
            raise ValueError(
                f"checkpoint contains {len(unknown)} leaves not in the "
                f"template (config mismatch?): {unknown[:5]} ..."
            )
        leaves = []
        for kp, want in path_leaves:
            ks = _keystr(kp)
            if ks in payload:
                leaves.append(payload[ks])
            elif _in_backfill_field(kp):
                leaves.append(np.asarray(want))
            else:
                raise ValueError(
                    f"checkpoint is missing leaf {ks!r} — config mismatch?"
                )
    else:
        # Legacy v1 (index-keyed): the checkpoint may predate any suffix of
        # the backfill generations (newest first).  Find the interpretation
        # whose leaf count matches exactly; backfilled fields keep their
        # template ("nothing tracked yet") values.
        def field_of(kp):
            for k in kp:
                name = getattr(k, "name", None)
                if name is not None:
                    return name
            return None

        fields = [field_of(kp) for kp, _ in path_leaves]
        for n_gens in range(len(_BACKFILL_GENERATIONS) + 1):
            missing = {f for gen in _BACKFILL_GENERATIONS[:n_gens] for f in gen}
            is_bf = [f in missing for f in fields]
            if len(payload) == len(t_leaves) - sum(is_bf):
                leaves, j = [], 0
                for bf, want in zip(is_bf, t_leaves):
                    if bf:
                        leaves.append(np.asarray(want))
                    else:
                        leaves.append(payload[str(j)])
                        j += 1
                break
        else:
            raise ValueError(
                f"checkpoint has {len(payload)} leaves, template has "
                f"{len(t_leaves)} — config mismatch?"
            )
    for (kp, want), got in zip(path_leaves, leaves):
        if tuple(got.shape) != tuple(np.shape(want)) or \
                np.asarray(got).dtype != np.asarray(want).dtype:
            raise ValueError(
                f"leaf {_keystr(kp)!r} mismatch: checkpoint "
                f"{got.shape}/{np.asarray(got).dtype} vs template "
                f"{np.shape(want)}/{np.asarray(want).dtype} — config mismatch?"
            )
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return (state, extra) if return_extra else state
