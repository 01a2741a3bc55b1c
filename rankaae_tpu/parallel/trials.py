"""Multi-trial parallelism: the ipyparallel replacement.

The reference runs N hyperparameter-identical trials as N OS processes over
ZeroMQ (``sc/cmd/train_sc.py:25-45``, ``run_training.sh:15``), one device per
trial, results pickled back at the end.  TPU-native design (SURVEY.md §2.8):

* stack per-trial (params, opt-states, rng) on a leading **trial axis**;
* ``vmap`` the whole jitted training run over that axis;
* shard the trial axis over the device mesh with ``jax.sharding`` — each
  core trains its resident trials in lockstep, the dataset is replicated
  (it's ~7 MB), and there is **zero inter-trial communication** during
  training — exactly the reference's communication pattern, minus the
  ZeroMQ hub.  Best-model selection afterwards is one tiny argmin on host.
* trials > cores: the trial axis is padded to a multiple of the mesh and
  excess lanes are sliced off afterwards (they cost idle FLOPs, not
  correctness).

This layer is where the >=20x wall-clock target comes from: 8+ trials train
concurrently per chip-second instead of queueing on a process pool.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rankaae_tpu.train.trainer import (
    SWEEPABLE_HPARAMS,
    RankAAETrainer,
    TrialData,
)
from rankaae_tpu.utils.config import TrainConfig


@dataclasses.dataclass
class TrialResults:
    """Stacked results with the trial axis leading (host numpy)."""

    n_trials: int
    final_params: Dict[str, Any]        # leaves (T, ...)
    final_batch_stats: Dict[str, Any]
    best_params: Dict[str, Any]
    best_batch_stats: Dict[str, Any]
    best_epoch: np.ndarray              # (T,)
    best_combined: np.ndarray           # (T,)
    logs: Dict[str, np.ndarray]         # (T, E, ...)
    final_metrics: np.ndarray           # (T, 5) reference-format metric list
    # min-val-recon tracked model (the `use_best_checkpoint` target)
    best_recon_params: Dict[str, Any]
    best_recon_batch_stats: Dict[str, Any]
    best_recon_epoch: np.ndarray        # (T,)
    best_recon: np.ndarray              # (T,)

    def trial(self, i: int):
        """Per-trial view (params, batch_stats, best_params, best_stats, logs)."""
        take = lambda tree: jax.tree_util.tree_map(lambda x: x[i], tree)
        return {
            "final_params": take(self.final_params),
            "final_batch_stats": take(self.final_batch_stats),
            "best_params": take(self.best_params),
            "best_batch_stats": take(self.best_batch_stats),
            "best_epoch": int(self.best_epoch[i]),
            "best_combined": float(self.best_combined[i]),
            "best_recon_params": take(self.best_recon_params),
            "best_recon_batch_stats": take(self.best_recon_batch_stats),
            "best_recon_epoch": int(self.best_recon_epoch[i]),
            "best_recon": float(self.best_recon[i]),
            "logs": {k: v[i] for k, v in self.logs.items()},
            "final_metrics": self.final_metrics[i],
        }


def trial_mesh(devices=None) -> Mesh:
    """A 1-D mesh over all (or given) devices with axis name 'trial'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(mesh_utils.create_device_mesh((len(devices),), devices=devices), ("trial",))


def trial_dp_mesh(n_dp: int = 2, devices=None) -> Mesh:
    """A 2-D ``trial x dp`` mesh: axis 'trial' shards resident trials (zero
    inter-trial communication), axis 'dp' shards the DATASET's row axis
    across ``n_dp`` devices — XLA inserts the all-gathers that materialize
    each minibatch from its row shards.  Useful when few distinct trials
    must each see a dataset too large to replicate per device; for the
    reference-sized workload (~7 MB dataset) the 1-D :func:`trial_mesh` is
    the faster default.  ``run_trials(mesh=trial_dp_mesh(...))`` is the
    production entry point for this layout."""
    if devices is None:
        devices = jax.devices()
    if len(devices) % n_dp:
        raise ValueError(f"{len(devices)} devices not divisible by n_dp={n_dp}")
    return Mesh(
        mesh_utils.create_device_mesh((len(devices) // n_dp, n_dp),
                                      devices=devices),
        ("trial", "dp"),
    )


def _trial_lanes(mesh: Mesh) -> int:
    """Concurrent trial lanes on a mesh (its 'trial' axis, or every device
    for a mesh without one)."""
    return mesh.shape.get("trial", mesh.devices.size)


def _data_sharding(mesh: Mesh, data: TrialData) -> NamedSharding:
    """Row-shard the dataset over the mesh's 'dp' axis when present (and
    every split divides evenly); replicate otherwise."""
    if "dp" in mesh.axis_names:
        n_dp = mesh.shape["dp"]
        leaves = jax.tree_util.tree_leaves(data)
        if all(leaf.shape[0] % n_dp == 0 for leaf in leaves):
            return NamedSharding(mesh, P("dp"))
    return NamedSharding(mesh, P())


def run_trials(
    cfg: TrainConfig,
    data: TrialData,
    n_trials: Optional[int] = None,
    seed: int = 0,
    mesh: Optional[Mesh] = None,
    max_resident_per_device: float = 64,
    checkpoint_every: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    on_segment=None,
    lr_scales=None,
    sweep=None,
) -> TrialResults:
    """Train ``n_trials`` independent trials concurrently across the mesh.

    Equivalent of the reference's load-balanced ``map_sync(run_training,
    range(trials))`` (``train_sc.py:134-143``) — as one compiled program.

    When ``n_trials`` exceeds ``max_resident_per_device * n_devices`` the
    trials run in sequential waves (same compiled program, fresh RNG lanes)
    to bound HBM — the analog of the reference's task queue when trials >
    engines.

    ``lr_scales`` (net-new, shape ``(n_trials,)``): per-trial multiplier on
    every optimizer's learning rate, turning the trial axis into a
    hyperparameter-SWEEP axis — the reference's process pool can only run
    identical configurations.  All trials still share one compiled program
    (lr is runtime plateau state).

    ``sweep`` (net-new): dict of per-trial arrays for the runtime-safe
    config knobs (``trainer.SWEEPABLE_HPARAMS``: spec_noise, alpha_limit,
    alpha_flat_step), e.g. ``sweep={"spec_noise": np.linspace(0, 0.05, 8)}``.
    Composable with ``lr_scales``.

    ``mesh`` may be 1-D (:func:`trial_mesh`, the default: data replicated)
    or 2-D (:func:`trial_dp_mesh`): the 'trial' axis shards trials, the
    'dp' axis row-shards the dataset and XLA inserts the gather
    collectives — for datasets too large to replicate per device.
    """
    n_trials = cfg.trials if n_trials is None else n_trials
    if mesh is None:
        mesh = trial_mesh()
    n_dev = _trial_lanes(mesh)
    if lr_scales is not None:
        lr_scales = np.asarray(lr_scales, np.float32)
        if lr_scales.shape != (n_trials,):
            raise ValueError(
                f"lr_scales must have shape ({n_trials},), got {lr_scales.shape}"
            )
        if cfg.optimizer_name == "AdaBound":
            # AdaBound's bound target uses a static base_lr captured at
            # optimizer construction; scaling only the runtime lr would make
            # swept trials correspond to no real AdaBound configuration
            raise NotImplementedError(
                "lr_scales is not supported with AdaBound (its lr-bound "
                "schedule depends on a static base_lr); sweep Adam/AdamW/"
                "RAdam, or run separate AdaBound configs"
            )

    if sweep is not None:
        sweep = {k: np.asarray(v, np.float32) for k, v in sweep.items()}
        for k, v in sweep.items():
            if k not in SWEEPABLE_HPARAMS:
                raise KeyError(
                    f"{k!r} is not sweepable; choose from {SWEEPABLE_HPARAMS}")
            if v.shape != (n_trials,):
                raise ValueError(
                    f"sweep[{k!r}] must have shape ({n_trials},), got {v.shape}")

    _check_scan_unroll(cfg, mesh.devices.flat[0].platform)
    max_resident_per_device = _safe_resident_cap(
        cfg, mesh.devices.flat[0].platform, max_resident_per_device)
    max_wave = max(1, int(max_resident_per_device * n_dev))
    if n_trials > max_wave:
        import os

        waves = []
        done = 0
        w = 0
        while done < n_trials:
            take = min(max_wave, n_trials - done)
            # each wave checkpoints into its own subdirectory; on resume,
            # completed waves reload their persisted state+logs instantly
            # and the interrupted wave picks up at its last segment
            wave_dir = None if checkpoint_dir is None else \
                os.path.join(checkpoint_dir, f"wave_{w:03d}")
            waves.append(_run_wave(
                cfg, data, take, seed + done, mesh,
                checkpoint_every=checkpoint_every,
                checkpoint_dir=wave_dir,
                on_segment=on_segment,
                trial_offset=done,
                allow_completed=True,
                lr_scales=None if lr_scales is None
                else lr_scales[done:done + take],
                sweep=None if sweep is None
                else {k: v[done:done + take] for k, v in sweep.items()}))
            done += take
            w += 1
        return _concat_results(waves)
    return _run_wave(cfg, data, n_trials, seed, mesh,
                     checkpoint_every=checkpoint_every,
                     checkpoint_dir=checkpoint_dir,
                     on_segment=on_segment,
                     lr_scales=lr_scales,
                     sweep=sweep)


#: On-chip-validated resident-trial ceiling for rematerialized conv forms:
#: remat + 32 residents crashes the TPU worker after a ~27-minute compile
#: (README known-limit); 8 residents is validated and throughput-optimal.
REMAT_TPU_RESIDENT_CAP = 8


def _check_scan_unroll(cfg, platform: str) -> None:
    """``scan_unroll > 1`` is CPU-mesh-experimental: at flagship scale on
    the tunneled TPU the unrolled batch body blew the remote compile helper
    up exactly like remat x 32 residents did (round-4 measurement — a
    41-minute compile followed by helper death).  Refuse on TPU rather
    than let an accepted config kill the worker."""
    if getattr(cfg, "scan_unroll", 1) > 1 and platform == "tpu":
        raise NotImplementedError(
            "scan_unroll > 1 is not supported on TPU (the unrolled batch "
            "body crashes the remote compile helper at flagship scale); "
            "use it on the CPU mesh for scheduling experiments only"
        )


def _safe_resident_cap(cfg, platform: str, max_resident_per_device: float) -> float:
    """Clamp ``max_resident_per_device`` to the validated region.  The
    known-crashing configuration (conv-form ``remat: true`` with >8
    resident trials per TPU device) is silently split into sequential
    waves instead of being allowed to kill the TPU worker — no config
    accepted by ``TrainConfig.validate()`` can reach the crash region."""
    if (getattr(cfg, "remat", False) and platform == "tpu"
            and cfg.ae_form in ("normal", "compact")
            and max_resident_per_device > REMAT_TPU_RESIDENT_CAP):
        import logging

        logging.getLogger("rankaae_tpu").warning(
            "remat: true with %s resident trials/device on TPU is outside "
            "the validated region (crashes the TPU worker at 32); capping "
            "residents at %d per device — excess trials run as sequential "
            "waves", max_resident_per_device, REMAT_TPU_RESIDENT_CAP)
        return float(REMAT_TPU_RESIDENT_CAP)
    return max_resident_per_device


def _concat_results(waves):
    cat = lambda trees: jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs, axis=0), *trees
    )
    return TrialResults(
        n_trials=sum(w.n_trials for w in waves),
        final_params=cat([w.final_params for w in waves]),
        final_batch_stats=cat([w.final_batch_stats for w in waves]),
        best_params=cat([w.best_params for w in waves]),
        best_batch_stats=cat([w.best_batch_stats for w in waves]),
        best_epoch=np.concatenate([w.best_epoch for w in waves]),
        best_combined=np.concatenate([w.best_combined for w in waves]),
        best_recon_params=cat([w.best_recon_params for w in waves]),
        best_recon_batch_stats=cat([w.best_recon_batch_stats for w in waves]),
        best_recon_epoch=np.concatenate([w.best_recon_epoch for w in waves]),
        best_recon=np.concatenate([w.best_recon for w in waves]),
        logs=cat([w.logs for w in waves]),
        final_metrics=np.concatenate([w.final_metrics for w in waves]),
    )


def _run_wave(
    cfg: TrainConfig,
    data: TrialData,
    n_trials: int,
    seed: int,
    mesh: Mesh,
    checkpoint_every: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    on_segment=None,
    trial_offset: int = 0,
    allow_completed: bool = False,
    lr_scales=None,
    sweep=None,
) -> TrialResults:
    """One resident wave of trials; optionally segmented with mid-run
    checkpoints (``checkpoint_every`` epochs) that a rerun can restart
    from — fault tolerance the reference lacks (SURVEY.md §5).

    ``on_segment(e0, e1, seg_logs, states, trial_offset=0)`` is invoked
    after each segment with the host-side stacked logs for epochs [e0, e1)
    and the current (device) train states — used by the CLI for incremental
    losses.csv rows and per-improvement checkpoint files.  ``trial_offset``
    is this wave's position on the global trial axis.

    Alongside the resumable state, every checkpoint persists the cumulative
    epoch logs (``logs.npz``), so a resumed run returns the FULL log history
    and a fully-completed wave (``allow_completed``) reconstructs its
    results without retraining."""
    import json
    import os

    from rankaae_tpu.utils.checkpoint import load_train_state, save_train_state

    n_lanes = _trial_lanes(mesh)
    t_pad = -(-n_trials // n_lanes) * n_lanes  # pad to a multiple of the lanes

    trainer = RankAAETrainer(
        cfg, n_train=data.train_spec.shape[0], n_val=data.val_spec.shape[0]
    )
    keys = jax.random.split(jax.random.PRNGKey(seed), t_pad)
    scales = jnp.ones((t_pad,), jnp.float32)
    if lr_scales is not None:
        scales = scales.at[:n_trials].set(jnp.asarray(lr_scales, jnp.float32))
    hp = None
    if sweep is not None:
        # padded lanes train at the config defaults
        hp = {}
        for k, v in sweep.items():
            full = jnp.full((t_pad,), getattr(cfg, k), jnp.float32)
            hp[k] = full.at[:n_trials].set(jnp.asarray(v, jnp.float32))

    trial_sharding = NamedSharding(mesh, P("trial"))
    data_sharding = _data_sharding(mesh, data)

    @jax.jit
    def init_all(keys, scales, hp):
        return jax.vmap(trainer.init_state)(keys, scales, hp)

    start_epoch = 0
    log_parts = []
    states = init_all(keys, scales, hp)
    if checkpoint_dir:
        progress_fn = os.path.join(checkpoint_dir, "progress.json")
        state_fn = os.path.join(checkpoint_dir, "trial_state.mpk")
        logs_fn = os.path.join(checkpoint_dir, "logs.npz")
        if os.path.exists(progress_fn) and os.path.exists(state_fn):
            with open(progress_fn) as f:
                progress = json.load(f)
            saved_scales = progress.get("lr_scales")
            want_scales = None if lr_scales is None else \
                [float(x) for x in lr_scales]
            saved_sweep = progress.get("sweep")
            want_sweep = None if sweep is None else \
                {k: [float(x) for x in v] for k, v in sweep.items()}
            if progress.get("n_trials") == n_trials and \
                    progress.get("seed") == seed:
                if saved_scales != want_scales or saved_sweep != want_sweep:
                    # the checkpointed optimizer lrs/hparams embody the
                    # ORIGINAL sweep; silently relabeling them would corrupt
                    # the sweep's record (messages.txt logs the new scales)
                    raise ValueError(
                        "resume sweep mismatch: checkpoint was trained with "
                        f"lr_scales={saved_scales}, sweep={saved_sweep}; "
                        f"resume requested lr_scales={want_scales}, "
                        f"sweep={want_sweep}"
                    )
                states, state_extra = load_train_state(
                    state_fn, states, return_extra=True)
                # The state file embeds the epoch it corresponds to, so a
                # crash between the per-segment file writes can never leave
                # state and epoch disagreeing; progress.json's epoch is the
                # fallback for pre-epoch-embedding checkpoints.
                start_epoch = int(state_extra.get("epoch", progress["epoch"]))
                if os.path.exists(logs_fn):
                    with np.load(logs_fn) as z:
                        # Truncate to the state's epoch: logs.npz is written
                        # before the state file, so a crash in that window
                        # can leave logs with epochs past the state —
                        # replaying the segment would duplicate them.
                        log_parts.append(
                            {k: z[k][:, :start_epoch] for k in z.files})
    states = jax.device_put(states, trial_sharding)
    data = jax.device_put(data, data_sharding)

    run_seg = jax.jit(
        jax.vmap(trainer.run_epochs, in_axes=(0, None, None)),
        donate_argnums=(0,),
    )

    if start_epoch >= cfg.max_epoch and not (allow_completed and log_parts):
        raise ValueError(
            f"checkpoint in {checkpoint_dir} is already complete "
            f"(epoch {start_epoch} >= max_epoch {cfg.max_epoch})"
        )
    seg = checkpoint_every or (cfg.max_epoch - start_epoch)
    e0 = start_epoch
    while e0 < cfg.max_epoch:
        e1 = min(e0 + seg, cfg.max_epoch)
        states, seg_logs = run_seg(states, data, jnp.arange(e0, e1))
        seg_host = jax.tree_util.tree_map(np.asarray, seg_logs)
        log_parts.append(seg_host)
        if on_segment is not None:
            on_segment(e0, e1, jax.tree_util.tree_map(
                lambda x: x[:n_trials], seg_host), states, trial_offset)
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
            # Write order matters for crash consistency: logs first, then
            # the state (which embeds its own epoch), then progress.  On
            # resume the state's embedded epoch is authoritative and logs
            # are truncated to it, so every crash window replays cleanly.
            cum = log_parts[0] if len(log_parts) == 1 else \
                jax.tree_util.tree_map(
                    lambda *xs: np.concatenate(xs, axis=1), *log_parts)
            logs_tmp = os.path.join(checkpoint_dir, "logs.tmp.npz")
            np.savez(logs_tmp, **cum)
            os.replace(logs_tmp, os.path.join(checkpoint_dir, "logs.npz"))
            save_train_state(os.path.join(checkpoint_dir, "trial_state.mpk"),
                             states, extra={"epoch": e1})
            with open(os.path.join(checkpoint_dir, "progress.json"), "w") as f:
                json.dump({"epoch": e1, "n_trials": n_trials, "seed": seed,
                           "lr_scales": None if lr_scales is None
                           else [float(x) for x in lr_scales],
                           "sweep": None if sweep is None
                           else {k: [float(x) for x in v]
                                 for k, v in sweep.items()}}, f)
        e0 = e1

    if len(log_parts) == 1:
        logs = log_parts[0]
    else:
        logs = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=1), *log_parts
        )

    # gather to host, drop padding lanes
    host = lambda tree: jax.tree_util.tree_map(
        lambda x: np.asarray(x)[:n_trials], tree
    )
    logs_h = host(logs)
    return TrialResults(
        n_trials=n_trials,
        final_params=host(states.params),
        final_batch_stats=host(states.batch_stats),
        best_params=host(states.best_params),
        best_batch_stats=host(states.best_batch_stats),
        best_epoch=np.asarray(states.best_epoch)[:n_trials],
        best_combined=np.asarray(states.best_combined)[:n_trials],
        best_recon_params=host(states.best_recon_params),
        best_recon_batch_stats=host(states.best_recon_batch_stats),
        best_recon_epoch=np.asarray(states.best_recon_epoch)[:n_trials],
        best_recon=np.asarray(states.best_recon)[:n_trials],
        logs=logs_h,
        final_metrics=logs_h["metrics"][:, -1, :],
    )
