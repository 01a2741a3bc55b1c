"""``train_sc`` equivalent: multi-trial training driver.

Reference CLI contract (``sc/cmd/train_sc.py:105-157``):
``train_sc -c config.yaml [-w work_dir]`` reads the YAML from the work dir,
runs ``trials`` hyperparameter-identical trainings, writes per-trial
``training/job_<i>/{messages.txt, losses.csv, final.*}`` and a
``main_process_message.txt`` with per-trial and total wall times.

TPU-native difference: no ipcluster — one process drives the whole mesh, all
trials train concurrently as a vmapped axis (``rankaae_tpu.parallel``).  The
reference's per-trial SIGALRM timeout (``train_sc.py:21-22,91-97``) becomes a
total wall-clock alarm around the compiled run: trials advance in lockstep,
so a per-trial deadline and a total deadline coincide.
"""
from __future__ import annotations

import argparse
import os
import signal
import time

import jax
import jax.numpy as jnp
import numpy as np

from rankaae_tpu.data.dataset import load_split_arrays
from rankaae_tpu.parallel.trials import run_trials
from rankaae_tpu.train.trainer import TrialData
from rankaae_tpu.utils.checkpoint import save_model_bundle
from rankaae_tpu.utils.config import Parameters, TrainConfig
from rankaae_tpu.utils.logging import create_logger, write_losses_csv


def _timeout_handler(signum, frame):
    raise TimeoutError("Training Overtime!")


def train_from_config(work_dir: str, params: Parameters, seed: int = 0,
                      checkpoint_every=None, resume: bool = False,
                      lr_scales=None):
    """Run the full multi-trial training + artifact dump. Returns TrialResults."""
    cfg = TrainConfig.from_parameters(params)
    logger = create_logger(
        "Main training:", os.path.join(work_dir, "main_process_message.txt"), append=True
    )
    logger.info("START")

    data_file = os.path.join(work_dir, params.get("data_file"))
    splits = load_split_arrays(
        data_file, (cfg.train_ratio, cfg.validation_ratio, cfg.test_ratio), cfg.n_aux
    )
    data = TrialData(
        train_spec=jnp.asarray(splits["train"].spec),
        train_aux=jnp.asarray(splits["train"].aux),
        val_spec=jnp.asarray(splits["val"].spec),
        val_aux=jnp.asarray(splits["val"].aux),
    )

    import jax

    logger.info(
        f"Running {cfg.trials} trial(s) on {len(jax.devices())} device(s): "
        f"{[str(d) for d in jax.devices()]}"
    )

    timeout_s = int(cfg.timeout * 3600)
    if timeout_s > 0 and hasattr(signal, "SIGALRM"):
        signal.signal(signal.SIGALRM, _timeout_handler)
        signal.alarm(timeout_s)
    start = time.time()
    checkpoint_dir = os.path.join(work_dir, "train_state") \
        if (checkpoint_every or resume) else None

    on_segment = None
    if checkpoint_dir:
        from rankaae_tpu.utils.logging import append_losses_csv

        last_best = {}

        def on_segment(e0, e1, seg_logs, states, trial_offset=0):
            # incremental losses.csv: rows survive a crash and resume
            # continues appending where the last segment stopped.
            # seg_logs/states cover ONE wave; trial_offset maps wave lane i
            # to global job number trial_offset + i + 1.
            best_epoch = np.asarray(states.best_epoch)
            best_combined = np.asarray(states.best_combined)
            n_wave = next(iter(seg_logs.values())).shape[0]
            for i in range(n_wave):
                g = trial_offset + i
                job_dir = os.path.join(work_dir, "training", f"job_{g+1}")
                os.makedirs(job_dir, exist_ok=True)
                trial_logs = {k: v[i] for k, v in seg_logs.items()
                              if k != "metrics"}
                append_losses_csv(
                    os.path.join(job_dir, "losses.csv"), trial_logs, e0
                )
                # per-improvement checkpoint files, the reference's
                # checkpoints/epoch_*_loss_*.pt cadence (trainer.py:297-301)
                # at segment granularity: when this segment produced a new
                # best, a new file accumulates alongside earlier ones
                if np.isfinite(best_combined[i]) and \
                        best_combined[i] < last_best.get(g, np.inf):
                    last_best[g] = float(best_combined[i])
                    take = lambda tree: jax.tree_util.tree_map(
                        lambda x: np.asarray(x[i]), tree)
                    save_model_bundle(
                        os.path.join(
                            job_dir, "checkpoints",
                            f"epoch_{int(best_epoch[i]):06d}"
                            f"_loss_{best_combined[i]:07.6g}.mpk",
                        ),
                        take(states.best_params), take(states.best_batch_stats),
                        cfg,
                        extra={"best_epoch": int(best_epoch[i]),
                               "best_combined": float(best_combined[i])},
                    )

    try:
        results = run_trials(cfg, data, seed=seed,
                             checkpoint_every=checkpoint_every,
                             checkpoint_dir=checkpoint_dir,
                             on_segment=on_segment,
                             lr_scales=lr_scales)
    finally:
        if timeout_s > 0 and hasattr(signal, "SIGALRM"):
            signal.alarm(0)
    total = time.time() - start

    # per-trial artifacts (reference train_sc.py:48-102 layout)
    if cfg.bn_recalibrate:
        # SWA-style update_bn before every saved bundle (net-new, opt-in):
        # replace BN running stats with full-train-set statistics so
        # eval-mode deployment matches the trained model's activations
        # (models/recalibrate.py; motivating data in PARITY_RESULTS_CONV.md)
        from rankaae_tpu.models.recalibrate import recalibrate_batch_stats
    if cfg.amp_recalibrate:
        # one-scalar deployment gain per bundle (net-new, opt-in): the flex
        # recon objective leaves a coherent output-amplitude drift
        # unconstrained; InferenceModel divides decoder outputs by the
        # manifest's amp_gain (models/recalibrate.py:amplitude_gain)
        from rankaae_tpu.models.recalibrate import amplitude_gain

    for i in range(results.n_trials):
        job_dir = os.path.join(work_dir, "training", f"job_{i+1}")
        os.makedirs(job_dir, exist_ok=True)
        tr = results.trial(i)
        if cfg.bn_recalibrate:
            for pk, sk in (("final_params", "final_batch_stats"),
                           ("best_params", "best_batch_stats"),
                           ("best_recon_params", "best_recon_batch_stats")):
                tr[sk] = jax.tree_util.tree_map(
                    np.asarray,
                    recalibrate_batch_stats(cfg, tr[pk], tr[sk],
                                            data.train_spec))
        job_logger = create_logger(f"subtraining_{i+1}",
                                   os.path.join(job_dir, "messages.txt"))
        job_logger.info(f"Training started for trial {i+1}.")
        if lr_scales is not None:
            job_logger.info(f"lr_scale: {float(lr_scales[i]):.6g} "
                            f"(sweep over the trial axis)")
        if checkpoint_dir is None:
            # (incremental mode already wrote losses.csv per segment)
            write_losses_csv(os.path.join(job_dir, "losses.csv"), tr["logs"])
        final_extra = {"final_metrics": [float(x) for x in tr["final_metrics"]]}
        if lr_scales is not None:
            final_extra["lr_scale"] = float(lr_scales[i])
        if cfg.amp_recalibrate:
            final_extra["amp_gain"] = amplitude_gain(
                cfg, tr["final_params"], tr["final_batch_stats"],
                data.train_spec)
        save_model_bundle(
            os.path.join(job_dir, "final.mpk"),
            tr["final_params"], tr["final_batch_stats"], cfg,
            extra=final_extra,
        )
        # net-new: the true best (min combined metric) — the reference's
        # best.pt gate is dead code (SURVEY.md §2.4 / trainer docstring)
        best_extra = {"best_epoch": tr["best_epoch"], "best_combined": tr["best_combined"]}
        if lr_scales is not None:
            best_extra["lr_scale"] = float(lr_scales[i])
        if cfg.amp_recalibrate:
            best_extra["amp_gain"] = amplitude_gain(
                cfg, tr["best_params"], tr["best_batch_stats"],
                data.train_spec)
        save_model_bundle(
            os.path.join(job_dir, "best_tracked.mpk"),
            tr["best_params"], tr["best_batch_stats"], cfg, extra=best_extra,
        )
        # net-new: best-RECONSTRUCTION model (min val recon MSE) — the
        # `use_best_checkpoint` deployment target; min-combined fires in the
        # first ~100 epochs and selects far worse reconstructors
        # (PARITY_RESULTS_1500.md)
        recon_extra = {"best_recon_epoch": tr["best_recon_epoch"],
                       "best_recon_mse": tr["best_recon"]}
        if lr_scales is not None:
            recon_extra["lr_scale"] = float(lr_scales[i])
        if cfg.amp_recalibrate:
            recon_extra["amp_gain"] = amplitude_gain(
                cfg, tr["best_recon_params"], tr["best_recon_batch_stats"],
                data.train_spec)
        save_model_bundle(
            os.path.join(job_dir, "best_recon.mpk"),
            tr["best_recon_params"], tr["best_recon_batch_stats"], cfg,
            extra=recon_extra,
        )
        # reference checkpoint-directory layout (trainer.py:77,300):
        # checkpoints/epoch_<e>_loss_<combined>.<ext>
        chkpt = os.path.join(
            job_dir, "checkpoints",
            f"epoch_{tr['best_epoch']:06d}_loss_{tr['best_combined']:07.6g}.mpk",
        )
        save_model_bundle(chkpt, tr["best_params"], tr["best_batch_stats"], cfg,
                          extra=best_extra)
        job_logger.info(list(np.round(tr["final_metrics"], 6)))
        job_logger.info(
            f"Training finished. Time used: {total:.2f}s (concurrent with all trials).\n\n"
        )

    per_trial = total / max(results.n_trials, 1)
    logger.info(
        f"Time used for each trial: {per_trial:.2f} +/- 0.00s (lockstep).\n"
        + " ".join([f"{per_trial:.2f}s"] * results.n_trials)
    )
    logger.info(
        f"Total time used: {total:.2f}s for {results.n_trials} trails "
        f"({per_trial:.2f} each on average)."
    )
    logger.info("END\n\n")
    return results


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="Config for training parameter in YAML format")
    parser.add_argument("-w", "--work_dir", type=str, default=".",
                        help="Working directory to write the output files")
    parser.add_argument("--seed", type=int, default=0, help="Base RNG seed")
    parser.add_argument("--debug-nans", action="store_true",
                        help="Enable jax_debug_nans (analog of the reference's "
                             "always-on autograd anomaly detection)")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="Write a jax.profiler trace of the training run")
    parser.add_argument("--checkpoint-every", type=int, default=None,
                        help="Save resumable training state every N epochs")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from <work_dir>/train_state if present")
    parser.add_argument("--lr-sweep", type=str, default=None, metavar="LO,HI",
                        help="Sweep the base learning rate geometrically "
                             "across the trial axis: trial i gets lr scaled "
                             "by geomspace(LO, HI, trials)[i].  Net-new: the "
                             "reference pool can only run identical configs.")
    args = parser.parse_args(argv)

    work_dir = os.path.abspath(os.path.expanduser(args.work_dir))
    assert os.path.exists(work_dir)
    params = Parameters.from_yaml(os.path.join(work_dir, args.config))

    from rankaae_tpu.utils.profiling import (
        enable_compilation_cache,
        enable_nan_debugging,
        trace,
    )

    enable_compilation_cache()
    if args.debug_nans:
        enable_nan_debugging(True)
    lr_scales = None
    if args.lr_sweep:
        lo, hi = (float(x) for x in args.lr_sweep.split(","))
        n = int(params.get("trials", 1))
        lr_scales = np.geomspace(lo, hi, n).astype(np.float32)

    with trace(args.profile_dir, label="train_sc"):
        train_from_config(work_dir, params, seed=args.seed,
                          checkpoint_every=args.checkpoint_every,
                          resume=args.resume, lr_scales=lr_scales)


if __name__ == "__main__":
    main()
