"""Reference-compatible ``Trainer`` facade.

The reference's public training API is
``Trainer.from_data(csv_fn, ..., config_parameters).train(callback)``
(``sc/clustering/trainer.py:65,411-474``).  This facade preserves that
surface over the jitted core: ``from_data`` builds the device-resident data
and compiled trainer, ``train`` runs the whole compiled program, writes the
reference artifact layout (losses.csv, final/best bundles) into ``work_dir``
and returns the final metrics list ``[min shapiro-W, val recon MSE, avg
train MI, max inter-style |rho|, val kendall]`` (``trainer.py:294-295``).

``callback(epoch, metrics)`` parity note: the reference invokes it inside
the epoch loop purely as an observer (``trainer.py:306-307``; unused by any
in-tree caller).  Here the run is one XLA program, so the callback is
invoked after the compiled run over the recorded per-epoch metrics —
identical call sequence, deferred timing.
"""
from __future__ import annotations

import logging
import os
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rankaae_tpu.data.dataset import load_split_arrays
from rankaae_tpu.train.trainer import RankAAETrainer, TrainState, TrialData
from rankaae_tpu.utils.checkpoint import save_model_bundle
from rankaae_tpu.utils.config import Parameters, TrainConfig
from rankaae_tpu.utils.logging import write_losses_csv


class Trainer:
    """Single-trial facade with the reference's construction/run interface."""

    def __init__(self, core: RankAAETrainer, data: TrialData, work_dir: str = ".",
                 seed: int = 0, verbose: bool = True,
                 logger: Optional[logging.Logger] = None):
        self.core = core
        self.data = data
        self.work_dir = work_dir
        self.seed = seed
        self.verbose = verbose
        self.logger = logger or logging.getLogger("training")
        self.state: Optional[TrainState] = None
        self.logs = None

    @classmethod
    def from_data(
        cls,
        csv_fn: str,
        igpu: int = 0,                      # accepted for API parity; one chip
        verbose: bool = True,
        work_dir: str = ".",
        train_ratio: float = 0.7,
        validation_ratio: float = 0.15,
        test_ratio: float = 0.15,
        config_parameters: Parameters = None,
        logger: Optional[logging.Logger] = None,
        loss_logger=None,                   # losses.csv is written by train()
        seed: int = 0,
    ) -> "Trainer":
        cfg = TrainConfig.from_parameters(config_parameters).replace(
            train_ratio=train_ratio,
            validation_ratio=validation_ratio,
            test_ratio=test_ratio,
        )
        splits = load_split_arrays(
            csv_fn, (train_ratio, validation_ratio, test_ratio), cfg.n_aux
        )
        data = TrialData(
            train_spec=jnp.asarray(splits["train"].spec),
            train_aux=jnp.asarray(splits["train"].aux),
            val_spec=jnp.asarray(splits["val"].spec),
            val_aux=jnp.asarray(splits["val"].aux),
        )
        core = RankAAETrainer(cfg, n_train=len(splits["train"]),
                              n_val=len(splits["val"]))
        return cls(core, data, work_dir=work_dir, seed=seed, verbose=verbose,
                   logger=logger)

    def train(self, callback: Optional[Callable] = None) -> List[float]:
        cfg = self.core.cfg
        state = self.core.init_state(jax.random.PRNGKey(self.seed))
        state, logs = jax.jit(self.core.run)(state, self.data)
        self.state = state
        self.logs = jax.tree_util.tree_map(np.asarray, logs)

        os.makedirs(self.work_dir, exist_ok=True)
        write_losses_csv(os.path.join(self.work_dir, "losses.csv"), self.logs)
        save_model_bundle(
            os.path.join(self.work_dir, "final.mpk"),
            state.params, state.batch_stats, cfg,
        )
        save_model_bundle(
            os.path.join(self.work_dir, "best_tracked.mpk"),
            state.best_params, state.best_batch_stats, cfg,
            extra={"best_epoch": int(state.best_epoch),
                   "best_combined": float(state.best_combined)},
        )
        save_model_bundle(
            os.path.join(self.work_dir, "best_recon.mpk"),
            state.best_recon_params, state.best_recon_batch_stats, cfg,
            extra={"best_recon_epoch": int(state.best_recon_epoch),
                   "best_recon_mse": float(state.best_recon)},
        )

        metrics_all = self.logs["metrics"]
        if callback is not None:
            for epoch in range(metrics_all.shape[0]):
                callback(epoch, [float(m) for m in metrics_all[epoch]])

        metrics = [float(m) for m in metrics_all[-1]]
        if self.verbose:
            self.logger.info(metrics)
        return metrics

    def get_style_distribution_plot(self, z):
        """Stacked per-style histograms of a latent batch ``z`` (B, nstyle).

        Same figure contract as the reference's unused trainer hook
        (``sc/clustering/trainer.py:323-330``): nstyle shared-axis rows,
        step-style histograms over bins ``arange(-3, 3.01, 0.2)``.
        """
        # build via Figure directly — no pyplot, so the user's interactive
        # backend is left untouched (the reference hook never switches it)
        from matplotlib.figure import Figure

        z = np.asarray(z)
        nstyle = self.core.cfg.nstyle
        fig = Figure(figsize=(9, 12))
        ax_list = fig.subplots(nstyle, 1, sharex=True, sharey=True)
        bins = np.arange(-3.0, 3.01, 0.2)
        for istyle, ax in zip(range(nstyle), np.atleast_1d(ax_list)):
            ax.hist(z[:, istyle], bins=bins, color="blue",
                    histtype="stepfilled", edgecolor="blue")
        return fig
