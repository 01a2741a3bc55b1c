"""The training core: the reference's 6-loss / 7-optimizer alternating loop
(``sc/clustering/trainer.py:65-315``) as one XLA program.

TPU-first structure
-------------------
* A whole training run is ``lax.scan`` over epochs of ``lax.scan`` over
  batches — zero host round-trips after launch.  The reference syncs to host
  every batch (loss ``.item()``) and every epoch (scipy Shapiro/Spearman,
  ``trainer.py:286-295``); here the per-epoch quality metrics are computed on
  device (``rankaae_tpu.ops.stats``).
* The dataset lives on device; a batch is a gather with a per-epoch permuted
  index matrix.  Full batches run as a ``lax.scan``; the trailing partial
  batch (drop_last=False semantics) is one unrolled step at its own static
  shape — no duplicate samples, torch-identical batch statistics.
* ReduceLROnPlateau is carried scan state (``rankaae_tpu.optim.plateau``),
  and best-model selection is a traced argmin over the combined metric.
* Everything is a pytree of arrays -> ``vmap`` over a stacked trial axis
  replaces the reference's ipyparallel process pool (see
  ``rankaae_tpu.parallel.trials``).

Faithfulness notes (SURVEY.md §7 hard parts)
--------------------------------------------
* The per-batch protocol re-encodes from scratch before every loss and steps
  a dedicated optimizer per loss, in the reference order: adversarial (GRL)
  -> kendall -> reconstruction -> mutual-info -> smoothness
  (``trainer.py:103-204``).  Parameter subsets per optimizer match
  ``trainer.py:333-397`` exactly.
* Train-mode forwards that exist in the reference purely as side effects
  (the dead ``spec_out`` at ``trainer.py:114``, the unused re-encode at
  ``:176``) are replicated as stats-only forwards so BatchNorm running-stat
  trajectories match.
* The reference's best-checkpoint gate initializes ``best=10.0`` and saves
  when ``combined > best`` (``trainer.py:76,297-301``) — since lower
  combined is better and typical values are ~-0.5, that gate never fires
  and ``best.pt`` is effectively never produced.  We replicate the gate
  (``faithful_best_*``) AND additionally track the true best
  (min-combined) model, which the checkpoint layer saves as ``best``.
* Validation reconstruction uses plain MSE even when training uses the flex
  target (``trainer.py:223-228`` passes no ``scale``).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from rankaae_tpu.models.registry import build_autoencoder, build_discriminator
from rankaae_tpu.ops.kendall_pallas import kendall_constraint_auto as kendall_constraint
from rankaae_tpu.ops.losses import (
    alpha_schedule,
    bce_with_logits,
    mse,
    nll_loss,
    recon_loss,
    smoothness_loss,
)
from rankaae_tpu.ops.stats import max_interstyle_spearman, min_style_shapiro
from rankaae_tpu.optim.optimizers import Optimizer, make_optimizer
from rankaae_tpu.optim.plateau import PlateauState, plateau_init, plateau_update
from rankaae_tpu.utils.config import TrainConfig

# reference trainer.py:35-36.  Kept as host numpy: a module-level jnp.array
# would initialize the XLA backend at import time, which breaks
# jax.distributed.initialize (it must run before any backend touch).
import numpy as _np

METRIC_WEIGHTS = _np.array([1.0, -1.0, -0.01, -1.0, -1.0], _np.float32)
GAU_KERNEL_SIZE = 17

# optimizer name -> (param subset keys, lr ratio attr, uses custom betas,
# explicit wd) (reference trainer.py:333-397).  The four optimizers the
# reference constructs WITHOUT weight_decay= (mutual_info / discriminator /
# generator / adversarial) inherit the torch class default — 0.01 for AdamW,
# 0 for Adam and torch_optimizer's RAdam/AdaBound — so "no explicit wd" is
# NOT "no wd" under the shipped AdamW configs.
OPT_SPECS = {
    "reconstruction": (("enc", "dec"), "lr_ratio_Reconn", None, True),
    "mutual_info": (("enc", "dec"), "lr_ratio_Mutual", None, False),
    "smoothness": (("dec",), "lr_ratio_Smooth", None, True),
    "correlation": (("enc",), "lr_ratio_Corr", None, True),
    "discriminator": (("dis",), "lr_ratio_dis", "dis_beta", False),
    "generator": (("enc",), "lr_ratio_gen", "gen_beta", False),
    "adversarial": (("dis", "enc"), "lr_ratio_dis", "dis_beta", False),
}

# torch default weight_decay per optimizer class (applied when the reference
# omits the kwarg; torch.optim.AdamW signature / torch_optimizer docs)
DEFAULT_WD = {"Adam": 0.0, "AdamW": 1e-2, "RAdam": 0.0, "AdaBound": 0.0}


class TrialData(NamedTuple):
    """Device-resident dataset for one training run (shared across trials)."""

    train_spec: jnp.ndarray   # (N_train, dim_in)
    train_aux: jnp.ndarray    # (N_train, n_aux)
    val_spec: jnp.ndarray     # (N_val, dim_in)
    val_aux: jnp.ndarray      # (N_val, n_aux)


class TrainState(NamedTuple):
    params: Dict[str, Any]          # {'enc','dec','dis'} param pytrees
    batch_stats: Dict[str, Any]     # same keys; {} where module has no BN
    opt: Dict[str, Any]             # 7 optimizer MomentStates over subsets
    sched: Dict[str, PlateauState]  # 7 plateau states
    rng: jnp.ndarray
    # true-best tracking (min combined metric)
    best_combined: jnp.ndarray
    best_epoch: jnp.ndarray
    best_params: Dict[str, Any]
    best_batch_stats: Dict[str, Any]
    # faithful-quirk gate (reference trainer.py:76,297-301; never fires)
    faithful_best: jnp.ndarray
    # best-RECONSTRUCTION tracking (min val recon MSE; net-new).  The
    # combined metric weights latent gaussianity/decoupling on par with
    # reconstruction and its minimum fires in the first ~100 epochs on both
    # stacks, selecting 5-14x-worse reconstructors (PARITY_RESULTS_1500.md)
    # — so ``use_best_checkpoint`` deploys THIS model, while ``best_*``
    # above remains the faithful min-combined record.
    best_recon: jnp.ndarray
    best_recon_epoch: jnp.ndarray
    best_recon_params: Dict[str, Any]
    best_recon_batch_stats: Dict[str, Any]
    # runtime-swept hyperparameters (net-new): per-state copies of the
    # config knobs that are numerically safe to vary across vmapped trials.
    # Defaults equal the config; parallel.run_trials(sweep=...) overrides
    # them per trial so ONE compiled program trains many configurations.
    hparams: Dict[str, jnp.ndarray]


#: config knobs sweepable across the trial axis (values used as runtime
#: scalars inside the traced step; everything else is baked into the program)
SWEEPABLE_HPARAMS = ("spec_noise", "alpha_limit", "alpha_flat_step")


class RankAAETrainer:
    """Compiled trainer for one config.  All config fields are static; the
    returned ``run`` function is jittable and vmappable over trials."""

    def __init__(self, cfg: TrainConfig, n_train: int, n_val: int):
        cfg.validate()
        from rankaae_tpu.models.primitives import (
            set_activation_dtype,
            set_matmul_precision,
        )

        # process-level knobs (see TrainConfig docstrings)
        set_matmul_precision(cfg.matmul_precision)
        set_activation_dtype(cfg.activation_dtype)
        jax.config.update(
            "jax_default_prng_impl",
            {"threefry": "threefry2x32", "rbg": "rbg"}[cfg.rng_impl],
        )
        self.cfg = cfg
        self.n_train = n_train
        self.n_val = n_val
        self.n_batch = -(-n_train // cfg.batch_size)
        self.encoder, self.decoder = build_autoencoder(cfg)
        self.discriminator = build_discriminator(cfg)
        self.opts: Dict[str, Optimizer] = {}
        for name, (_, ratio_attr, beta_attr, explicit_wd) in OPT_SPECS.items():
            betas = (0.9, 0.999)
            if beta_attr is not None:
                b = getattr(cfg, beta_attr)
                betas = (0.9 * b, 0.009 * b + 0.99)  # reference trainer.py:369,377,386
            wd = cfg.weight_decay if explicit_wd else DEFAULT_WD[cfg.optimizer_name]
            kw = {}
            if cfg.optimizer_name == "AdaBound":
                kw["base_lr"] = getattr(cfg, ratio_attr) * cfg.lr_base
            self.opts[name] = make_optimizer(
                cfg.optimizer_name, betas=betas, weight_decay=wd, **kw
            )
        if cfg.protocol == "joint":
            # one optimizer over ALL params; lr rides the reconstruction
            # ratio (the per-loss ratios become loss weights, see
            # _train_batch_joint)
            kw = {}
            if cfg.optimizer_name == "AdaBound":
                kw["base_lr"] = cfg.lr_ratio_Reconn * cfg.lr_base
            self.opts["joint"] = make_optimizer(
                cfg.optimizer_name, betas=(0.9, 0.999),
                weight_decay=cfg.weight_decay, **kw
            )
        if cfg.flat_optim:
            from rankaae_tpu.optim.optimizers import flat_optimizer

            self.opts = {k: flat_optimizer(v) for k, v in self.opts.items()}

    # ------------------------------------------------------------------ #
    # forwards
    # ------------------------------------------------------------------ #

    def _fwd(self, module, params, stats, x, *args, train: bool, rngs=None):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
        if train:
            out, mut = module.apply(
                variables, x, *args, train=True, rngs=rngs, mutable=["batch_stats"]
            )
            return out, mut.get("batch_stats", stats)
        return module.apply(variables, x, *args, train=False), stats

    def init_state(self, rng, lr_scale=1.0, hparams=None) -> TrainState:
        """Fresh training state.

        ``lr_scale`` multiplies every optimizer's initial learning rate (the
        plateau schedulers carry lr as runtime state, so it can differ per
        trial under ``vmap`` — net-new hyperparameter sweep over the trial
        axis, see ``parallel.run_trials(lr_scales=...)``).  ``hparams``
        optionally overrides entries of :data:`SWEEPABLE_HPARAMS` (same
        sweep mechanism for the noise/alpha knobs)."""
        cfg = self.cfg
        if (isinstance(lr_scale, (int, float)) and float(lr_scale) != 1.0
                and cfg.optimizer_name == "AdaBound"):
            # AdaBound's bound target uses a static base_lr captured at
            # optimizer construction; scaling only the runtime lr would make
            # the trial correspond to no real AdaBound configuration.  The
            # same guard lives in parallel.run_trials (which checks the
            # CONCRETE lr_scales before tracing); here we must only reject
            # concrete non-unit scalars — under jit(vmap) lr_scale is a
            # traced array of ones when no sweep was requested, and raising
            # on "not a float" would break plain AdaBound training.
            raise NotImplementedError(
                "lr_scale is not supported with AdaBound (its lr-bound "
                "schedule depends on a static base_lr); use Adam/AdamW/"
                "RAdam, or run separate AdaBound configs"
            )
        k_enc, k_dec, k_dis, k_run = jax.random.split(rng, 4)
        rngs = lambda k: {"params": k, "dropout": jax.random.fold_in(k, 1),
                          "noise": jax.random.fold_in(k, 2)}
        spec0 = jnp.zeros((2, cfg.dim_in), jnp.float32)
        z0 = jnp.zeros((2, cfg.nstyle), jnp.float32)
        ev = self.encoder.init(rngs(k_enc), spec0, train=True)
        dv = self.decoder.init(rngs(k_dec), z0, train=True)
        xv = self.discriminator.init(rngs(k_dis), z0, jnp.float32(0.0), train=True)
        params = {"enc": ev["params"], "dec": dv["params"], "dis": xv["params"]}
        batch_stats = {
            "enc": ev.get("batch_stats", {}),
            "dec": dv.get("batch_stats", {}),
            "dis": xv.get("batch_stats", {}),
        }
        opt = {}
        sched = {}
        if cfg.protocol == "joint":
            # single optimizer/scheduler over all params; the carry skips
            # the 7 per-loss moment states entirely
            opt["joint"] = self.opts["joint"].init(params)
            sched["joint"] = plateau_init(cfg.lr_ratio_Reconn * cfg.lr_base)
            if not isinstance(lr_scale, float) or lr_scale != 1.0:
                sched["joint"] = sched["joint"]._replace(
                    lr=sched["joint"].lr * jnp.asarray(lr_scale, jnp.float32))
        else:
            for name, (subset, ratio_attr, _, _) in OPT_SPECS.items():
                sub = {k: params[k] for k in subset}
                opt[name] = self.opts[name].init(sub)
                sched[name] = plateau_init(
                    getattr(cfg, ratio_attr) * cfg.lr_base)
                if not isinstance(lr_scale, float) or lr_scale != 1.0:
                    sched[name] = sched[name]._replace(
                        lr=sched[name].lr * jnp.asarray(lr_scale, jnp.float32))
        hp = {k: jnp.asarray(getattr(cfg, k), jnp.float32)
              for k in SWEEPABLE_HPARAMS}
        if hparams:
            for k, v in hparams.items():
                if k not in SWEEPABLE_HPARAMS:
                    raise KeyError(
                        f"{k!r} is not sweepable; choose from {SWEEPABLE_HPARAMS}")
                hp[k] = jnp.asarray(v, jnp.float32)
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt=opt,
            sched=sched,
            rng=k_run,
            hparams=hp,
            best_combined=jnp.asarray(jnp.inf, jnp.float32),
            best_epoch=jnp.asarray(-1, jnp.int32),
            best_params=jax.tree_util.tree_map(jnp.copy, params),
            best_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
            faithful_best=jnp.asarray(10.0, jnp.float32),
            best_recon=jnp.asarray(jnp.inf, jnp.float32),
            best_recon_epoch=jnp.asarray(-1, jnp.int32),
            best_recon_params=jax.tree_util.tree_map(jnp.copy, params),
            best_recon_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        )

    # ------------------------------------------------------------------ #
    # one optimizer step over a loss
    # ------------------------------------------------------------------ #

    def _opt_step(self, name, loss_fn, params, opt_state, lr):
        """value_and_grad over the optimizer's parameter subset, then update.

        ``loss_fn(sub_params) -> (loss, new_stats)`` must rebuild full params
        from the subset internally.
        """
        subset = OPT_SPECS[name][0]
        sub = {k: params[k] for k in subset}
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(sub)
        new_sub, new_opt = self.opts[name].update(grads, opt_state, sub, lr)
        new_params = {**params, **new_sub}
        return loss, new_params, new_stats, new_opt

    # ------------------------------------------------------------------ #
    # per-batch training protocol (reference trainer.py:103-204)
    # ------------------------------------------------------------------ #

    def _train_batch(self, state: TrainState, spec, aux, alpha, epoch, rng):
        if self.cfg.protocol == "fused":
            return self._train_batch_fused(state, spec, aux, alpha, epoch, rng)
        if self.cfg.protocol == "joint":
            return self._train_batch_joint(state, spec, aux, alpha, epoch, rng)
        cfg = self.cfg
        keys = jax.random.split(rng, 17)
        params, stats, opt, sched = state.params, state.batch_stats, state.opt, state.sched

        # input noise (trainer.py:112)
        spec_in = spec + jax.random.normal(keys[0], spec.shape) * state.hparams["spec_noise"]

        def enc_fwd(p, s, x, k):
            return self._fwd(self.encoder, p, s["enc"], x, train=True,
                             rngs={"dropout": k})

        def dec_fwd(p, s, z, k):
            return self._fwd(self.decoder, p, s["dec"], z, train=True,
                             rngs={"dropout": k})

        def dis_fwd(p, dstats, x, beta, k):
            return self._fwd(self.discriminator, p, dstats, x, beta, train=True,
                             rngs={"dropout": k, "noise": jax.random.fold_in(k, 7)})

        # ---- adversarial / GAN block ---------------------------------- #
        if cfg.gradient_reversal:
            z_real = jax.random.normal(keys[1], (cfg.batch_size, cfg.nstyle))

            def adv_loss(sub):
                # one encoder forward serves both the adversarial loss and
                # the reference's dead decode at trainer.py:113-114 (the
                # decoder stats update rides along as aux, pre-update params)
                styles, enc_stats = enc_fwd(sub["enc"], stats, spec_in, keys[2])
                _, dec_stats = dec_fwd(params["dec"], stats, styles, keys[5])
                if cfg.use_cnn_discriminator:
                    # BN inside the CNN discriminator: the two forwards must
                    # stay sequential (real updates stats seen by fake, as in
                    # torch).  2-class log-softmax head -> NLL objective (the
                    # reference's GRL+CNN combination is type-broken upstream:
                    # BCE against (B, 2) log-probs; PARITY.md ledger)
                    real_pred, ds1 = dis_fwd(sub["dis"], stats["dis"], z_real,
                                             alpha, keys[3])
                    fake_pred, ds2 = dis_fwd(sub["dis"], ds1, styles, alpha, keys[4])
                    loss = nll_loss(real_pred, jnp.ones(real_pred.shape[0], jnp.int32)) + \
                        nll_loss(fake_pred, jnp.zeros(fake_pred.shape[0], jnp.int32))
                else:
                    # FC discriminator is BN-free: one fused (2B, nstyle)
                    # forward replaces two dispatches — identical loss (mean
                    # over each half computed separately) and gradients
                    # styles may be bf16 (activation_dtype); keep the fused
                    # pass in the activation dtype instead of promoting to f32
                    both = jnp.concatenate([z_real.astype(styles.dtype), styles], axis=0)
                    pred, ds2 = dis_fwd(sub["dis"], stats["dis"], both, alpha, keys[3])
                    real_p = pred[: cfg.batch_size].squeeze(-1)
                    fake_p = pred[cfg.batch_size:].squeeze(-1)
                    loss = bce_with_logits(real_p, jnp.ones_like(real_p)) + \
                        bce_with_logits(fake_p, jnp.zeros_like(fake_p))
                return loss, {"enc": enc_stats, "dec": dec_stats, "dis": ds2}

            dis_loss, params, stats, opt_adv = self._opt_step(
                "adversarial", adv_loss, params, opt["adversarial"],
                sched["adversarial"].lr,
            )
            opt = {**opt, "adversarial": opt_adv}
            gen_loss = jnp.float32(0.0)
        else:
            # initial encode+decode side-effect forwards (trainer.py:113-114)
            styles0, enc_stats0 = enc_fwd(params["enc"], stats, spec_in, keys[2])
            _, dec_stats0 = dec_fwd(params["dec"], {**stats, "enc": enc_stats0},
                                    styles0, keys[5])
            stats = {**stats, "enc": enc_stats0, "dec": dec_stats0}

            # D step then G step (trainer.py:128-150).  The reference's label
            # dtypes/losses only type-check for the CNN (2-class log-softmax)
            # discriminator; we implement that protocol and, for the FC
            # 1-logit discriminator, the BCE equivalent (documented deviation:
            # the reference generator step labels fakes 0, which optimizes the
            # wrong direction and is dead code upstream — we label 1).
            z_real = jax.random.normal(keys[1], (cfg.batch_size, cfg.nstyle))

            def d_loss(sub):
                styles, enc_stats = enc_fwd(params["enc"], stats, spec_in, keys[2])
                styles = jax.lax.stop_gradient(styles)
                real_pred, ds1 = dis_fwd(sub["dis"], stats["dis"], z_real, None, keys[3])
                fake_pred, ds2 = dis_fwd(sub["dis"], ds1, styles, None, keys[4])
                if cfg.use_cnn_discriminator:
                    loss = nll_loss(real_pred, jnp.ones(real_pred.shape[0], jnp.int32)) + \
                        nll_loss(fake_pred, jnp.zeros(fake_pred.shape[0], jnp.int32))
                else:
                    rp, fp = real_pred.squeeze(-1), fake_pred.squeeze(-1)
                    loss = bce_with_logits(rp, jnp.ones_like(rp)) + \
                        bce_with_logits(fp, jnp.zeros_like(fp))
                return loss, {**stats, "enc": enc_stats, "dis": ds2}

            dis_loss, params, stats, opt_d = self._opt_step(
                "discriminator", d_loss, params, opt["discriminator"],
                sched["discriminator"].lr,
            )
            opt = {**opt, "discriminator": opt_d}

            def g_loss(sub):
                styles, enc_stats = enc_fwd(sub["enc"], stats, spec_in, keys[6])
                pred, dis_stats = dis_fwd(params["dis"], stats["dis"], styles, None, keys[7])
                if cfg.use_cnn_discriminator:
                    loss = nll_loss(pred, jnp.ones(pred.shape[0], jnp.int32))
                else:
                    p1 = pred.squeeze(-1)
                    loss = bce_with_logits(p1, jnp.ones_like(p1))
                return loss, {**stats, "enc": enc_stats, "dis": dis_stats}

            gen_loss, params, stats, opt_g = self._opt_step(
                "generator", g_loss, params, opt["generator"],
                sched["generator"].lr,
            )
            opt = {**opt, "generator": opt_g}

        # ---- kendall / correlation step (trainer.py:152-161) ----------- #
        def corr_loss(sub):
            styles, enc_stats = enc_fwd(sub["enc"], stats, spec_in, keys[8])
            loss = kendall_constraint(
                aux, styles[:, : cfg.n_aux], activate=cfg.kendall_activation
            )
            return loss, {**stats, "enc": enc_stats}

        aux_loss, params, stats, opt_c = self._opt_step(
            "correlation", corr_loss, params, opt["correlation"],
            sched["correlation"].lr,
        )
        opt = {**opt, "correlation": opt_c}

        # ---- reconstruction step (trainer.py:163-172) ------------------ #
        def rec_loss(sub):
            styles, enc_stats = enc_fwd(sub["enc"], stats, spec_in, keys[9])
            s2 = {**stats, "enc": enc_stats}
            spec_out, dec_stats = dec_fwd(sub["dec"], s2, styles, keys[10])
            loss = recon_loss(spec_in, spec_out, scale=cfg.use_flex_spec_target,
                              scale_weight=cfg.flex_scale_weight)
            return loss, {**s2, "dec": dec_stats}

        recon_loss_v, params, stats, opt_r = self._opt_step(
            "reconstruction", rec_loss, params, opt["reconstruction"],
            sched["reconstruction"].lr,
        )
        opt = {**opt, "reconstruction": opt_r}

        # ---- mutual-info step (trainer.py:174-186) --------------------- #
        # dead re-encode at trainer.py:176 — stats-only forward for parity
        _, enc_stats_dead = enc_fwd(params["enc"], stats, spec_in, keys[11])
        stats = {**stats, "enc": enc_stats_dead}

        # z ~ N(0,I) at the ACTUAL batch size (reference mutual_info_loss uses
        # spec_in.size()[0], functions.py:185 — matters for the trailing
        # partial batch under drop_last=False)
        z_sample = jax.random.normal(keys[12], (spec.shape[0], cfg.nstyle))

        def mi_loss(sub):
            spec_gen, dec_stats = dec_fwd(sub["dec"], stats, z_sample, keys[13])
            s2 = {**stats, "dec": dec_stats}
            z_recon, enc_stats = enc_fwd(sub["enc"], s2, spec_gen, keys[14])
            loss = mse(z_recon, z_sample)
            return loss, {**s2, "enc": enc_stats}

        mi_loss_v, params, stats, opt_m = self._opt_step(
            "mutual_info", mi_loss, params, opt["mutual_info"],
            sched["mutual_info"].lr,
        )
        opt = {**opt, "mutual_info": opt_m}

        # ---- smoothness step, until epoch_stop_smooth (trainer.py:188-200) #
        def do_smooth(operand):
            params, stats, opt_s = operand

            def sm_loss(sub):
                styles, enc_stats = enc_fwd(params["enc"], stats, spec_in, keys[15])
                s2 = {**stats, "enc": enc_stats}
                spec_out, dec_stats = dec_fwd(sub["dec"], s2, styles, keys[16])
                loss = smoothness_loss(spec_out, GAU_KERNEL_SIZE)
                return loss, {**s2, "dec": dec_stats}

            loss, new_params, new_stats, new_opt = self._opt_step(
                "smoothness", sm_loss, params, opt_s, sched["smoothness"].lr
            )
            return loss, new_params, new_stats, new_opt

        def skip_smooth(operand):
            params, stats, opt_s = operand
            return jnp.float32(0.0), params, stats, opt_s

        smooth_loss_v, params, stats, opt_s = jax.lax.cond(
            epoch < cfg.epoch_stop_smooth, do_smooth, skip_smooth,
            (params, stats, opt["smoothness"]),
        )
        opt = {**opt, "smoothness": opt_s}

        new_state = state._replace(params=params, batch_stats=stats, opt=opt)
        batch_losses = {
            "dis": dis_loss,
            "gen": gen_loss,
            "aux": aux_loss,
            "recon": recon_loss_v,
            "smooth": smooth_loss_v,
            "mi": mi_loss_v,
        }
        return new_state, batch_losses

    # ------------------------------------------------------------------ #
    # fused per-batch protocol (``protocol: fused``, net-new fast path)
    # ------------------------------------------------------------------ #

    def _train_batch_fused(self, state: TrainState, spec, aux, alpha, epoch,
                           rng):
        """One-shared-forward batch step.

        The faithful protocol executes ~11 forward/backward graph passes per
        batch (each loss re-encodes from scratch and steps its optimizer
        before the next loss runs — reference ``trainer.py:103-204``), and
        round-4 measurement pinned its throughput ceiling to exactly that
        pass count (HBM/op-floor bound, PERF_NOTES_r04.md).  Here instead:

        * every loss is computed from the SAME base parameters with the
          SAME per-forward RNG keys, each via ``value_and_grad`` over its
          reference optimizer subset only (``OPT_SPECS``) — the duplicated
          forward subgraphs are structurally identical expressions, so XLA
          CSE collapses them into ONE shared encode/decode (plus the MI
          latent-cycle pair).  A one-hot-cotangent ``jax.vjp`` over stacked
          losses was measured WORSE (14.4K ops/epoch vs faithful's 11.2K;
          2.17 s vs 1.62 s on-chip): XLA cannot fold the zero-cotangent
          backward paths away under NaN semantics, so every pullback
          replayed the full 6-loss backward;
        * all optimizer updates are computed from the base parameters and
          applied jointly (Jacobi-style parallel sweep instead of the
          reference's Gauss-Seidel sequential sweep) — the five backwards
          and seven updates form independent dataflow XLA can overlap,
          where the faithful protocol serializes them through the param
          carry.

        Deviations from the faithful protocol (all opt-in, quality-gated in
        PARITY_FUSED.md): update order (joint vs sequential), single BN
        running-stat update per module per batch (the reference updates ~6x
        per batch including dead stats-only forwards), and a fresh RNG
        stream layout.
        """
        cfg = self.cfg
        keys = jax.random.split(rng, 9)
        params, stats, opt, sched = (state.params, state.batch_stats,
                                     state.opt, state.sched)

        spec_in = spec + jax.random.normal(keys[0], spec.shape) * \
            state.hparams["spec_noise"]
        z_real = jax.random.normal(keys[1], (cfg.batch_size, cfg.nstyle))
        # actual batch size, as in the faithful path (functions.py:185)
        z_sample = jax.random.normal(keys[2], (spec.shape[0], cfg.nstyle))

        def enc_fwd(p, es, x, k):
            return self._fwd(self.encoder, p, es, x, train=True,
                             rngs={"dropout": k})

        def dec_fwd(p, ds, z, k):
            return self._fwd(self.decoder, p, ds, z, train=True,
                             rngs={"dropout": k})

        def dis_fwd(p, dstats, x, beta, k):
            return self._fwd(self.discriminator, p, dstats, x, beta,
                             train=True,
                             rngs={"dropout": k,
                                   "noise": jax.random.fold_in(k, 7)})

        # Every closure recomputes its forward dependency chain from the
        # SAME base params/stats/keys — identical subexpressions that XLA
        # CSE collapses into one shared forward.  ``full()`` rebuilds the
        # {enc,dec,dis} view a closure needs from its diff'd subset.
        def full(sub):
            return {**params, **sub}

        def adv_loss(sub):      # ("dis", "enc") — GRL path
            p = full(sub)
            styles, _ = enc_fwd(p["enc"], stats["enc"], spec_in, keys[3])
            if cfg.use_cnn_discriminator:
                rp, ds1 = dis_fwd(p["dis"], stats["dis"], z_real, alpha,
                                  keys[5])
                fp, _ = dis_fwd(p["dis"], ds1, styles, alpha, keys[6])
                loss = nll_loss(rp, jnp.ones(rp.shape[0], jnp.int32)) + \
                    nll_loss(fp, jnp.zeros(fp.shape[0], jnp.int32))
            else:
                both = jnp.concatenate(
                    [z_real.astype(styles.dtype), styles], axis=0)
                pred, _ = dis_fwd(p["dis"], stats["dis"], both, alpha,
                                  keys[5])
                rp1 = pred[: cfg.batch_size].squeeze(-1)
                fp1 = pred[cfg.batch_size:].squeeze(-1)
                loss = bce_with_logits(rp1, jnp.ones_like(rp1)) + \
                    bce_with_logits(fp1, jnp.zeros_like(fp1))
            return loss, None

        def d_loss(sub):        # ("dis",) — non-GRL D step
            p = full(sub)
            styles, _ = enc_fwd(params["enc"], stats["enc"], spec_in,
                                keys[3])
            styles = jax.lax.stop_gradient(styles)
            rp, ds1 = dis_fwd(p["dis"], stats["dis"], z_real, None, keys[5])
            fp, _ = dis_fwd(p["dis"], ds1, styles, None, keys[6])
            if cfg.use_cnn_discriminator:
                loss = nll_loss(rp, jnp.ones(rp.shape[0], jnp.int32)) + \
                    nll_loss(fp, jnp.zeros(fp.shape[0], jnp.int32))
            else:
                rp1, fp1 = rp.squeeze(-1), fp.squeeze(-1)
                loss = bce_with_logits(rp1, jnp.ones_like(rp1)) + \
                    bce_with_logits(fp1, jnp.zeros_like(fp1))
            return loss, None

        def g_loss(sub):        # ("enc",) — non-GRL G step
            p = full(sub)
            styles, _ = enc_fwd(p["enc"], stats["enc"], spec_in, keys[3])
            gp, _ = dis_fwd(params["dis"], stats["dis"], styles, None,
                            keys[7])
            if cfg.use_cnn_discriminator:
                loss = nll_loss(gp, jnp.ones(gp.shape[0], jnp.int32))
            else:
                gp1 = gp.squeeze(-1)
                loss = bce_with_logits(gp1, jnp.ones_like(gp1))
            return loss, None

        def corr_loss(sub):     # ("enc",)
            p = full(sub)
            styles, _ = enc_fwd(p["enc"], stats["enc"], spec_in, keys[3])
            loss = kendall_constraint(aux, styles[:, : cfg.n_aux],
                                      activate=cfg.kendall_activation)
            return loss, None

        def rec_loss(sub):      # ("enc", "dec")
            p = full(sub)
            styles, _ = enc_fwd(p["enc"], stats["enc"], spec_in, keys[3])
            spec_out, _ = dec_fwd(p["dec"], stats["dec"], styles, keys[4])
            loss = recon_loss(spec_in, spec_out,
                              scale=cfg.use_flex_spec_target,
                              scale_weight=cfg.flex_scale_weight)
            return loss, None

        def mi_loss(sub):       # ("enc", "dec")
            # train-mode BN normalizes by CURRENT batch statistics, so the
            # running-stats input does not affect outputs — no need to
            # thread the shared pass's stats through the closure
            p = full(sub)
            spec_gen, _ = dec_fwd(p["dec"], stats["dec"], z_sample, keys[8])
            z_recon, _ = enc_fwd(p["enc"], stats["enc"], spec_gen,
                                 jax.random.fold_in(keys[8], 1))
            loss = mse(z_recon, z_sample)
            return loss, None

        def sm_loss(sub):       # ("dec",)
            p = full(sub)
            styles, _ = enc_fwd(params["enc"], stats["enc"], spec_in,
                                keys[3])
            spec_out, _ = dec_fwd(p["dec"], stats["dec"], styles, keys[4])
            loss = smoothness_loss(spec_out, GAU_KERNEL_SIZE)
            return loss, None

        if cfg.gradient_reversal:
            plan = [("adversarial", adv_loss)]
        else:
            plan = [("discriminator", d_loss), ("generator", g_loss)]
        plan += [("correlation", corr_loss), ("reconstruction", rec_loss),
                 ("mutual_info", mi_loss)]

        add = lambda a, b: jax.tree_util.tree_map(jnp.add, a, b)
        sub_delta = lambda n, b: jax.tree_util.tree_map(
            lambda x, y: x - y, n, b)
        delta = jax.tree_util.tree_map(jnp.zeros_like, params)
        new_opt = dict(opt)
        loss_vals = {}
        for name, loss_fn in plan:
            subset = OPT_SPECS[name][0]
            base_sub = {k: params[k] for k in subset}
            (loss_v, _), g_sub = jax.value_and_grad(
                loss_fn, has_aux=True)(base_sub)
            loss_vals[name] = loss_v
            new_sub, new_opt[name] = self.opts[name].update(
                g_sub, opt[name], base_sub, sched[name].lr)
            d_sub = sub_delta(new_sub, base_sub)
            delta = {**delta,
                     **{k: add(delta[k], d_sub[k]) for k in subset}}

        # smoothness: decoder-only update until epoch_stop_smooth
        # (reference trainer.py:188-200); moments freeze after the cutoff
        def do_sm(opt_s):
            base_sub = {"dec": params["dec"]}
            (loss_v, _), g_sub = jax.value_and_grad(
                sm_loss, has_aux=True)(base_sub)
            new_sub, new_o = self.opts["smoothness"].update(
                g_sub, opt_s, base_sub, sched["smoothness"].lr)
            return loss_v, sub_delta(new_sub["dec"], base_sub["dec"]), new_o

        def skip_sm(opt_s):
            return jnp.float32(0.0), \
                jax.tree_util.tree_map(jnp.zeros_like, params["dec"]), opt_s

        sm_val, sm_delta, new_opt["smoothness"] = jax.lax.cond(
            epoch < cfg.epoch_stop_smooth, do_sm, skip_sm, opt["smoothness"])
        delta = {**delta, "dec": add(delta["dec"], sm_delta)}

        # one coherent running-stats chain per batch: encoder sees the
        # noisy batch then the MI-generated spectra, decoder sees the
        # shared styles then the MI prior samples, discriminator its
        # adversarial pass — forwards CSE with the loss closures above
        styles_c, enc_s1 = enc_fwd(params["enc"], stats["enc"], spec_in,
                                   keys[3])
        _, dec_s1 = dec_fwd(params["dec"], stats["dec"], styles_c, keys[4])
        spec_gen_c, dec_s2 = dec_fwd(params["dec"], dec_s1, z_sample,
                                     keys[8])
        _, enc_s2 = enc_fwd(params["enc"], enc_s1, spec_gen_c,
                            jax.random.fold_in(keys[8], 1))
        if cfg.gradient_reversal:
            if cfg.use_cnn_discriminator:
                _, ds1 = dis_fwd(params["dis"], stats["dis"], z_real, alpha,
                                 keys[5])
                _, dis_s = dis_fwd(params["dis"], ds1, styles_c, alpha,
                                   keys[6])
            else:
                both_c = jnp.concatenate(
                    [z_real.astype(styles_c.dtype), styles_c], axis=0)
                _, dis_s = dis_fwd(params["dis"], stats["dis"], both_c,
                                   alpha, keys[5])
        else:
            _, ds1 = dis_fwd(params["dis"], stats["dis"], z_real, None,
                             keys[5])
            _, ds2 = dis_fwd(params["dis"], ds1,
                             jax.lax.stop_gradient(styles_c), None, keys[6])
            _, dis_s = dis_fwd(params["dis"], ds2, styles_c, None, keys[7])
        new_stats = {"enc": enc_s2, "dec": dec_s2, "dis": dis_s}

        new_params = add(params, delta)
        new_state = state._replace(params=new_params, batch_stats=new_stats,
                                   opt=new_opt)
        zero = jnp.float32(0.0)
        batch_losses = {
            "dis": loss_vals.get("adversarial",
                                 loss_vals.get("discriminator", zero)),
            "gen": loss_vals.get("generator", zero),
            "aux": loss_vals["correlation"],
            "recon": loss_vals["reconstruction"],
            "smooth": sm_val,
            "mi": loss_vals["mutual_info"],
        }
        return new_state, batch_losses

    # ------------------------------------------------------------------ #
    # joint per-batch protocol (``protocol: joint``, net-new fast path)
    # ------------------------------------------------------------------ #

    def _train_batch_joint(self, state: TrainState, spec, aux, alpha, epoch,
                           rng):
        """One-backward batch step: the classic multi-task formulation.

        ``total = w_dis*adv + w_corr*kendall + recon + w_mi*MI +
        w_smooth*smooth`` with weights = the reference's per-loss lr ratios
        normalized to the reconstruction ratio, ONE ``value_and_grad`` over
        all parameters, ONE optimizer (lr = ``lr_ratio_Reconn * lr_base``
        under its own plateau scheduler).  The GRL inside the discriminator
        realizes the adversarial minimax within the single backward — the
        exact mechanism the reference already relies on
        (``sc/clustering/model.py:8-22``).

        Why it exists: round-5 on-chip measurement showed the 5-backward
        protocols are residual-READ bound — sharing the forward (fused)
        cut ops but not wall, because every backward re-reads the same
        residuals.  One backward divides that traffic ~4x.  Strongest
        deviation from the reference (single Adam moment state, loss
        weights instead of per-loss lrs, one wd application) — opt-in,
        quality-gated in PARITY_FUSED.md.
        """
        cfg = self.cfg
        keys = jax.random.split(rng, 9)
        params, stats, opt, sched = (state.params, state.batch_stats,
                                     state.opt, state.sched)

        spec_in = spec + jax.random.normal(keys[0], spec.shape) * \
            state.hparams["spec_noise"]
        z_real = jax.random.normal(keys[1], (cfg.batch_size, cfg.nstyle))
        z_sample = jax.random.normal(keys[2], (spec.shape[0], cfg.nstyle))

        def enc_fwd(p, es, x, k):
            return self._fwd(self.encoder, p, es, x, train=True,
                             rngs={"dropout": k})

        def dec_fwd(p, ds, z, k):
            return self._fwd(self.decoder, p, ds, z, train=True,
                             rngs={"dropout": k})

        def dis_fwd(p, dstats, x, beta, k):
            return self._fwd(self.discriminator, p, dstats, x, beta,
                             train=True,
                             rngs={"dropout": k,
                                   "noise": jax.random.fold_in(k, 7)})

        # reference lr ratios -> loss weights (reconstruction anchors)
        r = cfg.lr_ratio_Reconn
        w_dis = cfg.lr_ratio_dis / r
        w_corr = cfg.lr_ratio_Corr / r
        w_mi = cfg.lr_ratio_Mutual / r
        w_sm = cfg.lr_ratio_Smooth / r
        sm_on = (epoch < cfg.epoch_stop_smooth).astype(jnp.float32)

        def total_loss(p):
            styles, enc_s1 = enc_fwd(p["enc"], stats["enc"], spec_in,
                                     keys[3])
            spec_out, dec_s1 = dec_fwd(p["dec"], stats["dec"], styles,
                                       keys[4])
            if cfg.use_cnn_discriminator:
                rp, ds1 = dis_fwd(p["dis"], stats["dis"], z_real, alpha,
                                  keys[5])
                fp, dis_s = dis_fwd(p["dis"], ds1, styles, alpha, keys[6])
                adv_l = nll_loss(rp, jnp.ones(rp.shape[0], jnp.int32)) + \
                    nll_loss(fp, jnp.zeros(fp.shape[0], jnp.int32))
            else:
                both = jnp.concatenate(
                    [z_real.astype(styles.dtype), styles], axis=0)
                pred, dis_s = dis_fwd(p["dis"], stats["dis"], both, alpha,
                                      keys[5])
                rp1 = pred[: cfg.batch_size].squeeze(-1)
                fp1 = pred[cfg.batch_size:].squeeze(-1)
                adv_l = bce_with_logits(rp1, jnp.ones_like(rp1)) + \
                    bce_with_logits(fp1, jnp.zeros_like(fp1))
            corr_l = kendall_constraint(aux, styles[:, : cfg.n_aux],
                                        activate=cfg.kendall_activation)
            rec_l = recon_loss(spec_in, spec_out,
                               scale=cfg.use_flex_spec_target,
                               scale_weight=cfg.flex_scale_weight)
            sm_l = smoothness_loss(spec_out, GAU_KERNEL_SIZE)
            spec_gen, dec_s2 = dec_fwd(p["dec"], dec_s1, z_sample, keys[8])
            z_recon, enc_s2 = enc_fwd(p["enc"], enc_s1, spec_gen,
                                      jax.random.fold_in(keys[8], 1))
            mi_l = mse(z_recon, z_sample)
            total = (w_dis * adv_l + w_corr * corr_l + rec_l + w_mi * mi_l
                     + sm_on * w_sm * sm_l)
            new_stats = {"enc": enc_s2, "dec": dec_s2, "dis": dis_s}
            losses = {"dis": adv_l, "gen": jnp.float32(0.0), "aux": corr_l,
                      "recon": rec_l, "smooth": sm_on * sm_l, "mi": mi_l}
            return total, (new_stats, losses)

        (_, (new_stats, batch_losses)), grads = jax.value_and_grad(
            total_loss, has_aux=True)(params)
        new_params, new_opt_j = self.opts["joint"].update(
            grads, opt["joint"], params, sched["joint"].lr)
        new_state = state._replace(params=new_params, batch_stats=new_stats,
                                   opt={**opt, "joint": new_opt_j})
        return new_state, batch_losses

    # ------------------------------------------------------------------ #
    # validation + metrics (reference trainer.py:206-304)
    # ------------------------------------------------------------------ #

    def _validate(self, state: TrainState, data: TrialData, alpha, rng):
        cfg = self.cfg
        params, stats = state.params, state.batch_stats
        z = self._fwd(self.encoder, params["enc"], stats["enc"], data.val_spec,
                      train=False)[0]
        spec_out = self._fwd(self.decoder, params["dec"], stats["dec"], z,
                             train=False)[0]
        k1, k2 = jax.random.split(rng)

        recon_v = mse(spec_out, data.val_spec)   # plain MSE (trainer.py:223)
        aux_v = kendall_constraint(data.val_aux, z[:, : cfg.n_aux],
                                   activate=cfg.kendall_activation)
        smooth_v = smoothness_loss(spec_out, GAU_KERNEL_SIZE)

        # amplitude-drift observability (net-new): the flex objective leaves
        # output gain nearly unconstrained (reference functions.py:99-105),
        # so per-epoch gain trajectories are the primary diagnostic for the
        # shared drift instability (PARITY_RESULTS_CONV.md).  ``gain`` is the
        # median output/target amplitude ratio on the val split;
        # ``clamp_frac`` is the fraction of val samples whose ratio sits
        # outside the flex clamp window [0.7, 1.3] (clamp-entry indicator).
        ratio = jnp.abs(jnp.mean(spec_out.astype(jnp.float32), axis=1)) / \
            jnp.abs(jnp.mean(data.val_spec, axis=1))
        gain_v = jnp.median(ratio)
        clamp_frac_v = jnp.mean(((ratio < 0.7) | (ratio > 1.3))
                                .astype(jnp.float32))

        z_sample = jnp.asarray(
            jax.random.normal(k1, (self.n_val, cfg.nstyle)), jnp.float32
        )
        spec_gen = self._fwd(self.decoder, params["dec"], stats["dec"], z_sample,
                             train=False)[0]
        z_recon = self._fwd(self.encoder, params["enc"], stats["enc"], spec_gen,
                            train=False)[0]
        mi_v = mse(z_recon, z_sample)

        def d_eval(x, beta):
            return self._fwd(self.discriminator, params["dis"], stats["dis"], x,
                             beta, train=False)[0]

        if cfg.gradient_reversal:
            z_real = jax.random.normal(k2, (cfg.batch_size, cfg.nstyle))
            rp = d_eval(z_real, alpha)
            fp = d_eval(z, alpha)
            if cfg.use_cnn_discriminator:
                dis_v = nll_loss(rp, jnp.ones(rp.shape[0], jnp.int32)) + \
                    nll_loss(fp, jnp.zeros(fp.shape[0], jnp.int32))
            else:
                rp1, fp1 = rp.squeeze(-1), fp.squeeze(-1)
                dis_v = bce_with_logits(rp1, jnp.ones_like(rp1)) + \
                    bce_with_logits(fp1, jnp.zeros_like(fp1))
            gen_v = jnp.float32(0.0)
        else:
            z_real = jax.random.normal(k2, (self.n_val, cfg.nstyle))
            rp = d_eval(z_real, None)
            fp = d_eval(z, None)
            if cfg.use_cnn_discriminator:
                dis_v = nll_loss(rp, jnp.ones(rp.shape[0], jnp.int32)) + nll_loss(
                    fp, jnp.zeros(fp.shape[0], jnp.int32)
                )
                gen_v = nll_loss(fp, jnp.ones(fp.shape[0], jnp.int32))
            else:
                rp1, fp1 = rp.squeeze(-1), fp.squeeze(-1)
                dis_v = bce_with_logits(rp1, jnp.ones_like(rp1)) + bce_with_logits(
                    fp1, jnp.zeros_like(fp1)
                )
                gen_v = bce_with_logits(fp1, jnp.ones_like(fp1))

        return z, {"recon": recon_v, "aux": aux_v, "smooth": smooth_v,
                   "mi": mi_v, "dis": dis_v, "gen": gen_v,
                   "gain": gain_v, "clamp_frac": clamp_frac_v}

    # ------------------------------------------------------------------ #
    # full run
    # ------------------------------------------------------------------ #

    def epoch_step(self, state: TrainState, epoch, data: TrialData):
        cfg = self.cfg
        k_epoch = jax.random.fold_in(state.rng, epoch)
        k_perm, k_val = jax.random.split(k_epoch)

        alpha = alpha_schedule(
            epoch.astype(jnp.float32) / cfg.max_epoch,
            state.hparams["alpha_flat_step"], state.hparams["alpha_limit"],
        ) if cfg.gradient_reversal else jnp.float32(0.0)

        # Reference batch semantics (DataLoader shuffle + drop_last=False,
        # dataloader.py:66-70): a permutation sliced into full batches plus
        # one smaller trailing batch.  Both shapes are static, so the full
        # batches run as a lax.scan and the trailing partial batch is one
        # unrolled _train_batch call at its own (smaller) shape — no
        # wrap-padded duplicate samples, and BN batch statistics on the
        # trailing batch are computed over exactly its rows, as in torch.
        perm = jax.random.permutation(k_perm, self.n_train)
        n_full = self.n_train // cfg.batch_size
        rem = self.n_train - n_full * cfg.batch_size

        def batch_step(carry, batch):
            st = carry
            i, bidx = batch
            spec = jnp.take(data.train_spec, bidx, axis=0)
            aux = jnp.take(data.train_aux, bidx, axis=0)
            st, losses = self._train_batch(
                st, spec, aux, alpha, epoch, jax.random.fold_in(k_epoch, 1000 + i)
            )
            return st, losses

        mi_sum = jnp.float32(0.0)
        last = None
        if n_full > 0:
            idx = perm[: n_full * cfg.batch_size].reshape(n_full, cfg.batch_size)
            state, train_losses = jax.lax.scan(
                batch_step, state, (jnp.arange(n_full), idx),
                unroll=min(cfg.scan_unroll, n_full),
            )
            last = jax.tree_util.tree_map(lambda x: x[-1], train_losses)
            mi_sum = jnp.sum(train_losses["mi"])
        if rem > 0:
            state, last = batch_step(state, (jnp.int32(n_full), perm[n_full * cfg.batch_size:]))
            mi_sum = mi_sum + last["mi"]
        avg_mi = mi_sum / self.n_batch

        z_val, val_losses = self._validate(state, data, alpha, k_val)

        # quality metrics (trainer.py:286-297)
        metrics = jnp.stack([
            min_style_shapiro(z_val),
            val_losses["recon"],
            avg_mi,
            max_interstyle_spearman(z_val),
            val_losses["aux"],
        ])
        combined = -jnp.sum(METRIC_WEIGHTS * metrics)

        # true-best tracking (min combined)
        is_best = combined < state.best_combined
        take = lambda a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.where(is_best, x, y), a, b
        )
        state = state._replace(
            best_combined=jnp.where(is_best, combined, state.best_combined),
            best_epoch=jnp.where(is_best, epoch, state.best_epoch),
            best_params=take(state.params, state.best_params),
            best_batch_stats=take(state.batch_stats, state.best_batch_stats),
            # faithful (dead) gate: combined > faithful_best, init 10.0
            faithful_best=jnp.where(
                combined > state.faithful_best, combined, state.faithful_best
            ),
        )

        # best-reconstruction tracking (min val recon MSE) — the
        # ``use_best_checkpoint`` deployment target (see TrainState)
        is_best_recon = val_losses["recon"] < state.best_recon
        take_r = lambda a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.where(is_best_recon, x, y), a, b
        )
        state = state._replace(
            best_recon=jnp.where(is_best_recon, val_losses["recon"],
                                 state.best_recon),
            best_recon_epoch=jnp.where(is_best_recon, epoch,
                                       state.best_recon_epoch),
            best_recon_params=take_r(state.params, state.best_recon_params),
            best_recon_batch_stats=take_r(state.batch_stats,
                                          state.best_recon_batch_stats),
        )

        # plateau schedulers step on the combined metric (trainer.py:303-304);
        # with sch_recon_metric="val_recon" (net-new, see TrainConfig) the
        # reconstruction scheduler steps on val recon MSE instead, so the
        # recon lr is only cut once reconstruction itself has plateaued
        sched = {
            name: plateau_update(
                state.sched[name],
                val_losses["recon"]
                if (name in ("reconstruction", "joint")
                    and cfg.sch_recon_metric == "val_recon")
                else combined,
                cfg.sch_factor, cfg.sch_patience)
            for name in state.sched
        }
        state = state._replace(sched=sched)

        log = {
            "epoch": epoch,
            "train_dis": last["dis"], "train_gen": last["gen"],
            "train_aux": last["aux"], "train_recon": last["recon"],
            "train_smooth": last["smooth"], "train_mi": last["mi"],
            "val_dis": val_losses["dis"], "val_gen": val_losses["gen"],
            "val_aux": val_losses["aux"], "val_recon": val_losses["recon"],
            "val_smooth": val_losses["smooth"], "val_mi": val_losses["mi"],
            "val_gain": val_losses["gain"],
            "val_clamp_frac": val_losses["clamp_frac"],
            "metrics": metrics,
            "combined": combined,
            "lr_recon": sched.get("reconstruction", sched.get("joint")).lr,
        }
        return state, log

    def run_epochs(self, state: TrainState, data: TrialData, epochs):
        """Scan over an explicit (traced) array of epoch indices — the
        building block for full runs, resume, and segmented checkpointing.
        Same-shaped ``epochs`` arrays share one compilation."""

        def step(carry, epoch):
            return self.epoch_step(carry, epoch, data)

        return jax.lax.scan(step, state, epochs)

    def run(self, state: TrainState, data: TrialData, start_epoch: int = 0):
        """Full training: scan over epochs.  Jittable; vmap over trials.

        ``start_epoch`` (static) resumes a checkpointed state partway —
        a capability the reference lacks entirely (SURVEY.md §5
        checkpoint/resume row).  Epoch-indexed behavior (alpha ramp,
        smoothness cutoff, RNG streams) continues exactly where it left off.
        """
        return self.run_epochs(
            state, data, jnp.arange(start_epoch, self.cfg.max_epoch)
        )

    # convenience: final metrics in the reference's return format
    @staticmethod
    def final_metrics(logs) -> jnp.ndarray:
        """metrics list of the last epoch (reference ``Trainer.train`` return)."""
        return logs["metrics"][-1]
