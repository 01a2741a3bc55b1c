"""Configuration layer.

Two views of the same YAML config:

* :class:`Parameters` — an immutable attribute namespace over a dict, API
  compatible with the reference (``sc/utils/parameter.py:42-93``): ``get``,
  ``update``, ``to_dict``, ``from_yaml``, attribute access, and a TypeError
  on direct attribute assignment.  The YAML files shipped with the reference
  (``example/fix_config.yaml``) load unmodified.

* :class:`TrainConfig` — a validated frozen dataclass consumed by the
  trainer.  Unlike the reference (which splats raw YAML keys into Trainer
  attributes, ``sc/clustering/trainer.py:60``), unknown keys are rejected
  loudly and defaults are explicit.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import yaml


class Parameters:
    """Immutable attribute namespace over a parameter dict.

    Mirrors the reference public interface exactly
    (``sc/utils/parameter.py:42-93``): attributes are read-only, ``update``
    is the only mutator, ``get`` falls back to a default.
    """

    def __init__(self, parameter_dict: Dict[str, Any]):
        super().__setattr__("_parameter_dict", dict(parameter_dict))
        self.update({})

    def __setattr__(self, name: str, value: Any):
        raise TypeError("Parameters object cannot be modified after instantiation")

    def get(self, key: str, default: Any = None) -> Any:
        return self._parameter_dict.get(key, default)

    def update(self, parameter_dict: Dict[str, Any]) -> None:
        self._parameter_dict.update(parameter_dict)
        # Map keys into the attribute namespace (reference parameter.py:75).
        self.__dict__.update(self._parameter_dict)

    def to_dict(self) -> Dict[str, Any]:
        return self._parameter_dict

    @classmethod
    def from_yaml(cls, config_file_path: str) -> "Parameters":
        with open(config_file_path) as f:
            cfg = yaml.full_load(f)
        return cls(cfg)


# Keys understood by the training stack.  Union of the reference's shipped
# configs (SURVEY.md §2.7; ``sc/cmd/fix_config.yaml``, ``example/fix_config.yaml``,
# ``sc/tests/data/fix_config.yaml``) plus report-only keys.
_REPORT_ONLY_KEYS = {"output_name", "top_n", "gpu", "n_sampling", "plot_residual",
                     "plot_job", "use_best_checkpoint"}


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Validated, static training configuration.

    Every field is a compile-time constant of the XLA training program:
    changing any of them retraces.  Field names match the reference YAML
    schema key-for-key so shipped configs run unmodified.
    """

    # system
    data_file: str = ""
    trials: int = 1
    timeout: float = 10.0           # hours; per-trial deadline
    verbose: bool = True
    max_epoch: int = 300
    batch_size: int = 512

    # adversarial
    gradient_reversal: bool = True
    alpha_flat_step: float = 800.0
    alpha_limit: float = 0.7
    decoder_activation: str = "ReLu"
    dis_beta: float = 1.0
    dis_dropout_rate: float = 0.2
    dis_noise: float = 0.1
    gen_beta: float = 1.0

    # network structure
    n_aux: int = 5
    nstyle: int = 6
    ae_form: str = "FC"
    dim_in: int = 256
    dim_out: int = 256
    n_layers: int = 3
    FC_discriminator_layers: int = 3
    use_cnn_discriminator: bool = False

    # training
    dropout_rate: float = 0.2
    sch_factor: float = 0.25
    sch_patience: int = 300
    lr_base: float = 1e-4
    lr_ratio_Corr: float = 2.0
    lr_ratio_Mutual: float = 3.0
    lr_ratio_Reconn: float = 3.0
    lr_ratio_Smooth: float = 0.1
    lr_ratio_dis: float = 0.5
    lr_ratio_gen: float = 0.5
    optimizer_name: str = "AdamW"
    spec_noise: float = 0.01
    use_flex_spec_target: bool = False
    weight_decay: float = 1e-2
    kendall_activation: bool = False
    # default 500 mirrors the reference fallback (``trainer.py:59``)
    epoch_stop_smooth: int = 500

    # net-new: weight of the flex-target amplitude penalty
    # ``mean((scale-1)^2) * flex_scale_weight`` inside ``recon_loss`` when
    # ``use_flex_spec_target`` is on.  0.1 = faithful reference value
    # (functions.py:101).  The reference objective anchors output amplitude
    # only through this term, so trained conv models on both stacks can
    # drift to a coherent gain far from 1 (PARITY_RESULTS_CONV.md); larger
    # values anchor the amplitude harder.  No effect without
    # ``use_flex_spec_target``.
    flex_scale_weight: float = 0.1

    # net-new: metric driving the RECONSTRUCTION optimizer's plateau
    # scheduler.  "combined" = faithful reference behavior (all 7 schedulers
    # step on the combined metric, reference trainer.py:303-304) — which can
    # cut the reconstruction lr while val recon is still improving and
    # freeze a run at a high floor (the "freeze lottery"; observed on BOTH
    # stacks, see PARITY_RESULTS_CONV.md).  "val_recon" steps that one
    # scheduler on validation reconstruction MSE instead, so the recon lr
    # only drops once reconstruction itself has plateaued.  The other six
    # schedulers always follow the reference.
    sch_recon_metric: str = "combined"

    # net-new: recalibrate BatchNorm running statistics with one full-train
    # train-mode pass before saving each model bundle (SWA-style update_bn,
    # models/recalibrate.py).  Use when a genuine eval-mode/train-mode
    # reconstruction gap is observed; NOT a fix for the conv amplitude-drift
    # seeds (measured to slightly worsen them — see models/recalibrate.py
    # and PARITY_RESULTS_CONV.md; use amp_recalibrate for drift).  Off by
    # default for reference parity.
    bn_recalibrate: bool = False

    # net-new: write a one-scalar deployment gain (median output/target
    # amplitude ratio over the train split, models/recalibrate.py
    # amplitude_gain) into every saved bundle's manifest as ``amp_gain``;
    # InferenceModel divides decoder outputs by it.  Corrects the coherent
    # amplitude drift the flex reconstruction objective leaves unconstrained
    # (reference functions.py:99-105; measured data in
    # PARITY_RESULTS_CONV.md) — off by default for reference parity.
    amp_recalibrate: bool = False

    # net-new: matmul/conv precision ('highest' = true f32, parity-exact;
    # 'default' = fast TPU bf16 passes — required for the deep conv families
    # under memory-limited remote compilers, see README known-gaps).
    # Process-level: one precision per process (set at trainer construction).
    matmul_precision: str = "highest"

    # PRNG implementation for all key streams (net-new, process-level like
    # matmul_precision).  "threefry" = JAX default, counter-based, fully
    # reproducible across backends; "rbg" = the TPU's hardware RNG
    # instructions — measured ~1.65x end-to-end training speedup (the
    # 6-loss protocol draws dropout/noise masks in ~100+ sites per batch).
    # Statistical quality is equivalent for dropout/noise purposes; key
    # streams are NOT bit-compatible across the two.
    rng_impl: str = "threefry"

    # Activation storage dtype (net-new, process-level like matmul_precision).
    # "float32" is parity-exact; "bfloat16" stores the tensors flowing
    # between modules (and the weight copies feeding matmuls/convs) in bf16 —
    # the training program is HBM-bandwidth/op-floor bound on TPU, so this
    # halves the dominant traffic.  Parameters, optimizer states, BatchNorm
    # statistics, losses, and metric reductions stay float32.
    activation_dtype: str = "float32"

    # Rematerialize conv-block activations in the backward pass (net-new,
    # ``jax.checkpoint`` via ``nn.remat`` on the conv autoencoder blocks).
    # Trades a second forward pass for peak-memory headroom — the lever for
    # raising resident-trial counts on the deep "normal" form.  No effect
    # on FC/qved forms (their activations are already tiny).
    remat: bool = False

    # net-new: run each optimizer's update arithmetic over ONE raveled
    # parameter vector instead of per-leaf
    # (optim.optimizers.flat_optimizer) — numerically identical
    # (all steps are elementwise; concatenation changes no values), and it
    # collapses the ~10-ops-x-150-leaf-updates per batch into ~10 vector
    # ops per optimizer (-23% executed ops/epoch measured on chip).  Wall
    # however measured slightly WORSE at flagship shapes (1.70 s vs the
    # 1.62 s faithful baseline, PERF_NOTES_r05.md): the program is
    # residual-byte bound, not op-issue bound, and the ravel/unravel
    # copies add HBM traffic.  Kept as an off-by-default knob for shapes
    # where op-issue dominates.  Mid-run ``trial_state.mpk`` checkpoints
    # are structure-incompatible across this knob (moment states become
    # single vectors); saved model bundles are unaffected.
    flat_optim: bool = False

    # net-new: per-batch optimization protocol.
    # "faithful" (default) = the reference's sequential 5-pass protocol:
    # every loss re-encodes from scratch and steps its optimizer before the
    # next loss runs (reference sc/clustering/trainer.py:103-204) — ~11
    # forward/backward graph executions per batch, measured HBM/op-floor
    # bound at ~31% of the tile-padded roofline (PERF_NOTES_r04.md).
    # "fused" = one shared forward computes ALL losses; each optimizer's
    # gradient is taken at the SAME base parameters via per-loss VJP
    # pullbacks restricted to its reference parameter subset, and all
    # updates are applied jointly (Jacobi-style parallel update instead of
    # the reference's Gauss-Seidel sweep).  Cuts the per-batch pass count
    # ~2x and removes the reference's dead stats-only forwards; BatchNorm
    # running stats update once per module per batch instead of ~6 times.
    # Semantics deviate from the reference (documented, opt-in) — quality
    # is gated head-to-head in PARITY_FUSED.md.
    # "joint" = the classic multi-task formulation: ONE weighted-sum
    # objective (weights = the reference's per-loss lr ratios, normalized
    # to the reconstruction ratio), ONE optimizer over all parameters, one
    # backward per batch — the GRL supplies the adversarial sign-flip
    # inside the single backward, exactly what it exists for.  Round-5
    # measurement showed the 5-backward protocols are residual-read bound
    # (fused's shared forward was a wall wash), so one backward is the
    # byte lever.  Requires gradient_reversal; quality-gated like fused.
    protocol: str = "faithful"

    # Unroll factor for the per-epoch batch scan (net-new, experimental).
    # lax.scan ``unroll`` merges iterations into one loop body, letting XLA
    # overlap independent op chains ACROSS batch steps — e.g. batch k's
    # decoder-only smoothness update with batch k+1's discriminator phase —
    # which the while-loop barrier otherwise forbids.  Same math on the
    # same data, but cross-step fusion reorders float ops (like vmap does),
    # so trajectories are equivalent-in-distribution, not bitwise.
    # CPU-MESH-EXPERIMENTAL ONLY: at flagship scale on the tunneled TPU the
    # unrolled body crashes the remote compile helper (round-4 measurement)
    # — run_trials and bench refuse scan_unroll > 1 on TPU.
    scan_unroll: int = 1

    # split ratios (reference hardcodes these in Trainer.from_data signature,
    # ``trainer.py:415``)
    train_ratio: float = 0.7
    validation_ratio: float = 0.15
    test_ratio: float = 0.15

    @classmethod
    def field_names(cls) -> Tuple[str, ...]:
        return tuple(f.name for f in dataclasses.fields(cls))

    @classmethod
    def from_parameters(cls, p: Parameters, strict: bool = True) -> "TrainConfig":
        """Build from a :class:`Parameters`; rejects unknown keys when strict."""
        known = set(cls.field_names())
        d = {}
        for k, v in p.to_dict().items():
            if k in known:
                d[k] = v
            elif k in _REPORT_ONLY_KEYS:
                continue
            elif strict:
                raise KeyError(
                    f"Unknown config key {k!r}; known keys: {sorted(known | _REPORT_ONLY_KEYS)}"
                )
        cfg = cls(**d)
        cfg.validate()
        return cfg

    @classmethod
    def from_yaml(cls, path: str, strict: bool = True) -> "TrainConfig":
        return cls.from_parameters(Parameters.from_yaml(path), strict=strict)

    def validate(self) -> None:
        from rankaae_tpu.models.registry import AE_FORMS

        if self.ae_form not in AE_FORMS:
            raise ValueError(f"ae_form {self.ae_form!r} not in {sorted(AE_FORMS)}")
        if self.decoder_activation not in ("ReLu", "Softplus"):
            raise ValueError(
                f"Unknown activation {self.decoder_activation!r}; use 'ReLu' or 'Softplus'"
            )
        if self.optimizer_name not in ("Adam", "AdamW", "AdaBound", "RAdam"):
            raise ValueError(f"Unknown optimizer {self.optimizer_name!r}")
        if self.nstyle < self.n_aux:
            raise ValueError(
                f"nstyle ({self.nstyle}) must be >= n_aux ({self.n_aux}): "
                "each descriptor is rank-tied to one style dimension"
            )
        if not (self.batch_size > 1):
            raise ValueError("batch_size must be > 1 (pairwise Kendall loss)")
        if self.matmul_precision not in ("highest", "default"):
            raise ValueError(
                f"matmul_precision {self.matmul_precision!r} not in "
                "('highest', 'default')"
            )
        if self.rng_impl not in ("threefry", "rbg"):
            raise ValueError(
                f"rng_impl {self.rng_impl!r} not in ('threefry', 'rbg')"
            )
        if self.activation_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"activation_dtype {self.activation_dtype!r} not in "
                "('float32', 'bfloat16')"
            )
        if not (1 <= int(self.scan_unroll) <= 16):
            raise ValueError(
                f"scan_unroll must be in [1, 16], got {self.scan_unroll}"
            )
        if not (float(self.flex_scale_weight) >= 0.0):
            raise ValueError(
                f"flex_scale_weight must be >= 0, got {self.flex_scale_weight}"
            )
        if self.sch_recon_metric not in ("combined", "val_recon"):
            raise ValueError(
                f"sch_recon_metric {self.sch_recon_metric!r} not in "
                "('combined', 'val_recon')"
            )
        if self.protocol not in ("faithful", "fused", "joint"):
            raise ValueError(
                f"protocol {self.protocol!r} not in "
                "('faithful', 'fused', 'joint')"
            )
        if self.protocol == "joint" and not self.gradient_reversal:
            raise ValueError(
                "protocol 'joint' requires gradient_reversal: the single "
                "backward realizes the adversarial minimax through the GRL "
                "(the non-GRL two-step GAN cannot be summed into one "
                "objective)"
            )

    def replace(self, **kw) -> "TrainConfig":
        cfg = dataclasses.replace(self, **kw)
        cfg.validate()
        return cfg

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

