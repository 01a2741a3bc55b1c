"""BatchNorm running-statistics recalibration (SWA-style ``update_bn``).

Net-new over the reference (which has no equivalent; cf.
``torch.optim.swa_utils.update_bn``): replace every BatchNorm layer's
running mean/var with the statistics of ONE train-mode pass over the full
training set, so eval-mode forwards normalize with statistics that actually
describe the trained model's activations.

Why this exists: the trained models' BN running stats are an EMA over
mini-batch statistics whose inputs moved all through training (the 7-optimizer
protocol updates parameters five times per batch), so eval-mode forwards can
in principle normalize with stale statistics.

Measured outcome (amp-instrumented n=16 compact study,
artifacts/parity_conv_compact_amp, PARITY_RESULTS_CONV.md): on those runs the
staleness hypothesis is REFUTED — eval-mode train-split recon matches val
recon per seed (no train/eval mismatch), the elevated-recon seeds are
explained by a coherent output AMPLITUDE drift the flex objective leaves
unconstrained, and this recalibration slightly *raises* their val MSE
(the stale EMA was partially masking the drift; fresh statistics expose it).
For that failure mode use ``amp_recalibrate`` (one-scalar deployment gain)
instead.  ``bn_recalibrate`` remains the right tool when a genuine
train/eval-mode reconstruction gap is observed.

Mechanics: our ``BatchNorm`` (models/primitives.py) updates running stats as
``new = (1-m)*old + m*batch`` with torch momentum ``m=0.1`` and unbiased batch
variance.  A single full-train-set pass therefore leaves
``batch = (new - (1-m)*old) / m`` recoverable exactly per leaf — no module
surgery or momentum override needed.  Layer composition is consistent: in the
train-mode pass every BN normalizes by its own full-set batch statistics,
which is precisely what eval mode reproduces after the swap.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from rankaae_tpu.models.primitives import BatchNorm
from rankaae_tpu.models.registry import build_autoencoder

_MOMENTUM = BatchNorm.momentum  # torch semantics: new = (1-m)*old + m*batch


def _invert_ema(old_stats, new_stats):
    """Recover the single pass's batch statistics from one EMA update."""
    m = _MOMENTUM
    return jax.tree_util.tree_map(
        lambda new, old: (new - (1.0 - m) * old) / m, new_stats, old_stats
    )


def recalibrate_batch_stats(
    cfg,
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    train_spec,
    rng: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Return ``batch_stats`` with encoder/decoder BN leaves replaced by
    full-``train_spec`` statistics.

    ``params``/``batch_stats`` are single-trial trees keyed ``{"enc","dec",...}``
    (the ``save_model_bundle`` layout).  The pass runs with dropout active
    (matching how training-time activations — and hence what running stats
    estimate — are distributed); ``rng`` seeds it, default ``PRNGKey(0)``.
    Non-BN entries (e.g. the discriminator, which has no batch_stats) pass
    through untouched.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    encoder, decoder = build_autoencoder(cfg)
    k_enc, k_dec = jax.random.split(rng)

    new_stats = dict(batch_stats)

    def one_pass(module, role, x, key):
        """Train-mode forward; returns (output, recalibrated stats or None)."""
        old = batch_stats.get(role)
        if not old:  # module has no BN state — plain eval forward
            return module.apply({"params": params[role]}, x, train=False), None
        out, mut = module.apply(
            {"params": params[role], "batch_stats": old}, x, train=True,
            rngs={"dropout": key}, mutable=["batch_stats"],
        )
        return out, _invert_ema(old, mut["batch_stats"])

    x = jnp.asarray(train_spec)
    z, enc_stats = one_pass(encoder, "enc", x, k_enc)
    if enc_stats is not None:
        new_stats["enc"] = enc_stats
    _, dec_stats = one_pass(decoder, "dec", z, k_dec)
    if dec_stats is not None:
        new_stats["dec"] = dec_stats
    return new_stats


def amplitude_gain(
    cfg,
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    train_spec,
) -> float:
    """Median output/target amplitude ratio of the eval-mode reconstruction
    over ``train_spec`` — the one-scalar deployment gain calibration.

    Why this exists: the reference's flex reconstruction objective
    (``use_flex_spec_target``, reference ``sc/utils/functions.py:99-105``)
    rescales the TARGET toward the output's per-spectrum amplitude (detached,
    clamped to [0.7, 1.3]) and resists the drift only through a 0.1-weighted
    penalty — so trained models can sit at a coherent global output gain far
    from 1 with a converged spectral SHAPE (measured median gain down to 0.76
    on conv seeds with per-sample spread ~0.05,
    ``artifacts/parity_conv_compact_det``; BOTH stacks drift — torch compact
    seed 5 sits at 0.96).  Dividing decoder outputs by this gain at
    deployment removes exactly the component of plain reconstruction MSE
    that the training objective never punished.  ``InferenceModel`` applies
    the correction when the bundle manifest carries ``amp_gain`` (written by
    ``train_sc`` under ``amp_recalibrate: true``).

    The returned gain is clipped to [0.5, 2.0]: training's own clamp bounds
    the drift to [0.7, 1.3], so anything far outside is a diverged model
    where a gain "correction" would only amplify garbage.
    """
    from rankaae_tpu.models.inference import InferenceModel

    import numpy as np

    model = InferenceModel(params, batch_stats, cfg)
    x = np.asarray(train_spec, np.float32)
    out = model.decode(model.encode(x))
    ratio = np.abs(out.mean(axis=1)) / np.abs(x.mean(axis=1))
    gain = float(np.median(ratio))
    if not np.isfinite(gain):
        return 1.0
    return float(np.clip(gain, 0.5, 2.0))
