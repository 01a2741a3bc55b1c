"""The six-loss library as pure functions of (arrays, apply-fns, rng).

Behavioral spec: reference ``sc/utils/functions.py:81-219``.  Losses are pure
and jit-safe; model forwards are passed in as closures so the trainer decides
train/eval mode and batch-stat threading.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rankaae_tpu.models.primitives import gaussian_smooth_1d


def mse(a, b):
    # losses always reduce in float32 (activations may be bf16).
    # jnp.asarray, not .astype: the sc-shim feeds these torch tensors too.
    return jnp.mean(jnp.square(jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)))


def bce_with_logits(logits, targets):
    """Mean binary cross-entropy on logits (torch ``BCEWithLogitsLoss``)."""
    logits = jnp.asarray(logits, jnp.float32)
    # log(1+exp(-|x|)) formulation for stability
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def nll_loss(log_probs, targets):
    """Mean negative log-likelihood over integer class targets
    (torch ``NLLLoss`` on log-probabilities)."""
    log_probs = jnp.asarray(log_probs, jnp.float32)
    return -jnp.mean(jnp.take_along_axis(log_probs, targets[:, None], axis=1))


def recon_loss(spec_in, spec_out, scale: bool = False, scale_weight: float = 0.1):
    """Reconstruction loss (reference ``functions.py:81-107``).

    ``scale=True`` is the "flex spectra target" (``use_flex_spec_target``):
    a per-spectrum amplitude ratio is learned toward 1 with a
    ``scale_weight``-weighted penalty (reference hardcodes 0.1,
    ``functions.py:101``), then detached, clamped to [0.7, 1.3], and used to
    rescale the target before the MSE.  ``scale_weight`` > 0.1 anchors the
    output amplitude harder against the drift mode the reference objective
    leaves weakly constrained (``TrainConfig.flex_scale_weight``).
    """
    spec_in = jnp.asarray(spec_in, jnp.float32)
    spec_out = jnp.asarray(spec_out, jnp.float32)
    if not scale:
        return mse(spec_out, spec_in)
    spec_scale = jnp.abs(jnp.mean(spec_out, axis=1)) / jnp.abs(jnp.mean(spec_in, axis=1))
    loss = jnp.mean(jnp.square(spec_scale - 1.0)) * scale_weight
    clamped = jnp.clip(jax.lax.stop_gradient(spec_scale), 0.7, 1.3)
    loss += mse(spec_out, spec_in * clamped[:, None])
    return loss


def adversarial_loss(
    styles,
    discriminator_apply: Callable,
    alpha,
    rng,
    batch_size: int,
):
    """GRL-path adversarial loss (reference ``functions.py:109-132``).

    ``discriminator_apply(x, beta, rng)`` must run the discriminator in the
    caller's chosen mode.  D(z~N(0,I)) is labeled 1, D(styles) labeled 0;
    the loss is the sum of two mean-BCE-with-logits terms.  The GRL inside
    D makes one backward train D normally and the encoder adversarially.
    """
    nstyle = styles.shape[1]
    k_prior, k_d1, k_d2 = jax.random.split(rng, 3)
    z_real = jax.random.normal(k_prior, (batch_size, nstyle), styles.dtype)
    real_pred = discriminator_apply(z_real, alpha, k_d1).squeeze(-1)
    fake_pred = discriminator_apply(styles, alpha, k_d2).squeeze(-1)
    return bce_with_logits(real_pred, jnp.ones_like(real_pred)) + bce_with_logits(
        fake_pred, jnp.zeros_like(fake_pred)
    )


def discriminator_loss(styles, discriminator_apply: Callable, rng, batch_size: int):
    """Non-GRL GAN discriminator step (reference ``functions.py:135-155``).

    Implemented for the 2-class CNN discriminator (log-softmax outputs +
    NLL), the only combination that is type-consistent in the reference
    (SURVEY.md §2.3 "latent-bug alert"; the shipped configs all use the GRL
    path).  Real z ~ N(0, I) labeled class 1, encoded styles class 0.
    """
    nstyle = styles.shape[1]
    k_prior, k_d1, k_d2 = jax.random.split(rng, 3)
    z_real = jax.random.normal(k_prior, (batch_size, nstyle), styles.dtype)
    real_pred = discriminator_apply(z_real, None, k_d1)
    fake_pred = discriminator_apply(jax.lax.stop_gradient(styles), None, k_d2)
    ones = jnp.ones((real_pred.shape[0],), jnp.int32)
    zeros = jnp.zeros((fake_pred.shape[0],), jnp.int32)
    return nll_loss(real_pred, ones) + nll_loss(fake_pred, zeros)


def generator_loss(styles, discriminator_apply: Callable, rng):
    """Non-GRL GAN generator step (reference ``functions.py:158-171``):
    encoder tries to make D call its styles class-1 ("real prior").

    Note: the reference labels fakes 0 here, which (with NLL on log-softmax)
    *minimizes* -log p(class 0 | styles) — pushing styles to look fake, the
    opposite of a generator objective and inconsistent with its own GAN
    framing; combined with its default-config mismatch this path is dead
    code upstream.  We implement the working objective (label 1) and
    document the deviation (SURVEY.md §7 faithful-bug policy).
    """
    pred = discriminator_apply(styles, None, rng)
    ones = jnp.ones((pred.shape[0],), jnp.int32)
    return nll_loss(pred, ones)


def mutual_info_loss(encoder_apply: Callable, decoder_apply: Callable, rng,
                     batch_size: int, nstyle: int):
    """Latent-cycle consistency (DualAAE Ge-2020 heritage; reference
    ``functions.py:174-192``): z ~ N(0, I); MSE(encoder(decoder(z)), z)."""
    z = jax.random.normal(rng, (batch_size, nstyle))
    z_recon = encoder_apply(decoder_apply(z))
    return mse(z_recon, z)


def smoothness_loss(spec_out, gs_kernel_size: int = 17, sigma: float = 3.0):
    """MSE between the decoded spectrum and its Gaussian-smoothed self
    (reference ``functions.py:194-212``)."""
    return mse(spec_out, gaussian_smooth_1d(spec_out, gs_kernel_size, sigma))


def alpha_schedule(epoch_percentage, step: float = 800.0, limit: float = 0.7):
    """GRL strength ramp (reference ``functions.py:214-219``):
    a(p) = (2 / (1 + exp(-1e4/step * p)) - 1) * limit."""
    return (2.0 / (1.0 + jnp.exp(-1.0e4 / step * epoch_percentage)) - 1.0) * limit
