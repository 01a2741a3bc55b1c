"""Shim for ``sc.utils.functions`` — the loss library with the REFERENCE
signatures (``/root/reference/sc/utils/functions.py``).

Two families:

* Array-only losses (kendall / recon / smoothness / alpha): thin adapters
  over the pure-JAX implementations in ``rankaae_tpu.ops``; torch-specific
  arguments (``device``, loss-module objects) are accepted and ignored.
* Model-calling losses (adversarial / discriminator / generator /
  mutual_info): reference-style user code passes torch ``nn.Module``s, so
  these are implemented directly in torch with the reference's math —
  drop-in for code that imported them from ``sc.utils.functions``.
  Two documented deviations from the reference (PARITY.md ledger #4):
  ``generator_loss`` labels encoded styles as class 1 ("look like the
  prior") instead of the reference's 0, which optimized the opposite
  direction; label dtypes follow the supplied ``loss_fn`` (float for BCE).
"""
import torch
import torch.nn as nn

from rankaae_tpu.ops.kendall import kendall_constraint as _kendall
from rankaae_tpu.ops.losses import (  # noqa: F401
    alpha_schedule as alpha,
    recon_loss as _recon,
    smoothness_loss as _smooth,
)


class TrainingLossGeneral:
    """Reference's abstract loss-callable stub (``functions.py:8-27``).

    Dead upstream (nothing in-tree instantiates it); kept for import
    compatibility with the same attributes and NotImplementedError call.
    """

    def __init__(self, input=None, max_epoch=None, device=None):
        self.max_epoch = max_epoch
        self.device = device
        self.input = input

    def __call__(self, *args, **kwargs):
        raise NotImplementedError


class KendallConstraint(TrainingLossGeneral):
    """Reference's unfinished class wrapper (``functions.py:29-34``).

    Upstream's ``__init__`` is broken (``super.__init_`` — AttributeError on
    construction) and ``__call__`` is ``pass``; here construction works and
    ``__call__`` delegates to the functional ``kendall_constraint`` so the
    class is usable rather than a landmine (PARITY.md faithful-quirk ledger).
    """

    def __init__(self, max_epoch=None, device=None):
        super().__init__(max_epoch=max_epoch, device=device)

    def __call__(self, epoch, input=None, model=None):
        if input is None:
            return None
        descriptors, styles = input
        return kendall_constraint(descriptors, styles, device=self.device)


def kendall_constraint(descriptors, styles, activate=False, device=None):
    """Reference signature (``functions.py:37``); ``device`` ignored."""
    return _kendall(descriptors, styles, activate=activate)


def recon_loss(spec_in, spec_out, scale=False, mse_loss=None, device=None):
    """Reference signature (``functions.py:81``); torch args ignored."""
    return _recon(spec_in, spec_out, scale=scale)


def smoothness_loss(spec_out, gs_kernel_size, mse_loss=None, device=None):
    """Reference signature (``functions.py:194``); torch args ignored."""
    return _smooth(spec_out, gs_kernel_size)


def _as_float_labels(labels, loss_fn):
    """BCE-family losses need float targets; NLL/CE need long (the reference
    always built long labels, which crashes its own BCE path)."""
    if isinstance(loss_fn, (nn.BCELoss, nn.BCEWithLogitsLoss)):
        return labels.float()
    return labels.long()


def _flat_logits(pred):
    """Collapse a trailing 1-logit dim for the BCE path; keep (B, C) class
    logits intact (a bare .squeeze() would also drop the batch dim at B=1,
    breaking CrossEntropy on single-row inputs)."""
    if pred.dim() == 2 and pred.size(-1) == 1:
        return pred.squeeze(-1)
    return pred


def adversarial_loss(spec_in, styles, D, alpha, batch_size=100, nll_loss=None,
                     device=None):
    """GRL-path adversarial loss, reference signature (``functions.py:109``):
    D(z~N(0,I)) labeled 1, D(styles) labeled 0; sum of both terms."""
    if device is None:
        device = torch.device("cpu")
    if nll_loss is None:
        # the reference's default (NLLLoss, functions.py:121) crashes on its
        # own float labels; its only real caller passes BCEWithLogitsLoss
        # (trainer.py:73,119-124), so that is the working default here
        nll_loss = nn.BCEWithLogitsLoss().to(device)
    nstyle = styles.size()[1]
    z_real = torch.randn(batch_size, nstyle, requires_grad=True, device=device)
    real_pred = D(z_real, alpha)
    fake_pred = D(styles, alpha)
    ones = _as_float_labels(
        torch.ones(batch_size, dtype=torch.long, device=device), nll_loss)
    zeros = _as_float_labels(
        torch.zeros(spec_in.size()[0], dtype=torch.long, device=device), nll_loss)
    return nll_loss(_flat_logits(real_pred), ones) + \
        nll_loss(_flat_logits(fake_pred), zeros)


def discriminator_loss(styles, D, batch_size=100, loss_fn=None, device=None):
    """Non-GRL D step, reference signature (``functions.py:135``)."""
    if device is None:
        device = torch.device("cpu")
    if loss_fn is None:
        loss_fn = nn.CrossEntropyLoss().to(device)
    z_real = torch.randn(batch_size, styles.size()[1], requires_grad=True,
                         device=device)
    real_pred = D(z_real, None)
    fake_pred = D(styles.detach(), None)
    ones = _as_float_labels(
        torch.ones(batch_size, dtype=torch.long, device=device), loss_fn)
    zeros = _as_float_labels(
        torch.zeros(styles.size()[0], dtype=torch.long, device=device), loss_fn)
    return loss_fn(_flat_logits(real_pred), ones) + loss_fn(_flat_logits(fake_pred), zeros)


def generator_loss(spec_in, encoder, D, loss_fn=None, device=None):
    """Non-GRL G step, reference signature (``functions.py:158``).  Deviation:
    styles are labeled 1 (generator wants D to call them real) — the
    reference's 0 label optimizes the encoder AWAY from the prior and is dead
    code upstream (every shipped config uses gradient reversal)."""
    if device is None:
        device = torch.device("cpu")
    if loss_fn is None:
        loss_fn = nn.CrossEntropyLoss().to(device)
    styles = encoder(spec_in)
    pred = D(styles, None)
    ones = _as_float_labels(
        torch.ones(styles.size()[0], dtype=torch.long, device=device), loss_fn)
    return loss_fn(_flat_logits(pred), ones)


def mutual_info_loss(spec_in, styles, encoder, decoder, mse_loss=None,
                     device=None):
    """Latent-cycle loss, reference signature (``functions.py:174``):
    z ~ N(0,I); MSE(encoder(decoder(z)), z)."""
    if device is None:
        device = torch.device("cpu")
    if mse_loss is None:
        mse_loss = nn.MSELoss().to(device)
    z = torch.randn(spec_in.size()[0], styles.size()[1], device=device)
    return mse_loss(encoder(decoder(z)), z)
