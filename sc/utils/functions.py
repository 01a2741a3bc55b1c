"""Shim for ``sc.utils.functions`` — the loss library.

The rankaae_tpu losses are pure JAX functions; torch-specific arguments of
the reference signatures (``device``, ``mse_loss``/``nll_loss`` modules) are
accepted and ignored where harmless.
"""
from rankaae_tpu.ops.kendall import kendall_constraint as _kendall
from rankaae_tpu.ops.losses import (  # noqa: F401
    alpha_schedule as alpha,
    mutual_info_loss,
    recon_loss as _recon,
    smoothness_loss as _smooth,
)


def kendall_constraint(descriptors, styles, activate=False, device=None):
    """Reference signature (``functions.py:37``); ``device`` ignored."""
    return _kendall(descriptors, styles, activate=activate)


def recon_loss(spec_in, spec_out, scale=False, mse_loss=None, device=None):
    """Reference signature (``functions.py:81``); torch args ignored."""
    return _recon(spec_in, spec_out, scale=scale)


def smoothness_loss(spec_out, gs_kernel_size, mse_loss=None, device=None):
    """Reference signature (``functions.py:194``); torch args ignored."""
    return _smooth(spec_out, gs_kernel_size)
