"""Latent-space discriminators with gradient reversal and train-mode noise.

Behavioral spec: reference ``sc/clustering/model.py:573-663``.  Both add
N(0, noise) to the input **in training mode only** and pass it through the
GRL before the classifier.  ``beta=None`` skips the reversal (used by the
non-GRL GAN path, ``sc/utils/functions.py:147,150``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rankaae_tpu.models.grl import grad_reverse
from rankaae_tpu.models.primitives import (
    BatchNorm,
    Conv1d,
    Dropout,
    Linear,
    PReLU,
)


class DiscriminatorFC(nn.Module):
    """MLP discriminator -> single logit (default in shipped configs,
    reference ``model.py:631-663``)."""

    nstyle: int = 5
    hidden_size: int = 64
    dropout_rate: float = 0.2
    noise: float = 0.1
    layers: int = 3

    @nn.compact
    def __call__(self, x, beta: Optional[jnp.ndarray], train: bool = True):
        if train and self.noise > 0:
            rng = self.make_rng("noise")
            x = x + self.noise * jax.random.normal(rng, x.shape, x.dtype)
        if beta is not None:
            x = grad_reverse(x, jnp.asarray(beta, x.dtype))
        h = self.hidden_size
        out = x
        for i in range(self.layers - 1):
            out = Linear(h, name=f"lin{i}")(out)
            out = PReLU(h, name=f"prelu{i}")(out)
            out = Dropout(self.dropout_rate, name=f"drop{i}")(out, train)
        return Linear(1, name="lin_out")(out)


class DiscriminatorCNN(nn.Module):
    """CNN discriminator -> 2-class log-probabilities
    (reference ``model.py:573-628``): the 64-dim embedding is treated as a
    length-64 1-channel signal through 5 replicate-padded convs."""

    nstyle: int = 5
    hidden_size: int = 64
    channels: int = 2
    kernel_size: int = 5
    dropout_rate: float = 0.2
    noise: float = 0.1

    @nn.compact
    def __call__(self, x, beta: Optional[jnp.ndarray], train: bool = True):
        if train and self.noise > 0:
            rng = self.make_rng("noise")
            x = x + self.noise * jax.random.normal(rng, x.shape, x.dtype)
        if beta is not None:
            x = grad_reverse(x, jnp.asarray(beta, x.dtype))

        x = Linear(self.hidden_size, name="pre_lin")(x)
        x = PReLU(self.hidden_size, name="pre_prelu")(x)

        x = x[:, None, :]   # (B, 1, 64)
        k, ch = self.kernel_size, self.channels
        pad = (k - 1) // 2
        chans = [(1, ch), (ch, ch), (ch, ch), (ch, ch), (ch, 1)]
        for i, (ci, co) in enumerate(chans):
            x = BatchNorm(ci, channel_axis=1, name=f"bn{i}")(x, train)
            x = Conv1d(ci, co, k, padding=pad, padding_mode="replicate", name=f"conv{i}")(x)
            x = PReLU(co, channel_axis=1, name=f"prelu{i}")(x)
        x = x[:, 0, :]      # (B, 64)

        x = BatchNorm(self.hidden_size, name="post_bn")(x, train)
        x = Dropout(self.dropout_rate, name="post_drop")(x, train)
        x = Linear(2, name="post_lin")(x)
        return jax.nn.log_softmax(x, axis=1)
