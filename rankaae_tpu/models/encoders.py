"""Encoder zoo: spectrum (B, dim_in) -> standardized latent styles (B, nstyle).

Behavioral spec: reference ``sc/clustering/model.py:232-378``.  Every encoder
ends in an affine-free BatchNorm so the latent is standardized — that is what
makes the N(0, I) adversarial prior meaningful.
"""
from __future__ import annotations

from flax import linen as nn

from rankaae_tpu.models.blocks import EncodingBlock
from rankaae_tpu.models.primitives import BatchNorm, Dropout, Linear, PReLU, softplus_beta

import jax.numpy as jnp


class FCEncoder(nn.Module):
    """MLP encoder — the form every shipped config uses
    (reference ``model.py:330-378``; ``ae_form: FC``).

    [Linear -> PReLU -> BN -> Dropout] x (n_layers-1) -> Linear -> BN.
    """

    nstyle: int = 5
    dropout_rate: float = 0.2
    dim_in: int = 256
    n_layers: int = 3
    hidden_size: int = 64

    remat: bool = False

    @nn.compact
    def __call__(self, spec, train: bool = True):
        h = self.hidden_size
        x = spec
        for i in range(self.n_layers - 1):
            x = Linear(h, name=f"lin{i}")(x)
            x = PReLU(h, name=f"prelu{i}")(x)
            x = BatchNorm(h, name=f"bn{i}")(x, train)
            x = Dropout(self.dropout_rate, name=f"drop{i}")(x, train)
        x = Linear(self.nstyle, name="lin_out")(x)
        return BatchNorm(self.nstyle, name="bn_style")(x, train)


class Encoder(nn.Module):
    """5-block conv encoder ("normal" form, reference ``model.py:232-261``):
    (B, 256) -> 5x EncodingBlock -> flatten(32) -> Linear -> BN."""

    nstyle: int = 5
    dropout_rate: float = 0.2
    dim_in: int = 256
    n_layers: int = 3   # placeholder for registry signature parity

    remat: bool = False

    @nn.compact
    def __call__(self, spec, train: bool = True):
        x = spec[:, None, :]   # (B, 1, L)
        specs = [
            dict(in_channels=1, out_channels=4, in_len=self.dim_in, out_len=128, kernel_size=11, excitation=4),
            dict(in_channels=4, out_channels=4, in_len=128, out_len=64, kernel_size=11, excitation=4),
            dict(in_channels=4, out_channels=4, in_len=64, out_len=32, kernel_size=7, excitation=2),
            dict(in_channels=4, out_channels=4, in_len=32, out_len=16, kernel_size=7, excitation=2),
            dict(in_channels=4, out_channels=4, in_len=16, out_len=8, kernel_size=5, excitation=1),
        ]
        block_cls = nn.remat(EncodingBlock, static_argnums=(2,)) \
            if self.remat else EncodingBlock
        for i, s in enumerate(specs):
            x = block_cls(stride=2, dropout_rate=self.dropout_rate, name=f"block{i}", **s)(x, train)
        x = x.reshape(x.shape[0], 32)
        x = Linear(self.nstyle, name="lin3")(x)
        return BatchNorm(self.nstyle, name="bn_style")(x, train)


class CompactEncoder(nn.Module):
    """3-block conv encoder (reference ``model.py:264-295``)."""

    nstyle: int = 5
    dropout_rate: float = 0.2
    dim_in: int = 256
    n_layers: int = 3

    remat: bool = False

    @nn.compact
    def __call__(self, spec, train: bool = True):
        x = spec[:, None, :]
        specs = [
            dict(in_channels=1, out_channels=4, in_len=self.dim_in, out_len=64, kernel_size=11, excitation=4),
            dict(in_channels=4, out_channels=4, in_len=64, out_len=16, kernel_size=7, excitation=2),
            dict(in_channels=4, out_channels=4, in_len=16, out_len=8, kernel_size=5, excitation=1),
        ]
        block_cls = nn.remat(EncodingBlock, static_argnums=(2,)) \
            if self.remat else EncodingBlock
        for i, s in enumerate(specs):
            x = block_cls(stride=2, dropout_rate=self.dropout_rate, name=f"block{i}", **s)(x, train)
        x = x.reshape(x.shape[0], 32)
        x = Linear(self.nstyle, name="lin3")(x)
        return BatchNorm(self.nstyle, name="bn_style")(x, train)


class QvecEncoder(nn.Module):
    """MLP encoder over 12-dim q-vectors, main + shortcut summed
    (reference ``model.py:298-327``)."""

    nstyle: int = 5
    dropout_rate: float = 0.2
    dim_in: int = 12
    n_layers: int = 3

    remat: bool = False

    @nn.compact
    def __call__(self, q_vec, train: bool = True):
        x = Linear(8, name="main_lin0")(q_vec)
        x = jnp.maximum(x, 0.0)
        x = Dropout(self.dropout_rate, name="main_drop")(x, train)
        x = Linear(6, name="main_lin1")(x)
        x = jnp.maximum(x, 0.0)
        x = BatchNorm(6, name="main_bn1")(x, train)
        x = Linear(4, name="main_lin2")(x)
        x = softplus_beta(x, beta=2.0)
        x = BatchNorm(4, name="main_bn2")(x, train)
        x = Linear(self.nstyle, name="main_lin3")(x)
        x = BatchNorm(self.nstyle, name="main_bn3")(x, train)

        s = Linear(8, name="short_lin0")(q_vec)
        s = jnp.maximum(s, 0.0)
        s = Dropout(self.dropout_rate, name="short_drop")(s, train)
        s = Linear(self.nstyle, name="short_lin1")(s)
        s = BatchNorm(self.nstyle, name="short_bn")(s, train)
        return x + s
