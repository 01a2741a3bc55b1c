"""Decoder zoo: latent styles (B, nstyle) -> spectrum (B, dim_out).

Behavioral spec: reference ``sc/clustering/model.py:381-570``.  The last-layer
activation is ReLU or Softplus(beta=2) per ``decoder_activation``.
"""
from __future__ import annotations

from flax import linen as nn
import jax.numpy as jnp

from rankaae_tpu.models.blocks import DecodingBlock, EncodingBlock
from rankaae_tpu.models.primitives import (
    BatchNorm,
    Conv1d,
    Dropout,
    Linear,
    PReLU,
    softplus_beta,
)


def _last_act(name: str):
    if name == "ReLu":
        return lambda x: jnp.maximum(x, 0.0)
    if name == "Softplus":
        return lambda x: softplus_beta(x, beta=2.0)
    raise ValueError(f'Unknown activation "{name}", use "ReLu" or "Softplus"')


class FCDecoder(nn.Module):
    """MLP decoder (reference ``model.py:518-570``): mirror of FCEncoder with
    a ReLU/Softplus head."""

    nstyle: int = 5
    dropout_rate: float = 0.2
    dim_out: int = 256
    last_layer_activation: str = "ReLu"
    n_layers: int = 3
    hidden_size: int = 64

    remat: bool = False

    @nn.compact
    def __call__(self, z, train: bool = True):
        act = _last_act(self.last_layer_activation)
        h = self.hidden_size
        x = z
        for i in range(self.n_layers - 1):
            x = Linear(h, name=f"lin{i}")(x)
            x = PReLU(h, name=f"prelu{i}")(x)
            x = BatchNorm(h, name=f"bn{i}")(x, train)
            x = Dropout(self.dropout_rate, name=f"drop{i}")(x, train)
        x = Linear(self.dim_out, name="lin_out")(x)
        return act(x)


class Decoder(nn.Module):
    """Conv decoder ("normal" form, reference ``model.py:381-427``):
    z -> 4x DecodingBlock (len 1->256) -> 5x stride-1 EncodingBlock
    -> BN -> 1x1 Conv -> activation."""

    nstyle: int = 5
    dropout_rate: float = 0.2
    dim_out: int = 256       # fixed at 256 by the architecture
    last_layer_activation: str = "ReLu"
    n_layers: int = 3

    remat: bool = False

    @nn.compact
    def __call__(self, z, train: bool = True):
        act = _last_act(self.last_layer_activation)
        x = z[:, :, None]    # (B, nstyle, 1)
        dec = [
            dict(in_channels=self.nstyle, out_channels=8, in_len=1, excitation=1),
            dict(in_channels=8, out_channels=4, in_len=4, excitation=2),
            dict(in_channels=4, out_channels=4, in_len=16, excitation=2),
            dict(in_channels=4, out_channels=4, in_len=64, excitation=4),
        ]
        dblock_cls = nn.remat(DecodingBlock, static_argnums=(2,)) \
            if self.remat else DecodingBlock
        eblock_cls = nn.remat(EncodingBlock, static_argnums=(2,)) \
            if self.remat else EncodingBlock
        for i, s in enumerate(dec):
            x = dblock_cls(dropout_rate=self.dropout_rate, name=f"dblock{i}", **s)(x, train)
        enc = [
            dict(in_channels=4, out_channels=4, excitation=2),
            dict(in_channels=4, out_channels=4, excitation=2),
            dict(in_channels=4, out_channels=2, excitation=2),
            dict(in_channels=2, out_channels=2, excitation=2),
            dict(in_channels=2, out_channels=2, excitation=2),
        ]
        for i, s in enumerate(enc):
            x = eblock_cls(
                in_len=256, out_len=256, kernel_size=11, stride=1,
                dropout_rate=self.dropout_rate, name=f"eblock{i}", **s,
            )(x, train)
        x = BatchNorm(2, channel_axis=1, name="bn_out")(x, train)
        x = Conv1d(2, 1, 1, name="conv_out")(x)
        return act(x[:, 0, :])


class CompactDecoder(nn.Module):
    """Compact conv decoder (reference ``model.py:430-474``)."""

    nstyle: int = 5
    dropout_rate: float = 0.2
    dim_out: int = 256
    last_layer_activation: str = "ReLu"
    n_layers: int = 3

    remat: bool = False

    @nn.compact
    def __call__(self, z, train: bool = True):
        act = _last_act(self.last_layer_activation)
        x = z[:, :, None]
        dblock_cls = nn.remat(DecodingBlock, static_argnums=(2,)) \
            if self.remat else DecodingBlock
        eblock_cls = nn.remat(EncodingBlock, static_argnums=(2,)) \
            if self.remat else EncodingBlock
        x = dblock_cls(self.nstyle, 8, in_len=1, excitation=1, out_len=8,
                       dropout_rate=self.dropout_rate, name="dblock0")(x, train)
        x = dblock_cls(8, 4, in_len=8, excitation=2, out_len=64,
                       dropout_rate=self.dropout_rate, name="dblock1")(x, train)
        x = dblock_cls(4, 4, in_len=64, excitation=4,
                       dropout_rate=self.dropout_rate, name="dblock2")(x, train)
        x = eblock_cls(4, 4, in_len=256, out_len=self.dim_out, kernel_size=11, stride=1,
                       excitation=2, dropout_rate=self.dropout_rate, name="eblock0")(x, train)
        x = BatchNorm(4, channel_axis=1, name="bn_out")(x, train)
        x = Conv1d(4, 1, 1, name="conv_out")(x)
        return act(x[:, 0, :])


class QvecDecoder(nn.Module):
    """MLP decoder to 12-dim q-vectors, main + shortcut summed
    (reference ``model.py:477-515``)."""

    nstyle: int = 5
    dropout_rate: float = 0.2
    dim_out: int = 12
    last_layer_activation: str = "ReLu"
    n_layers: int = 3

    remat: bool = False

    @nn.compact
    def __call__(self, z, train: bool = True):
        act = _last_act(self.last_layer_activation)
        x = Linear(4, name="main_lin0")(z)
        x = jnp.maximum(x, 0.0)
        x = BatchNorm(4, name="main_bn0")(x, train)
        x = Linear(6, name="main_lin1")(x)
        x = jnp.maximum(x, 0.0)
        x = BatchNorm(6, name="main_bn1")(x, train)
        x = Linear(8, name="main_lin2")(x)
        x = act(x)
        x = Dropout(self.dropout_rate, name="main_drop")(x, train)
        x = Linear(self.dim_out, name="main_lin3")(x)

        s = Linear(8, name="short_lin0")(z)
        s = jnp.maximum(s, 0.0)
        s = Dropout(self.dropout_rate, name="short_drop")(s, train)
        s = Linear(self.dim_out, name="short_lin1")(s)
        return x + s
