"""Residual conv blocks for the "normal"/"compact" autoencoder forms.

Behavioral spec: reference ``sc/clustering/model.py:24-174``.  Each block sums
three branches — a 2-conv main path, a strided/grouped shortcut, and a
squeeze-excitation-like MLP over the length axis — with per-channel PReLU
(init 0.01) and affine-free BatchNorm throughout.
"""
from __future__ import annotations

import math

from flax import linen as nn

from rankaae_tpu.models.primitives import (
    BatchNorm,
    Conv1d,
    ConvTranspose1d,
    Dropout,
    Linear,
    PReLU,
)


class EncodingBlock(nn.Module):
    """Downsampling residual block (reference ``model.py:24-100``).

    Input (B, in_channels, in_len) -> (B, out_channels, out_len).
    Main: [BN] -> Conv(k, stride=in_len//(out_len*stride), replicate pad) -> PReLU
          -> BN -> Conv(k, stride, zero pad) -> PReLU.
    Shortcut (when shape changes): grouped Conv(k=s=in_len//out_len) -> PReLU.
    Excitation: [Dropout] -> Linear(in_len->excitation) -> PReLU
          -> Linear(excitation->out_len) -> PReLU [-> BN -> 1x1 grouped Conv -> PReLU].
    """

    in_channels: int
    out_channels: int
    in_len: int
    out_len: int
    kernel_size: int = 7
    stride: int = 2
    excitation: int = 4
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool):
        c_in, c_out = self.in_channels, self.out_channels
        k = self.kernel_size

        out = BatchNorm(c_in, channel_axis=1, name="bn1")(x, train) if c_in > 1 else x
        residual = out

        out = Conv1d(
            c_in, c_out, k, stride=self.in_len // (self.out_len * self.stride),
            padding=(k - 1) // 2, padding_mode="replicate", name="conv1",
        )(out)
        out = PReLU(c_out, channel_axis=1, name="relu1")(out)
        out = BatchNorm(c_out, channel_axis=1, name="bn2")(out, train)
        out = Conv1d(
            c_out, c_out, k, stride=self.stride, padding=(k - 1) // 2, name="conv2"
        )(out)
        out = PReLU(c_out, channel_axis=1, name="relu2")(out)

        if self.stride > 1 or c_in != c_out:
            res = Conv1d(
                c_in, c_out, self.in_len // self.out_len, stride=self.in_len // self.out_len,
                groups=math.gcd(c_in, c_out), name="conv_short",
            )(residual)
            res = PReLU(c_out, channel_axis=1, name="relu_short")(res)
        else:
            res = residual

        excit = residual
        if self.in_len > 10:
            excit = Dropout(self.dropout_rate, name="dropout_1")(excit, train)
        excit = Linear(self.excitation, name="fc1")(excit)
        excit = PReLU(c_in, channel_axis=1, name="relu_excit_1")(excit)
        excit = Linear(self.out_len, name="fc2")(excit)
        excit = PReLU(c_in, channel_axis=1, name="relu_excit_2")(excit)
        if c_in != c_out:
            excit = BatchNorm(c_in, channel_axis=1, name="bn_excit")(excit, train)
            excit = Conv1d(c_in, c_out, 1, groups=math.gcd(c_in, c_out), name="conv_excit")(excit)
            excit = PReLU(c_out, channel_axis=1, name="relu_excit_3")(excit)

        return out + res + excit


class DecodingBlock(nn.Module):
    """Upsampling residual block (reference ``model.py:103-174``).

    Mirror of :class:`EncodingBlock` built on transposed convs; all of them
    have kernel == stride, so each lowers to one MXU einsum.
    Default ``out_len = 4 * in_len``.
    """

    in_channels: int
    out_channels: int
    in_len: int
    excitation: int = 4
    dropout_rate: float = 0.2
    out_len: int = -1   # -1 -> 4 * in_len

    @nn.compact
    def __call__(self, x, train: bool):
        c_in, c_out = self.in_channels, self.out_channels
        out_len = self.out_len if self.out_len > 0 else self.in_len * 4

        out = BatchNorm(c_in, channel_axis=1, name="bn1")(x, train) if self.in_len > 1 else x
        residual = out

        out = ConvTranspose1d(c_in, c_out, kernel_size=2, stride=2, name="conv1")(out)
        out = PReLU(c_out, channel_axis=1, name="relu1")(out)
        out = BatchNorm(c_out, channel_axis=1, name="bn2")(out, train)
        s2 = out_len // (self.in_len * 2)
        out = ConvTranspose1d(c_out, c_out, kernel_size=s2, stride=s2, name="conv2")(out)
        out = PReLU(c_out, channel_axis=1, name="relu2")(out)

        ss = out_len // self.in_len
        res = ConvTranspose1d(
            c_in, c_out, kernel_size=ss, stride=ss, groups=math.gcd(c_in, c_out),
            name="conv_short",
        )(residual)
        res = PReLU(c_out, channel_axis=1, name="relu_short")(res)

        excit = residual
        if self.in_len > 10:
            excit = Dropout(self.dropout_rate, name="dropout_1")(excit, train)
        excit = Linear(self.excitation, name="fc1")(excit)
        excit = PReLU(c_in, channel_axis=1, name="relu_excit_1")(excit)
        excit = Linear(out_len, name="fc2")(excit)
        excit = PReLU(c_in, channel_axis=1, name="relu_excit_2")(excit)
        if c_in != c_out:
            excit = BatchNorm(c_in, channel_axis=1, name="bn_excit")(excit, train)
            excit = Conv1d(c_in, c_out, 1, groups=math.gcd(c_in, c_out), name="conv_excit")(excit)
            excit = PReLU(c_out, channel_axis=1, name="relu_excit_3")(excit)

        return out + res + excit
