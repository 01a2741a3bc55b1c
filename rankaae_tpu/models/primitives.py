"""Neural-net primitives with PyTorch-compatible semantics, built on Flax.

These cover the native-op surface the reference inherits from libtorch
(SURVEY.md §2.9): Conv1d with replicate padding / groups / stride,
ConvTranspose1d (grouped), BatchNorm1d(affine=False) with running stats,
per-channel PReLU, Linear, Dropout, Softplus(beta=2).

Parity notes
------------
* Initializers follow torch defaults (kaiming-uniform with a=sqrt(5) for
  Linear/Conv weights, U(+-1/sqrt(fan_in)) for biases) so training dynamics
  are statistically comparable to the reference; exact bitwise parity is a
  non-goal (different RNG streams).
* BatchNorm matches torch ``BatchNorm1d(affine=False)``: train mode
  normalizes with *biased* batch variance and updates running stats with
  ``(1-m)*run + m*batch`` where the running variance uses the *unbiased*
  batch variance; eval mode uses running stats.  momentum=0.1, eps=1e-5.
* All transposed convolutions in the reference zoo have kernel == stride
  (``model.py:114-119,140``); that case lowers to a single einsum —
  one MXU contraction — instead of a gradient-of-conv.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------------------
# matmul/conv precision knob
# ---------------------------------------------------------------------------
# HIGHEST (true f32) by default — required by the torch-parity tolerances.
# "default" (bf16 passes on TPU) shrinks the lowered program substantially,
# which matters for the deep conv families under memory-limited remote
# compilers.  Process-level knob: set BEFORE building/compiling models
# (jit caches do not observe changes).

_MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def set_matmul_precision(name: str) -> None:
    """'highest' (f32, parity-exact) or 'default' (fast TPU passes)."""
    global _MATMUL_PRECISION
    _MATMUL_PRECISION = {
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
    }[name]


def get_matmul_precision():
    return _MATMUL_PRECISION


# ---------------------------------------------------------------------------
# activation dtype knob (mixed precision)
# ---------------------------------------------------------------------------
# float32 by default (parity-exact: every cast below is then a no-op).
# "bfloat16" stores module activations in bf16 — on TPU the training program
# is HBM-bandwidth/op-floor bound (see scripts/chip_calibration.py), so
# halving every materialized activation buffer is a direct throughput win.
# Numerics policy: parameters, optimizer states, BatchNorm statistics, loss
# values, and reductions stay float32; only the tensors flowing between
# modules (and the weight copies consumed by matmuls/convs) are bf16.
# Process-level knob like the matmul precision: set BEFORE building models.

_ACT_DTYPE = jnp.float32


def set_activation_dtype(name: str) -> None:
    """'float32' (parity-exact default) or 'bfloat16' (half the HBM traffic)."""
    global _ACT_DTYPE
    _ACT_DTYPE = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def get_activation_dtype():
    return _ACT_DTYPE


import contextlib


@contextlib.contextmanager
def activation_dtype_scope(name: str):
    """Temporarily force the activation dtype (trace-time knob).

    Used by eval/inference paths to pin parity-exact f32 regardless of the
    process's training setting; restores the previous dtype on exit."""
    global _ACT_DTYPE
    prev = _ACT_DTYPE
    set_activation_dtype(name)
    try:
        yield
    finally:
        _ACT_DTYPE = prev


# ---------------------------------------------------------------------------
# torch-default initializers
# ---------------------------------------------------------------------------

def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """Flax Dense kernel has shape (in, out); torch init bound = 1/sqrt(fan_in)."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for_fan_in(fan_in):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv_weight_init(key, shape, dtype=jnp.float32):
    """Conv weight stored as (out_ch, in_ch_per_group, k); fan_in = in_pg * k."""
    fan_in = shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_convt_weight_init(key, shape, dtype=jnp.float32):
    """ConvTranspose weight stored as (in_ch, out_ch_per_group, k).

    torch computes fan_in over dim-1 x kernel: fan_in = out_pg * k
    (torch _calculate_fan_in_and_fan_out uses size(1) as fan_in channels).
    """
    fan_in = shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------

class Linear(nn.Module):
    """torch-initialized Dense over the last axis."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param("kernel", torch_linear_kernel_init, (in_features, self.features))
        bias = self.param("bias", torch_bias_init_for_fan_in(in_features), (self.features,))
        dt = get_activation_dtype()
        y = jnp.dot(x.astype(dt), kernel.astype(dt), precision=get_matmul_precision(),
                    preferred_element_type=jnp.float32)
        return (y + bias).astype(dt)


class PReLU(nn.Module):
    """Per-channel PReLU, torch semantics (reference uses init=0.01 everywhere).

    ``channel_axis`` selects which axis carries the per-channel slope:
    -1 for (B, F) dense activations, 1 for (B, C, L) conv activations.
    """

    num_parameters: int
    init_value: float = 0.01
    channel_axis: int = -1

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha",
            lambda k, s: jnp.full(s, self.init_value, jnp.float32),
            (self.num_parameters,),
        )
        shape = [1] * x.ndim
        shape[self.channel_axis] = self.num_parameters
        a = alpha.reshape(shape).astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class BatchNorm(nn.Module):
    """``torch.nn.BatchNorm1d(affine=False)`` semantics.

    Normalizes over all axes except ``channel_axis``; maintains running
    mean/var in the ``batch_stats`` collection.  ``train=True`` uses batch
    statistics (biased variance) and updates running stats; ``train=False``
    uses running stats.
    """

    num_features: int
    momentum: float = 0.1
    eps: float = 1e-5
    channel_axis: int = -1

    @nn.compact
    def __call__(self, x, train: bool):
        axis = self.channel_axis % x.ndim
        red_axes = tuple(i for i in range(x.ndim) if i != axis)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.num_features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.num_features,), jnp.float32)
        )

        # statistics always in float32 (activations may be bf16)
        xf = x.astype(jnp.float32)
        if train:
            mean = jnp.mean(xf, axis=red_axes)
            var = jnp.mean(jnp.square(xf - _expand(mean, x.ndim, axis)), axis=red_axes)
            if not self.is_initializing():
                n = x.size // self.num_features
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps)
        y = (xf - _expand(mean, x.ndim, axis)) * _expand(inv, x.ndim, axis)
        return y.astype(x.dtype)


def _expand(v, ndim, axis):
    shape = [1] * ndim
    shape[axis] = v.shape[0]
    return v.reshape(shape)


class Conv1d(nn.Module):
    """torch ``Conv1d`` over (B, C, L) with zero or replicate padding and groups."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    padding_mode: str = "zeros"    # "zeros" | "replicate"
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        assert self.in_channels % self.groups == 0 and self.out_channels % self.groups == 0
        in_pg = self.in_channels // self.groups
        weight = self.param(
            "weight", torch_conv_weight_init, (self.out_channels, in_pg, self.kernel_size)
        )
        bias = self.param(
            "bias", torch_bias_init_for_fan_in(in_pg * self.kernel_size), (self.out_channels,)
        )
        dt = get_activation_dtype()
        x = x.astype(dt)
        if self.padding > 0:
            mode = "edge" if self.padding_mode == "replicate" else "constant"
            x = jnp.pad(x, ((0, 0), (0, 0), (self.padding, self.padding)), mode=mode)
        # conv (unlike dot_general) requires matching operand dtypes in both
        # the forward and the transposed/VJP convs, so under bf16 the output
        # must be bf16 too (the MXU still accumulates in f32 internally)
        y = jax.lax.conv_general_dilated(
            x,
            weight.astype(dt),
            window_strides=(self.stride,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=self.groups,
            precision=get_matmul_precision(),
            preferred_element_type=dt,
        )
        return (y + bias.astype(dt)[None, :, None]).astype(dt)


class ConvTranspose1d(nn.Module):
    """torch ``ConvTranspose1d`` over (B, C, L), with groups.

    Every instance in the reference zoo has ``kernel_size == stride``
    (pure learned upsampling), which lowers here to one grouped einsum:
    ``out[b, g, o, l, t] = sum_c x[b, g, c, l] * W[g, c, o, t]`` reshaped to
    (B, C_out, L*k).  This is a single MXU contraction — no scatter, no
    gradient-of-conv lowering.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        assert self.kernel_size == self.stride, (
            "reference architectures only use kernel_size == stride "
            "(sc/clustering/model.py:114-119,140); general transposed conv "
            "is out of scope until needed"
        )
        g = self.groups
        in_pg = self.in_channels // g
        out_pg = self.out_channels // g
        weight = self.param(
            "weight", torch_convt_weight_init, (self.in_channels, out_pg, self.kernel_size)
        )
        bias = self.param(
            # torch fan_in for ConvTranspose bias = out_pg * k
            "bias", torch_bias_init_for_fan_in(out_pg * self.kernel_size), (self.out_channels,)
        )
        dt = get_activation_dtype()
        b, _, length = x.shape
        xg = x.astype(dt).reshape(b, g, in_pg, length)
        wg = weight.astype(dt).reshape(g, in_pg, out_pg, self.kernel_size)
        y = jnp.einsum("bgcl,gcot->bgolt", xg, wg,
                       precision=get_matmul_precision(),
                       preferred_element_type=jnp.float32)
        y = y.reshape(b, self.out_channels, length * self.kernel_size)
        return (y + bias[None, :, None]).astype(dt)


class Dropout(nn.Module):
    """Inverted dropout (torch semantics), active only in train mode."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if not train or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)


def softplus_beta(x, beta: float = 2.0, threshold: float = 20.0):
    """torch ``Softplus(beta=2)``: (1/beta) * log(1 + exp(beta*x)), linear
    above threshold for numerical stability."""
    bx = beta * x
    return jnp.where(bx > threshold, x, jnp.logaddexp(bx, 0.0) / beta)


def gaussian_kernel_1d(kernel_size: int, sigma: float) -> jnp.ndarray:
    """Normalized 1-D Gaussian kernel (reference ``model.py:186-200``)."""
    grid = jnp.arange(kernel_size, dtype=jnp.float32)
    mean = (kernel_size - 1) / 2.0
    k = jnp.exp(-0.5 * ((grid - mean) / sigma) ** 2) / (sigma * math.sqrt(2 * math.pi))
    return k / jnp.sum(k)


def gaussian_smooth_1d(x: jnp.ndarray, kernel_size: int = 17, sigma: float = 3.0) -> jnp.ndarray:
    """Depthwise Gaussian smoothing of (B, L) signals with replicate padding.

    Equivalent to the reference's ``GaussianSmoothing`` module + explicit
    ``ReplicationPad1d`` (``sc/utils/functions.py:203-209``).  The kernel is a
    constant folded into the XLA program — no parameters.
    """
    pad = (kernel_size - 1) // 2
    x = jnp.asarray(x, jnp.float32)   # loss-side smoothing always in f32 (asarray: shim feeds torch tensors)
    kernel = gaussian_kernel_1d(kernel_size, sigma)
    xp = jnp.pad(x[:, None, :], ((0, 0), (0, 0), (pad, pad)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp,
        kernel.reshape(1, 1, kernel_size),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=get_matmul_precision(),
        preferred_element_type=jnp.float32,
    )
    return y[:, 0, :]
