"""Train-mode and GRADIENT parity for the conv blocks vs the reference.

``test_blocks_torch_parity.py`` pins the eval-mode forward only.  Training
convergence depends on what it leaves unpinned:

* the train-mode forward (BatchNorm batch-statistics path),
* the running-stat update (torch: biased var normalizes, *unbiased* var is
  tracked, momentum 0.1 — reference modules at model.py:24-174 use defaults),
* the backward through replicate-pad convs, grouped convs/transpose-convs,
  PReLU and train-mode BN.

This file pins all three with copied weights: identical outputs, identical
updated running stats, and identical parameter + input gradients of the same
scalar loss, torch vs jax autodiff (f32 CPU).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from rankaae_tpu.models.blocks import DecodingBlock, EncodingBlock  # noqa: E402
from tests.test_blocks_torch_parity import (  # noqa: E402
    RNGS,
    _copy_bn,
    _copy_conv,
    _copy_linear,
    _copy_prelu,
    _deep_mutable,
    _ref,
)


def _copy_encoding_weights(tblock, params, stats):
    if tblock.bn1 is not None:
        _copy_bn(tblock.bn1, stats["bn1"])
    _copy_conv(tblock.conv1, params["conv1"])
    _copy_prelu(tblock.relu1, params["relu1"])
    _copy_bn(tblock.bn2, stats["bn2"])
    _copy_conv(tblock.conv2, params["conv2"])
    _copy_prelu(tblock.relu2, params["relu2"])
    if tblock.conv_short is not None:
        _copy_conv(tblock.conv_short, params["conv_short"])
        _copy_prelu(tblock.relu_short, params["relu_short"])
    _copy_linear(tblock.fc1, params["fc1"])
    _copy_prelu(tblock.relu_excit_1, params["relu_excit_1"])
    _copy_linear(tblock.fc2, params["fc2"])
    _copy_prelu(tblock.relu_excit_2, params["relu_excit_2"])
    if tblock.conv_excit is not None:
        _copy_bn(tblock.bn_excit, stats["bn_excit"])
        _copy_conv(tblock.conv_excit, params["conv_excit"])
        _copy_prelu(tblock.relu_excit_3, params["relu_excit_3"])


def _grad_pairs(tblock, gparams):
    """(name, torch grad, ours grad) for every copied parameter."""
    pairs = []

    def conv(name, tmod):
        pairs.append((f"{name}.weight", tmod.weight.grad.numpy(),
                      np.asarray(gparams[name]["weight"])))
        pairs.append((f"{name}.bias", tmod.bias.grad.numpy(),
                      np.asarray(gparams[name]["bias"])))

    def linear(name, tmod):
        pairs.append((f"{name}.weight", tmod.weight.grad.numpy(),
                      np.asarray(gparams[name]["kernel"]).T))
        pairs.append((f"{name}.bias", tmod.bias.grad.numpy(),
                      np.asarray(gparams[name]["bias"])))

    def prelu(name, tmod):
        pairs.append((f"{name}.alpha", tmod.weight.grad.numpy(),
                      np.asarray(gparams[name]["alpha"])))

    conv("conv1", tblock.conv1)
    prelu("relu1", tblock.relu1)
    conv("conv2", tblock.conv2)
    prelu("relu2", tblock.relu2)
    if getattr(tblock, "conv_short", None) is not None:
        conv("conv_short", tblock.conv_short)
        prelu("relu_short", tblock.relu_short)
    linear("fc1", tblock.fc1)
    prelu("relu_excit_1", tblock.relu_excit_1)
    linear("fc2", tblock.fc2)
    prelu("relu_excit_2", tblock.relu_excit_2)
    if tblock.conv_excit is not None:
        conv("conv_excit", tblock.conv_excit)
        prelu("relu_excit_3", tblock.relu_excit_3)
    return pairs


def _run_case(tblock, block, x, cot):
    """Shared body: returns (train-mode output pair, stat pairs, grad pairs)."""
    variables = block.init(RNGS, jnp.asarray(x), train=True)
    params = _deep_mutable(variables["params"])
    stats = _deep_mutable(variables.get("batch_stats", {}))
    _copy_encoding_weights(tblock, params, stats)

    # --- torch side: train-mode forward + backward ---
    tblock.train()
    tx = torch.tensor(x, requires_grad=True)
    tout = tblock(tx)
    (tout * torch.tensor(cot)).sum().backward()

    # --- ours: train-mode forward (mutable batch stats) + jax.grad ---
    def loss_fn(p, xin):
        out, updates = block.apply(
            {"params": p, "batch_stats": stats}, xin, train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out * jnp.asarray(cot)), (out, updates)

    (_, (ours_out, updates)), (gparams, gx) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(params, jnp.asarray(x))

    # 1) train-mode forward
    np.testing.assert_allclose(np.asarray(ours_out),
                               tout.detach().numpy(), atol=3e-5,
                               err_msg="train-mode forward")
    # 2) running-stat updates (momentum + unbiased-variance semantics)
    for name, mod in tblock.named_modules():
        if isinstance(mod, torch.nn.BatchNorm1d):
            ours_bn = updates["batch_stats"][name]
            np.testing.assert_allclose(np.asarray(ours_bn["mean"]),
                                       mod.running_mean.numpy(), atol=1e-6,
                                       err_msg=f"{name} running mean")
            np.testing.assert_allclose(np.asarray(ours_bn["var"]),
                                       mod.running_var.numpy(), atol=1e-5,
                                       err_msg=f"{name} running var")
    # 3) gradients: input + every parameter
    np.testing.assert_allclose(np.asarray(gx), tx.grad.numpy(), atol=5e-5,
                               err_msg="input gradient")
    for name, tg, og in _grad_pairs(tblock, gparams):
        scale = max(np.abs(tg).max(), 1.0)
        np.testing.assert_allclose(og, tg, atol=5e-5 * scale,
                                   err_msg=f"grad {name}")


@pytest.mark.parametrize(
    "cin,cout,in_len,out_len,k,stride,excitation",
    [
        (1, 4, 256, 128, 11, 2, 4),   # Encoder block0 (replicate-pad, shortcut)
        (4, 4, 64, 32, 7, 2, 2),      # middle block (grouped shortcut)
        (4, 2, 256, 256, 11, 1, 2),   # channel-changing stride-1 block
    ],
)
def test_encoding_block_train_and_grads(rng, cin, cout, in_len, out_len, k,
                                        stride, excitation):
    ref = _ref()
    tblock = ref.EncodingBlock(cin, cout, in_len, out_len, kernel_size=k,
                               stride=stride, excitation=excitation,
                               dropout_rate=0.0)
    block = EncodingBlock(cin, cout, in_len, out_len, kernel_size=k,
                          stride=stride, excitation=excitation,
                          dropout_rate=0.0)
    x = rng.normal(size=(16, cin, in_len)).astype(np.float32)
    cot = rng.normal(size=(16, cout, out_len)).astype(np.float32)
    _run_case(tblock, block, x, cot)


@pytest.mark.parametrize(
    "cin,cout,in_len,out_len,excitation",
    [
        (6, 8, 1, 4, 1),     # dblock0 (in_len=1: no bn1)
        (8, 4, 4, 16, 2),    # middle dblock (grouped transpose shortcut)
        (4, 4, 64, 256, 4),  # final dblock
    ],
)
def test_decoding_block_train_and_grads(rng, cin, cout, in_len, out_len,
                                        excitation):
    ref = _ref()
    tblock = ref.DecodingBlock(cin, cout, in_len, excitation=excitation,
                               dropout_rate=0.0, out_len=out_len)
    block = DecodingBlock(cin, cout, in_len, excitation=excitation,
                          dropout_rate=0.0, out_len=out_len)
    x = rng.normal(size=(16, cin, in_len)).astype(np.float32)
    cot = rng.normal(size=(16, cout, out_len)).astype(np.float32)
    _run_case(tblock, block, x, cot)
