"""Block-level parity: our EncodingBlock/DecodingBlock vs the reference's
actual torch modules with copied weights (eval mode, BN running stats warmed
identically)."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from rankaae_tpu.models.blocks import DecodingBlock, EncodingBlock  # noqa: E402

RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


def _ref():
    from tests.conftest import import_reference_sc

    import_reference_sc()
    import sc.clustering.model as ref_model

    return ref_model


# NOTE: jnp.array (not asarray) — jnp.asarray of a torch-backed numpy view
# can alias the torch buffer on the CPU backend, so a later in-place torch
# mutation (e.g. a train-mode BN forward updating running stats) silently
# changes the "copied" jax value.


def _copy_conv(tconv, p):
    p["weight"] = jnp.array(tconv.weight.detach().numpy())
    p["bias"] = jnp.array(tconv.bias.detach().numpy())


def _copy_linear(tlin, p):
    p["kernel"] = jnp.array(tlin.weight.detach().numpy().T)
    p["bias"] = jnp.array(tlin.bias.detach().numpy())


def _copy_prelu(tprelu, p):
    p["alpha"] = jnp.array(tprelu.weight.detach().numpy())


def _copy_bn(tbn, stats):
    stats["mean"] = jnp.array(tbn.running_mean.numpy())
    stats["var"] = jnp.array(tbn.running_var.numpy())


def _deep_mutable(d):
    return {k: _deep_mutable(v) if isinstance(v, dict) else v for k, v in d.items()}


@pytest.mark.parametrize(
    "cin,cout,in_len,out_len,k,stride,excitation",
    [
        (1, 4, 256, 128, 11, 2, 4),   # Encoder block0 (shape-changing)
        (4, 4, 64, 32, 7, 2, 2),      # Encoder middle block
        (4, 4, 256, 256, 11, 1, 2),   # Decoder stride-1 block (identity shortcut)
        (4, 2, 256, 256, 11, 1, 2),   # channel-changing stride-1 block
    ],
)
def test_encoding_block_matches_reference(rng, cin, cout, in_len, out_len, k,
                                          stride, excitation):
    ref = _ref()
    tblock = ref.EncodingBlock(cin, cout, in_len, out_len, kernel_size=k,
                               stride=stride, excitation=excitation,
                               dropout_rate=0.0)
    # warm BN running stats with a train-mode pass
    tblock.train()
    tblock(torch.randn(16, cin, in_len))
    tblock.eval()

    block = EncodingBlock(cin, cout, in_len, out_len, kernel_size=k,
                          stride=stride, excitation=excitation, dropout_rate=0.0)
    x = rng.normal(size=(4, cin, in_len)).astype(np.float32)
    variables = block.init(RNGS, jnp.asarray(x), train=True)
    params = _deep_mutable(variables["params"])
    stats = _deep_mutable(variables.get("batch_stats", {}))

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

    ours = block.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False)
    theirs = tblock(torch.tensor(x)).detach().numpy()
    assert ours.shape == theirs.shape == (4, cout, out_len)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)


@pytest.mark.parametrize(
    "cin,cout,in_len,out_len,excitation",
    [
        (6, 8, 1, 4, 1),     # Decoder dblock0 pattern (in_len=1: no bn1)
        (8, 4, 4, 16, 2),    # middle dblock
        (4, 4, 64, 256, 4),  # final dblock (has dropout branch)
    ],
)
def test_decoding_block_matches_reference(rng, cin, cout, in_len, out_len, excitation):
    ref = _ref()
    tblock = ref.DecodingBlock(cin, cout, in_len, excitation=excitation,
                               dropout_rate=0.0, out_len=out_len)
    tblock.train()
    tblock(torch.randn(16, cin, in_len))
    tblock.eval()

    block = DecodingBlock(cin, cout, in_len, excitation=excitation,
                          dropout_rate=0.0, out_len=out_len)
    x = rng.normal(size=(4, cin, in_len)).astype(np.float32)
    variables = block.init(RNGS, jnp.asarray(x), train=True)
    params = _deep_mutable(variables["params"])
    stats = _deep_mutable(variables.get("batch_stats", {}))

    if tblock.bn1 is not None:
        _copy_bn(tblock.bn1, stats["bn1"])
    _copy_conv(tblock.conv1, params["conv1"])
    _copy_prelu(tblock.relu1, params["relu1"])
    _copy_bn(tblock.bn2, stats["bn2"])
    _copy_conv(tblock.conv2, params["conv2"])
    _copy_prelu(tblock.relu2, params["relu2"])
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

    ours = block.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False)
    theirs = tblock(torch.tensor(x)).detach().numpy()
    assert ours.shape == theirs.shape == (4, cout, out_len)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)
