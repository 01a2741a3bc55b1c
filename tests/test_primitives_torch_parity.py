"""Golden parity tests: our primitives vs torch CPU kernels.

The reference delegates all native compute to libtorch (SURVEY.md §2.9); these
tests pin our JAX re-implementations to torch's numerics on random inputs by
copying identical weights into both and comparing outputs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from rankaae_tpu.models.primitives import (  # noqa: E402
    BatchNorm,
    Conv1d,
    ConvTranspose1d,
    Dropout,
    Linear,
    PReLU,
    gaussian_smooth_1d,
    softplus_beta,
)

ATOL = 1e-5


def _np(x):
    return np.asarray(x)


def test_linear_matches_torch(rng):
    x = rng.normal(size=(8, 32)).astype(np.float32)
    mod = Linear(16)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tl = tnn.Linear(32, 16)
    with torch.no_grad():
        tl.weight.copy_(torch.tensor(_np(params["params"]["kernel"]).T))
        tl.bias.copy_(torch.tensor(_np(params["params"]["bias"])))
    ours = _np(mod.apply(params, jnp.asarray(x)))
    theirs = tl(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_prelu_matches_torch(rng):
    x = rng.normal(size=(4, 6, 50)).astype(np.float32)
    mod = PReLU(6, init_value=0.01, channel_axis=1)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tp = tnn.PReLU(num_parameters=6, init=0.01)
    ours = _np(mod.apply(params, jnp.asarray(x)))
    theirs = tp(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_batchnorm_train_and_eval_match_torch(rng):
    x1 = rng.normal(size=(16, 10)).astype(np.float32) * 2 + 1
    x2 = rng.normal(size=(16, 10)).astype(np.float32)
    mod = BatchNorm(10)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x1), train=True)
    tb = tnn.BatchNorm1d(10, affine=False)

    # two train steps accumulate running stats
    state = variables
    for x in (x1, x2):
        y, mut = mod.apply(state, jnp.asarray(x), train=True, mutable=["batch_stats"])
        state = {"batch_stats": mut["batch_stats"]}
        ty = tb(torch.tensor(x)).detach().numpy()
        np.testing.assert_allclose(_np(y), ty, atol=1e-4)

    np.testing.assert_allclose(
        _np(state["batch_stats"]["mean"]), tb.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        _np(state["batch_stats"]["var"]), tb.running_var.numpy(), atol=1e-5
    )

    # eval mode uses running stats
    tb.eval()
    y_eval = mod.apply(state, jnp.asarray(x2), train=False)
    ty_eval = tb(torch.tensor(x2)).detach().numpy()
    np.testing.assert_allclose(_np(y_eval), ty_eval, atol=1e-4)


def test_batchnorm_channel_axis_conv_layout(rng):
    x = rng.normal(size=(8, 4, 32)).astype(np.float32)
    mod = BatchNorm(4, channel_axis=1)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    tb = tnn.BatchNorm1d(4, affine=False)
    y, mut = mod.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
    ty = tb(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(_np(y), ty, atol=1e-4)
    np.testing.assert_allclose(
        _np(mut["batch_stats"]["var"]), tb.running_var.numpy(), atol=1e-5
    )


@pytest.mark.parametrize(
    "cin,cout,k,stride,pad,mode,groups",
    [
        (1, 4, 11, 1, 5, "replicate", 1),   # EncodingBlock conv1 pattern
        (4, 4, 7, 2, 3, "zeros", 1),        # EncodingBlock conv2 pattern
        (4, 2, 1, 1, 0, "zeros", 2),        # grouped 1x1 excitation conv
        (4, 4, 8, 8, 0, "zeros", 4),        # grouped strided shortcut
    ],
)
def test_conv1d_matches_torch(rng, cin, cout, k, stride, pad, mode, groups):
    x = rng.normal(size=(3, cin, 64)).astype(np.float32)
    mod = Conv1d(cin, cout, k, stride=stride, padding=pad, padding_mode=mode, groups=groups)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tc = tnn.Conv1d(cin, cout, k, stride=stride, padding=pad,
                    padding_mode=mode if mode == "replicate" else "zeros", groups=groups)
    with torch.no_grad():
        tc.weight.copy_(torch.tensor(_np(params["params"]["weight"])))
        tc.bias.copy_(torch.tensor(_np(params["params"]["bias"])))
    ours = _np(mod.apply(params, jnp.asarray(x)))
    theirs = tc(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


@pytest.mark.parametrize(
    "cin,cout,k,groups",
    [
        (6, 8, 2, 1),    # DecodingBlock conv1 pattern
        (8, 8, 2, 1),    # conv2 pattern
        (8, 4, 4, 4),    # grouped shortcut pattern
    ],
)
def test_conv_transpose1d_matches_torch(rng, cin, cout, k, groups):
    x = rng.normal(size=(3, cin, 16)).astype(np.float32)
    mod = ConvTranspose1d(cin, cout, kernel_size=k, stride=k, groups=groups)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    tc = tnn.ConvTranspose1d(cin, cout, k, stride=k, groups=groups)
    with torch.no_grad():
        tc.weight.copy_(torch.tensor(_np(params["params"]["weight"])))
        tc.bias.copy_(torch.tensor(_np(params["params"]["bias"])))
    ours = _np(mod.apply(params, jnp.asarray(x)))
    theirs = tc(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_softplus_beta2_matches_torch(rng):
    x = rng.normal(size=(100,)).astype(np.float32) * 10
    ours = _np(softplus_beta(jnp.asarray(x), beta=2.0))
    theirs = tnn.Softplus(beta=2)(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_gaussian_smoothing_matches_reference_construction(rng):
    """Our constant-folded Gaussian smoothing vs torch depthwise conv with the
    reference's kernel construction (model.py:186-207) + ReplicationPad1d."""
    import math

    x = rng.normal(size=(4, 256)).astype(np.float32)
    k, sigma = 17, 3.0
    grid = torch.arange(k, dtype=torch.float32)
    mean = (k - 1) / 2
    kern = torch.exp(-(((grid - mean) / sigma) ** 2) / 2) / (sigma * math.sqrt(2 * math.pi))
    kern = kern / kern.sum()
    xt = torch.tensor(x).unsqueeze(1)
    xt = tnn.ReplicationPad1d((k - 1) // 2)(xt)
    theirs = torch.nn.functional.conv1d(xt, kern.view(1, 1, k)).squeeze(1).numpy()
    ours = _np(gaussian_smooth_1d(jnp.asarray(x), k, sigma))
    np.testing.assert_allclose(ours, theirs, atol=ATOL)


def test_dropout_train_eval(rng):
    x = jnp.ones((1000,))
    mod = Dropout(0.5)
    params = mod.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, train=True)
    y_eval = mod.apply(params, x, train=False)
    np.testing.assert_allclose(_np(y_eval), _np(x))
    y_train = mod.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    kept = _np(y_train) != 0
    assert 0.35 < kept.mean() < 0.65
    np.testing.assert_allclose(_np(y_train)[kept], 2.0)  # inverted scaling
