"""Loss numerics vs independent torch implementations of the reference math
(``sc/utils/functions.py``), plus on-device stats vs scipy."""
import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from scipy import stats as sstats  # noqa: E402

from rankaae_tpu.ops.kendall import kendall_constraint  # noqa: E402
from rankaae_tpu.ops.losses import (  # noqa: E402
    alpha_schedule,
    bce_with_logits,
    mse,
    nll_loss,
    recon_loss,
    smoothness_loss,
)
from rankaae_tpu.ops.stats import (  # noqa: E402
    max_interstyle_spearman,
    min_style_shapiro,
    shapiro_w,
    spearman_rho,
)


def _torch_kendall(descriptors, styles, activate):
    """The reference formula (functions.py:37-79), re-derived in torch."""
    d = torch.tensor(descriptors)
    s = torch.tensor(styles, requires_grad=True)
    n_aux = s.shape[1]
    target = torch.sign(d[:, None, :] - d[None, :, :])
    pred = s[:, None, :] - s[None, :, :]
    n = pred.shape[0]
    product = pred * target
    if activate:
        pos = product > 0
        neg = product < 0
        for k in range(n_aux):
            n_same = max(int(pos[:, :, k].sum()), 1)
            n_opp = max(int(neg[:, :, k].sum()), 1)
            w = n_opp / max(n_same, n_opp)
            product = torch.where(
                pos & (torch.arange(n_aux) == k), product * w, product
            )
    loss = -product.sum() / ((n * n - n) * n_aux)
    loss.backward()
    return loss.item(), s.grad.numpy()


@pytest.mark.parametrize("activate", [False, True])
def test_kendall_matches_reference_math(rng, activate):
    b, k = 64, 5
    descriptors = rng.normal(size=(b, k)).astype(np.float32)
    # make one descriptor discrete to exercise sign ties (CN is {4,5,6})
    descriptors[:, 1] = rng.choice([4.0, 5.0, 6.0], b)
    styles = rng.normal(size=(b, k)).astype(np.float32)
    # exact style ties (pred == 0, target != 0): torch's in-place masked
    # scale leaves those product entries untouched, so their gradient is
    # the raw t — the masked-sum form must keep that path (ops/kendall.py
    # sum_tie)
    styles[3] = styles[4]

    ref_loss, ref_grad = _torch_kendall(descriptors, styles, activate)
    f = lambda s: kendall_constraint(jnp.asarray(descriptors), s, activate=activate)
    loss, grad = jax.value_and_grad(f)(jnp.asarray(styles))
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), ref_grad, atol=1e-6)


def test_recon_loss_plain_matches_torch_mse(rng):
    a = rng.normal(size=(16, 256)).astype(np.float32)
    b = rng.normal(size=(16, 256)).astype(np.float32)
    ours = float(recon_loss(jnp.asarray(a), jnp.asarray(b)))
    theirs = torch.nn.MSELoss()(torch.tensor(b), torch.tensor(a)).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_recon_loss_flex_matches_reference_math(rng):
    """Flex-target recon (functions.py:101-105): scale penalty + clamped
    detached rescale of the target."""
    spec_in = np.abs(rng.normal(size=(16, 256))).astype(np.float32) + 0.1
    spec_out = np.abs(rng.normal(size=(16, 256))).astype(np.float32) + 0.1

    si = torch.tensor(spec_in)
    so = torch.tensor(spec_out, requires_grad=True)
    scale = torch.abs(so.mean(dim=1)) / torch.abs(si.mean(dim=1))
    ref = ((scale - 1.0) ** 2).mean() * 0.1
    scale = torch.clamp(scale.detach(), min=0.7, max=1.3)
    ref = ref + torch.nn.MSELoss()(so, (si.T * scale).T)
    ref.backward()

    f = lambda out: recon_loss(jnp.asarray(spec_in), out, scale=True)
    loss, grad = jax.value_and_grad(f)(jnp.asarray(spec_out))
    np.testing.assert_allclose(float(loss), ref.item(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), so.grad.numpy(), atol=1e-6)


def test_bce_with_logits_matches_torch(rng):
    logits = rng.normal(size=(32,)).astype(np.float32) * 3
    targets = (rng.uniform(size=(32,)) > 0.5).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    theirs = torch.nn.BCEWithLogitsLoss()(torch.tensor(logits), torch.tensor(targets)).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_nll_loss_matches_torch(rng):
    x = rng.normal(size=(32, 2)).astype(np.float32)
    logp = np.log(np.exp(x) / np.exp(x).sum(axis=1, keepdims=True)).astype(np.float32)
    targets = rng.integers(0, 2, 32).astype(np.int64)
    ours = float(nll_loss(jnp.asarray(logp), jnp.asarray(targets.astype(np.int32))))
    theirs = torch.nn.NLLLoss()(torch.tensor(logp), torch.tensor(targets)).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_smoothness_loss_reference_math(rng):
    """smoothness = MSE(spec, gaussian_smooth(spec)) — verified against a
    direct numpy convolution with the reference kernel."""
    import math

    spec = rng.normal(size=(8, 256)).astype(np.float32)
    k, sigma = 17, 3.0
    grid = np.arange(k, dtype=np.float32)
    kern = np.exp(-(((grid - (k - 1) / 2) / sigma) ** 2) / 2) / (sigma * math.sqrt(2 * math.pi))
    kern /= kern.sum()
    pad = (k - 1) // 2
    padded = np.pad(spec, ((0, 0), (pad, pad)), mode="edge")
    smoothed = np.stack([np.convolve(row, kern[::-1], mode="valid") for row in padded])
    expected = np.mean((spec - smoothed) ** 2)
    ours = float(smoothness_loss(jnp.asarray(spec), k, sigma))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_alpha_schedule_matches_reference_math():
    # reference functions.py:214-219
    for p, step, limit in [(0.0, 800, 0.7), (0.3, 739, 0.7172), (1.0, 800, 0.7)]:
        expected = (2.0 / (1.0 + np.exp(-1.0e4 / step * p)) - 1) * limit
        np.testing.assert_allclose(float(alpha_schedule(p, step, limit)), expected, rtol=1e-6)


def test_spearman_matches_scipy(rng):
    x = rng.normal(size=500).astype(np.float32)
    y = 0.3 * x + rng.normal(size=500).astype(np.float32)
    ours = float(spearman_rho(jnp.asarray(x), jnp.asarray(y)))
    theirs = sstats.spearmanr(x, y).correlation
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_max_interstyle_spearman_matches_scipy(rng):
    styles = rng.normal(size=(300, 6)).astype(np.float32)
    styles[:, 3] += 0.5 * styles[:, 1]
    ours = float(max_interstyle_spearman(jnp.asarray(styles)))
    theirs = max(
        abs(sstats.spearmanr(styles[:, i], styles[:, j]).correlation)
        for i, j in itertools.combinations(range(6), 2)
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("n", [50, 500, 1050])
def test_shapiro_w_matches_scipy(rng, n):
    for dist in ["normal", "uniform", "lognormal"]:
        x = getattr(rng, dist)(size=n).astype(np.float32)
        ours = float(shapiro_w(jnp.asarray(x)))
        theirs = sstats.shapiro(x).statistic
        np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_min_style_shapiro(rng):
    styles = rng.normal(size=(400, 6)).astype(np.float32)
    styles[:, 2] = rng.uniform(size=400)  # one clearly non-normal dim
    ours = float(min_style_shapiro(jnp.asarray(styles)))
    theirs = min(sstats.shapiro(styles[:, i]).statistic for i in range(6))
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_recon_loss_flex_scale_weight_knob(rng):
    """Net-new flex_scale_weight (TrainConfig): reweights ONLY the amplitude
    penalty term; default 0.1 is the faithful reference constant
    (functions.py:101)."""
    spec_in = np.abs(rng.normal(size=(16, 256))).astype(np.float32) + 0.1
    spec_out = np.abs(rng.normal(size=(16, 256))).astype(np.float32) + 0.1
    si, so = jnp.asarray(spec_in), jnp.asarray(spec_out)

    base = float(recon_loss(si, so, scale=True))
    default = float(recon_loss(si, so, scale=True, scale_weight=0.1))
    np.testing.assert_allclose(base, default, rtol=0)

    # loss(w) is affine in w: loss(w) = mse_term + w * penalty
    l0 = float(recon_loss(si, so, scale=True, scale_weight=0.0))
    l1 = float(recon_loss(si, so, scale=True, scale_weight=1.0))
    penalty = l1 - l0
    assert penalty > 0
    np.testing.assert_allclose(base, l0 + 0.1 * penalty, rtol=1e-5)


def test_flex_scale_weight_config_validation():
    from rankaae_tpu.utils.config import TrainConfig

    cfg = TrainConfig()
    assert cfg.flex_scale_weight == 0.1  # faithful default
    cfg.replace(flex_scale_weight=1.0)   # validates
    with pytest.raises(ValueError):
        cfg.replace(flex_scale_weight=-0.5)
