"""BN running-statistics recalibration (models/recalibrate.py).

Net-new over the reference (torch.optim.swa_utils.update_bn analog); the
motivating data is PARITY_RESULTS_CONV.md: some conv seeds end training with
converged train-mode reconstruction but eval-mode reconstruction 3-4x worse —
a BN running-stats mismatch that one recalibration pass removes.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankaae_tpu.models.primitives import BatchNorm
from rankaae_tpu.models.recalibrate import recalibrate_batch_stats
from rankaae_tpu.train.trainer import RankAAETrainer
from tests.test_conv_forms_training import conv_data  # noqa: F401 (fixture)
from tests.test_trainer import _tiny_cfg


def test_ema_inversion_exact():
    """Recalibrated stats equal the direct full-batch statistics exactly."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32) * 3 + 1)
    bn = BatchNorm(num_features=16)
    variables = bn.init(jax.random.PRNGKey(0), x, train=True)
    # a "trained" running state far from this batch's statistics
    old = {"mean": jnp.full((16,), -2.0), "var": jnp.full((16,), 9.0)}
    _, mut = bn.apply({"batch_stats": old}, x, train=True,
                      mutable=["batch_stats"])
    m = BatchNorm.momentum
    recal = jax.tree_util.tree_map(
        lambda new, o: (new - (1 - m) * o) / m, mut["batch_stats"], old)
    n = x.shape[0]
    want_mean = np.mean(np.asarray(x), axis=0)
    want_var = np.var(np.asarray(x), axis=0, ddof=1)  # unbiased, as stored
    np.testing.assert_allclose(np.asarray(recal["mean"]), want_mean,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(recal["var"]), want_var,
                               rtol=1e-4, atol=1e-5)
    del variables, n


@pytest.mark.parametrize(
    "ae_form",
    [pytest.param("compact", marks=pytest.mark.slow), "FC"])
def test_recalibrated_eval_matches_trainmode(conv_data, ae_form):  # noqa: F811
    """The defining property: after recalibration, an eval-mode forward on the
    recalibration set equals the train-mode forward (dropout off) — every BN
    layer's running stats ARE that pass's batch statistics.  Also: the result
    must not depend on the pre-recalibration stats (exact EMA inversion)."""
    cfg = _tiny_cfg(ae_form=ae_form, dim_in=256, dim_out=256, max_epoch=3,
                    batch_size=32, epoch_stop_smooth=3, dropout_rate=0.0)
    trainer = RankAAETrainer(cfg, 96, 32)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, _ = jax.jit(trainer.run)(state, conv_data)
    params = jax.tree_util.tree_map(np.asarray, state.params)
    stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)

    from rankaae_tpu.models.registry import build_autoencoder

    encoder, decoder = build_autoencoder(cfg)
    recal = recalibrate_batch_stats(cfg, params, stats, conv_data.train_spec)

    def fwd(batch_stats, train):
        kw = {"rngs": {"dropout": jax.random.PRNGKey(0)},
              "mutable": ["batch_stats"]} if train else {}
        z = encoder.apply(
            {"params": params["enc"], "batch_stats": batch_stats["enc"]},
            conv_data.train_spec, train=train, **kw)
        if train:
            z = z[0]
        out = decoder.apply(
            {"params": params["dec"], "batch_stats": batch_stats["dec"]},
            z, train=train, **kw)
        if train:
            out = out[0]
        return np.asarray(z), np.asarray(out)

    z_train, out_train = fwd(stats, train=True)     # stats unused in train mode
    z_eval, out_eval = fwd(recal, train=False)
    # equality holds up to the torch-faithful biased(train) vs
    # unbiased(running) variance factor n/(n-1): n = 96 rows for the style
    # BN here -> ~0.5% scale shift on every element
    np.testing.assert_allclose(z_eval, z_train, rtol=0.03, atol=5e-3)
    # the decoder compounds that factor through its nonlinearities — bound
    # the error distribution rather than every element
    diff = np.abs(out_eval - out_train)
    assert float(diff.mean()) < 2e-2, f"mean |diff| {diff.mean():.4g}"
    assert float(np.quantile(diff, 0.99)) < 6e-2, (
        f"p99 |diff| {np.quantile(diff, 0.99):.4g}")

    # exact inversion: recalibration from corrupted stats gives the same result
    corrupted = dict(stats)
    for role in ("enc", "dec"):
        corrupted[role] = jax.tree_util.tree_map_with_path(
            lambda p, x: x * 3.0 + 0.5 if "var" in jax.tree_util.keystr(p)
            else x + 0.5, stats[role])
    recal2 = recalibrate_batch_stats(cfg, params, corrupted,
                                     conv_data.train_spec)
    for x, y in zip(jax.tree_util.tree_leaves(recal),
                    jax.tree_util.tree_leaves(recal2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_amplitude_gain_calibration(conv_data):  # noqa: F811
    """amplitude_gain measures the median output/target amplitude ratio and
    an InferenceModel built with that gain decodes at median ratio 1 —
    the deployment correction for the flex objective's unconstrained
    coherent gain drift (amp_recalibrate knob)."""
    from rankaae_tpu.models.inference import InferenceModel
    from rankaae_tpu.models.recalibrate import amplitude_gain

    cfg = _tiny_cfg(ae_form="FC", dim_in=256, dim_out=256, max_epoch=2,
                    batch_size=32, epoch_stop_smooth=2)
    trainer = RankAAETrainer(cfg, 96, 32)
    state = trainer.init_state(jax.random.PRNGKey(1))
    state, _ = jax.jit(trainer.run)(state, conv_data)
    params = jax.tree_util.tree_map(np.asarray, state.params)
    stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)

    x = np.asarray(conv_data.train_spec)
    base = InferenceModel(params, stats, cfg)
    raw_ratio = np.abs(base.decode(base.encode(x)).mean(axis=1)) / np.abs(
        x.mean(axis=1))
    g = amplitude_gain(cfg, params, stats, conv_data.train_spec)
    assert 0.5 <= g <= 2.0
    want = float(np.clip(np.median(raw_ratio), 0.5, 2.0))
    np.testing.assert_allclose(g, want, rtol=1e-5)

    # out_gain divides decoder outputs exactly
    cal = InferenceModel(params, stats, cfg, out_gain=g)
    z = base.encode(x)
    np.testing.assert_allclose(cal.decode(z), base.decode(z) / g,
                               rtol=1e-5, atol=1e-7)
    if 0.5 < float(np.median(raw_ratio)) < 2.0:  # unclipped: exact property
        cal_ratio = np.abs(cal.decode(cal.encode(x)).mean(axis=1)) / np.abs(
            x.mean(axis=1))
        assert abs(float(np.median(cal_ratio)) - 1.0) < 1e-4


def test_amp_gain_bundle_roundtrip(conv_data, tmp_path):  # noqa: F811
    """from_bundle picks up the manifest's amp_gain (the amp_recalibrate
    deployment path used by report/serve)."""
    from rankaae_tpu.models.inference import InferenceModel
    from rankaae_tpu.utils.checkpoint import save_model_bundle

    cfg = _tiny_cfg(ae_form="FC", dim_in=256, dim_out=256, max_epoch=1,
                    batch_size=32, epoch_stop_smooth=1)
    trainer = RankAAETrainer(cfg, 96, 32)
    state = trainer.init_state(jax.random.PRNGKey(2))
    params = jax.tree_util.tree_map(np.asarray, state.params)
    stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    path = str(tmp_path / "final.mpk")
    save_model_bundle(path, params, stats, cfg, extra={"amp_gain": 2.0})
    loaded = InferenceModel.from_bundle(path)
    assert loaded.out_gain == 2.0
    plain = InferenceModel(params, stats, cfg)
    z = np.zeros((4, cfg.nstyle), np.float32)
    np.testing.assert_allclose(loaded.decode(z), plain.decode(z) / 2.0,
                               rtol=1e-6, atol=1e-8)
