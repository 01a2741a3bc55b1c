"""remat=True (``jax.checkpoint`` on the conv blocks via ``nn.remat``) must
be a pure memory/compute trade: identical parameter trees and numerically
identical training trajectories."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankaae_tpu.train.trainer import RankAAETrainer, TrialData
from tests.test_trainer import _tiny_cfg, tiny_data  # noqa: F401


@pytest.fixture(scope="module")
def conv_data():
    rng = np.random.default_rng(11)
    n, dim = 128, 256   # conv architectures hard-require 256-point spectra
    aux = rng.normal(size=(n, 5)).astype(np.float32)
    t = np.linspace(0, 1, dim, dtype=np.float32)
    spec = (1.0 + aux[:, :1] * np.sin(2 * np.pi * t)[None, :] * 0.3
            + rng.normal(size=(n, dim)).astype(np.float32) * 0.02
            ).astype(np.float32)
    return TrialData(
        train_spec=jnp.asarray(spec[:96]), train_aux=jnp.asarray(aux[:96]),
        val_spec=jnp.asarray(spec[96:]), val_aux=jnp.asarray(aux[96:]),
    )


@pytest.mark.slow
@pytest.mark.parametrize("ae_form", ["normal", "compact"])
def test_remat_conv_form_identical(conv_data, ae_form):
    """Forward passes under remat are bit-identical (params, dropout
    streams, eval outputs — verified separately); training trajectories
    agree to the same tolerance budget the vmap/single pins use: remat
    recomputes the backward's activations, so gradients reassociate at the
    ulp level and Adam's sign-like steps turn that into ~lr-sized
    per-element drift (see test_trials.py::
    test_vmapped_matches_single_one_epoch_params for the derivation).
    Stochastic regularizers off + lr_base=1e-4 keep the drift bounded."""
    base_cfg = _tiny_cfg(ae_form=ae_form, dim_in=256, dim_out=256,
                         max_epoch=2, batch_size=32, epoch_stop_smooth=2,
                         spec_noise=0.0, dropout_rate=0.0,
                         dis_dropout_rate=0.0, dis_noise=0.0, lr_base=1e-4)
    rem_cfg = base_cfg.replace(remat=True)

    runs = {}
    for name, cfg in (("base", base_cfg), ("remat", rem_cfg)):
        trainer = RankAAETrainer(cfg, n_train=96, n_val=32)
        state = trainer.init_state(jax.random.PRNGKey(3))
        state, logs = jax.jit(trainer.run)(state, conv_data)
        runs[name] = (state, logs)

    s0, l0 = runs["base"]
    s1, l1 = runs["remat"]
    # identical parameter structure
    p0 = jax.tree_util.tree_leaves_with_path(s0.params)
    p1 = jax.tree_util.tree_leaves_with_path(s1.params)
    assert [jax.tree_util.keystr(k) for k, _ in p0] == \
        [jax.tree_util.keystr(k) for k, _ in p1]
    # Trajectory agreement is pinned on the LOSSES, not per-element params:
    # remat's gradients reassociate at the ulp level and the 5-optimizer
    # adversarial protocol (BN-stat feedback, PReLU slopes, Adam sign
    # steps) amplifies that chaotically — the same reason the vmap/single
    # pins in test_trials.py compare trajectories, not weights, beyond one
    # epoch.  Exactness of remat itself is pinned bit-for-bit by
    # test_remat_forward_bit_identical below.
    np.testing.assert_allclose(np.asarray(l0["val_recon"]),
                               np.asarray(l1["val_recon"]),
                               rtol=5e-2, atol=1e-4)
    # val_aux (Kendall) hovers near its zero crossing at this horizon —
    # only a coarse magnitude check is meaningful (cf. test_trials.py)
    np.testing.assert_allclose(np.asarray(l0["val_aux"]),
                               np.asarray(l1["val_aux"]),
                               rtol=0.5, atol=2e-2)


@pytest.mark.slow
def test_remat_forward_bit_identical():
    """The cheap, tight pin: same init, same rng streams, same train-mode
    forward (incl. dropout masks) with and without remat."""
    from rankaae_tpu.models.encoders import Encoder

    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2)}
    x = jnp.asarray(np.random.default_rng(0).standard_normal((16, 256)),
                    jnp.float32)
    outs = {}
    for rem in (False, True):
        enc = Encoder(nstyle=6, dropout_rate=0.5, dim_in=256, remat=rem)
        v = enc.init(rngs, x, train=True)
        out, _ = enc.apply(
            v, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(7),
                  "noise": jax.random.PRNGKey(8)},
            mutable=["batch_stats"])
        outs[rem] = np.asarray(out)
    np.testing.assert_array_equal(outs[False], outs[True])


def test_remat_fc_form_noop(tiny_data):
    """remat on the FC form is accepted and changes nothing (no conv
    blocks to wrap)."""
    cfg = _tiny_cfg(max_epoch=1, remat=True)
    trainer = RankAAETrainer(cfg, n_train=192, n_val=64)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, logs = jax.jit(trainer.run)(state, tiny_data)
    assert np.all(np.isfinite(np.asarray(logs["val_recon"])))
