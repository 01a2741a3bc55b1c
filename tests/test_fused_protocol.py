"""The net-new ``protocol: fused`` fast path (one shared forward, per-loss
VJP pullbacks, joint Jacobi-style optimizer updates — see
``RankAAETrainer._train_batch_fused``).

The faithful protocol is pinned to the reference elsewhere
(``test_protocol_det_parity.py``); fused mode deviates by design, so these
tests assert its own contract: it trains every model family, steps exactly
the reference's optimizer subsets, respects the smoothness epoch cutoff,
and optimizes the same objectives (reconstruction improves, latent matches
the prior direction of the losses).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankaae_tpu.train.trainer import OPT_SPECS, RankAAETrainer, TrialData
from tests.test_trainer import _tiny_cfg


@pytest.fixture(scope="module")
def fused_data():
    rng = np.random.default_rng(5)
    n, dim = 128, 64
    aux = rng.normal(size=(n, 5)).astype(np.float32)
    t = np.linspace(0, 1, dim, dtype=np.float32)
    spec = (1.0 + aux[:, :1] * np.sin(2 * np.pi * t)[None, :] * 0.3
            + rng.normal(size=(n, dim)).astype(np.float32) * 0.02
            ).astype(np.float32)
    return TrialData(
        train_spec=jnp.asarray(spec[:96]), train_aux=jnp.asarray(aux[:96]),
        val_spec=jnp.asarray(spec[96:]), val_aux=jnp.asarray(aux[96:]),
    )


def _run(cfg, data):
    trainer = RankAAETrainer(cfg, int(data.train_spec.shape[0]),
                             int(data.val_spec.shape[0]))
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, logs = jax.jit(trainer.run)(state, data)
    return trainer, state, jax.tree_util.tree_map(np.asarray, logs)


@pytest.mark.slow
def test_fused_trains_and_improves(fused_data):
    cfg = _tiny_cfg(max_epoch=30, protocol="fused",
                    use_flex_spec_target=True, kendall_activation=True)
    _, state, logs = _run(cfg, fused_data)
    assert np.all(np.isfinite(logs["val_recon"]))
    assert logs["val_recon"][-1] < 0.5 * logs["val_recon"][0]
    # every non-generator optimizer stepped once per batch (GRL path)
    for name in ("adversarial", "correlation", "reconstruction",
                 "mutual_info", "smoothness"):
        assert int(state.opt[name].count) > 0, name
    assert int(state.opt["generator"].count) == 0
    assert int(state.opt["discriminator"].count) == 0


def test_fused_non_grl_path(fused_data):
    cfg = _tiny_cfg(max_epoch=4, protocol="fused", gradient_reversal=False)
    _, state, logs = _run(cfg, fused_data)
    assert np.all(np.isfinite(logs["val_recon"]))
    assert int(state.opt["discriminator"].count) > 0
    assert int(state.opt["generator"].count) > 0
    assert int(state.opt["adversarial"].count) == 0


def test_fused_smoothness_cutoff(fused_data):
    """After ``epoch_stop_smooth`` the smoothness optimizer must freeze
    (moments included) and the logged smooth loss must read 0 — the
    reference cutoff semantics (``trainer.py:188-200``)."""
    cfg = _tiny_cfg(max_epoch=6, protocol="fused", epoch_stop_smooth=3)
    trainer = RankAAETrainer(cfg, 96, 32)
    state = trainer.init_state(jax.random.PRNGKey(0))
    n_batches = -(-96 // cfg.batch_size)
    state, logs = jax.jit(trainer.run)(state, fused_data)
    assert int(state.opt["smoothness"].count) == 3 * n_batches
    assert np.all(np.asarray(logs["train_smooth"])[3:] == 0.0)
    assert np.all(np.asarray(logs["train_smooth"])[:3] > 0.0)


def test_fused_subset_isolation(fused_data):
    """One fused batch step must only move each module through its
    reference optimizer subsets: with every loss's lr at zero except
    correlation's (an encoder-only optimizer), decoder and discriminator
    parameters must not move at all."""
    cfg = _tiny_cfg(max_epoch=1, protocol="fused", spec_noise=0.0,
                    lr_ratio_Reconn=0.0, lr_ratio_Mutual=0.0,
                    lr_ratio_Smooth=0.0, lr_ratio_dis=0.0,
                    lr_ratio_gen=0.0, lr_ratio_Corr=5.0)
    trainer = RankAAETrainer(cfg, 96, 32)
    state0 = trainer.init_state(jax.random.PRNGKey(0))
    state, _ = jax.jit(trainer.run)(state0, fused_data)
    # encoder moved...
    enc0 = np.concatenate([np.ravel(x) for x in
                           jax.tree_util.tree_leaves(state0.params["enc"])])
    enc1 = np.concatenate([np.ravel(x) for x in
                           jax.tree_util.tree_leaves(state.params["enc"])])
    assert not np.allclose(enc0, enc1)
    # ...decoder and discriminator did not (their optimizers' lrs are 0, and
    # correlation's subset is ("enc",) — OPT_SPECS)
    assert OPT_SPECS["correlation"][0] == ("enc",)
    for mod in ("dec", "dis"):
        a = jax.tree_util.tree_leaves(state0.params[mod])
        b = jax.tree_util.tree_leaves(state.params[mod])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       err_msg=mod)


@pytest.mark.parametrize("ae_form,dim", [("compact", 256), ("qved", 12)])
def test_fused_other_forms(ae_form, dim):
    rng = np.random.default_rng(3)
    n = 128
    aux = rng.normal(size=(n, 5)).astype(np.float32)
    x = np.abs(aux @ rng.normal(size=(5, dim)).astype(np.float32)
               + rng.normal(size=(n, dim)).astype(np.float32) * 0.1) + 0.5
    data = TrialData(
        train_spec=jnp.asarray(x[:96]), train_aux=jnp.asarray(aux[:96]),
        val_spec=jnp.asarray(x[96:]), val_aux=jnp.asarray(aux[96:]),
    )
    cfg = _tiny_cfg(ae_form=ae_form, dim_in=dim, dim_out=dim, max_epoch=2,
                    batch_size=32, epoch_stop_smooth=2, protocol="fused")
    _, state, logs = _run(cfg, data)
    assert np.all(np.isfinite(logs["val_recon"]))


@pytest.mark.slow
def test_joint_trains_and_improves(fused_data):
    """``protocol: joint`` — one weighted-sum objective, ONE optimizer over
    all params, GRL carries the adversarial sign-flip inside the single
    backward (see ``RankAAETrainer._train_batch_joint``)."""
    cfg = _tiny_cfg(max_epoch=30, protocol="joint",
                    use_flex_spec_target=True, kendall_activation=True)
    _, state, logs = _run(cfg, fused_data)
    assert np.all(np.isfinite(logs["val_recon"]))
    assert logs["val_recon"][-1] < 0.5 * logs["val_recon"][0]
    # one optimizer, stepped once per batch; no per-loss slots exist
    assert set(state.opt.keys()) == {"joint"}
    n_batches = -(-96 // cfg.batch_size)
    assert int(state.opt["joint"].count) == 30 * n_batches
    # the plateau scheduler rides the joint slot
    assert set(state.sched.keys()) == {"joint"}


def test_joint_requires_grl():
    from rankaae_tpu.utils.config import TrainConfig

    with pytest.raises(ValueError, match="gradient_reversal"):
        TrainConfig(protocol="joint", gradient_reversal=False).validate()


def test_joint_smoothness_cutoff(fused_data):
    """After ``epoch_stop_smooth`` the smoothness term drops out of the
    joint objective and the logged smooth loss reads 0 (reference cutoff
    semantics, ``trainer.py:188-200``)."""
    cfg = _tiny_cfg(max_epoch=6, protocol="joint", epoch_stop_smooth=3)
    _, state, logs = _run(cfg, fused_data)
    sm = np.asarray(logs["train_smooth"])
    assert np.all(sm[3:] == 0.0)
    assert np.all(sm[:3] > 0.0)


@pytest.mark.slow
def test_fused_vmaps_over_trials(fused_data):
    """The fused program must vmap over the trial axis (the production
    multi-trial strategy) with per-trial independent trajectories."""
    cfg = _tiny_cfg(max_epoch=2, protocol="fused")
    trainer = RankAAETrainer(cfg, 96, 32)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    states = jax.jit(jax.vmap(trainer.init_state))(keys)
    states, logs = jax.jit(jax.vmap(trainer.run, in_axes=(0, None)))(
        states, fused_data)
    recon = np.asarray(logs["val_recon"])
    assert recon.shape == (3, 2)
    assert np.all(np.isfinite(recon))
    assert len({round(float(r), 6) for r in recon[:, -1]}) == 3
