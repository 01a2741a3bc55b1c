"""Trainer tests: the jitted 7-optimizer protocol on tiny synthetic data.

Covers SURVEY.md §7 hard parts: sequential multi-optimizer semantics under
jit, BN-stat threading through the scan, plateau + best tracking as traced
state, and learning signal (recon loss must actually drop).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankaae_tpu.data.dataset import load_split_arrays
from rankaae_tpu.train.trainer import RankAAETrainer, TrialData
from rankaae_tpu.utils.config import TrainConfig


def _tiny_cfg(**kw):
    base = dict(
        max_epoch=10,
        batch_size=64,
        nstyle=6,
        n_aux=5,
        ae_form="FC",
        n_layers=3,
        dim_in=64,
        dim_out=64,
        gradient_reversal=True,
        alpha_flat_step=800,
        alpha_limit=0.7,
        decoder_activation="Softplus",
        optimizer_name="AdamW",
        lr_base=1e-3,
        lr_ratio_Reconn=10,
        lr_ratio_Corr=2,
        lr_ratio_Mutual=1,
        lr_ratio_Smooth=1,
        lr_ratio_dis=1,
        lr_ratio_gen=1,
        spec_noise=0.01,
        dropout_rate=0.05,
        dis_dropout_rate=0.05,
        dis_noise=0.1,
        sch_factor=0.5,
        sch_patience=5,
        weight_decay=1e-4,
        kendall_activation=True,
        use_flex_spec_target=False,
        epoch_stop_smooth=5,
    )
    base.update(kw)
    return TrainConfig(**base)


@pytest.fixture(scope="module")
def tiny_data():
    rng = np.random.default_rng(42)
    n, dim = 256, 64
    aux = rng.normal(size=(n, 5)).astype(np.float32)
    # spectra with descriptor-driven structure so losses have signal
    t = np.linspace(0, 1, dim, dtype=np.float32)
    spec = (
        1.0
        + aux[:, :1] * np.sin(2 * np.pi * t)[None, :] * 0.3
        + aux[:, 1:2] * t[None, :] * 0.2
        + rng.normal(size=(n, dim)).astype(np.float32) * 0.02
    ).astype(np.float32)
    n_train = 192
    return TrialData(
        train_spec=jnp.asarray(spec[:n_train]),
        train_aux=jnp.asarray(aux[:n_train]),
        val_spec=jnp.asarray(spec[n_train:]),
        val_aux=jnp.asarray(aux[n_train:]),
    )


def _run(cfg, data, seed=0):
    trainer = RankAAETrainer(cfg, n_train=data.train_spec.shape[0],
                             n_val=data.val_spec.shape[0])
    state = trainer.init_state(jax.random.PRNGKey(seed))
    run = jax.jit(trainer.run)
    state, logs = run(state, data)
    return trainer, state, jax.tree_util.tree_map(np.asarray, logs)


def test_training_runs_and_learns(tiny_data):
    cfg = _tiny_cfg(max_epoch=30)
    trainer, state, logs = _run(cfg, tiny_data)
    assert logs["val_recon"].shape == (30,)
    assert np.all(np.isfinite(logs["val_recon"]))
    # reconstruction must improve substantially over training
    assert logs["val_recon"][-1] < 0.5 * logs["val_recon"][0]
    # metrics array well-formed: (E, 5)
    assert logs["metrics"].shape == (30, 5)
    shapiro = logs["metrics"][:, 0]
    assert np.all((shapiro > 0.3) & (shapiro <= 1.0))


def test_training_bf16_activations(tiny_data):
    """``activation_dtype: bfloat16`` (mixed precision: bf16 module
    activations, f32 params/stats/losses) trains to a result comparable to
    the f32 path on the same data."""
    from rankaae_tpu.models import primitives

    cfg = _tiny_cfg(max_epoch=30, activation_dtype="bfloat16")
    try:
        trainer, state, logs = _run(cfg, tiny_data)
    finally:
        primitives.set_activation_dtype("float32")
    assert np.all(np.isfinite(logs["val_recon"]))
    assert logs["val_recon"][-1] < 0.5 * logs["val_recon"][0]
    # parameters and BN running stats stay f32
    for leaf in jax.tree_util.tree_leaves((state.params, state.batch_stats)):
        assert leaf.dtype == np.float32
    # the f32 run on the same data must be in the same quality ballpark
    cfg32 = _tiny_cfg(max_epoch=30)
    _, _, logs32 = _run(cfg32, tiny_data)
    assert logs["val_recon"][-1] < 3.0 * logs32["val_recon"][-1]


def test_best_tracking_is_argmin_combined(tiny_data):
    cfg = _tiny_cfg(max_epoch=15)
    trainer, state, logs = _run(cfg, tiny_data)
    combined = logs["combined"]
    assert int(state.best_epoch) == int(np.argmin(combined))
    np.testing.assert_allclose(float(state.best_combined), combined.min(), rtol=1e-6)
    # faithful dead gate: never fires on sane runs (stays 10.0)
    assert float(state.faithful_best) == pytest.approx(10.0)


def test_smoothness_stops_after_epoch_stop_smooth(tiny_data):
    cfg = _tiny_cfg(max_epoch=10, epoch_stop_smooth=4)
    _, state, logs = _run(cfg, tiny_data)
    assert np.all(logs["train_smooth"][:4] != 0.0)
    assert np.all(logs["train_smooth"][4:] == 0.0)
    # smoothness optimizer stepped exactly 4 epochs * n_batch times
    n_batch = -(-192 // cfg.batch_size)
    assert int(state.opt["smoothness"].count) == 4 * n_batch


def test_optimizer_counts_match_protocol(tiny_data):
    cfg = _tiny_cfg(max_epoch=3)
    _, state, _ = _run(cfg, tiny_data)
    n_steps = 3 * (-(-192 // cfg.batch_size))
    for name in ["adversarial", "correlation", "reconstruction", "mutual_info"]:
        assert int(state.opt[name].count) == n_steps, name
    # GRL path: discriminator/generator optimizers never step (trainer.py:117-127)
    assert int(state.opt["discriminator"].count) == 0
    assert int(state.opt["generator"].count) == 0


@pytest.mark.parametrize("opt_name,adamw_wd", [
    ("mutual_info", 0.01), ("adversarial", 0.01), ("generator", 0.01),
])
def test_default_weight_decay_matches_torch_classes(opt_name, adamw_wd):
    """The reference builds mutual_info/dis/gen/adv optimizers WITHOUT
    weight_decay=, so under AdamW they inherit torch's class default 0.01
    (PARITY.md ledger #8).  Behavioral pin: a zero-gradient AdamW update
    must decay the parameter by lr*wd; under Adam (default wd=0, L2-style)
    it must leave it unchanged."""
    import jax.numpy as jnp

    for optimizer_name, expect_decay in [("AdamW", adamw_wd), ("Adam", 0.0)]:
        cfg = _tiny_cfg(max_epoch=1, optimizer_name=optimizer_name)
        trainer = RankAAETrainer(cfg, n_train=64, n_val=32)
        opt = trainer.opts[opt_name]
        params = {"w": jnp.ones((3,), jnp.float32)}
        state = opt.init(params)
        zero = {"w": jnp.zeros((3,), jnp.float32)}
        lr = jnp.float32(0.01)
        new_params, _ = opt.update(zero, state, params, lr)
        expected = 1.0 - 0.01 * expect_decay
        np.testing.assert_allclose(np.asarray(new_params["w"]),
                                   np.full(3, expected, np.float32), rtol=1e-6)


def test_non_grl_gan_path(tiny_data):
    cfg = _tiny_cfg(max_epoch=3, gradient_reversal=False)
    _, state, logs = _run(cfg, tiny_data)
    n_steps = 3 * (-(-192 // cfg.batch_size))
    assert int(state.opt["discriminator"].count) == n_steps
    assert int(state.opt["generator"].count) == n_steps
    assert int(state.opt["adversarial"].count) == 0
    assert np.all(np.isfinite(logs["train_dis"]))
    assert np.all(logs["train_gen"] != 0.0)


def test_plateau_reduces_lr_on_stagnation(tiny_data):
    # patience 1, aggressive factor: with a short run lr should drop at least once
    cfg = _tiny_cfg(max_epoch=12, sch_patience=1, sch_factor=0.1,
                    lr_base=1e-6)  # lr so tiny nothing improves -> combined stagnates
    _, state, logs = _run(cfg, tiny_data)
    assert float(state.sched["reconstruction"].lr) < 1e-6 * 10 * 0.999
    assert logs["lr_recon"][-1] < logs["lr_recon"][0]


@pytest.mark.slow
def test_determinism_same_seed(tiny_data):
    cfg = _tiny_cfg(max_epoch=4)
    _, s1, l1 = _run(cfg, tiny_data, seed=123)
    _, s2, l2 = _run(cfg, tiny_data, seed=123)
    np.testing.assert_array_equal(l1["val_recon"], l2["val_recon"])
    np.testing.assert_array_equal(l1["combined"], l2["combined"])


@pytest.mark.slow
def test_different_seeds_differ(tiny_data):
    cfg = _tiny_cfg(max_epoch=4)
    _, _, l1 = _run(cfg, tiny_data, seed=1)
    _, _, l2 = _run(cfg, tiny_data, seed=2)
    assert not np.array_equal(l1["val_recon"], l2["val_recon"])


@pytest.mark.slow
def test_batch_stats_evolve(tiny_data):
    cfg = _tiny_cfg(max_epoch=2)
    trainer = RankAAETrainer(cfg, 192, 64)
    state0 = trainer.init_state(jax.random.PRNGKey(0))
    state, _ = jax.jit(trainer.run)(state0, tiny_data)
    before = np.asarray(state0.batch_stats["enc"]["bn0"]["mean"])
    after = np.asarray(state.batch_stats["enc"]["bn0"]["mean"])
    assert not np.allclose(before, after)
