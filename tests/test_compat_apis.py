"""Tests for reference-compatible APIs: get_dataloaders, Trainer facade,
DualAAE, SpectraVariationEvaluator, resume, descriptors, profiling."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankaae_tpu.data.dataset import get_dataloaders
from rankaae_tpu.utils.config import Parameters


def test_get_dataloaders_semantics(synthetic_csv):
    train, val, test = get_dataloaders(synthetic_csv, batch_size=128, n_aux=5)
    assert len(train) == -(-560 // 128)
    batches = list(train)
    assert batches[0][0].shape == (128, 256)
    assert batches[0][1].shape == (128, 5)
    assert batches[-1][0].shape[0] == 560 - 4 * 128  # ragged last batch
    # train shuffles between epochs, val doesn't
    b1 = next(iter(val))[0]
    b2 = next(iter(val))[0]
    np.testing.assert_array_equal(b1, b2)
    t1 = next(iter(train))[0]
    t2 = next(iter(train))[0]
    assert not np.array_equal(t1, t2)
    assert hasattr(train, "dataset") and len(train.dataset) == 560


def test_trainer_facade_from_data(synthetic_csv, tmp_path):
    from rankaae_tpu.train.facade import Trainer

    params = Parameters({
        "ae_form": "FC", "nstyle": 6, "n_aux": 5, "n_layers": 3,
        "dim_in": 256, "dim_out": 256, "batch_size": 128, "max_epoch": 4,
        "gradient_reversal": True, "decoder_activation": "Softplus",
        "optimizer_name": "AdamW", "lr_base": 1e-3,
        "epoch_stop_smooth": 2, "kendall_activation": True,
    })
    trainer = Trainer.from_data(
        synthetic_csv, work_dir=str(tmp_path), config_parameters=params
    )
    seen = []
    metrics = trainer.train(callback=lambda e, m: seen.append((e, m)))
    assert len(metrics) == 5  # [shapiro, recon, mi, coupling, kendall]
    assert len(seen) == 4 and seen[0][0] == 0
    assert os.path.exists(tmp_path / "losses.csv")
    assert os.path.exists(tmp_path / "final.mpk")
    assert os.path.exists(tmp_path / "best_tracked.mpk")

    # the reference's unused style-distribution hook (trainer.py:323-330):
    # nstyle stacked histogram axes over a latent batch
    import numpy as np

    fig = trainer.get_style_distribution_plot(
        np.random.default_rng(0).normal(size=(64, 6)).astype("float32"))
    assert len(fig.axes) == 6
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_resume_exact_equivalence(tmp_path):
    """Exact: same trainer, stop at epoch 2 via start_epoch slicing."""
    from rankaae_tpu.train.trainer import RankAAETrainer, TrialData
    from rankaae_tpu.utils.checkpoint import load_train_state, save_train_state
    from tests.test_trainer import _tiny_cfg

    rng = np.random.default_rng(4)
    data = TrialData(
        train_spec=jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32)),
        train_aux=jnp.asarray(rng.normal(size=(128, 5)).astype(np.float32)),
        val_spec=jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32)),
        val_aux=jnp.asarray(rng.normal(size=(64, 5)).astype(np.float32)),
    )
    cfg = _tiny_cfg(max_epoch=4, batch_size=64)
    trainer = RankAAETrainer(cfg, 128, 64)
    s0 = trainer.init_state(jax.random.PRNGKey(7))

    # uninterrupted
    sA, logsA = jax.jit(trainer.run)(s0, data)

    # interrupted at epoch 2: run epochs [0,2) by scanning manually
    def run_first_two(state, data):
        def step(c, e):
            return trainer.epoch_step(c, e, data)
        return jax.lax.scan(step, state, jnp.arange(0, 2))

    s_half, _ = jax.jit(run_first_two)(s0, data)
    path = str(tmp_path / "state2.mpk")
    save_train_state(path, s_half)
    restored = load_train_state(path, trainer.init_state(jax.random.PRNGKey(7)))
    sB, logsB = jax.jit(lambda s, d: trainer.run(s, d, start_epoch=2))(restored, data)

    np.testing.assert_allclose(
        np.asarray(logsA["val_recon"])[2:], np.asarray(logsB["val_recon"]),
        rtol=1e-5,
    )
    for leafA, leafB in zip(jax.tree_util.tree_leaves(sA.params),
                            jax.tree_util.tree_leaves(sB.params)):
        np.testing.assert_allclose(np.asarray(leafA), np.asarray(leafB), atol=1e-6)


def test_load_train_state_rejects_config_mismatch(tmp_path):
    from rankaae_tpu.train.trainer import RankAAETrainer
    from rankaae_tpu.utils.checkpoint import load_train_state, save_train_state
    from tests.test_trainer import _tiny_cfg

    trainer = RankAAETrainer(_tiny_cfg(), 192, 64)
    s = trainer.init_state(jax.random.PRNGKey(0))
    path = str(tmp_path / "s.mpk")
    save_train_state(path, s)

    other = RankAAETrainer(_tiny_cfg(n_layers=4), 192, 64)
    with pytest.raises(ValueError, match="mismatch"):
        load_train_state(path, other.init_state(jax.random.PRNGKey(0)))


def test_dual_aae_composition(rng):
    from rankaae_tpu.models.encoders import FCEncoder
    from rankaae_tpu.models.decoders import FCDecoder
    from rankaae_tpu.models.registry import DualAAE

    model = DualAAE(False, FCEncoder, FCDecoder)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "noise": jax.random.PRNGKey(2)}
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    variables = model.init(rngs, x)
    x2, is_gau = model.apply(variables, x)
    assert x2.shape == (8, 256)
    assert is_gau.shape == (8, 1)


def test_spectra_variation_evaluator(rng):
    from rankaae_tpu.models.inference import InferenceModel
    from rankaae_tpu.report.curves import SpectraVariationEvaluator
    from rankaae_tpu.train.trainer import RankAAETrainer
    from tests.test_trainer import _tiny_cfg

    cfg = _tiny_cfg()
    trainer = RankAAETrainer(cfg, 192, 64)
    s = trainer.init_state(jax.random.PRNGKey(0))
    model = InferenceModel(s.params, s.batch_stats, cfg)

    ev = SpectraVariationEvaluator(n_spec=10, n_sampling=5)
    ev.model = model
    ev.styles = rng.normal(size=(100, cfg.nstyle)).astype(np.float32)
    out = ev.evaluate(istyle=2)
    assert out.shape == (10, cfg.dim_out)
    fig = ev.plot()
    assert fig is not None


def test_profiling_utils(tmp_path, capsys):
    from rankaae_tpu.utils.profiling import PhaseTimer, trace

    timer = PhaseTimer()
    with timer.phase("a"):
        jnp.ones(10).block_until_ready()
    with timer.phase("b"):
        pass
    assert "a:" in timer.summary() and "total:" in timer.summary()

    with trace(label="unit"):
        pass
    assert "[unit]" in capsys.readouterr().out
