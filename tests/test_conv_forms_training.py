"""End-to-end training of the conv model families ("normal"/"compact") and
the CNN discriminator — the non-FC configurations the registry supports
(reference AE_CLS_DICT, ``sc/utils/parameter.py:14-31``)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankaae_tpu.train.trainer import RankAAETrainer, TrialData
from tests.test_trainer import _tiny_cfg


@pytest.fixture(scope="module")
def conv_data():
    rng = np.random.default_rng(11)
    n, dim = 128, 256   # conv architectures hard-require 256-point spectra
    aux = rng.normal(size=(n, 5)).astype(np.float32)
    t = np.linspace(0, 1, dim, dtype=np.float32)
    spec = (1.0 + aux[:, :1] * np.sin(2 * np.pi * t)[None, :] * 0.3
            + rng.normal(size=(n, dim)).astype(np.float32) * 0.02).astype(np.float32)
    return TrialData(
        train_spec=jnp.asarray(spec[:96]), train_aux=jnp.asarray(aux[:96]),
        val_spec=jnp.asarray(spec[96:]), val_aux=jnp.asarray(aux[96:]),
    )


@pytest.mark.parametrize(
    "ae_form",
    [pytest.param("normal", marks=pytest.mark.slow), "compact"])
def test_conv_form_trains(conv_data, ae_form):
    cfg = _tiny_cfg(ae_form=ae_form, dim_in=256, dim_out=256, max_epoch=2,
                    batch_size=32, epoch_stop_smooth=2)
    trainer = RankAAETrainer(cfg, 96, 32)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, logs = jax.jit(trainer.run)(state, conv_data)
    recon = np.asarray(logs["val_recon"])
    assert recon.shape == (2,)
    assert np.all(np.isfinite(recon))
    # conv batch stats threaded (channel-axis BN evolves)
    stats0 = trainer.init_state(jax.random.PRNGKey(0)).batch_stats
    leaf_before = jax.tree_util.tree_leaves(stats0["enc"])[0]
    leaf_after = jax.tree_util.tree_leaves(state.batch_stats["enc"])[0]
    assert not np.allclose(np.asarray(leaf_before), np.asarray(leaf_after))


@pytest.mark.parametrize("gradient_reversal", [True, False])
def test_cnn_discriminator_trains(conv_data, gradient_reversal):
    cfg = _tiny_cfg(use_cnn_discriminator=True, gradient_reversal=gradient_reversal,
                    dim_in=256, dim_out=256, max_epoch=2, batch_size=32,
                    epoch_stop_smooth=2)
    trainer = RankAAETrainer(cfg, 96, 32)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, logs = jax.jit(trainer.run)(state, conv_data)
    assert np.all(np.isfinite(np.asarray(logs["train_dis"])))
    assert np.all(np.isfinite(np.asarray(logs["val_dis"])))
    # CNN discriminator has BatchNorms: its stats must be threaded too
    assert state.batch_stats["dis"], "CNN discriminator should carry batch stats"
    if not gradient_reversal:
        # the non-GRL path uses the 2-class NLL objective for the CNN disc
        assert int(state.opt["discriminator"].count) > 0


def test_qved_form_trains(rng):
    """The q-vector family (12-dim inputs, reference model.py:298-327,477-515)."""
    import jax
    import jax.numpy as jnp

    from rankaae_tpu.train.trainer import RankAAETrainer, TrialData

    n = 128
    aux = rng.normal(size=(n, 5)).astype(np.float32)
    qvec = (aux @ rng.normal(size=(5, 12)).astype(np.float32)
            + rng.normal(size=(n, 12)).astype(np.float32) * 0.1)
    data = TrialData(
        train_spec=jnp.asarray(qvec[:96]), train_aux=jnp.asarray(aux[:96]),
        val_spec=jnp.asarray(qvec[96:]), val_aux=jnp.asarray(aux[96:]),
    )
    cfg = _tiny_cfg(ae_form="qved", dim_in=12, dim_out=12, max_epoch=2,
                    batch_size=32, epoch_stop_smooth=2)
    trainer = RankAAETrainer(cfg, 96, 32)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, logs = jax.jit(trainer.run)(state, data)
    assert np.all(np.isfinite(np.asarray(logs["val_recon"])))


def test_matmul_precision_config(conv_data):
    """matmul_precision=default trains the conv form (the TPU path for the
    deep 'normal' family); invalid values are rejected."""
    import pytest as _pytest

    from rankaae_tpu.models.primitives import get_matmul_precision, set_matmul_precision
    from rankaae_tpu.utils.config import TrainConfig

    with _pytest.raises(ValueError, match="matmul_precision"):
        _tiny_cfg().replace(matmul_precision="bf16")

    cfg = _tiny_cfg(ae_form="compact", dim_in=256, dim_out=256, max_epoch=1,
                    batch_size=32, epoch_stop_smooth=1,
                    matmul_precision="default")
    trainer = RankAAETrainer(cfg, 96, 32)
    assert "DEFAULT" in str(get_matmul_precision())
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, logs = jax.jit(trainer.run)(state, conv_data)
    assert np.all(np.isfinite(np.asarray(logs["val_recon"])))
    set_matmul_precision("highest")  # restore for other tests
