"""The net-new ``sch_recon_metric`` knob (TrainConfig): with "val_recon" the
reconstruction optimizer's plateau scheduler steps on validation recon MSE
instead of the combined metric, so the recon lr can only be cut once
reconstruction itself plateaus (the faithful "combined" default reproduces
the reference's freeze-lottery, trainer.py:303-304 / PARITY_RESULTS_CONV.md).

The test replays the pure plateau transition over each logged metric stream
and asserts the logged recon-lr trajectory matches the replay — i.e. the
scheduler really is driven by the configured metric.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankaae_tpu.optim.plateau import plateau_init, plateau_update
from rankaae_tpu.train.trainer import RankAAETrainer, TrialData
from rankaae_tpu.utils.config import TrainConfig


def _tiny_cfg(**kw):
    return TrainConfig(
        trials=1, max_epoch=12, batch_size=16, n_aux=2, nstyle=3,
        ae_form="FC", dim_in=16, dim_out=16, n_layers=2,
        FC_discriminator_layers=2, sch_factor=0.1, sch_patience=1,
        lr_base=1e-3, optimizer_name="AdamW", gradient_reversal=True,
        alpha_flat_step=8, alpha_limit=0.5, decoder_activation="Softplus",
        epoch_stop_smooth=6, **kw,
    )


def _run(cfg):
    rng = np.random.default_rng(0)
    data = TrialData(
        train_spec=jnp.asarray(rng.normal(size=(48, 16)).astype(np.float32)),
        train_aux=jnp.asarray(rng.normal(size=(48, 2)).astype(np.float32)),
        val_spec=jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32)),
        val_aux=jnp.asarray(rng.normal(size=(16, 2)).astype(np.float32)),
    )
    tr = RankAAETrainer(cfg, 48, 16)
    state = jax.jit(tr.init_state)(jax.random.PRNGKey(0))
    _, logs = jax.jit(tr.run)(state, data)
    return {k: np.asarray(v) for k, v in logs.items()}


def _replay_lr(metric_seq, lr0, factor, patience):
    st = plateau_init(lr0)
    out = []
    for m in metric_seq:
        st = plateau_update(st, jnp.float32(m), factor, patience)
        out.append(float(st.lr))
    return np.array(out)


@pytest.mark.parametrize(
    "knob",
    [pytest.param("combined", marks=pytest.mark.slow), "val_recon"])
def test_recon_lr_follows_configured_metric(knob):
    cfg = _tiny_cfg(sch_recon_metric=knob)
    logs = _run(cfg)
    driver = logs["combined"] if knob == "combined" else logs["val_recon"]
    want = _replay_lr(driver, cfg.lr_ratio_Reconn * cfg.lr_base,
                      cfg.sch_factor, cfg.sch_patience)
    np.testing.assert_allclose(logs["lr_recon"], want, rtol=1e-6,
                               err_msg=f"lr_recon must be driven by {knob}")
    # sanity: with patience=1 on noisy tiny-model metrics, at least one cut
    # actually happened, so the assertion above is not vacuous
    assert logs["lr_recon"][-1] < cfg.lr_ratio_Reconn * cfg.lr_base


def test_bad_value_rejected():
    with pytest.raises(ValueError, match="sch_recon_metric"):
        _tiny_cfg(sch_recon_metric="recon").validate()
