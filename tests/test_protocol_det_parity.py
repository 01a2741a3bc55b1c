"""Deterministic PROTOCOL-level training parity vs the torch reference.

The per-loss pinning tests (test_update_step_parity, test_update_step_conv_
parity, test_blocks_grad_parity) each pin ONE optimizer step in isolation.
This file pins the COMPOSED per-batch protocol — the reference's sequential
adversarial -> kendall -> reconstruction -> mutual-info -> smoothness block
(reference trainer.py:103-204) — over one full-batch epoch, pointwise on
every gradient-carrying parameter AND in train-mode function space.  The
composition is what the per-loss tests cannot see: each step must consume
the PREVIOUS step's params and BatchNorm batch-stats updates in the
reference's exact order.

Determinism: with spec_noise=0, all dropout/noise rates 0, and the three
RNG-CONSUMING optimizers' learning rates zeroed (lr_ratio_dis = lr_ratio_gen
= lr_ratio_Mutual = 0), every pass that depends on sampled z or masks still
RUNS (forwards update BN running statistics on both stacks) but cannot move
parameters — so the parameter trajectory is a deterministic function of the
initial weights, which we make identical across stacks via the pinned
torch->ours converter.  Remaining active updates: correlation/kendall
(encoder), flex reconstruction (encoder+decoder), smoothness (decoder) —
three AdamW steps per batch.

Scope — why ONE epoch, why bias leaves are excluded, why train-mode
function space (all measured on this exact setup, Aug 2026):

* Parameters whose gradient is analytically zero or noise-dominated — a
  Linear/Conv bias feeding an affine-free BatchNorm is EXACTLY null (the
  mean subtraction cancels it) — random-walk O(lr) PER STEP on both
  stacks, because Adam's m/sqrt(v) normalizes noise-level gradients to
  full-size steps in arithmetic-noise-determined directions.  Measured:
  enc/lin3/bias diverges 7.9e-2 after ONE epoch while every non-bias
  leaf stays <= 2.6e-3.  The torch reference has the same dead
  parameters; their trajectories are unpinnable BY CONSTRUCTION, not a
  protocol property.
* Train-mode (batch-stat) forwards are exactly invariant to those null
  directions, so function space is the honest pointwise comparison:
  measured |dz|max 8.7e-5, |dx|max 1.1e-4 after the epoch (eval-mode
  forwards are contaminated to ~7e-2 by the running means lagging the
  noise-walked biases — also on both stacks).
* Beyond a few epochs, float32 rounding seeds chaotic divergence through
  the protocol's non-smooth ops (PReLU kinks, Kendall pair reweighting):
  median leaf error 3.1e-3 by epoch 3, PReLU alphas at 0.74 relative by
  epoch 7.  A genuine protocol bug shows up at O(update) = 1e-2..2e-2
  after the FIRST composed epoch, which the 5e-3/1e-3 bounds below
  detect with margin.

Motivation: the conv amplitude-drift investigation (PARITY_RESULTS_CONV.md)
needed the composed protocol exonerated, not just the per-loss steps.
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

EPOCHS = 1
ROWS = 400          # -> train split 280, one full batch
NSTYLE = 6


def _cfg_dict(tmpdir, csv):
    return {
        "data_file": csv, "trials": 1, "timeout": 10, "verbose": False,
        "max_epoch": EPOCHS, "batch_size": 280,
        "gradient_reversal": True, "alpha_flat_step": 739,
        "alpha_limit": 0.7172, "decoder_activation": "Softplus",
        "dis_beta": 1.1, "dis_dropout_rate": 0.0, "dis_noise": 0.0,
        "gen_beta": 1.1, "n_aux": 5, "nstyle": NSTYLE, "ae_form": "compact",
        "dim_in": 256, "dim_out": 256, "n_layers": 3,
        "FC_discriminator_layers": 3, "use_cnn_discriminator": False,
        "dropout_rate": 0.0, "sch_factor": 0.1, "sch_patience": 1000,
        "lr_base": 0.001, "lr_ratio_Corr": 10, "lr_ratio_Mutual": 0.0,
        "lr_ratio_Reconn": 10, "lr_ratio_Smooth": 1, "lr_ratio_dis": 0.0,
        "lr_ratio_gen": 0.0, "optimizer_name": "AdamW", "spec_noise": 0.0,
        "use_flex_spec_target": True, "weight_decay": 0.01,
        "kendall_activation": True, "epoch_stop_smooth": EPOCHS,
    }


def _leaves(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _leaves(tree[k], f"{prefix}/{k}")
    else:
        yield prefix, np.asarray(tree)


@pytest.mark.slow
def test_deterministic_protocol_matches_reference(tmp_path):
    from tests.conftest import import_reference_sc

    import_reference_sc()
    sys.path.insert(0, "/root/repo/scripts")
    from parity_experiment import _stub_reference_deps

    _stub_reference_deps()

    import sc.clustering.model as ref_model
    from sc.clustering.dataloader import get_dataloaders
    from sc.clustering.trainer import Trainer as RefTrainer
    from sc.utils.parameter import Parameters as RefParameters

    from rankaae_tpu.data.dataset import load_split_arrays
    from rankaae_tpu.data.synthetic import make_synthetic_xanes_csv
    from rankaae_tpu.models.registry import build_autoencoder
    from rankaae_tpu.train.trainer import RankAAETrainer, TrialData
    from rankaae_tpu.utils.config import Parameters, TrainConfig
    from rankaae_tpu.utils.torch_import import convert_reference_model

    csv = str(tmp_path / "data.csv")
    make_synthetic_xanes_csv(csv, n_rows=ROWS, dim=256, seed=42)
    cfg_dict = _cfg_dict(str(tmp_path), csv)

    # ---- build torch modules; capture their init through the converter ----
    torch.manual_seed(7)
    tenc = ref_model.CompactEncoder(nstyle=NSTYLE, dropout_rate=0.0)
    tdec = ref_model.CompactDecoder(nstyle=NSTYLE, dropout_rate=0.0,
                                    last_layer_activation="Softplus")
    tdis = ref_model.DiscriminatorFC(nstyle=NSTYLE, dropout_rate=0.0,
                                     noise=0.0, layers=3)
    init_params, init_stats, _ = convert_reference_model(
        {"Encoder": tenc, "Decoder": tdec, "Style Discriminator": tdis})

    # ---- torch: drive the reference trainer ----
    p = RefParameters(cfg_dict)
    dl_train, dl_val, _ = get_dataloaders(csv, p.batch_size,
                                          (0.7, 0.15, 0.15), n_aux=p.n_aux)
    ref_trainer = RefTrainer(
        tenc, tdec, tdis, torch.device("cpu"), dl_train, dl_val,
        verbose=False, work_dir=str(tmp_path),
        config_parameters=p,
    )
    ref_trainer.train()
    ref_final, _, _ = convert_reference_model(
        {"Encoder": tenc, "Decoder": tdec, "Style Discriminator": tdis})

    # ---- ours: same protocol from the SAME initial weights ----
    cfg = TrainConfig.from_parameters(Parameters(dict(cfg_dict)))
    splits = load_split_arrays(csv, n_aux=cfg.n_aux)
    data = TrialData(
        train_spec=jnp.asarray(splits["train"].spec),
        train_aux=jnp.asarray(splits["train"].aux),
        val_spec=jnp.asarray(splits["val"].spec),
        val_aux=jnp.asarray(splits["val"].aux),
    )
    trainer = RankAAETrainer(cfg, len(splits["train"]), len(splits["val"]))
    state = trainer.init_state(jax.random.PRNGKey(0))
    to_j = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)
    state = state._replace(params=to_j(init_params),
                           batch_stats=to_j(init_stats))
    state, logs = jax.jit(trainer.run)(state, data)
    ours_final = jax.device_get(state.params)
    ours_stats = jax.device_get(state.batch_stats)

    # ---- discriminator must be EXACTLY frozen on both stacks ----
    for (path, want), (_, got) in zip(_leaves(init_params["dis"]),
                                      _leaves(ours_final["dis"])):
        np.testing.assert_allclose(got, want, rtol=0, atol=0,
                                   err_msg=f"ours dis moved: {path}")
    for (path, want), (_, got) in zip(_leaves(init_params["dis"]),
                                      _leaves(ref_final["dis"])):
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-7,
                                   err_msg=f"torch dis moved: {path}")

    # ---- gradient-carrying leaves must agree pointwise ----
    # Bias leaves are excluded: see module docstring (Adam amplifies their
    # noise-level gradients to O(lr) arithmetic-determined steps; measured
    # 7.9e-2 divergence on enc/lin3/bias after one epoch on BOTH stacks'
    # null direction).  Everything else measured <= 2.6e-3; a protocol bug
    # registers at O(update) ~ 1e-2..2e-2.
    checked = 0
    for key in ("enc", "dec"):
        for (path, want), (_, got), (_, init) in zip(
                _leaves(ref_final[key]), _leaves(ours_final[key]),
                _leaves(init_params[key])):
            assert got.shape == want.shape, path
            if path.endswith("/bias"):
                continue
            move = np.abs(want - init).max()
            scale = max(np.abs(want).max(), 1e-3)
            err = np.abs(got - want).max() / scale
            checked += 1
            assert err < 5e-3, (
                f"{key}/{path}: rel err {err:.2e} (update magnitude "
                f"{move:.2e}) — protocol divergence")
    assert checked > 60  # guard against silently skipping everything

    # ---- train-mode function space: null directions cancel exactly ----
    enc_m, dec_m = build_autoencoder(cfg)
    val = data.val_spec
    tenc.train(), tdec.train()
    with torch.no_grad():
        zt = tenc(torch.tensor(np.asarray(val), dtype=torch.float32))
        xt = tdec(zt)
    z_ours, _ = enc_m.apply(
        {"params": ours_final["enc"], "batch_stats": ours_stats["enc"]},
        val, train=True, mutable=["batch_stats"])
    x_ours, _ = dec_m.apply(
        {"params": ours_final["dec"], "batch_stats": ours_stats["dec"]},
        z_ours, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(z_ours), zt.numpy(), atol=1e-3,
                               rtol=0, err_msg="encoder function diverged")
    np.testing.assert_allclose(np.asarray(x_ours), xt.numpy(), atol=1e-3,
                               rtol=0, err_msg="decoder function diverged")

    # the run must HAVE trained (guard against silently-inert protocol)
    total_move = sum(
        float(np.abs(w - i).sum())
        for (_, w), (_, i) in zip(_leaves(ref_final["dec"]),
                                  _leaves(init_params["dec"])))
    assert total_move > 1e-3
