"""Segmented mid-run checkpointing and resume through run_trials."""
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from rankaae_tpu.parallel.trials import run_trials
from rankaae_tpu.train.trainer import TrialData
from tests.test_trainer import _tiny_cfg


@pytest.fixture()
def small_data():
    rng = np.random.default_rng(9)
    spec = rng.normal(size=(256, 64)).astype(np.float32)
    aux = rng.normal(size=(256, 5)).astype(np.float32)
    return TrialData(
        train_spec=jnp.asarray(spec[:192]), train_aux=jnp.asarray(aux[:192]),
        val_spec=jnp.asarray(spec[192:]), val_aux=jnp.asarray(aux[192:]),
    )


@pytest.mark.slow
def test_segmented_run_matches_plain_run(small_data, tmp_path):
    cfg = _tiny_cfg(max_epoch=6)
    plain = run_trials(cfg, small_data, n_trials=2, seed=5)
    seg = run_trials(cfg, small_data, n_trials=2, seed=5,
                     checkpoint_every=2, checkpoint_dir=str(tmp_path / "ck"))
    np.testing.assert_allclose(
        plain.logs["val_recon"], seg.logs["val_recon"], rtol=1e-4
    )
    # checkpoint artifacts exist and record completion
    with open(tmp_path / "ck" / "progress.json") as f:
        progress = json.load(f)
    assert progress["epoch"] == 6
    assert os.path.exists(tmp_path / "ck" / "trial_state.mpk")


def test_resume_from_partial_checkpoint(small_data, tmp_path):
    """Simulate a crash mid-run: the checkpoint from a truncated run must
    resume into the same final state a continuous run reaches."""
    ckdir = str(tmp_path / "ck2")
    # alpha ramp saturates instantly (alpha_flat_step -> 0) so the GRL
    # strength trajectory is independent of max_epoch — letting us simulate
    # a crash by training with a truncated max_epoch
    cfg = _tiny_cfg(max_epoch=6, alpha_flat_step=1e-9)

    # continuous run for the target trajectory
    full = run_trials(cfg, small_data, n_trials=2, seed=5)

    # "crashed" run: train only epochs [0, 4) by lying about max_epoch,
    # writing a checkpoint every 2 epochs
    cfg_short = _tiny_cfg(max_epoch=4, alpha_flat_step=1e-9)
    run_trials(cfg_short, small_data, n_trials=2, seed=5,
               checkpoint_every=2, checkpoint_dir=ckdir)

    # resume the real config from the same checkpoint dir: picks up at 4,
    # and the persisted logs.npz restores the pre-crash history, so the
    # resumed results carry the FULL 6-epoch log
    resumed = run_trials(cfg, small_data, n_trials=2, seed=5,
                         checkpoint_every=2, checkpoint_dir=ckdir)
    assert resumed.logs["val_recon"].shape == (2, 6)
    np.testing.assert_allclose(
        resumed.logs["val_recon"], full.logs["val_recon"], rtol=1e-4
    )
    # final params identical to the continuous run
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(full.final_params),
                    jax.tree_util.tree_leaves(resumed.final_params)):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_completed_checkpoint_raises(small_data, tmp_path):
    ckdir = str(tmp_path / "ck3")
    cfg = _tiny_cfg(max_epoch=2)
    run_trials(cfg, small_data, n_trials=2, seed=5,
               checkpoint_every=2, checkpoint_dir=ckdir)
    with pytest.raises(ValueError, match="already complete"):
        run_trials(cfg, small_data, n_trials=2, seed=5,
                   checkpoint_every=2, checkpoint_dir=ckdir)


def test_mismatched_checkpoint_ignored(small_data, tmp_path):
    """A checkpoint from a different seed/trial-count must not be loaded."""
    ckdir = str(tmp_path / "ck4")
    cfg = _tiny_cfg(max_epoch=3)
    run_trials(cfg, small_data, n_trials=2, seed=5,
               checkpoint_every=1, checkpoint_dir=ckdir)
    # different seed: starts fresh (all 3 epochs of logs)
    res = run_trials(cfg, small_data, n_trials=2, seed=6,
                     checkpoint_every=1, checkpoint_dir=ckdir)
    assert res.logs["val_recon"].shape == (2, 3)


@pytest.mark.slow
def test_wave_resume(small_data, tmp_path):
    """Checkpointing composes with sequential waves: trials beyond one
    resident wave checkpoint into per-wave subdirectories, completed waves
    reload without retraining, and the interrupted wave resumes mid-run."""
    import jax

    from rankaae_tpu.parallel.trials import trial_mesh

    ckdir = str(tmp_path / "ckw")
    cfg = _tiny_cfg(max_epoch=4, alpha_flat_step=1e-9)
    # 3 trials at 1 resident trial/device on a 1-device mesh -> 3 waves
    mesh = trial_mesh(jax.devices()[:1])
    kw = dict(n_trials=3, seed=5, mesh=mesh, max_resident_per_device=1)

    full = run_trials(cfg, small_data, **kw)

    # "crashed" run: every wave stops at epoch 2 of 4 (simulated by
    # truncating max_epoch, as in the single-wave test)
    cfg_short = _tiny_cfg(max_epoch=2, alpha_flat_step=1e-9)
    run_trials(cfg_short, small_data, checkpoint_every=2,
               checkpoint_dir=ckdir, **kw)
    assert os.path.isdir(os.path.join(ckdir, "wave_002"))

    # resume: each wave picks up at its epoch-2 snapshot
    resumed = run_trials(cfg, small_data, checkpoint_every=2,
                         checkpoint_dir=ckdir, **kw)
    assert resumed.logs["val_recon"].shape == (3, 4)
    np.testing.assert_allclose(
        resumed.logs["val_recon"], full.logs["val_recon"], rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(full.final_params),
                    jax.tree_util.tree_leaves(resumed.final_params)):
        np.testing.assert_allclose(a, b, atol=1e-5)

    # rerun on the fully-completed directory: every wave reconstructs its
    # results from the persisted state + logs without retraining
    again = run_trials(cfg, small_data, checkpoint_every=2,
                       checkpoint_dir=ckdir, **kw)
    np.testing.assert_allclose(
        again.logs["val_recon"], full.logs["val_recon"], rtol=1e-4)
    np.testing.assert_array_equal(again.best_epoch, resumed.best_epoch)
    for a, b in zip(jax.tree_util.tree_leaves(resumed.final_params),
                    jax.tree_util.tree_leaves(again.final_params)):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_resume_after_crash_between_logs_and_state(small_data, tmp_path):
    """Crash window: logs.npz was written for a segment but the state file
    (written after it) wasn't.  The state's embedded epoch is authoritative
    — resume must truncate the orphaned log epochs and replay the segment,
    returning exactly max_epoch epochs with no duplicates."""
    ckdir = tmp_path / "ck3"
    cfg2 = _tiny_cfg(max_epoch=2, alpha_flat_step=1e-9)
    run_trials(cfg2, small_data, n_trials=2, seed=5,
               checkpoint_every=2, checkpoint_dir=str(ckdir))

    # forge the crash: logs.npz contains a phantom extra epoch the state
    # (epoch=2) knows nothing about
    with np.load(ckdir / "logs.npz") as z:
        cum = {k: z[k] for k in z.files}
    forged = {k: np.concatenate([v, np.full_like(v[:, :1], 99.0)], axis=1)
              for k, v in cum.items()}
    np.savez(ckdir / "logs.npz", **forged)

    cfg4 = _tiny_cfg(max_epoch=4, alpha_flat_step=1e-9)
    res = run_trials(cfg4, small_data, n_trials=2, seed=5,
                     checkpoint_every=2, checkpoint_dir=str(ckdir))
    assert res.logs["val_recon"].shape == (2, 4)
    assert not np.any(res.logs["val_recon"] == 99.0)
    np.testing.assert_array_equal(np.asarray(res.logs["epoch"][0]),
                                  np.arange(4))


def _write_index_keyed(path, leaves):
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {str(i): leaf for i, leaf in enumerate(leaves)}))


@pytest.mark.parametrize("missing_fields", [
    # pre-hparams era: missing both backfill generations
    ("hparams", "best_recon", "best_recon_epoch",
     "best_recon_params", "best_recon_batch_stats"),
    # round-3 era: has hparams, predates best-recon tracking
    ("best_recon", "best_recon_epoch",
     "best_recon_params", "best_recon_batch_stats"),
])
def test_legacy_checkpoint_backfills(tmp_path, missing_fields):
    """Marker-less index-keyed trial_state.mpk files from older formats must
    still load: leaves of fields that postdate the checkpoint are backfilled
    from the template (which init_state populated from the config)."""
    import jax

    from rankaae_tpu.train.trainer import RankAAETrainer
    from rankaae_tpu.utils.checkpoint import load_train_state

    cfg = _tiny_cfg(max_epoch=2)
    trainer = RankAAETrainer(cfg, 192, 64)
    state = trainer.init_state(jax.random.PRNGKey(0))

    path_leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    legacy = [np.asarray(leaf) for kp, leaf in path_leaves
              if not any(getattr(k, "name", None) in missing_fields
                         for k in kp)]
    assert len(legacy) < len(path_leaves)  # leaves really dropped
    ck = tmp_path / "legacy_state.mpk"
    _write_index_keyed(ck, legacy)

    template = trainer.init_state(jax.random.PRNGKey(1))
    restored = load_train_state(str(ck), template)
    # hparams backfilled from the template's config-derived values
    for k, v in template.hparams.items():
        np.testing.assert_allclose(np.asarray(restored.hparams[k]),
                                   np.asarray(v))
    # everything else came from the checkpoint (PRNGKey(0) state), not the
    # PRNGKey(1) template
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    if "hparams" not in missing_fields:
        for k, v in state.hparams.items():
            np.testing.assert_array_equal(
                np.asarray(restored.hparams[k]), np.asarray(v))


def test_v2_state_roundtrip_and_mismatch_detection(tmp_path):
    """The keypath-keyed v2 format: exact roundtrip, and a mismatched
    checkpoint is refused by leaf NAME (ADVICE r03: the v1 leaf-count
    coincidence could silently shift leaves)."""
    import jax
    from flax import serialization

    from rankaae_tpu.train.trainer import RankAAETrainer
    from rankaae_tpu.utils.checkpoint import (
        load_train_state,
        save_train_state,
    )

    cfg = _tiny_cfg(max_epoch=2)
    trainer = RankAAETrainer(cfg, 192, 64)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ck = tmp_path / "state.mpk"
    save_train_state(str(ck), state)

    template = trainer.init_state(jax.random.PRNGKey(1))
    restored = load_train_state(str(ck), template)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a v2 payload with a foreign leaf name is refused even when the total
    # leaf count happens to match (drop one leaf, add one unknown)
    with open(ck, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    victim = next(k for k in payload if "best_combined" in k)
    payload.pop(victim)
    payload[".not_a_real_field"] = np.zeros((), np.float32)
    bad = tmp_path / "bad.mpk"
    with open(bad, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    with pytest.raises(ValueError, match="not in the template"):
        load_train_state(str(bad), template)


@pytest.mark.slow
def test_incremental_losses_csv(small_data, tmp_path):
    """Segmented CLI runs append losses.csv rows per segment; the final file
    matches what a one-shot write produces."""
    import yaml

    from rankaae_tpu.data.synthetic import make_synthetic_xanes_csv
    from rankaae_tpu.cli.train_sc import main

    wd = tmp_path / "wd"
    wd.mkdir()
    make_synthetic_xanes_csv(str(wd / "d.csv"), n_rows=300, dim=64, seed=2)
    cfg = {
        "data_file": "d.csv", "trials": 2, "max_epoch": 21, "batch_size": 64,
        "ae_form": "FC", "nstyle": 6, "n_aux": 5, "n_layers": 3,
        "dim_in": 64, "dim_out": 64, "decoder_activation": "Softplus",
        "optimizer_name": "AdamW", "lr_base": 1e-3, "epoch_stop_smooth": 5,
        "kendall_activation": True, "gradient_reversal": True, "timeout": 1,
    }
    with open(wd / "c.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    main(["-c", "c.yaml", "-w", str(wd), "--checkpoint-every", "7"])
    lines = (wd / "training" / "job_1" / "losses.csv").read_text().splitlines()
    # header + epochs 0, 10, 20
    assert len(lines) == 4
    assert lines[1].startswith("0,\t")
    assert lines[2].startswith("10,\t")
    assert lines[3].startswith("20,\t")

    # per-improvement checkpoint files accumulate (reference
    # checkpoints/epoch_*_loss_* cadence, at segment granularity): with 3
    # segments there are 1..3 improvement files plus the post-run best
    for job in ("job_1", "job_2"):
        ckpts = sorted((wd / "training" / job / "checkpoints").glob("epoch_*.mpk"))
        assert len(ckpts) >= 1
        # epoch stamps are strictly increasing with later (better) bests
        epochs = [int(p.name.split("_")[1]) for p in ckpts]
        assert epochs == sorted(epochs)
