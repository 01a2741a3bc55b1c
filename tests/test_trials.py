"""Multi-trial vmap/sharding tests on the virtual 8-device CPU mesh —
the distributed-equivalence harness the reference never had (SURVEY.md §4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rankaae_tpu.parallel.trials import run_trials, trial_mesh
from rankaae_tpu.train.trainer import RankAAETrainer, TrialData
from rankaae_tpu.utils.config import TrainConfig

from tests.test_trainer import _tiny_cfg, tiny_data  # noqa: F401


def test_mesh_has_8_devices():
    mesh = trial_mesh()
    assert mesh.devices.size == 8


def test_run_trials_shapes_and_independence(tiny_data):
    cfg = _tiny_cfg(max_epoch=4)
    res = run_trials(cfg, tiny_data, n_trials=8, seed=0)
    assert res.n_trials == 8
    assert res.logs["val_recon"].shape == (8, 4)
    assert res.final_metrics.shape == (8, 5)
    # trials are independent: different rng -> different trajectories
    assert len({res.logs["val_recon"][t, -1] for t in range(8)}) == 8
    # every trial learned something finite
    assert np.all(np.isfinite(res.logs["val_recon"]))


@pytest.mark.slow
def test_lr_sweep_over_trial_axis(tiny_data):
    """Net-new HPO sweep: per-trial lr_scales change outcomes, and an
    all-ones sweep is numerically identical to no sweep (x*1.0 is exact)."""
    cfg = _tiny_cfg(max_epoch=3)
    base = run_trials(cfg, tiny_data, n_trials=4, seed=5)
    ones = run_trials(cfg, tiny_data, n_trials=4, seed=5,
                      lr_scales=np.ones(4, np.float32))
    np.testing.assert_array_equal(base.logs["val_recon"], ones.logs["val_recon"])

    swept = run_trials(cfg, tiny_data, n_trials=4, seed=5,
                       lr_scales=np.asarray([1.0, 0.1, 3.0, 10.0], np.float32))
    # lane 0 (scale 1) identical to the unswept run; scaled lanes diverge
    np.testing.assert_array_equal(swept.logs["val_recon"][0],
                                  base.logs["val_recon"][0])
    for t in (1, 2, 3):
        assert not np.allclose(swept.logs["val_recon"][t],
                               base.logs["val_recon"][t])

    with pytest.raises(ValueError):
        run_trials(cfg, tiny_data, n_trials=4, lr_scales=np.ones(3))

    # AdaBound's bound schedule has a static base_lr — sweeping it is refused
    with pytest.raises(NotImplementedError):
        run_trials(_tiny_cfg(optimizer_name="AdaBound"), tiny_data,
                   n_trials=4, lr_scales=np.ones(4))


@pytest.mark.slow
def test_scan_unroll_same_trajectory_contract(tiny_data):
    """scan_unroll runs the same math on the same data but lets XLA fuse
    across batch steps, which reorders float ops (exactly like vmap does —
    see test_vmapped_trial_matches_single_trial): the contract is tight
    agreement at the first epoch and qualitatively identical learning."""
    base = run_trials(_tiny_cfg(max_epoch=3), tiny_data, n_trials=2, seed=4)
    unrolled = run_trials(_tiny_cfg(max_epoch=3, scan_unroll=2), tiny_data,
                          n_trials=2, seed=4)
    np.testing.assert_allclose(base.logs["val_recon"][:, 0],
                               unrolled.logs["val_recon"][:, 0], rtol=2e-2)
    np.testing.assert_allclose(base.logs["val_recon"],
                               unrolled.logs["val_recon"], rtol=0.5)
    assert np.all(np.isfinite(unrolled.logs["val_recon"]))


def test_remat_tpu_resident_cap():
    """The known-crashing region (conv-form remat + >8 residents/device on
    TPU) is clamped to sequential waves; every other combination passes
    through untouched."""
    from rankaae_tpu.parallel.trials import (
        REMAT_TPU_RESIDENT_CAP,
        _safe_resident_cap,
    )

    remat_conv = _tiny_cfg(ae_form="normal", remat=True)
    assert _safe_resident_cap(remat_conv, "tpu", 64) == REMAT_TPU_RESIDENT_CAP
    assert _safe_resident_cap(remat_conv, "tpu", 4) == 4
    assert _safe_resident_cap(remat_conv, "cpu", 64) == 64
    assert _safe_resident_cap(_tiny_cfg(ae_form="normal"), "tpu", 64) == 64
    assert _safe_resident_cap(_tiny_cfg(ae_form="FC", remat=True),
                              "tpu", 64) == 64

    # scan_unroll > 1 crashes the remote compile helper on TPU (round 4)
    from rankaae_tpu.parallel.trials import _check_scan_unroll

    with pytest.raises(NotImplementedError, match="scan_unroll"):
        _check_scan_unroll(_tiny_cfg(scan_unroll=2), "tpu")
    _check_scan_unroll(_tiny_cfg(scan_unroll=2), "cpu")
    _check_scan_unroll(_tiny_cfg(), "tpu")


@pytest.mark.slow
def test_adabound_plain_run_trials(tiny_data):
    """Regression (ADVICE r03 high): plain AdaBound with lr_scales=None must
    train — the init_state guard sees a TRACED all-ones scales array under
    jit(vmap) and must not mistake it for a sweep."""
    res = run_trials(_tiny_cfg(max_epoch=2, optimizer_name="AdaBound"),
                     tiny_data, n_trials=2, seed=3)
    assert np.all(np.isfinite(res.logs["val_recon"]))


def test_hparam_sweep_over_trial_axis(tiny_data):
    """Net-new: spec_noise/alpha_limit sweep across the vmapped axis — one
    compiled program, four different configurations."""
    cfg = _tiny_cfg(max_epoch=3)
    base = run_trials(cfg, tiny_data, n_trials=4, seed=7)
    swept = run_trials(
        cfg, tiny_data, n_trials=4, seed=7,
        sweep={"spec_noise": np.asarray([cfg.spec_noise, 0.0, 0.3, 0.05]),
               "alpha_limit": np.asarray([cfg.alpha_limit, 0.0, 0.9, 0.2])})
    assert np.all(np.isfinite(swept.logs["val_recon"]))
    # lane 0 runs at the config values; its only difference from the base
    # run is constant-folding, so trajectories must agree to float noise
    np.testing.assert_allclose(swept.logs["val_recon"][0],
                               base.logs["val_recon"][0], rtol=1e-4)
    # heavy input noise must change the trajectory
    assert not np.allclose(swept.logs["val_recon"][2],
                           base.logs["val_recon"][2])

    with pytest.raises(KeyError):
        run_trials(cfg, tiny_data, n_trials=4,
                   sweep={"dropout_rate": np.ones(4)})
    with pytest.raises(ValueError):
        run_trials(cfg, tiny_data, n_trials=4,
                   sweep={"spec_noise": np.ones(3)})


@pytest.mark.slow
def test_lr_sweep_resume_mismatch_refused(tiny_data, tmp_path):
    """A checkpointed sweep cannot be resumed under different lr_scales —
    the checkpointed optimizer lrs embody the original sweep."""
    scales = np.asarray([1.0, 2.0, 0.5, 1.5], np.float32)
    ck = str(tmp_path / "state")
    run_trials(_tiny_cfg(max_epoch=2), tiny_data, n_trials=4, seed=2,
               checkpoint_every=2, checkpoint_dir=ck, lr_scales=scales)
    # continue-training resume (max_epoch raised to 4) under different
    # lr_scales must be refused
    cfg4 = _tiny_cfg(max_epoch=4)
    with pytest.raises(ValueError, match="resume sweep mismatch"):
        run_trials(cfg4, tiny_data, n_trials=4, seed=2, checkpoint_every=2,
                   checkpoint_dir=ck, lr_scales=np.ones(4, np.float32))
    # same scales resume fine
    res = run_trials(cfg4, tiny_data, n_trials=4, seed=2, checkpoint_every=2,
                     checkpoint_dir=ck, lr_scales=scales)
    assert res.n_trials == 4
    assert res.logs["val_recon"].shape == (4, 4)


def test_run_trials_padding_non_divisible(tiny_data):
    """5 trials on 8 devices: padded lanes must be sliced off."""
    cfg = _tiny_cfg(max_epoch=2)
    res = run_trials(cfg, tiny_data, n_trials=5, seed=1)
    assert res.logs["val_recon"].shape == (5, 2)
    assert res.best_epoch.shape == (5,)


def test_vmapped_trial_matches_single_trial(tiny_data):
    """Lane t of the vmapped run must track an unvmapped run with the same
    key — sharded multi-trial == reference's sequential trials.

    vmap reorders float ops, so bitwise equality is impossible and the
    chaotic training loop amplifies ulp-level differences; the contract is
    same-key => same trajectory within numerical tolerance at the first
    epoch and qualitatively identical behavior after.
    """
    cfg = _tiny_cfg(max_epoch=3)
    res = run_trials(cfg, tiny_data, n_trials=2, seed=7)

    trainer = RankAAETrainer(cfg, n_train=192, n_val=64)
    keys = jax.random.split(jax.random.PRNGKey(7), 8)  # t_pad = 8 on 8 devices
    state = trainer.init_state(keys[0])
    state, logs = jax.jit(trainer.run)(state, tiny_data)
    single = np.asarray(logs["val_recon"])
    lane = res.logs["val_recon"][0]
    # first epoch: tight agreement (same key stream, same protocol)
    np.testing.assert_allclose(single[0], lane[0], rtol=1e-2)
    # whole trajectory: same scale and both learning
    np.testing.assert_allclose(single, lane, rtol=0.5)
    assert lane[-1] < lane[0] and single[-1] < single[0]


def _single_run(cfg, data, seed):
    trainer = RankAAETrainer(cfg, n_train=192, n_val=64)
    keys = jax.random.split(jax.random.PRNGKey(seed), 8)  # t_pad = 8 lanes
    state = trainer.init_state(keys[0])
    return jax.jit(trainer.run)(state, data)


@pytest.mark.slow
def test_vmapped_matches_single_one_epoch_params(tiny_data):
    """Tight pin: with all stochastic regularizers off, one full epoch of the
    vmapped lane must reproduce the unvmapped run's PARAMETERS, optimizer-
    update for optimizer-update — only float reassociation under vmap is
    allowed (round-1 review: pin more than a loss scalar).  lr_base=1e-4
    keeps Adam's sign-like steps from amplifying reassociation ulps above
    the tolerance within the epoch's 15 sequential optimizer steps."""
    cfg = _tiny_cfg(max_epoch=1, spec_noise=0.0, dropout_rate=0.0,
                    dis_dropout_rate=0.0, dis_noise=0.0, lr_base=1e-4)
    res = run_trials(cfg, tiny_data, n_trials=2, seed=11)
    state, logs = _single_run(cfg, tiny_data, seed=11)

    # Adam's bias-corrected first steps act like sign-SGD: for coordinates
    # with near-zero gradient, a single reassociation ulp flips the step's
    # sign, moving the element by a full lr — so the per-element contract is
    # "within ~2 optimizer steps of each other", not float-tight.  (The
    # fastest optimizer here runs at lr_ratio 10 * lr_base = 1e-3/step; a
    # semantically different trajectory would differ by the full 15-step
    # displacement, an order of magnitude more.)
    flat_single = jax.tree_util.tree_leaves_with_path(state.params)
    lane_params = jax.tree_util.tree_map(lambda x: x[0], res.final_params)
    flat_lane = jax.tree_util.tree_leaves_with_path(lane_params)
    assert len(flat_single) == len(flat_lane)
    for (path, a), (_, b) in zip(flat_single, flat_lane):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-3,
            err_msg=f"param diverged at {jax.tree_util.keystr(path)}",
        )
    # the logged losses of the epoch are float-tight (no Adam amplification
    # between the forward passes that produced them).  "combined" is excluded
    # from tight pins here and below: it embeds rank statistics (Shapiro,
    # inter-style Spearman) that jump discretely when two near-equal latent
    # values swap order under reassociation.
    for name in ("val_recon", "val_aux", "val_mi"):
        np.testing.assert_allclose(np.asarray(logs[name]),
                                   res.logs[name][0], rtol=5e-3, atol=1e-5,
                                   err_msg=f"epoch losses diverged in {name}")


@pytest.mark.slow
def test_vmapped_matches_single_deterministic_trajectory(tiny_data):
    """Multi-epoch pin: the 5-optimizer adversarial protocol is chaotic, so
    ulp-level vmap reassociation noise grows exponentially with epochs (at
    the default lr it reaches O(1) by epoch ~8).  At lr_base=1e-4 the
    measured 12-epoch worst-case divergence is ~4% on the reconstruction
    trajectory and ~12% on the volatile latent-cycle (MI) loss; 15%
    tolerance pins the whole trajectory with margin while still catching
    any systemic vmap/single semantic difference (which would show up at
    epoch 0-1, where agreement is ~1e-5)."""
    cfg = _tiny_cfg(max_epoch=12, spec_noise=0.0, dropout_rate=0.0,
                    dis_dropout_rate=0.0, dis_noise=0.0, lr_base=1e-4)
    res = run_trials(cfg, tiny_data, n_trials=2, seed=11)
    state, logs = _single_run(cfg, tiny_data, seed=11)

    for name in ("val_recon", "val_aux", "val_mi", "combined"):
        # atol covers the near-zero-crossing Kendall loss, where relative
        # error is meaningless
        np.testing.assert_allclose(
            np.asarray(logs[name]), res.logs[name][0], rtol=0.15, atol=8e-3,
            err_msg=f"trajectory diverged in {name}",
        )
    # and the first epoch is float-tight in every smooth channel
    for name in ("val_recon", "val_aux", "val_mi"):
        np.testing.assert_allclose(
            np.asarray(logs[name])[:1], res.logs[name][0][:1],
            rtol=1e-3, atol=1e-5,
            err_msg=f"first epoch diverged in {name}",
        )


@pytest.mark.slow
def test_trial_dp_mesh_run(tiny_data):
    """First-class 2-D ``trial x dp`` mesh (SURVEY §2.8 DP row): dataset
    rows sharded over 'dp', trajectories match a 1-D mesh with the same
    lane count, and the compiled program contains real collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rankaae_tpu.parallel.trials import (
        _data_sharding,
        trial_dp_mesh,
        trial_mesh,
    )

    cfg = _tiny_cfg(max_epoch=3)
    mesh2 = trial_dp_mesh(n_dp=2)
    assert dict(mesh2.shape) == {"trial": 4, "dp": 2}
    # 192/64 rows divide by dp=2 -> rows really are sharded
    assert _data_sharding(mesh2, tiny_data).spec == P("dp")

    # same lane count on both meshes so the RNG lanes coincide exactly
    base = run_trials(cfg, tiny_data, n_trials=4, seed=3,
                      mesh=trial_mesh(jax.devices()[:4]))
    dp = run_trials(cfg, tiny_data, n_trials=4, seed=3, mesh=mesh2)
    np.testing.assert_allclose(dp.logs["val_recon"],
                               base.logs["val_recon"], rtol=1e-3, atol=1e-5)

    # the dp-sharded program really communicates: collectives in the HLO
    trainer = RankAAETrainer(cfg, n_train=192, n_val=64)
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    states = jax.jit(jax.vmap(trainer.init_state))(keys)
    states = jax.device_put(states, NamedSharding(mesh2, P("trial")))
    sdata = jax.device_put(tiny_data, _data_sharding(mesh2, tiny_data))
    run = jax.jit(jax.vmap(trainer.run_epochs, in_axes=(0, None, None)))
    hlo = run.lower(states, sdata, jnp.arange(0, 3)).compile().as_text()
    assert any(c in hlo for c in
               ("all-gather", "all-reduce", "collective-permute", "all-to-all"))

    # non-divisible rows fall back to replication (no crash, no shard)
    ragged = TrialData(
        train_spec=tiny_data.train_spec[:191],
        train_aux=tiny_data.train_aux[:191],
        val_spec=tiny_data.val_spec, val_aux=tiny_data.val_aux,
    )
    assert _data_sharding(mesh2, ragged).spec == P()


def test_trial_accessor(tiny_data):
    cfg = _tiny_cfg(max_epoch=2)
    res = run_trials(cfg, tiny_data, n_trials=3, seed=0)
    t1 = res.trial(1)
    assert t1["final_metrics"].shape == (5,)
    assert t1["logs"]["val_recon"].shape == (2,)
    # per-trial params have no leading trial axis
    leaf = jax.tree_util.tree_leaves(t1["final_params"]["enc"])[0]
    assert leaf.ndim in (1, 2)
