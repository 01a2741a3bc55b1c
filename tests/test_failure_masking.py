"""Failure-detection behaviors: NaN trials rank last; trial waves concat."""
import numpy as np

from rankaae_tpu.report.analysis import sort_all_models
from rankaae_tpu.report.generate_report import sorting_algorithm


def _fake_result(recon, rho, coupling=0.3):
    return {
        "Inter-style Corr": coupling,
        "Reconstruct Err": [recon, 0.01],
        "Style-descriptor Corr": {
            i: ({"F1 score": rho} if i == 1 else {"Spearman": rho}) for i in range(5)
        },
        "Input": None,
        "Output": None,
    }


def test_nan_trial_ranks_last():
    results = {
        "job_1": _fake_result(0.05, 0.8),
        "job_2": _fake_result(float("nan"), float("nan")),   # diverged trial
        "job_3": _fake_result(0.04, 0.9),
    }
    out, ranked_jobs, _ = sort_all_models(
        results, sort_score=sorting_algorithm, ascending=False
    )
    assert ranked_jobs[-1] == "job_2"
    assert out["job_2"]["Rank"] == 2
    # the healthy trials are ranked by score, best first
    assert out["job_3"]["Rank"] == 0


def test_nan_trial_ranks_last_ascending_too():
    """Failed trials must rank last regardless of sort direction (round-1
    advisor finding: the -inf sentinel put them FIRST under ascending=True)."""
    results = {
        "job_1": _fake_result(0.05, 0.8),
        "job_2": _fake_result(float("nan"), float("nan")),
        "job_3": _fake_result(0.04, 0.9),
    }
    out, ranked_jobs, _ = sort_all_models(
        results, sort_score=sorting_algorithm, ascending=True
    )
    assert ranked_jobs[-1] == "job_2"
    assert out["job_2"]["Rank"] == 2
    assert out["job_2"]["Score"] == float("inf")


def test_trial_waves_concat(tiny_data_import):
    """trials > max_resident runs in waves; results concatenate seamlessly."""
    from rankaae_tpu.parallel.trials import run_trials
    from tests.test_trainer import _tiny_cfg

    cfg = _tiny_cfg(max_epoch=2)
    res = run_trials(cfg, tiny_data_import, n_trials=5, seed=0,
                     max_resident_per_device=0.25)  # force 2-trial... see below
    assert res.n_trials == 5
    assert res.logs["val_recon"].shape == (5, 2)
    assert res.best_epoch.shape == (5,)
    assert np.all(np.isfinite(res.logs["val_recon"]))


import pytest  # noqa: E402


@pytest.fixture()
def tiny_data_import():
    from tests.test_trainer import tiny_data as _td  # reuse builder logic

    import jax.numpy as jnp

    rng = np.random.default_rng(42)
    n, dim = 256, 64
    aux = rng.normal(size=(n, 5)).astype(np.float32)
    t = np.linspace(0, 1, dim, dtype=np.float32)
    spec = (1.0 + aux[:, :1] * np.sin(2 * np.pi * t)[None, :] * 0.3).astype(np.float32)
    from rankaae_tpu.train.trainer import TrialData

    return TrialData(
        train_spec=jnp.asarray(spec[:192]), train_aux=jnp.asarray(aux[:192]),
        val_spec=jnp.asarray(spec[192:]), val_aux=jnp.asarray(aux[192:]),
    )


def test_f1_threshold_scan_matches_sklearn(rng):
    """The vectorized scan must equal the reference's sklearn loop exactly
    (same quirky argument order: prediction passed as sklearn y_true)."""
    from sklearn.metrics import f1_score

    from rankaae_tpu.report.analysis import _f1_threshold_scan

    style = rng.normal(size=300)
    classes = rng.choice([0, 1, 2], 300)
    grid = np.linspace(-3.5, 3.5, 97)
    ref_lt = np.array([f1_score(style < th, classes < 1, zero_division=0) for th in grid])
    ref_gt = np.array([f1_score(style > th, classes > 1, zero_division=0) for th in grid])
    np.testing.assert_allclose(_f1_threshold_scan(style, classes < 1, grid, "lt"),
                               ref_lt, atol=1e-12)
    np.testing.assert_allclose(_f1_threshold_scan(style, classes > 1, grid, "gt"),
                               ref_gt, atol=1e-12)
