"""The OO evaluator family (reference ``analysis_new.py`` — implemented to
working state here): Evaluator base serialization, EvaluatorAll single-model
evaluation, Reporter aggregation + ranking."""
import os

import numpy as np
import pytest

import jax

from rankaae_tpu.report.curves import Evaluator, EvaluatorAll, Reporter
from rankaae_tpu.utils.checkpoint import save_model_bundle
from rankaae_tpu.utils.config import TrainConfig


@pytest.fixture(scope="module")
def tiny_bundle_workdir(tmp_path_factory):
    """A training-directory layout with 2 untrained (init-only) bundles and a
    matching synthetic dataset — enough to drive the evaluator machinery."""
    from rankaae_tpu.data.synthetic import make_synthetic_xanes_csv
    from rankaae_tpu.models.registry import build_autoencoder, build_discriminator

    wd = tmp_path_factory.mktemp("evalwd")
    csv = str(wd / "d.csv")
    make_synthetic_xanes_csv(csv, n_rows=300, dim=64, seed=3)

    cfg = TrainConfig(
        max_epoch=1, batch_size=32, nstyle=6, n_aux=5, ae_form="FC",
        n_layers=3, dim_in=64, dim_out=64, decoder_activation="Softplus",
        optimizer_name="AdamW", lr_base=1e-3, epoch_stop_smooth=1,
        kendall_activation=True, gradient_reversal=True,
    )
    for i in (1, 2):
        enc, dec = build_autoencoder(cfg)
        rngs = {"params": jax.random.PRNGKey(i), "dropout": jax.random.PRNGKey(0)}
        ev = enc.init(rngs, np.zeros((2, 64), np.float32), train=True)
        dv = dec.init(rngs, np.zeros((2, 6), np.float32), train=True)
        dis = build_discriminator(cfg)
        xv = dis.init(rngs, np.zeros((2, 6), np.float32), 0.0, train=True)
        params = {"enc": ev["params"], "dec": dv["params"], "dis": xv["params"]}
        stats = {"enc": ev.get("batch_stats", {}), "dec": dv.get("batch_stats", {}),
                 "dis": xv.get("batch_stats", {})}
        job = wd / "training" / f"job_{i}"
        os.makedirs(job, exist_ok=True)
        save_model_bundle(str(job / "final.mpk"), params, stats, cfg)
    return str(wd), csv


def test_evaluator_base_serialization():
    ev = Evaluator(name="probe")
    ev._process_metadata(data_path="/x.csv", model_path="/m.mpk")
    ev.result = {"vector": np.arange(3.0), "scalar": 1.5}
    d = ev.as_dict()
    assert d["@class"] == "Evaluator" and d["metadata"]["data"] == "/x.csv"
    back = Evaluator.from_dict(d)
    np.testing.assert_array_equal(back.result["vector"], np.arange(3.0))
    assert back.result["scalar"] == 1.5
    with pytest.raises(NotImplementedError):
        ev.evaluate()


def test_evaluator_all_from_file(tiny_bundle_workdir):
    wd, csv = tiny_bundle_workdir
    ea = EvaluatorAll.from_file(csv, os.path.join(wd, "training", "job_1", "final.mpk"))
    result = ea.evaluate()
    assert "Reconstruct Err" in result and np.isfinite(result["Reconstruct Err"][0])
    assert ea.metadata["model"].endswith("final.mpk")


def test_reporter_aggregates_and_ranks(tiny_bundle_workdir):
    wd, csv = tiny_bundle_workdir
    from rankaae_tpu.data.dataset import AuxSpectraDataset

    ds = AuxSpectraDataset(csv, split_portion="val", n_aux=5)
    rep = Reporter()
    rep.evaluate_all_models(os.path.join(wd, "training"), test_ds=ds)
    df, fig = rep.report(plot=False)
    assert list(df.columns) == ["job", "Rank", "Score", "Recon Err"]
    assert len(df) == 2 and set(df["job"]) == {"job_1", "job_2"}
    assert df.iloc[0]["Rank"] == 0
    assert rep.ranked_jobs == list(df["job"])
