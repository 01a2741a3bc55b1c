"""End-to-end pipeline test: train_sc -> artifacts -> sc_generate_report.

The TPU analog of the reference's ``run_training.sh`` flow, on the virtual
CPU mesh with a tiny synthetic dataset."""
import json
import os

import numpy as np
import pytest
import yaml

from rankaae_tpu.data.synthetic import make_synthetic_xanes_csv


@pytest.fixture(scope="module")
def work_dir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("e2e")
    make_synthetic_xanes_csv(str(wd / "data.csv"), n_rows=600, dim=256, seed=5)
    cfg = {
        "data_file": "data.csv",
        "trials": 2,
        "timeout": 1,
        "verbose": True,
        "max_epoch": 12,
        "batch_size": 128,
        "gradient_reversal": True,
        "alpha_flat_step": 739,
        "alpha_limit": 0.7172,
        "decoder_activation": "Softplus",
        "dis_beta": 1.1,
        "dis_dropout_rate": 0.056,
        "dis_noise": 0.56,
        "gen_beta": 1.1,
        "output_name": "report",
        "top_n": 2,
        "gpu": False,
        "n_sampling": 10,
        "n_aux": 5,
        "nstyle": 6,
        "ae_form": "FC",
        "dim_in": 256,
        "dim_out": 256,
        "n_layers": 3,
        "FC_discriminator_layers": 3,
        "use_cnn_discriminator": False,
        "dropout_rate": 0.04,
        "sch_factor": 0.1,
        "sch_patience": 100,
        "lr_base": 0.001,
        "lr_ratio_Corr": 10,
        "lr_ratio_Mutual": 1,
        "lr_ratio_Reconn": 10,
        "lr_ratio_Smooth": 1,
        "lr_ratio_dis": 1,
        "lr_ratio_gen": 10,
        "optimizer_name": "AdamW",
        "spec_noise": 0.02,
        "use_flex_spec_target": True,
        "weight_decay": 0.01,
        "kendall_activation": True,
        "epoch_stop_smooth": 8,
    }
    with open(wd / "fix_config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    return str(wd)


def test_train_sc_produces_artifacts(work_dir):
    from rankaae_tpu.cli.train_sc import main

    main(["-c", "fix_config.yaml", "-w", work_dir, "--lr-sweep", "0.5,2"])

    assert os.path.exists(os.path.join(work_dir, "main_process_message.txt"))
    for i in (1, 2):
        job = os.path.join(work_dir, "training", f"job_{i}")
        assert os.path.exists(os.path.join(job, "messages.txt"))
        # the sweep records each trial's configuration
        assert "lr_scale:" in open(os.path.join(job, "messages.txt")).read()
        assert os.path.exists(os.path.join(job, "losses.csv"))
        assert os.path.exists(os.path.join(job, "final.mpk"))
        assert os.path.exists(os.path.join(job, "best_tracked.mpk"))
        assert os.path.exists(os.path.join(job, "best_recon.mpk"))

    # losses.csv schema byte-compatible with the reference fixture layout
    lines = open(os.path.join(work_dir, "training", "job_1", "losses.csv")).read().splitlines()
    assert lines[0].startswith("Epoch,Train_D,Val_D,Train_G,Val_G,Train_Aux")
    assert lines[1].startswith("0,\t")
    assert lines[1].endswith(",\t")
    assert len(lines) == 1 + 2  # header + epochs 0, 10


def test_generate_report_produces_artifacts(work_dir):
    from rankaae_tpu.cli.generate_report import main

    main(["-c", "fix_config.yaml", "-w", work_dir])

    for artifact in [
        "report_best_model.png",
        "report_model_selection.png",
        "report_model_evaluation.pkl",
        "report.json",
        "report.in",
        "report.out",
        "report_spec_in.txt",
        "report_spec_out.txt",
        "report_styles.txt",
        "loss_curves.png",
    ]:
        assert os.path.exists(os.path.join(work_dir, artifact)), artifact

    with open(os.path.join(work_dir, "report.json")) as f:
        report = json.load(f)
    assert len(report) == 2
    for job, result in report.items():
        assert "Reconstruct Err" in result
        assert "Rank" in result and "Score" in result
        assert result["Style-descriptor Corr"]["1"]["F1 score"] is not None
    # swept runs surface each trial's lr_scale in the selection report
    assert {round(report[j]["lr_scale"], 3) for j in report} == {0.5, 2.0}

    # spectra dumps well-formed
    spec_out = np.loadtxt(os.path.join(work_dir, "report.out"))
    assert spec_out.shape[1] == 256


def test_generate_report_over_best_checkpoints(work_dir):
    """use_best_checkpoint: true selects over each trial's best-RECON (min
    val recon MSE) model instead of the final-epoch snapshot (net-new; the
    final epoch is a lottery draw after plateau freeze, and min-combined
    picks early-epoch far-worse reconstructors)."""
    import yaml

    from rankaae_tpu.cli.generate_report import main
    from rankaae_tpu.utils.checkpoint import load_model_bundle

    cfg = yaml.safe_load(open(os.path.join(work_dir, "fix_config.yaml")))
    cfg["use_best_checkpoint"] = True
    cfg["output_name"] = "best_report"
    with open(os.path.join(work_dir, "best_config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)
    main(["-c", "best_config.yaml", "-w", work_dir])
    with open(os.path.join(work_dir, "best_report.json")) as f:
        report = json.load(f)
    assert len(report) == 2
    assert all(np.isfinite(r["Reconstruct Err"][0]) for r in report.values())
    # the selected bundle is the min-val-recon model: its recorded recon MSE
    # must be <= every logged val_recon (incl. the final epoch's)
    for i in (1, 2):
        job = os.path.join(work_dir, "training", f"job_{i}")
        _, _, _, extra = load_model_bundle(os.path.join(job, "best_recon.mpk"))
        import pandas as pd
        df = pd.read_csv(os.path.join(job, "losses.csv"), index_col=False,
                         delimiter=",", usecols=range(13))
        assert extra["best_recon_mse"] <= df["Val_Recon"].min() + 1e-6


def test_losses_csv_parses_with_reference_loss_curve_plotter(work_dir):
    """Our CSV must load through the same pandas path the reference uses."""
    import pandas as pd

    path = os.path.join(work_dir, "training", "job_1", "losses.csv")
    df = pd.read_csv(path, index_col=False, delimiter=",", usecols=range(13))
    assert df.shape[1] == 13
    assert "Train_Mutual_Info" in df.columns
    assert df["Epoch"].tolist() == [0, 10]


def test_plot_job_short_circuits_selection(work_dir):
    """plot_job config key skips model selection and reports one job
    (reference generate_report.py:248-251)."""
    import yaml

    cfg = yaml.safe_load(open(os.path.join(work_dir, "fix_config.yaml")))
    cfg["plot_job"] = "job_2"
    cfg["n_sampling"] = 0   # also exercise the zeros (non-MC) decoder sweep
    with open(os.path.join(work_dir, "plot_job_config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)

    from rankaae_tpu.cli.generate_report import main

    main(["-c", "plot_job_config.yaml", "-w", work_dir])
    assert os.path.exists(os.path.join(work_dir, "report_job_2.png"))
