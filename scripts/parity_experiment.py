"""Head-to-head training parity: reference PyTorch vs rankaae_tpu.

Trains BOTH frameworks on the SAME synthetic dataset with the SAME config
(trials=1) and compares the quantities the north star gates on:

* final validation reconstruction MSE,
* per-dimension style<->descriptor Spearman rho on the val split,
* min per-style Shapiro-W, max inter-style |Spearman|,
* validation Kendall loss.

The reference runs on torch CPU, imported read-only from /root/reference
(its unavailable optional deps — torch_optimizer, torchvision, ipyparallel —
are stubbed with equivalent shims; the experiment config uses AdamW, which is
plain torch.optim).

Usage:  python scripts/parity_experiment.py [--epochs 300] [--rows 2000]
Writes PARITY_RESULTS.md at the repo root.
"""
from __future__ import annotations

import argparse
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _stub_reference_deps():
    """Provide the reference's optional imports it never uses in this config."""
    import torch.optim as topt
    import torch.optim.lr_scheduler as sched

    # torch >= 2.x removed the `verbose` kwarg the reference passes
    # (reference trainer.py:405)
    if not getattr(sched.ReduceLROnPlateau, "_rankaae_verbose_shim", False):
        _Orig = sched.ReduceLROnPlateau

        class _Plateau(_Orig):
            _rankaae_verbose_shim = True

            def __init__(self, *a, verbose=False, **kw):
                super().__init__(*a, **kw)

        sched.ReduceLROnPlateau = _Plateau

    if "torch_optimizer" not in sys.modules:
        stub = types.ModuleType("torch_optimizer")
        stub.AdaBound = topt.Adam   # placeholders; experiment uses AdamW
        stub.RAdam = getattr(topt, "RAdam", topt.Adam)
        sys.modules["torch_optimizer"] = stub
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")

        class Compose:
            def __init__(self, fns):
                self.fns = fns

            def __call__(self, x):
                for f in self.fns:
                    x = f(x)
                return x

        tr.Compose = Compose
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr


def _experiment_config(epochs):
    return {
        "data_file": "parity_data.csv",
        "trials": 1,
        "timeout": 10,
        "verbose": False,
        "max_epoch": epochs,
        "batch_size": 512,
        "gradient_reversal": True,
        "alpha_flat_step": 739,
        "alpha_limit": 0.7172,
        "decoder_activation": "Softplus",
        "dis_beta": 1.1,
        "dis_dropout_rate": 0.056,
        "dis_noise": 0.56,
        "gen_beta": 1.1,
        "n_aux": 5,
        "nstyle": 6,
        "ae_form": "FC",
        "dim_in": 256,
        "dim_out": 256,
        "n_layers": 5,
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
        "epoch_stop_smooth": epochs,
    }


def _final_stats(encode, decode, val_spec, val_aux):
    from scipy.stats import shapiro, spearmanr

    z = encode(val_spec)
    out = decode(z)
    recon_mse = float(np.mean((out - val_spec) ** 2))
    style_desc_rho = [
        float(spearmanr(z[:, k], val_aux[:, k]).correlation) for k in range(5)
    ]
    shapiro_min = float(min(shapiro(z[:, k]).statistic for k in range(z.shape[1])))
    import itertools

    coupling = float(max(
        abs(spearmanr(z[:, i], z[:, j]).correlation)
        for i, j in itertools.combinations(range(z.shape[1]), 2)
    ))
    return {
        "recon_mse": recon_mse,
        "style_desc_rho": style_desc_rho,
        "shapiro_min": shapiro_min,
        "coupling": coupling,
    }


def run_reference(workdir, cfg_dict, csv_path):
    _stub_reference_deps()
    # evict the repo's import-compat `sc` shim so the REFERENCE package wins
    for name in list(sys.modules):
        if name == "sc" or name.startswith("sc."):
            mod = sys.modules[name]
            if "/root/repo" in (getattr(mod, "__file__", "") or ""):
                del sys.modules[name]
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    from sc.clustering.trainer import Trainer as RefTrainer
    from sc.utils.parameter import Parameters as RefParameters

    t0 = time.time()
    trainer = RefTrainer.from_data(
        csv_path, verbose=False, work_dir=workdir,
        config_parameters=RefParameters(dict(cfg_dict)),
    )
    metrics = trainer.train()
    wall = time.time() - t0

    enc, dec = trainer.encoder, trainer.decoder
    enc.eval(), dec.eval()

    def encode(x):
        with torch.no_grad():
            return enc(torch.tensor(x)).numpy()

    def decode(z):
        with torch.no_grad():
            return dec(torch.tensor(z)).numpy()

    return metrics, wall, encode, decode


def run_ours(workdir, cfg_dict, csv_path, platform=None):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from rankaae_tpu.data.dataset import load_split_arrays
    from rankaae_tpu.models.inference import InferenceModel
    from rankaae_tpu.train.trainer import RankAAETrainer, TrialData
    from rankaae_tpu.utils.config import Parameters, TrainConfig

    cfg = TrainConfig.from_parameters(Parameters(dict(cfg_dict)))
    splits = load_split_arrays(csv_path, n_aux=cfg.n_aux)
    data = TrialData(
        train_spec=jnp.asarray(splits["train"].spec),
        train_aux=jnp.asarray(splits["train"].aux),
        val_spec=jnp.asarray(splits["val"].spec),
        val_aux=jnp.asarray(splits["val"].aux),
    )
    trainer = RankAAETrainer(cfg, len(splits["train"]), len(splits["val"]))
    state = trainer.init_state(jax.random.PRNGKey(0))
    t0 = time.time()
    state, logs = jax.jit(trainer.run)(state, data)
    # np.asarray: block_until_ready does not reliably block on axon
    np.asarray(logs["combined"])
    wall = time.time() - t0
    metrics = [float(x) for x in np.asarray(logs["metrics"])[-1]]
    model = InferenceModel(state.params, state.batch_stats, cfg)
    return metrics, wall, model.encode, model.decode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--rows", type=int, default=2000)
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args()

    from rankaae_tpu.data.synthetic import make_synthetic_xanes_csv
    from rankaae_tpu.data.dataset import load_split_arrays

    workdir = os.path.join("/tmp", "parity_experiment")
    os.makedirs(workdir, exist_ok=True)
    csv_path = os.path.join(workdir, "parity_data.csv")
    make_synthetic_xanes_csv(csv_path, n_rows=args.rows, dim=256, seed=42)
    cfg_dict = _experiment_config(args.epochs)

    splits = load_split_arrays(csv_path, n_aux=5)
    val_spec, val_aux = splits["val"].spec, splits["val"].aux

    print(f"ours: training {args.epochs} epochs on {args.rows} rows ...")
    ours_metrics, ours_wall, enc_o, dec_o = run_ours(workdir, cfg_dict, csv_path)
    ours = _final_stats(enc_o, dec_o, val_spec, val_aux)
    print(f"ours: {ours_wall:.1f}s, {ours}")

    if args.skip_reference:
        return

    print("reference: training (torch CPU) ...")
    ref_metrics, ref_wall, enc_r, dec_r = run_reference(workdir, cfg_dict, csv_path)
    ref = _final_stats(enc_r, dec_r, val_spec, val_aux)
    print(f"reference: {ref_wall:.1f}s, {ref}")

    lines = [
        "# Training-outcome parity: reference (torch CPU) vs rankaae_tpu",
        "",
        f"Same synthetic dataset ({args.rows} rows), same config "
        f"(`example/fix_config.yaml` hyperparameters, {args.epochs} epochs, "
        "trials=1, AdamW, GRL, flex recon, activated Kendall), independent RNG.",
        "",
        "| Quantity | reference | rankaae_tpu |",
        "|---|---|---|",
        f"| wall-clock (s) | {ref_wall:.1f} | {ours_wall:.1f} (single chip, incl. compile) |",
        f"| final val recon MSE | {ref['recon_mse']:.5f} | {ours['recon_mse']:.5f} |",
        f"| min per-style Shapiro-W | {ref['shapiro_min']:.4f} | {ours['shapiro_min']:.4f} |",
        f"| max inter-style \\|rho\\| | {ref['coupling']:.4f} | {ours['coupling']:.4f} |",
    ]
    names = ["CT", "CN", "OCN", "RSTD", "MOOD"]
    for k in range(5):
        lines.append(
            f"| style{k+1}<->{names[k]} Spearman | {ref['style_desc_rho'][k]:.4f} "
            f"| {ours['style_desc_rho'][k]:.4f} |"
        )
    lines += [
        "",
        f"Reference per-epoch wall: {ref_wall/args.epochs*1000:.0f} ms; "
        f"ours: {ours_wall/args.epochs*1000:.0f} ms (1 trial; the production "
        "path runs 32 trials concurrently per chip).",
        "",
        "Parity is statistical (independent RNG streams): recon MSE within a",
        "factor of ~1.5 and rank correlations matching in sign and magnitude",
        "indicate equivalent training dynamics (BASELINE.json gate).",
    ]
    out = os.path.join(REPO, "PARITY_RESULTS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
