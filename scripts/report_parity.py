"""Cross-validate our report stage against the REFERENCE's own report code.

Takes trained rankaae_tpu models (the committed real-chip run in
``example/training/job_*/final.mpk``), exports them to genuine reference
``final.pt`` checkpoints (``utils/torch_export``), runs the reference's
``sc_generate_report`` (``/root/reference/sc/report/generate_report.py:218-293``
+ ``analysis.py:394-450``) on them with the same synthetic CSV, then runs OUR
report stage on the same bundles and diffs every model-evaluation metric and
the selection ranking.  Writes REPORT_PARITY.md.

The reference's optional deps are shimmed: plotly is absent, so
``plotly.express.colors.sequential.Plotly3`` is stubbed with the public
colormap hex values (the same ones inlined in ``rankaae_tpu/report``).

Usage: python scripts/report_parity.py [--jobs 8] [--out REPORT_PARITY.md]
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import shutil
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PLOTLY3 = [
    "#0508b8", "#1910d8", "#3c19f0", "#6b1cfb", "#981cfd", "#bf1cfd",
    "#dd2bfd", "#f246fe", "#fc67fd", "#fe88fc", "#fea5fd", "#febefe",
    "#fec3fe",
]


def _stub_plotly():
    if "plotly" not in sys.modules:
        px = types.ModuleType("plotly.express")
        colors = types.SimpleNamespace(
            sequential=types.SimpleNamespace(Plotly3=PLOTLY3))
        px.colors = colors
        plotly = types.ModuleType("plotly")
        plotly.express = px
        sys.modules["plotly"] = plotly
        sys.modules["plotly.express"] = px
    if "monty" not in sys.modules:
        # reference analysis_new.py:7 subclasses monty.json.MSONable, a
        # serialization mixin it never exercises in the report path
        mj = types.ModuleType("monty.json")

        class MSONable:
            pass

        mj.MSONable = MSONable
        monty = types.ModuleType("monty")
        monty.json = mj
        sys.modules["monty"] = monty
        sys.modules["monty.json"] = mj
    if "torch_optimizer" not in sys.modules:
        # imported at sc.utils.parameter module scope; never constructed in
        # the report path
        import torch.optim as topt

        stub = types.ModuleType("torch_optimizer")
        stub.AdaBound = topt.Adam
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


def _prepare_ref_workdir(example_dir, workdir, jobs):
    """Reference-shaped workdir: config (gpu off), CSV, per-job final.pt."""
    import yaml

    from rankaae_tpu.utils.torch_export import export_reference_checkpoint

    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(example_dir, "fix_config.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["gpu"] = False   # reference would map_location onto a missing CUDA
    # keys the reference report reads from the yaml without a fallback
    # (plot_job intentionally absent -> full evaluate/sort path)
    cfg.setdefault("n_sampling", 1000)
    cfg.setdefault("plot_residual", False)
    with open(os.path.join(workdir, "fix_config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)
    csv = cfg["data_file"]
    if not os.path.exists(os.path.join(workdir, csv)):
        shutil.copy2(os.path.join(example_dir, csv), os.path.join(workdir, csv))
    for i in jobs:
        jdir = os.path.join(workdir, "training", f"job_{i}")
        os.makedirs(jdir, exist_ok=True)
        export_reference_checkpoint(
            os.path.join(example_dir, "training", f"job_{i}", "final.mpk"),
            os.path.join(jdir, "final.pt"))
        shutil.copy2(
            os.path.join(example_dir, "training", f"job_{i}", "losses.csv"),
            os.path.join(jdir, "losses.csv"))
    return workdir


def _run_reference_report(workdir):
    """Run the reference's sc_generate_report main() in-place."""
    import matplotlib

    matplotlib.use("Agg")
    _stub_plotly()
    # torch >= 2.6 defaults weights_only=True; the reference pickles whole
    # nn.Modules (trainer.py:281-283), so restore the old default for it
    import torch

    if not getattr(torch.load, "_rankaae_wo_shim", False):
        _orig_load = torch.load

        def _load(*a, **kw):
            kw.setdefault("weights_only", False)
            return _orig_load(*a, **kw)

        _load._rankaae_wo_shim = True
        torch.load = _load
    # evict the repo's import-compat `sc` shim so the REFERENCE package wins
    for name in list(sys.modules):
        if name == "sc" or name.startswith("sc."):
            mod = sys.modules[name]
            if "/root/repo" in (getattr(mod, "__file__", "") or ""):
                del sys.modules[name]
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    from sc.report import generate_report as ref_gr
    import sc.report.analysis as ref_an

    # sklearn >= 1.x returns a plain float from f1_score; the reference
    # calls .tolist() on it (analysis.py:267) — restore the numpy scalar it
    # was written against
    if not getattr(ref_an.f1_score, "_rankaae_np_shim", False):
        _orig_f1 = ref_an.f1_score

        def _f1(*a, **kw):
            return np.float64(_orig_f1(*a, **kw))

        _f1._rankaae_np_shim = True
        ref_an.f1_score = _f1

    old_argv, old_cwd = sys.argv, os.getcwd()
    try:
        os.chdir(workdir)  # it savefigs loss_curves.png into cwd
        sys.argv = ["sc_generate_report", "-c", "fix_config.yaml", "-w", workdir]
        ref_gr.main()
    finally:
        sys.argv, _ = old_argv, os.chdir(old_cwd)

    with open(os.path.join(workdir, "report_model_evaluation.pkl"), "rb") as f:
        return pickle.load(f)


def _prepare_ours_workdir(example_dir, workdir, jobs):
    import yaml

    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(example_dir, "fix_config.yaml")) as f:
        cfg = yaml.safe_load(f)
    with open(os.path.join(workdir, "fix_config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)
    csv = cfg["data_file"]
    if not os.path.exists(os.path.join(workdir, csv)):
        shutil.copy2(os.path.join(example_dir, csv), os.path.join(workdir, csv))
    for i in jobs:
        src = os.path.join(example_dir, "training", f"job_{i}")
        dst = os.path.join(workdir, "training", f"job_{i}")
        os.makedirs(dst, exist_ok=True)
        for fn in ("final.mpk", "final.mpk.json", "losses.csv"):
            shutil.copy2(os.path.join(src, fn), os.path.join(dst, fn))
    return workdir


def _run_our_report(workdir):
    from rankaae_tpu.cli.generate_report import main as our_main

    our_main(["-c", "fix_config.yaml", "-w", workdir])
    with open(os.path.join(workdir, "report.json")) as f:
        return json.load(f)


def _flat_metrics(job_result):
    """metric-name -> float for one job's evaluation dict (both stacks emit
    the same schema: reference analysis.py evaluate_model / our
    report.analysis)."""
    out = {}
    corr = job_result["Style-descriptor Corr"]
    for k, v in corr.items():
        k = str(k)
        if "Spearman" in v:
            out[f"style{k}_spearman"] = float(v["Spearman"])
            out[f"style{k}_linear_R2"] = float(v["Linear"]["R2"])
        if "F1 score" in v:
            out[f"style{k}_f1"] = float(v["F1 score"])
            out[f"style{k}_cn45"] = float(v["CN45 Threshold"])
            out[f"style{k}_cn56"] = float(v["CN56 Threshold"])
    rerr = job_result["Reconstruct Err"]
    out["recon_err_mae"] = float(np.asarray(rerr).ravel()[0])
    out["inter_style_corr"] = float(job_result["Inter-style Corr"])
    out["score"] = float(job_result["Score"])
    out["rank"] = float(job_result["Rank"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=8)
    ap.add_argument("--example-dir", default=os.path.join(REPO, "example"))
    ap.add_argument("--workdir", default="/tmp/report_parity")
    ap.add_argument("--out", default="REPORT_PARITY.md")
    ap.add_argument("--skip-ours", action="store_true",
                    help="reuse the committed example/report.json for ours")
    args = ap.parse_args()
    jobs = list(range(1, args.jobs + 1))

    ref_wd = _prepare_ref_workdir(
        args.example_dir, os.path.join(args.workdir, "ref"), jobs)
    print("running the REFERENCE report stage (torch CPU) ...", flush=True)
    ref_results = _run_reference_report(ref_wd)

    if args.skip_ours:
        with open(os.path.join(args.example_dir, "report.json")) as f:
            our_results = json.load(f)
    else:
        ours_wd = _prepare_ours_workdir(
            args.example_dir, os.path.join(args.workdir, "ours"), jobs)
        print("running OUR report stage ...", flush=True)
        our_results = _run_our_report(ours_wd)

    ref_flat = {j: _flat_metrics(ref_results[j]) for j in ref_results}
    our_flat = {j: _flat_metrics(our_results[j]) for j in our_results}
    assert set(ref_flat) == set(our_flat), (ref_flat.keys(), our_flat.keys())

    ref_rank = sorted(ref_flat, key=lambda j: ref_flat[j]["rank"])
    our_rank = sorted(our_flat, key=lambda j: our_flat[j]["rank"])

    metric_names = sorted(next(iter(ref_flat.values())))
    lines = [
        "# Report-stage parity: reference `sc_generate_report` vs "
        "`rankaae_tpu.cli.generate_report`",
        "",
        f"Same {len(jobs)} trained models (the committed real-chip run in "
        "`example/training/`, exported to genuine reference `final.pt` "
        "checkpoints via `utils/torch_export`), same synthetic CSV and val "
        "split.  The reference stack ran unmodified from /root/reference "
        "(torch CPU; plotly stubbed with the public Plotly3 hex values).  "
        "Cites: reference `report/generate_report.py:218-293`, "
        "`report/analysis.py:394-450`.",
        "",
        "## Selection ranking",
        "",
        f"- reference order (best first): `{ref_rank}`",
        f"- ours:                         `{our_rank}`",
        f"- identical: **{ref_rank == our_rank}**",
        "",
        "## Per-metric agreement (max |delta| across jobs)",
        "",
        "| metric | reference (median) | ours (median) | max \\|delta\\| |",
        "|---|---|---|---|",
    ]
    worst = {}
    for m in metric_names:
        rv = np.array([ref_flat[j][m] for j in sorted(ref_flat)])
        ov = np.array([our_flat[j][m] for j in sorted(our_flat)])
        d = float(np.abs(rv - ov).max())
        worst[m] = d
        lines.append(f"| {m} | {np.median(rv):.4f} | {np.median(ov):.4f} "
                     f"| {d:.4f} |")

    lines += [
        "",
        "## Per-job scores",
        "",
        "| job | ref score | our score | ref rank | our rank |",
        "|---|---|---|---|---|",
    ]
    for j in sorted(ref_flat):
        lines.append(
            f"| {j} | {ref_flat[j]['score']:.4f} | {our_flat[j]['score']:.4f} "
            f"| {int(ref_flat[j]['rank'])} | {int(our_flat[j]['rank'])} |")

    out = os.path.join(REPO, args.out)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}; ranking identical: {ref_rank == our_rank}; "
          f"worst metric delta: {max(worst.values()):.4f} "
          f"({max(worst, key=worst.get)})")


if __name__ == "__main__":
    main()
