#!/usr/bin/env python
"""Regenerate the compact production-length (1500-epoch) block of
PARITY_RESULTS_CONV.md.

Ours-only inputs: artifacts/parity_conv_compact_1500{,_fsw03}/ours.json.
When torch seeds land in artifacts/parity_conv_compact_1500_ref/
(ref_seed_*.json, queued as stretch jobs behind the normal queue), the
block upgrades to a two-sided head-to-head: the parity aggregator runs
over a merged temp dir and its H2 blocks are spliced in demoted to H3.
Rerun whenever a new ref_seed lands.
"""
import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TARGET = os.path.join(REPO, "PARITY_RESULTS_CONV.md")
OURS_DIR = os.path.join(REPO, "artifacts/parity_conv_compact_1500")
FSW_DIR = os.path.join(REPO, "artifacts/parity_conv_compact_1500_fsw03")
REF_DIR = os.path.join(REPO, "artifacts/parity_conv_compact_1500_ref")
START_MARK = "### Production length (1500 epochs"


def mitigation_stats(path):
    d = json.load(open(path))
    # All columns from the "final" (pre-recalibration) evaluation: the
    # drift column describes the trained model's own amplitude bias, and
    # recon_mse_cal is the one-scalar-calibrated MSE — same convention as
    # the aggregator's amp table.
    fin = [s["final"]["recon_mse"] for s in d["seeds"]]
    bias = [s["final"]["scale_bias"] for s in d["seeds"]]
    cal = [s["final"]["recon_mse_cal"] for s in d["seeds"]]
    return {
        "n": len(fin),
        "median": float(np.median(fin)),
        "worst": float(max(fin)),
        "cal": float(np.median(cal)),
        "drifted": int(sum(abs(b) > 0.03 for b in bias)),
        "worst_bias": float(max(bias, key=abs)),
    }


def main():
    faith = mitigation_stats(os.path.join(OURS_DIR, "ours.json"))
    fsw = mitigation_stats(os.path.join(FSW_DIR, "ours.json")) \
        if os.path.exists(os.path.join(FSW_DIR, "ours.json")) else None
    refs = sorted(glob.glob(os.path.join(REF_DIR, "ref_seed_*.json")))

    section = [
        f"### Production length (1500 epochs, ours n={faith['n']} each, "
        "one chip, ~950 s/run)",
        "",
        "`artifacts/parity_conv_compact_1500{,_fsw03}/` (segmented dispatch — the",
        "axon tunnel kills single blocking device calls past ~15 min, so the run",
        "goes up as 10 bit-identical 150-epoch segments; `--segment-epochs`):",
        "",
        "| Config | median final recon | worst | amp-calibrated median "
        "| drifted (\\|bias\\|>3%) | worst bias |",
        "|---|---|---|---|---|---|",
        f"| faithful | {faith['median']:.5f} | {faith['worst']:.5f} "
        f"| {faith['cal']:.5f} | {faith['drifted']}/{faith['n']} "
        f"| {faith['worst_bias']:+.3f} |",
    ]
    if fsw is not None:
        section.append(
            f"| `flex_scale_weight: 0.3` | **{fsw['median']:.5f}** "
            f"| **{fsw['worst']:.5f}** | {fsw['cal']:.5f} "
            f"| {fsw['drifted']}/{fsw['n']} (mild) | {fsw['worst_bias']:+.3f} |")
    section += [
        "",
        "Longer training deepens the faithful drift (the gain keeps walking toward",
        "the clamp) while the calibrated quality is unchanged — confirming the",
        "300-epoch decomposition at production length.  fsw=0.3 contains both the",
        "median and the worst case.",
        "",
    ]

    if refs:
        with tempfile.TemporaryDirectory() as tmp:
            for f in refs:
                shutil.copy(f, tmp)
            shutil.copy(os.path.join(OURS_DIR, "ours.json"), tmp)
            agg_tmp = os.path.join(tmp, "agg.md")
            subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts/parity_experiment.py"),
                 "--mode", "aggregate", "--ae-form", "compact",
                 "--json-dir", tmp, "--out", agg_tmp,
                 "--epochs", "1500", "--rows", "2000"],
                check=True, cwd=REPO)
            agg = open(agg_tmp).read().splitlines()
        first_h2 = next(i for i, l in enumerate(agg) if l.startswith("## "))
        body = ["###" + l[2:] if l.startswith("## ") else l
                for l in agg[first_h2:]]
        section += [
            f"### Production-length head-to-head (torch n={len(refs)}, "
            f"ours n={faith['n']}, 1500 epochs)",
            "",
            "Torch compact at 1500 epochs costs ~2-4 h/seed on this 1-core "
            "host (`artifacts/parity_conv_compact_1500_ref/`); ours is the "
            "same 16-seed vmapped run as the table above.  This is the "
            "two-sided measurement at the reference's own fixture length "
            "(`/root/reference/sc/tests/data/training/job_1/messages.txt`, "
            "1500-epoch FC runs):",
            "",
            *body,
            "",
        ]

    text = open(TARGET).read().splitlines()
    start = next(i for i, l in enumerate(text) if l.startswith(START_MARK))
    # The block ends at the next H2 header (the compact head-to-head section).
    end = next(i for i in range(start + 1, len(text))
               if text[i].startswith("## "))
    out = text[:start] + section + text[end:]
    with open(TARGET, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"regenerated compact-1500 block: torch n={len(refs)}, "
          f"ours n={faith['n']}")


if __name__ == "__main__":
    main()
