"""Cross-stack amplitude-drift onset analysis.

Consumes the per-epoch gain traces written by ``parity_experiment.py``
(torch side: ``ref_seed_*.json`` ``gain_trace``; ours: ``ours.json``
``seeds[*].gain_trace``) and answers the round-4 verdict's open mechanism
question: does the flex-target gain walk start *systematically earlier* on
the rankaae_tpu stack, or is onset an RNG lottery whose within-stack spread
swamps the between-stack difference?

For every seed with a gain trace:
* ``onset``  — first epoch where |gain-1| > threshold (default 3%) holds
  for ``sustain`` consecutive epochs (None if never);
* ``final_bias``, ``floor`` (min val recon), ``floor_epoch``;
* ``floor_pre_onset`` — whether the reconstruction floor was reached
  before the drift onset (an uncontaminated floor).

Cross-stack statistics: drift incidence (Fisher exact), onset epochs
(Mann-Whitney U), floor medians (bootstrap CI overlap).

Usage: python scripts/drift_onset.py --json-dir artifacts/parity_conv_compact_amp
       [--threshold 0.03] [--sustain 20] [--out DRIFT_ONSET.md]
"""
from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def onset_epoch(gain, threshold=0.03, sustain=20):
    """First epoch where |gain-1| > threshold for ``sustain`` consecutive
    epochs (clipped at the trace tail); None if never."""
    g = np.abs(np.asarray(gain, float) - 1.0) > threshold
    n = len(g)
    run = 0
    for e in range(n):
        run = run + 1 if g[e] else 0
        need = min(sustain, n - (e - run + 1))
        if run >= need and g[e]:
            return e - run + 1
    return None


def seed_row(gain, recon, threshold, sustain):
    onset = onset_epoch(gain, threshold, sustain)
    recon = np.asarray(recon, float)
    floor_epoch = int(np.argmin(recon))
    return {
        "onset": onset,
        "final_bias": float(gain[-1] - 1.0),
        "floor": float(recon.min()),
        "floor_epoch": floor_epoch,
        "floor_pre_onset": onset is None or floor_epoch < onset,
    }


def _median_ci(vals, n_boot=20000, seed=0, alpha=0.05):
    vals = np.asarray(vals, float)
    r = np.random.default_rng(seed)
    meds = np.median(
        vals[r.integers(0, len(vals), size=(n_boot, len(vals)))], axis=1)
    return (float(np.percentile(meds, 100 * alpha / 2)),
            float(np.percentile(meds, 100 * (1 - alpha / 2))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-dir", default="artifacts/parity_conv_compact_amp")
    ap.add_argument("--threshold", type=float, default=0.03)
    ap.add_argument("--sustain", type=int, default=20)
    ap.add_argument("--out", default=None,
                    help="markdown output (repo-root relative); default: "
                         "print to stdout")
    args = ap.parse_args()

    refs = []
    for f in sorted(glob.glob(os.path.join(args.json_dir, "ref_seed_*.json"))):
        d = json.load(open(f))
        if "gain_trace" in d and "val_recon_trace" in d:
            refs.append((d["seed"], seed_row(d["gain_trace"],
                                             d["val_recon_trace"],
                                             args.threshold, args.sustain)))
    ours = []
    ours_fn = os.path.join(args.json_dir, "ours.json")
    if os.path.exists(ours_fn):
        d = json.load(open(ours_fn))
        for i, s in enumerate(d["seeds"]):
            if "gain_trace" in s and "val_recon_trace" in s:
                ours.append((i, seed_row(s["gain_trace"],
                                         s["val_recon_trace"],
                                         args.threshold, args.sustain)))

    lines = [
        f"# Drift-onset analysis: {args.json_dir}",
        "",
        f"Onset = first epoch where |gain-1| > {args.threshold:.0%} holds "
        f"{args.sustain} consecutive epochs (gain = median val "
        "output/target amplitude ratio, recorded per epoch on both stacks).",
        "",
        "| stack | seed | onset | final bias | floor | floor epoch | "
        "floor pre-onset |",
        "|---|---|---|---|---|---|---|",
    ]
    for label, rows in (("torch", refs), ("ours", ours)):
        for sd, r in rows:
            lines.append(
                f"| {label} | {sd} | {r['onset']} | {r['final_bias']:+.3f} "
                f"| {r['floor']:.5f} | {r['floor_epoch']} "
                f"| {'yes' if r['floor_pre_onset'] else 'NO'} |")

    def stats_block(refs, ours):
        out = []
        r_on = [r["onset"] for _, r in refs if r["onset"] is not None]
        o_on = [r["onset"] for _, r in ours if r["onset"] is not None]
        out += [
            "",
            f"Drift incidence (onset fired): torch {len(r_on)}/{len(refs)}, "
            f"ours {len(o_on)}/{len(ours)}.",
        ]
        if len(refs) and len(ours):
            try:
                from scipy.stats import fisher_exact

                _, p = fisher_exact(
                    [[len(r_on), len(refs) - len(r_on)],
                     [len(o_on), len(ours) - len(o_on)]])
                out.append(f"Fisher exact p (incidence) = {p:.3f}.")
            except Exception:
                pass
        if len(r_on) >= 2 and len(o_on) >= 2:
            from scipy.stats import mannwhitneyu

            u = mannwhitneyu(r_on, o_on, alternative="two-sided")
            out += [
                f"Onset epochs: torch median {np.median(r_on):.0f} "
                f"(spread {min(r_on)}-{max(r_on)}), ours median "
                f"{np.median(o_on):.0f} (spread {min(o_on)}-{max(o_on)}); "
                f"Mann-Whitney p = {u.pvalue:.3f}.",
            ]
        r_fl = [r["floor"] for _, r in refs]
        o_fl = [r["floor"] for _, r in ours]
        if len(r_fl) >= 3 and len(o_fl) >= 3:
            r_ci, o_ci = _median_ci(r_fl), _median_ci(o_fl)
            overlap = (o_ci[0] <= r_ci[1]) and (r_ci[0] <= o_ci[1])
            out += [
                f"Floor medians: torch {np.median(r_fl):.5f} "
                f"(95% CI [{r_ci[0]:.5f}, {r_ci[1]:.5f}]), ours "
                f"{np.median(o_fl):.5f} (95% CI [{o_ci[0]:.5f}, "
                f"{o_ci[1]:.5f}]) — CIs "
                f"{'OVERLAP' if overlap else 'do NOT overlap'}.",
            ]
        return out

    lines += stats_block(refs, ours)
    text = "\n".join(lines) + "\n"
    if args.out:
        path = os.path.join(REPO, args.out)
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")
    else:
        print(text)


if __name__ == "__main__":
    main()
