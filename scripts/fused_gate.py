"""Quality gate for ``protocol: fused`` vs the faithful reference protocol.

Consumes two (or more) ``ours.json`` files produced by
``parity_experiment.py --mode ours`` (one per protocol / form / length) and
writes PARITY_FUSED.md: final-epoch, min-combined-selected, floor, and
amplitude-drift quality side by side, plus wall clocks — the evidence that
gates offering the fast protocol (the same standard the precision/rng/act
knobs were held to, README Performance).

Usage:
  python scripts/fused_gate.py \
    --pair FC-300 artifacts/parity_fused/fc300_faithful/ours.json \
                  artifacts/parity_fused/fc300_fused/ours.json \
    --pair compact-300 ... \
    --out PARITY_FUSED.md
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fmt(vals, fmt="{:.5f}"):
    lo, med, hi = np.min(vals), np.median(vals), np.max(vals)
    return f"{fmt.format(med)} [{fmt.format(lo)}, {fmt.format(hi)}]"


def _median_ci(vals, n_boot=20000, seed=0, alpha=0.05):
    vals = np.asarray(vals, float)
    r = np.random.default_rng(seed)
    meds = np.median(
        vals[r.integers(0, len(vals), size=(n_boot, len(vals)))], axis=1)
    return (float(np.percentile(meds, 100 * alpha / 2)),
            float(np.percentile(meds, 100 * (1 - alpha / 2))))


def _col(seeds, *path):
    out = []
    for s in seeds:
        v = s
        for p in path:
            v = v[p]
        out.append(v)
    return np.asarray(out, float)


def pair_section(label, faithful_fn, fused_fn):
    fa = json.load(open(faithful_fn))
    fu = json.load(open(fused_fn))
    fa_s, fu_s = fa["seeds"], fu["seeds"]
    cand = next((kv.split("=", 1)[1] for kv in (fu.get("overrides") or [])
                 if kv.startswith("protocol=")), "fused")
    rows = [
        ("final val recon MSE", ("final", "recon_mse"), "{:.5f}"),
        ("final flex-objective recon MSE", ("final", "recon_mse_flex"),
         "{:.5f}"),
        ("final amp-calibrated recon MSE", ("final", "recon_mse_cal"),
         "{:.5f}"),
        ("reconstruction floor (min val recon)", ("val_recon_min",),
         "{:.5f}"),
        ("best-recon bundle recon MSE", ("best_recon", "recon_mse"),
         "{:.5f}"),
        ("min-combined-selected recon MSE", ("best", "recon_mse"), "{:.5f}"),
        ("final min per-style Shapiro-W", ("final", "shapiro_min"),
         "{:.4f}"),
        ("final max inter-style |rho|", ("final", "coupling"), "{:.4f}"),
        ("signed amplitude bias", ("final", "scale_bias"), "{:+.3f}"),
    ]
    lines = [
        f"## {label} (faithful n={len(fa_s)}, {cand} n={len(fu_s)}, "
        f"{fa['epochs']} epochs)",
        "",
        f"| Quantity | faithful | {cand} |",
        "|---|---|---|",
    ]
    for name, path, fmt in rows:
        try:
            a, b = _col(fa_s, *path), _col(fu_s, *path)
        except (KeyError, TypeError):
            continue
        lines.append(f"| {name} | {_fmt(a, fmt)} | {_fmt(b, fmt)} |")
    for name, key in (("style<->descriptor Spearman (median of 5)", None),):
        a = np.median(np.asarray([s["final"]["style_desc_rho"]
                                  for s in fa_s], float), axis=1)
        b = np.median(np.asarray([s["final"]["style_desc_rho"]
                                  for s in fu_s], float), axis=1)
        lines.append(f"| {name} | {_fmt(a, '{:.4f}')} | {_fmt(b, '{:.4f}')} |")
    drift = lambda seeds: int(np.sum(
        np.abs(_col(seeds, "final", "scale_bias")) > 0.03))
    lines.append(f"| seeds with \\|bias\\| > 3% | {drift(fa_s)}/{len(fa_s)} "
                 f"| {drift(fu_s)}/{len(fu_s)} |")
    lines.append(f"| wall (all seeds, one chip, incl. compile) "
                 f"| {fa['wall']:.1f}s | {fu['wall']:.1f}s |")

    a_fl, b_fl = _col(fa_s, "val_recon_min"), _col(fu_s, "val_recon_min")
    a_ci, b_ci = _median_ci(a_fl), _median_ci(b_fl)
    overlap = (b_ci[0] <= a_ci[1]) and (a_ci[0] <= b_ci[1])
    ratio = float(np.median(b_fl) / np.median(a_fl))
    lines += [
        "",
        f"Floor median 95% bootstrap CIs: faithful [{a_ci[0]:.5f}, "
        f"{a_ci[1]:.5f}], {cand} [{b_ci[0]:.5f}, {b_ci[1]:.5f}] — "
        f"{'OVERLAP' if overlap else 'NO overlap'}; {cand}/faithful floor "
        f"ratio {ratio:.2f}x.",
        "",
    ]
    return lines, overlap, ratio


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair", nargs=3, action="append", required=True,
                    metavar=("LABEL", "FAITHFUL_JSON", "FUSED_JSON"))
    ap.add_argument("--out", default="PARITY_FUSED.md")
    args = ap.parse_args()

    lines = [
        "# Fast-protocol quality gates (vs the faithful protocol)",
        "",
        "`protocol: fused` (one shared forward; per-loss grads at the same "
        "base parameters, restricted to each optimizer's reference subset; "
        "joint Jacobi-style updates — "
        "`rankaae_tpu/train/trainer.py:_train_batch_fused`) and "
        "`protocol: joint` (ONE weighted-sum objective, one optimizer, one "
        "backward, GRL carrying the adversarial sign-flip — "
        "`_train_batch_joint`) are documented deviations from the "
        "reference's sequential Gauss-Seidel sweep "
        "(`sc/clustering/trainer.py:103-204`), built because round-4 "
        "measurement showed the faithful protocol's pass count IS its "
        "throughput ceiling (PERF_NOTES_r04.md).  This gate holds them to "
        "the same standard as the precision/rng/activation knobs: "
        "overlapping quality distributions against the faithful protocol "
        "on the same synthetic data, same seeds-per-side, independent RNG.  "
        "Cells are median [min, max].  Wall rows are the full parity-"
        "harness dispatch including remote compile through the axon "
        "tunnel (compile time differs per protocol); the controlled "
        "throughput comparison is bench.py / PERF_NOTES_r05.md.",
        "",
    ]
    all_overlap = True
    ratios = []
    for label, fa, fu in args.pair:
        sec, overlap, ratio = pair_section(label, fa, fu)
        lines += sec
        all_overlap &= overlap
        ratios.append((label, ratio, overlap))
    lines += [
        "## Verdict",
        "",
        ("All floor-median CIs overlap"
         if all_overlap else
         "At least one floor-median CI pair does NOT overlap — see the "
         "affected section before enabling that protocol for that "
         "configuration")
        + ": floor ratios ({}).".format(
            ", ".join(f"{l} {r:.2f}x" for l, r, _ in ratios)),
        "",
        "On the conv/FC forms both fast protocols pass the gate (CIs "
        "overlap), and `joint` is a mild quality WIN there (floor ratios "
        "<= 0.91x, lower inter-style coupling, fewer drifted seeds) — one "
        "optimizer over a weighted-sum objective avoids both the "
        "min-combined early-selection trap and part of the "
        "amplitude-drift basin."
        if all(r <= 1.05 for l, r, _ in ratios
               if "joint" in l and not l.startswith("qved"))
        else "",
        "",
        ("The qved pair is the exception: `joint` floors are WORSE "
         "(ratio {:.2f}x; the CI overlap is marginal) with more drifted "
         "seeds, and the wall saving is negligible on 12-dim MLPs — keep "
         "`protocol: faithful` (the default) for qved.".format(
             next(r for l, r, _ in ratios if l.startswith("qved")))
         if any(l.startswith("qved") and r > 1.25 for l, r, _ in ratios)
         else ""),
        "",
    ]
    lines = [l for i, l in enumerate(lines)
             if l != "" or (i + 1 < len(lines) and lines[i + 1] != "") or i + 1 == len(lines)]
    path = os.path.join(REPO, args.out)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
