"""Analyze conv-form parity traces: lr-cut timing vs reconstruction convergence.

Consumes the per-seed JSONs written by ``scripts/parity_experiment.py``
(``--mode ours`` / ``--mode ref`` with the round-4 trace instrumentation:
``val_recon_trace`` and ``lr_recon_trace`` per seed) and prints, per seed:

* the min-combined epoch (the reference's selection gate, trainer.py:281-301),
* the reconstruction floor (min val recon) and where it occurred,
* every epoch at which the reconstruction optimizer's plateau scheduler cut
  the lr, with the val-recon value at that moment,
* the final-epoch recon and how far above the floor it sits.

The question this answers (PARITY_RESULTS_CONV.md "open investigation"):
do the poorly-reconstructing seeds have their recon lr collapsed *before*
recon converged (scheduler-cascade hypothesis), or do they simply never
reach a low floor at any lr (dynamics/precision hypothesis)?

Usage:
    python scripts/conv_trace_analysis.py DIR [DIR ...]
where each DIR holds ours.json and/or ref_seed_*.json.
"""
from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np


def _cut_epochs(lr_trace):
    """Epochs where lr dropped vs the previous epoch."""
    lr = np.asarray(lr_trace, dtype=np.float64)
    if lr.size < 2:
        return []
    drops = np.nonzero(lr[1:] < lr[:-1] * 0.999)[0] + 1
    return [int(e) for e in drops]


def _seed_report(tag, rec):
    trace = rec.get("val_recon_trace")
    if not trace:
        print(f"{tag}: (no trace recorded)")
        return None
    t = np.asarray(trace, dtype=np.float64)
    floor = float(t.min())
    floor_ep = int(t.argmin())
    final = float(t[-1])
    cuts = _cut_epochs(rec.get("lr_recon_trace", []))
    cut_desc = ", ".join(
        f"ep{e} (recon {t[e]:.5f})" for e in cuts) or "none"
    # recon when the FIRST cut landed — the scheduler-cascade hypothesis
    # predicts bad seeds have a high value here
    at_first_cut = float(t[cuts[0]]) if cuts else float("nan")
    print(f"{tag}: best_epoch {rec.get('best_epoch', '?'):>4}  "
          f"floor {floor:.5f}@ep{floor_ep}  final {final:.5f} "
          f"({final / floor:.1f}x floor)  lr cuts: {cut_desc}")
    return dict(floor=floor, floor_ep=floor_ep, final=final,
                first_cut_recon=at_first_cut, cuts=cuts)


def _descent_table(d):
    """Cross-stack recon-descent distributions at fixed epochs — separates
    'our seeds descend slower' from 'our seeds get cut earlier'."""
    ours_tr, ref_tr = [], []
    ours = os.path.join(d, "ours.json")
    if os.path.exists(ours):
        for rec in json.load(open(ours)).get("seeds", []):
            if rec.get("val_recon_trace"):
                ours_tr.append(np.asarray(rec["val_recon_trace"]))
    for f in sorted(glob.glob(os.path.join(d, "ref_seed_*.json"))):
        rec = json.load(open(f))
        if rec.get("val_recon_trace"):
            ref_tr.append(np.asarray(rec["val_recon_trace"]))
    if not ours_tr or not ref_tr:
        return
    n = min(min(len(t) for t in ours_tr), min(len(t) for t in ref_tr))
    probe = [e for e in (20, 40, 60, 100, 150, 200, 299) if e < n]
    print(f"-- recon at fixed epochs (median [min, max]):")
    for tag, trs in (("ours", ours_tr), ("ref ", ref_tr)):
        cells = []
        for e in probe:
            v = np.array([t[e] for t in trs])
            cells.append(f"ep{e} {np.median(v):.4f} [{v.min():.4f},{v.max():.4f}]")
        print(f"   {tag} (n={len(trs)}): " + "  ".join(cells))


def main(dirs):
    for d in dirs:
        print(f"=== {d} ===")
        rows = []
        ours = os.path.join(d, "ours.json")
        if os.path.exists(ours):
            data = json.load(open(ours))
            for i, rec in enumerate(data.get("seeds", [])):
                r = _seed_report(f"ours seed {i}", rec)
                if r:
                    rows.append(r)
        for f in sorted(glob.glob(os.path.join(d, "ref_seed_*.json"))):
            rec = json.load(open(f))
            _seed_report(f"ref seed {rec.get('seed')}", rec)
        _descent_table(d)
        if rows:
            floors = np.array([r["floor"] for r in rows])
            finals = np.array([r["final"] for r in rows])
            fc = np.array([r["first_cut_recon"] for r in rows])
            print(f"-- ours summary: floor median {np.median(floors):.5f} "
                  f"[{floors.min():.5f}, {floors.max():.5f}]  "
                  f"final median {np.median(finals):.5f}")
            good = finals < 1e-3
            if good.any() and (~good).any() and np.isfinite(fc).all():
                print(f"   recon at first lr cut — converged seeds: "
                      f"{np.median(fc[good]):.5f}, stuck seeds: "
                      f"{np.median(fc[~good]):.5f}")
        print()


if __name__ == "__main__":
    main(sys.argv[1:] or ["artifacts/parity_conv_compact",
                          "artifacts/parity_conv_normal"])
