#!/usr/bin/env python
"""A/B comparison of two `parity_experiment.py --mode ours` JSONs.

Used for the conv amplitude-drift mitigation studies
(PARITY_RESULTS_CONV.md): both runs train the SAME vmapped seeds on the
same data/config except for the overrides recorded in each JSON, so the
comparison is paired per seed.

Usage:
    python scripts/amp_ab_compare.py baseline/ours.json candidate/ours.json
"""
from __future__ import annotations

import json
import sys

import numpy as np

DRIFT_THRESHOLD = 0.03  # |median output/target gain - 1| above this = drifted


def _rows(path):
    with open(path) as f:
        d = json.load(f)
    return d


def _col(seeds, key):
    return np.array([s["final"][key] for s in seeds])


def main(a_path, b_path):
    a, b = _rows(a_path), _rows(b_path)
    na, nb = len(a["seeds"]), len(b["seeds"])
    n = min(na, nb)
    print(f"A: {a_path}  overrides={a.get('overrides')}  n={na}")
    print(f"B: {b_path}  overrides={b.get('overrides')}  n={nb}")
    print()
    hdr = (f"{'seed':>4} {'A bias':>8} {'B bias':>8} {'A final':>9} "
           f"{'B final':>9} {'A flex':>9} {'B flex':>9} {'A floor':>9} {'B floor':>9}")
    print(hdr)
    for i in range(n):
        sa, sb = a["seeds"][i], b["seeds"][i]
        fa, fb = sa["final"], sb["final"]
        print(f"{i:>4} {fa['scale_bias']:>+8.3f} {fb['scale_bias']:>+8.3f} "
              f"{fa['recon_mse']:>9.5f} {fb['recon_mse']:>9.5f} "
              f"{fa['recon_mse_flex']:>9.5f} {fb['recon_mse_flex']:>9.5f} "
              f"{sa['val_recon_min']:>9.5f} {sb['val_recon_min']:>9.5f}")
    print()
    for name, run, nn in (("A", a, na), ("B", b, nb)):
        seeds = run["seeds"]
        bias = _col(seeds, "scale_bias")
        mse = _col(seeds, "recon_mse")
        flex = _col(seeds, "recon_mse_flex")
        drifted = int(np.sum(np.abs(bias) > DRIFT_THRESHOLD))
        print(f"{name}: drifted {drifted}/{nn}  "
              f"median final {np.median(mse):.5f}  "
              f"median flex {np.median(flex):.5f}  "
              f"worst final {np.max(mse):.5f}  "
              f"median |bias| {np.median(np.abs(bias)):.3f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
