#!/usr/bin/env python
"""Replot MABO curves from saved proposal-eval results.

Parity target: tools/MABO_plots.py — recall/IoU3D-vs-N-proposals curves per
scoring function, from the json written by tools/eval_boxes.py.
"""
from __future__ import annotations

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", required=True, help="json from eval_boxes MABO run")
    ap.add_argument("--out-dir", default="output/mabo_plots")
    args = ap.parse_args()

    with open(args.results) as f:
        res = json.load(f)
    os.makedirs(args.out_dir, exist_ok=True)

    mabo_keys = sorted(k for k in res if k.startswith("MABO_"))
    print("MABO (best-overlap at N proposals, mean over GTs):")
    for k in mabo_keys:
        print(f"  {k[5:]:<14} {res[k]:.4f}")
    if "combinations_mean" in res:
        from threedod.models.boxer import COMBINATION_DEFS

        print("26 score-combination ablations (MABO):")
        pairs = sorted(
            zip(COMBINATION_DEFS, res["combinations_mean"]), key=lambda x: -x[1]
        )
        for parts, v in pairs:
            print(f"  {'*'.join(parts):<50} {v:.4f}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if mabo_keys:
            plt.figure(figsize=(7, 5))
            names = [k[5:] for k in mabo_keys]
            vals = [res[k] for k in mabo_keys]
            plt.barh(names, vals)
            plt.xlabel("MABO")
            plt.tight_layout()
            out = os.path.join(args.out_dir, "mabo_scores.png")
            plt.savefig(out, dpi=110)
            print(f"wrote {out}")
    except ImportError:
        pass


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
