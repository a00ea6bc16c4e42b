#!/usr/bin/env python
"""Remove near-empty ground masks and rebuild no_ground_idx.csv.

Parity target: cubercnn/data/filter_ground.py — masks covering less than a
minimum fraction of the image are deleted and their image ids recorded so
the weak losses fall back to low-confidence handling.
"""
from __future__ import annotations

import argparse
import csv
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ground-dir", default="datasets/ground_maps")
    ap.add_argument("--no-ground-csv", default="datasets/no_ground_idx.csv")
    ap.add_argument("--min-fraction", type=float, default=0.01)
    args = ap.parse_args()

    removed = []
    for fname in sorted(os.listdir(args.ground_dir)):
        if not fname.endswith(".npz"):
            continue
        path = os.path.join(args.ground_dir, fname)
        mask = np.load(path)["mask"]
        frac = float(mask.astype(bool).mean())
        if frac < args.min_fraction:
            os.remove(path)
            try:
                removed.append(int(fname.split(".")[0]))
            except ValueError:
                pass
            print(f"removed {fname} (fraction {frac:.4f})")

    existing = []
    if os.path.exists(args.no_ground_csv):
        with open(args.no_ground_csv) as f:
            existing = [int(r["img_id"]) for r in csv.DictReader(f)]
    all_ids = sorted(set(existing) | set(removed))
    os.makedirs(os.path.dirname(args.no_ground_csv) or ".", exist_ok=True)
    with open(args.no_ground_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["img_id"])
        for i in all_ids:
            w.writerow([i])
    print(f"{len(removed)} masks removed; {len(all_ids)} ids in {args.no_ground_csv}")


if __name__ == "__main__":
    main()
