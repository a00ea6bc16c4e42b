#!/usr/bin/env python
"""Standalone per-category priors computation.

Parity target: priors.py (reference repo root, :1-101) — compute dims/z/y
priors from a dataset (or fall back to the `typical sizes of 3d items.csv`
table for categories without samples) and pickle them for the proposal
method (tools/priors.pkl, eval_boxes.py:720-721).
"""
from __future__ import annotations

import argparse
import csv
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from threedod.config import load_config
from threedod.data import Omni3D, compute_priors, get_filter_settings_from_cfg


def load_typical_sizes_csv(path: str):
    """38-category width/depth/height fallback table (priors.py:95)."""
    out = {}
    with open(path) as f:
        for row in csv.DictReader(f):
            name = row.get("category", row.get("name", "")).strip().lower()
            try:
                out[name] = [
                    float(row.get("width", 1.0)),
                    float(row.get("height", 1.0)),
                    float(row.get("depth", row.get("length", 1.0))),
                ]
            except (TypeError, ValueError):
                continue
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--out", default="tools/priors.pkl")
    ap.add_argument("--typical-sizes-csv", default="")
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    cfg = load_config(args.config_file, args.opts)
    fs = get_filter_settings_from_cfg(cfg)
    paths = [
        os.path.join(cfg.datasets.root, "Omni3D", f"{n}.json") for n in cfg.datasets.train
    ]
    datasets = Omni3D(paths, filter_settings=fs)
    categories = sorted(fs["category_names"]) if fs["category_names"] else sorted(
        {c["name"] for c in datasets.dataset["categories"]}
    )
    priors = compute_priors(cfg, datasets, categories)

    if args.typical_sizes_csv and os.path.exists(args.typical_sizes_csv):
        typical = load_typical_sizes_csv(args.typical_sizes_csv)
        for i, cat in enumerate(categories):
            mean = priors["priors_dims_per_cat"][i][0]
            if mean == [1.0, 1.0, 1.0] and cat in typical:
                priors["priors_dims_per_cat"][i][0] = typical[cat]
                priors["priors_dims_per_cat"][i][1] = [
                    0.3 * d for d in typical[cat]
                ]

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump({"categories": categories, **priors}, f)
    print(f"wrote priors for {len(categories)} categories -> {args.out}")


if __name__ == "__main__":
    main()
