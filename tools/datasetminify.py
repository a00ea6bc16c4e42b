#!/usr/bin/env python
"""Mini-dataset maker.

Parity target: datasetminify.py (reference repo root, :5-78) — produce
`*_mini` splits by image count, by category, or by explicit image ids.
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def minify_dataset(src_json: str, out_json: str, count: int = 10, category: str = "", image_ids=None):
    with open(src_json) as f:
        data = json.load(f)

    if image_ids:
        keep_ids = set(image_ids)
    elif category:
        keep_ids = {
            a["image_id"] for a in data["annotations"] if a.get("category_name") == category
        }
        keep_ids = set(sorted(keep_ids)[:count])
    else:
        keep_ids = {im["id"] for im in data["images"][:count]}

    data["images"] = [im for im in data["images"] if im["id"] in keep_ids]
    data["annotations"] = [a for a in data["annotations"] if a["image_id"] in keep_ids]
    with open(out_json, "w") as f:
        json.dump(data, f)
    return out_json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", default="")
    ap.add_argument("--count", type=int, default=10)
    ap.add_argument("--category", default="")
    ap.add_argument("--image-ids", type=int, nargs="*", default=None)
    args = ap.parse_args()
    out = args.out or args.src.replace(".json", "_mini.json")
    minify_dataset(args.src, out, args.count, args.category, args.image_ids)
    print(out)


if __name__ == "__main__":
    main()
