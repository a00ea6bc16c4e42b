#!/usr/bin/env python
"""GT visualisation + dataset statistics.

Parity target: VisualiseGT.py (reference repo root) — draw ground-truth 3D
boxes over dataset images and print dataset statistics (category counts,
depth/dims distributions).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from threedod.vis import draw_scene_view, get_color


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-json", required=True)
    ap.add_argument("--image-root", default="datasets")
    ap.add_argument("--out-dir", default="output/gt_vis")
    ap.add_argument("--max-images", type=int, default=8)
    ap.add_argument("--stats-only", action="store_true")
    args = ap.parse_args()

    with open(args.dataset_json) as f:
        data = json.load(f)

    cats = {c["id"]: c["name"] for c in data["categories"]}
    counts = Counter(a["category_name"] for a in data["annotations"])
    depths = np.asarray([a["center_cam"][2] for a in data["annotations"]])
    dims = np.asarray([a["dimensions"] for a in data["annotations"]])
    print(f"images: {len(data['images'])}  annotations: {len(data['annotations'])}")
    print("category counts:", dict(counts.most_common()))
    if len(depths):
        print(f"depth: mean {depths.mean():.2f} m, p10 {np.percentile(depths, 10):.2f}, p90 {np.percentile(depths, 90):.2f}")
        print(f"dims (whl) mean: {dims.mean(0).round(2).tolist()}")
    if args.stats_only:
        return

    per_image = {}
    for a in data["annotations"]:
        per_image.setdefault(a["image_id"], []).append(a)

    os.makedirs(args.out_dir, exist_ok=True)
    for im in data["images"][: args.max_images]:
        annos = per_image.get(im["id"], [])
        if not annos:
            continue
        img = np.asarray(Image.open(os.path.join(args.image_root, im["file_path"])).convert("RGB"))
        corners = np.asarray([a["bbox3D_cam"] for a in annos])
        labels = [a["category_name"] for a in annos]
        out = draw_scene_view(img, np.asarray(im["K"]), corners, labels=labels)
        path = os.path.join(args.out_dir, f"gt_{im['id']:06d}.jpg")
        out.save(path)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
