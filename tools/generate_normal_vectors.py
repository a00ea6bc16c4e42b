#!/usr/bin/env python
"""Offline asset generator: precomputed per-image ground normal vectors.

Parity target: cubercnn/data/generate_normal_vectors.py:46-132 — run the
depth+ground RANSAC ground-plane fit per image and store the disambiguated
normal, so the weak trainer can skip the in-loop fit.
Writes datasets/normal_vectors.json: {image_id: [nx, ny, nz]}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from threedod.models.boxer import ground_plane_from_depth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-json", required=True)
    ap.add_argument("--depth-dir", default="datasets/depth_maps")
    ap.add_argument("--ground-dir", default="datasets/ground_maps")
    ap.add_argument("--out", default="datasets/normal_vectors.json")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    with open(args.dataset_json) as f:
        data = json.load(f)

    out = {}
    key = jax.random.PRNGKey(args.seed)
    for im in data["images"]:
        dpath = os.path.join(args.depth_dir, f"{im['id']}.npz")
        if not os.path.exists(dpath):
            continue
        depth = jnp.asarray(np.load(dpath)["depth"])
        gpath = os.path.join(args.ground_dir, f"{im['id']}.npz")
        ground = jnp.asarray(np.load(gpath)["mask"]) if os.path.exists(gpath) else None
        K = jnp.asarray(im["K"], jnp.float32)
        key, k = jax.random.split(key)
        normal, _, _ = ground_plane_from_depth(k, depth, K, ground)
        out[str(im["id"])] = np.asarray(normal, np.float64).round(6).tolist()
        print(f"image {im['id']}: normal {out[str(im['id'])]}")

    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {len(out)} normals -> {args.out}")


if __name__ == "__main__":
    main()
