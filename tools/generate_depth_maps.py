#!/usr/bin/env python
"""Offline asset generator: per-image metric depth maps.

Parity target: cubercnn/data/generate_depth_maps.py:66-86 — runs
Depth-Anything-V2 (metric) per dataset image and writes
`datasets/depth_maps/{image_id}.npz` with key 'depth'.

Weights: pass a converted DA-V2 checkpoint (--checkpoint, torch .pth;
converted on the fly) or run with random weights for pipeline smoke tests
(--random-weights).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from threedod.models.depth import DepthAnythingV2, preprocess_image
from threedod.models.depth.dpt import resize_align_corners


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-json", required=True, help="Omni3D json")
    ap.add_argument("--image-root", default="datasets")
    ap.add_argument("--out-dir", default="datasets/depth_maps")
    ap.add_argument("--encoder", default="vitl", choices=["vits", "vitb", "vitl"])
    ap.add_argument("--checkpoint", default="", help="DA-V2 torch .pth to convert")
    ap.add_argument("--max-depth", type=float, default=20.0)
    ap.add_argument("--input-size", type=int, default=518)
    ap.add_argument("--random-weights", action="store_true")
    args = ap.parse_args()

    import json

    with open(args.dataset_json) as f:
        data = json.load(f)

    model = DepthAnythingV2(encoder=args.encoder, max_depth=args.max_depth, dtype=jnp.bfloat16)
    if args.checkpoint:
        from threedod.utils.convert_weights import (
            convert_depth_anything_v2,
            load_torch_checkpoint,
        )

        params = convert_depth_anything_v2(load_torch_checkpoint(args.checkpoint), args.encoder)
    elif args.random_weights:
        dummy = jnp.zeros((1, args.input_size, args.input_size, 3))
        params = model.init(jax.random.PRNGKey(0), dummy)["params"]
    else:
        raise SystemExit("provide --checkpoint or --random-weights")

    # params as an argument, not a closure capture (relay 413 limit)
    _infer = jax.jit(lambda p, x: model.apply({"params": p}, x))
    infer = lambda x: _infer(params, x)

    os.makedirs(args.out_dir, exist_ok=True)
    for im in data["images"]:
        img = Image.open(os.path.join(args.image_root, im["file_path"])).convert("RGB")
        arr = jnp.asarray(np.asarray(img, np.float32) / 255.0)
        x = preprocess_image(arr, args.input_size)
        depth = infer(x)
        depth = resize_align_corners(
            depth[..., None], im["height"], im["width"]
        )[0, ..., 0]
        np.savez_compressed(
            os.path.join(args.out_dir, f"{im['id']}.npz"),
            depth=np.asarray(depth, np.float32),
        )
        print(f"wrote depth for image {im['id']}")


if __name__ == "__main__":
    main()
