#!/usr/bin/env python
"""Depth → colored point-cloud export (.ply).

Parity target: depth/metric_depth/depth_to_pointcloud.py:34-111 in the
reference — runs DA-V2 metric depth per image, unprojects every pixel with
a pinhole (fx, fy, cx=W/2, cy=H/2) camera and writes a colored point cloud.
The reference writes via open3d; this writes the same data as a standard
binary little-endian PLY (x, y, z float32 + r, g, b uint8) with no
third-party geometry dependency.

Usage:
    python tools/depth_to_pointcloud.py --img-path imgs/ --outdir pc/ \
        --encoder vits --checkpoint da_v2_metric.pth \
        --focal-length-x 470.4 --focal-length-y 470.4
"""
from __future__ import annotations

import argparse
import glob
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image


def write_ply(path: str, points: np.ndarray, colors: np.ndarray) -> None:
    """Binary little-endian PLY: N x (x y z float32, r g b uchar)."""
    points = np.asarray(points, np.float32).reshape(-1, 3)
    colors = np.asarray(colors).reshape(-1, 3)
    if colors.dtype != np.uint8:
        colors = np.clip(colors * 255.0 + 0.5, 0, 255).astype(np.uint8)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(points)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    rec = np.zeros(
        len(points),
        dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)],
    )
    rec["xyz"] = points
    rec["rgb"] = colors
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())


def unproject(depth: np.ndarray, fx: float, fy: float) -> np.ndarray:
    """Pinhole unprojection with the image center as principal point
    (reference depth_to_pointcloud.py:100-104)."""
    h, w = depth.shape
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    x = (x - w / 2) / fx
    y = (y - h / 2) / fy
    return np.stack((x * depth, y * depth, depth), axis=-1).reshape(-1, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img-path", required=True, help="image, dir, or .txt list")
    ap.add_argument("--outdir", default="./vis_pointcloud")
    ap.add_argument("--encoder", default="vitl", choices=["vits", "vitb", "vitl"])
    ap.add_argument("--checkpoint", default="", help="DA-V2 torch .pth to convert")
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--max-depth", type=float, default=20.0)
    ap.add_argument("--input-size", type=int, default=518)
    ap.add_argument("--focal-length-x", type=float, default=470.4)
    ap.add_argument("--focal-length-y", type=float, default=470.4)
    args = ap.parse_args()

    from threedod.models.depth import DepthAnythingV2, preprocess_image
    from threedod.models.depth.dpt import resize_align_corners

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

    infer = jax.jit(lambda x: model.apply({"params": params}, x))

    if os.path.isfile(args.img_path):
        if args.img_path.endswith("txt"):
            with open(args.img_path) as f:
                filenames = [l for l in f.read().splitlines() if l]
        else:
            filenames = [args.img_path]
    else:
        filenames = sorted(
            p for p in glob.glob(os.path.join(args.img_path, "**/*"), recursive=True)
            if os.path.isfile(p)
        )

    os.makedirs(args.outdir, exist_ok=True)
    for k, filename in enumerate(filenames):
        print(f"Processing {k + 1}/{len(filenames)}: {filename}", flush=True)
        img = Image.open(filename).convert("RGB")
        w, h = img.size
        arr = jnp.asarray(np.asarray(img, np.float32) / 255.0)
        x = preprocess_image(arr, args.input_size)
        depth = resize_align_corners(infer(x)[..., None], h, w)[0, ..., 0]
        points = unproject(np.asarray(depth, np.float32), args.focal_length_x, args.focal_length_y)
        out = os.path.join(
            args.outdir, os.path.splitext(os.path.basename(filename))[0] + ".ply"
        )
        write_ply(out, points, np.asarray(img))
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
