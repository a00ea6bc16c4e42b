#!/usr/bin/env python
"""Offline asset generator: per-image ground masks.

Parity target: cubercnn/data/generate_ground_segmentations.py:129-206 —
text-prompted "ground" box -> SAM mask -> datasets/ground_maps/{id}.npz
(key 'mask'); failures recorded in datasets/no_ground_idx.csv.

The text-prompted ground box comes from one of:
  --gdino-checkpoint <pth>  run the on-device flax GroundingDINO
                            (threedod.models.gdino) with --prompt-token-ids
                            (bert-base-uncased ids for "ground.", default
                            [101, 2598, 1012, 102])
  --ground-boxes <json>     precomputed {image_id: [x1,y1,x2,y2]} boxes
  --heuristic               bottom-third image box (documented fallback)
SAM then segments the box on-device.
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from threedod.models.sam import Sam, preprocess_sam_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-json", required=True)
    ap.add_argument("--image-root", default="datasets")
    ap.add_argument("--out-dir", default="datasets/ground_maps")
    ap.add_argument("--no-ground-csv", default="datasets/no_ground_idx.csv")
    ap.add_argument("--checkpoint", default="", help="SAM torch .pth to convert")
    ap.add_argument("--ground-boxes", default="", help="precomputed ground boxes json")
    ap.add_argument("--gdino-checkpoint", default="",
                    help="GroundingDINO swinT_OGC .pth; runs the on-device detector")
    ap.add_argument("--gdino-image-size", type=int, default=800)
    ap.add_argument("--prompt-token-ids", default="101,2598,1012,102",
                    help="comma-separated bert-base-uncased token ids for the prompt")
    ap.add_argument("--box-threshold", type=float, default=0.35)
    ap.add_argument("--heuristic", action="store_true")
    ap.add_argument("--img-size", type=int, default=1024)
    args = ap.parse_args()

    with open(args.dataset_json) as f:
        data = json.load(f)

    ground_boxes = {}
    if args.ground_boxes:
        with open(args.ground_boxes) as f:
            ground_boxes = {int(k): v for k, v in json.load(f).items()}

    gdino_infer = None
    if args.gdino_checkpoint:
        from threedod.models.gdino import GroundingDINO, best_box_for_prompt
        from threedod.utils.convert_weights import (
            convert_groundingdino,
            load_torch_checkpoint,
        )

        gmodel = GroundingDINO(dtype=jnp.bfloat16)
        gparams = jax.tree.map(
            jnp.asarray, convert_groundingdino(load_torch_checkpoint(args.gdino_checkpoint))
        )
        ids = np.asarray([[int(t) for t in args.prompt_token_ids.split(",")]], np.int32)
        tok_mask = np.ones_like(ids, bool)

        def _gdino(p, img_f32, hw):
            s = args.gdino_image_size
            mean = jnp.asarray([123.675, 116.28, 103.53])
            std = jnp.asarray([58.395, 57.12, 57.375])
            x = jax.image.resize(img_f32, (s, s, 3), method="linear")
            x = ((x - mean) / std)[None]
            logits, boxes = gmodel.apply(
                p, x, jnp.asarray(ids), jnp.asarray(tok_mask)
            )
            return best_box_for_prompt(logits, boxes, jnp.asarray([hw]))

        # params as an argument, not a closure capture (relay 413 limit)
        _gdino_jit = jax.jit(_gdino)
        gdino_infer = lambda img_f32, hw: _gdino_jit(gparams, img_f32, hw)

    if args.checkpoint:
        from threedod.utils.convert_weights import convert_sam, load_torch_checkpoint

        # prefer SAM-HQ like the reference (sam_hq_vit_b.pth,
        # generate_ground_segmentations.py:11-18): auto-detected from the
        # checkpoint's hf_token key
        sd = load_torch_checkpoint(args.checkpoint)
        model = Sam(
            img_size=args.img_size, dtype=jnp.bfloat16,
            hq="mask_decoder.hf_token.weight" in sd,
        )
        params = jax.tree.map(jnp.asarray, convert_sam(sd))
    else:
        model = Sam(img_size=args.img_size, dtype=jnp.bfloat16)
        dummy = jnp.zeros((1, args.img_size, args.img_size, 3))
        params = model.init(jax.random.PRNGKey(0), dummy, jnp.zeros((1, 4)))["params"]

    # params as an argument, not a closure capture: captured arrays embed
    # as program constants and the weight-sized compile payload trips the
    # relay's HTTP 413 body limit (CLAUDE.md relay gotchas)
    _infer = jax.jit(lambda p, x, b: model.apply({"params": p}, x, b))
    infer = lambda x, b: _infer(params, x, b)

    os.makedirs(args.out_dir, exist_ok=True)
    os.makedirs(os.path.dirname(args.no_ground_csv) or ".", exist_ok=True)
    failures = []
    for im in data["images"]:
        h, w = im["height"], im["width"]
        img = None
        if im["id"] in ground_boxes:
            box = ground_boxes[im["id"]]
        elif gdino_infer is not None:
            img = Image.open(os.path.join(args.image_root, im["file_path"])).convert("RGB")
            arr = jnp.asarray(np.asarray(img, np.float32))
            xyxy, score = gdino_infer(arr, [h, w])
            if float(score[0]) < args.box_threshold:
                failures.append(im["id"])
                continue
            box = [float(c) for c in np.asarray(xyxy[0])]
        elif args.heuristic:
            box = [0.0, h * 2 / 3, w - 1.0, h - 1.0]
        else:
            failures.append(im["id"])
            continue

        if img is None:
            img = Image.open(os.path.join(args.image_root, im["file_path"])).convert("RGB")
        arr = jnp.asarray(np.asarray(img, np.float32))
        x, scale = preprocess_sam_image(arr, args.img_size)
        box_in = jnp.asarray([[c * scale for c in box]], jnp.float32)
        logits = infer(x, box_in)  # (1, S/4, S/4)
        # upscale to model input, crop to valid, resize to original
        up = jax.image.resize(logits[0], (args.img_size, args.img_size), method="linear")
        nh, nw = int(round(h * scale)), int(round(w * scale))
        mask = jax.image.resize(up[:nh, :nw], (h, w), method="linear") > 0
        mask = np.asarray(mask, np.uint8)
        if mask.sum() < 0.01 * h * w:  # near-empty (filter_ground.py parity)
            failures.append(im["id"])
            continue
        np.savez_compressed(os.path.join(args.out_dir, f"{im['id']}.npz"), mask=mask)
        print(f"wrote ground mask for image {im['id']}")

    with open(args.no_ground_csv, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["img_id"])
        for i in failures:
            writer.writerow([i])
    print(f"{len(failures)} images without ground masks -> {args.no_ground_csv}")


if __name__ == "__main__":
    main()
