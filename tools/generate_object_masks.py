#!/usr/bin/env python
"""Offline asset generator: per-GT-object instance masks (SAM, box-prompted).

Parity target: the reference computes object masks *inside* the training
loop by running SAM on every ground-truth 2D box each iteration
(cubercnn/modeling/roi_heads/roi_heads.py:993-1011 object_masks). GT boxes
are fixed, so on TPU the masks are precomputed once here and streamed with
the batch (data/mapper.py loads them; batch.gt.masks feeds the weak
segmentation/depth losses) — identical signal, none of the per-step ViT
cost.

Writes datasets/object_masks/{image_id}.npz with keys
  masks   (N, H, W) uint8 — one mask per annotation, original image res
  ann_ids (N,) int64      — matching annotation ids

Without --checkpoint the SAM runs with random weights (pipeline smoke
only); --box-fill skips SAM entirely and rasterises the 2D boxes (the
degenerate-but-valid fallback the mapper also applies for missing masks).
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
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-json", required=True, help="Omni3D json")
    ap.add_argument("--image-root", default="datasets")
    ap.add_argument("--out-dir", default="datasets/object_masks")
    ap.add_argument("--checkpoint", default="", help="SAM torch .pth to convert")
    ap.add_argument("--img-size", type=int, default=1024)
    ap.add_argument("--box-fill", action="store_true",
                    help="rasterise GT boxes instead of running SAM")
    args = ap.parse_args()

    with open(args.dataset_json) as f:
        data = json.load(f)
    anns_by_img = {}
    for a in data["annotations"]:
        anns_by_img.setdefault(a["image_id"], []).append(a)

    infer = None
    if not args.box_fill:
        from threedod.models.sam import Sam, preprocess_sam_image

        if args.checkpoint:
            from threedod.utils.convert_weights import convert_sam, load_torch_checkpoint

            # prefer SAM-HQ like the reference (sam_hq_vit_b.pth):
            # auto-detected from the checkpoint's hf_token key
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
        # params as an argument, not a closure capture (relay 413 limit)
        _infer = jax.jit(lambda p, x, b: model.apply({"params": p}, x, b))
        infer = lambda x, b: _infer(params, x, b)

    os.makedirs(args.out_dir, exist_ok=True)
    for im in data["images"]:
        anns = anns_by_img.get(im["id"], [])
        h, w = im["height"], im["width"]
        masks, ids = [], []
        if anns and not args.box_fill:
            from threedod.models.sam import preprocess_sam_image

            img = Image.open(os.path.join(args.image_root, im["file_path"])).convert("RGB")
            x, scale = preprocess_sam_image(jnp.asarray(np.asarray(img, np.float32)), args.img_size)
        for a in anns:
            bx, by, bw, bh = a["bbox"]
            box = [bx, by, bx + bw, by + bh]
            if args.box_fill:
                ys, xs = np.arange(h)[:, None], np.arange(w)[None, :]
                m = ((ys >= box[1]) & (ys < box[3]) & (xs >= box[0]) & (xs < box[2]))
            else:
                box_in = jnp.asarray([[c * scale for c in box]], jnp.float32)
                logits = infer(x, box_in)  # (1, S/4, S/4)
                up = jax.image.resize(
                    logits[0], (args.img_size, args.img_size), method="linear"
                )
                nh, nw = int(round(h * scale)), int(round(w * scale))
                m = np.asarray(
                    jax.image.resize(up[:nh, :nw], (h, w), method="linear") > 0
                )
            masks.append(m.astype(np.uint8))
            ids.append(a["id"])
        np.savez_compressed(
            os.path.join(args.out_dir, f"{im['id']}.npz"),
            masks=np.stack(masks) if masks else np.zeros((0, h, w), np.uint8),
            ann_ids=np.asarray(ids, np.int64),
        )
        print(f"wrote {len(masks)} object masks for image {im['id']}")


if __name__ == "__main__":
    main()
