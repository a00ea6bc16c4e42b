#!/usr/bin/env python
"""KITTI-style dataset inference demo: per-image K from the Omni3D JSON,
prediction-JSON serialization, optional scene-view renders.

Parity target: demo/kitti_demo.py in the reference (do_test:36-226) — walk
an Omni3D-schema dataset (KITTI_test by default), run the detector with the
dataset's own camera intrinsics, optionally draw front + novel-view scene
images, and write one predictions JSON with per-detection 3D fields.

Usage:
  python tools/kitti_demo.py --config-file configs/Base_Synth.yaml \
      --dataset synth_test [--checkpoint ...] [--display] \
      [--threshold 0.35] [--output-dir output/kitti_demo]
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # for train_net

import jax
import numpy as np

from threedod.data import CATALOG, TestLoader, get_dataset_dicts
from threedod.models import build_model

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("kitti_demo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--dataset", default="KITTI_test", help="registered Omni3D split")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--threshold", type=float, default=0.25,
                    help="score threshold for serialized detections (ref :45)")
    ap.add_argument("--display", action="store_true",
                    help="write *_boxes.jpg/*_novel.jpg scene views (ref :157-195)")
    ap.add_argument("--output-dir", default="")
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    from train_net import setup

    class _Args:
        config_file = args.config_file
        opts = args.opts

    cfg, meta, priors = setup(_Args)
    out_dir = args.output_dir or os.path.join(cfg.output_dir, "kitti_demo")
    os.makedirs(out_dir, exist_ok=True)

    model = build_model(cfg, priors=priors)

    records = get_dataset_dicts([args.dataset])
    loader = TestLoader(records, cfg, batch_size=cfg.test.batch_size)

    sample = next(iter(loader))[0]
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, b, train=False
    ))(sample)
    if args.checkpoint:
        if args.checkpoint.startswith("cubercnn://") or args.checkpoint.endswith(
            (".pth", ".pt", ".pkl")
        ):
            from threedod.utils.model_zoo import load_model_weights

            variables = load_model_weights(args.checkpoint, variables)
        else:
            from threedod.train.checkpoint import CheckpointManager

            ckpt = CheckpointManager(os.path.dirname(args.checkpoint) or ".", 1, 1)
            restored = ckpt.restore(os.path.basename(args.checkpoint), None)
            st = restored["state"]
            # orbax without an abstract tree restores plain dicts
            if isinstance(st, dict):
                variables = {"params": st["params"],
                             "batch_stats": st.get("batch_stats", {})}
            else:
                variables = {"params": st.params, "batch_stats": st.batch_stats}
        logger.info("loaded %s", args.checkpoint)

    infer = jax.jit(lambda b: model.apply(variables, b, train=False))
    cats = list(meta.thing_classes)
    by_id = {r["image_id"]: r for r in records}

    inference_json = []
    for batch, n_real in loader:
        det = jax.device_get(infer(batch))
        image_ids = np.asarray(batch.image_id)[:n_real]
        for j, img_id in enumerate(image_ids):
            rec = by_id[int(img_id)]
            K = np.asarray(rec["K"], np.float64)
            keep = det.valid[j] & (det.scores[j] >= args.threshold)
            idx = np.where(keep)[0]
            preds = []
            for i in idx:
                preds.append({
                    "category": cats[int(det.classes[j, i])],
                    "score": float(det.scores[j, i]),
                    "bbox": [float(v) for v in det.boxes[j, i]],
                    "center_cam": [float(v) for v in det.center_cam[j, i]],
                    "dimensions": [float(v) for v in det.dimensions[j, i]],
                    "pose": np.asarray(det.pose[j, i]).tolist(),
                    "center_2D": [float(v) for v in det.center_2d[j, i]],
                    "corners3D": np.asarray(det.corners3d[j, i]).tolist(),
                })
            inference_json.append({
                "image_id": int(img_id),
                "file_path": rec.get("file_name", ""),
                "K": K.tolist(),
                "width": rec.get("width"),
                "height": rec.get("height"),
                "predictions": preds,
            })

            if args.display and len(idx):
                from PIL import Image

                from threedod.vis.vis import draw_scene_view

                img = np.asarray(Image.open(rec["file_name"]).convert("RGB"))
                corners = [np.asarray(det.corners3d[j, i]) for i in idx]
                scene = draw_scene_view(
                    img, K, corners,
                    labels=[int(det.classes[j, i]) for i in idx],
                    scores=[float(det.scores[j, i]) for i in idx],
                )
                stem = os.path.splitext(os.path.basename(rec["file_name"]))[0]
                scene.save(os.path.join(out_dir, f"{stem}_boxes.jpg"))

    out_path = os.path.join(out_dir, f"{args.dataset}_predictions.json")
    with open(out_path, "w") as f:
        json.dump(inference_json, f)
    logger.info("wrote %d image predictions to %s", len(inference_json), out_path)


if __name__ == "__main__":
    main()
