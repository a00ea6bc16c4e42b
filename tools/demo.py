#!/usr/bin/env python
"""Single-folder 3D-detection demo.

Parity target: demo/demo.py — run a trained model over a folder of images
with a default intrinsic guess (f = 2h, principal point at the center,
demo.py:67-80), draw scene views, write jpgs. Weak models additionally load
precomputed depth/ground maps when present (demo.py:81-106).

Usage:
  python tools/demo.py --config-file configs/Base_Synth.yaml \
      --input-folder datasets/synth/images --output-dir output/demo \
      [--checkpoint output/synth_rcnn3d/model_final]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from threedod.config import load_config
from threedod.data.batch import Batch
from threedod.data.mapper import DatasetMapper3D
from threedod.models import build_model
from threedod.train.checkpoint import CheckpointManager
from threedod.vis import draw_bev, get_color, render_scene_views


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--input-folder", required=True)
    ap.add_argument("--output-dir", default="output/demo")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--focal-scale", type=float, default=2.0, help="f = scale * image_height")
    ap.add_argument("--score-thresh", type=float, default=0.3)
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    cfg = load_config(args.config_file, args.opts)
    os.makedirs(args.output_dir, exist_ok=True)

    model = build_model(cfg)
    mapper = DatasetMapper3D(cfg, is_train=False)

    paths = sorted(
        p for p in glob.glob(os.path.join(args.input_folder, "*"))
        if p.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    assert paths, f"no images in {args.input_folder}"

    # build one sample to init
    def make_batch(path):
        img = Image.open(path)
        w0, h0 = img.size
        # default K: f = focal_scale * h, principal point at center (demo.py:67-80)
        f = args.focal_scale * h0
        K = np.array([[f, 0, w0 / 2], [0, f, h0 / 2], [0, 0, 1]], np.float32)
        record = {"file_name": path, "K": K, "image_id": 0, "height": h0, "width": w0}
        s = mapper(record)
        from threedod.data.batch import collate

        return collate([s], cfg.shapes.max_gt)

    batch0 = make_batch(paths[0])
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, b, train=False
    ))(batch0)
    if args.checkpoint:
        if args.checkpoint.startswith("cubercnn://") or args.checkpoint.endswith(
            (".pth", ".pt", ".pkl")
        ):
            # torch zoo checkpoint: convert on the fly
            from threedod.utils.model_zoo import load_model_weights

            variables = load_model_weights(args.checkpoint, variables)
            print(f"converted + loaded torch checkpoint {args.checkpoint}")
        else:
            ckpt = CheckpointManager(os.path.dirname(args.checkpoint) or ".", 1, 1)
            restored = ckpt.restore(os.path.basename(args.checkpoint), None)
            if restored is not None:
                st = restored["state"]
                # orbax without an abstract tree restores plain dicts
                if isinstance(st, dict):
                    variables = {"params": st["params"],
                                 "batch_stats": st.get("batch_stats", {})}
                else:
                    variables = {"params": st.params, "batch_stats": st.batch_stats}
                print(f"loaded checkpoint {args.checkpoint}")

    infer = jax.jit(lambda b: model.apply(variables, b, train=False))

    for path in paths:
        batch = make_batch(path)
        det = infer(batch)
        det = {k: np.asarray(v)[0] for k, v in det._asdict().items()}
        keep = det["valid"] & (det["scores"] > args.score_thresh)
        img = np.asarray(Image.open(path).convert("RGB"))
        corners = det["corners3d"][keep]
        labels = det["classes"][keep]
        scores = det["scores"][keep]
        text = [f"{int(c)} {s:.2f}" for c, s in zip(labels, scores)]
        colors = [get_color(int(c)) for c in labels]
        # reference demo contract (demo/demo.py:135-142): rendered front +
        # novel panels written separately, blend 0.5 / overlay 0.85
        front, novel = render_scene_views(
            img, np.asarray(batch.K)[0], corners, text=text, colors=colors,
            mode="front_and_novel", blend_weight=0.5, blend_weight_overlay=0.85,
        )
        stem = os.path.splitext(os.path.basename(path))[0]
        Image.fromarray(front).save(os.path.join(args.output_dir, stem + "_boxes.jpg"))
        Image.fromarray(novel).save(os.path.join(args.output_dir, stem + "_novel.jpg"))
        # three-panel composite: front | novel | BEV
        bev = draw_bev([np.asarray(c) for c in corners], colors=colors, size=front.shape[0])
        fimg, nimg = Image.fromarray(front), Image.fromarray(novel)
        if nimg.height != fimg.height:
            nimg = nimg.resize((int(nimg.width * fimg.height / nimg.height), fimg.height))
        panel = Image.new("RGB", (fimg.width + nimg.width + bev.width, fimg.height))
        panel.paste(fimg, (0, 0))
        panel.paste(nimg, (fimg.width, 0))
        panel.paste(bev, (fimg.width + nimg.width, 0))
        out_path = os.path.join(args.output_dir, os.path.basename(path))
        panel.save(out_path)
        print(f"{os.path.basename(path)}: {int(keep.sum())} detections -> {out_path}")


if __name__ == "__main__":
    main()
