#!/usr/bin/env python
"""Proposal-method driver: MABO / IoU3D curves / AP / pseudo-GT generation.

Parity target: tools/eval_boxes.py in the reference —
  mean_average_best_overlap (:211), percent_of_boxes IoU3D detection-rate
  curves (:125), AP eval via inference_on_dataset (:73), pseudo-GT Omni3D
  JSON writing (do_train :542-664), routing on PLOT.EVAL / PLOT.MODE2D /
  PLOT.PROPOSAL_FUNC / TRAIN.pseudo_gt.

Usage:
  python tools/eval_boxes.py --config-file configs/BoxNet_Synth.yaml \
      plot.eval MABO plot.proposal_func propose
  python tools/eval_boxes.py --config-file ... plot.eval AP plot.mode2d GT
  python tools/eval_boxes.py --config-file ... train.pseudo_gt pseudo
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

from threedod.config import load_config
from threedod.data import CATALOG, TestLoader, get_dataset_dicts
from threedod.evaluation import (
    Omni3DEvaluationHelper,
    detections_to_coco_json,
    gts_from_records,
)
from threedod.models import build_model
from threedod.models.boxer import SCORE_NAMES, mabo_statistics

logger = logging.getLogger("threedod.eval_boxes")


def run_proposal_eval(cfg, meta, priors, mode: str, proposal_function: str, use_pred_boxes: bool):
    model = build_model(cfg, priors=priors)
    sample_records = get_dataset_dicts(cfg.datasets.test)
    loader = TestLoader(sample_records, cfg, batch_size=1, load_maps=True)

    batch0, _ = next(iter(loader))
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        b, proposal_function=proposal_function, use_pred_boxes=use_pred_boxes,
    ))(batch0)

    @jax.jit
    def run(batch, key):
        return model.apply(
            variables, batch, proposal_function=proposal_function,
            use_pred_boxes=use_pred_boxes, key=key,
        )

    all_curves = {name: [] for name in SCORE_NAMES}
    all_combos = []
    predictions = []
    key = jax.random.PRNGKey(cfg.seed)
    for step, (batch, n_real) in enumerate(loader):
        key, k = jax.random.split(key)
        (out, boxes, classes, valid), = [run(batch, k)]
        valid_np = np.asarray(valid)[:n_real]

        if mode in ("MABO", "IoU3D"):
            for i in range(n_real):
                curves, combos = mabo_statistics(
                    {k2: v[i] for k2, v in out.scores.items()},
                    np.asarray(out.iou3d)[i], valid_np[i],
                )
                for name, c in curves.items():
                    all_curves[name].append(c)
                all_combos.append(combos)
        else:  # AP
            det = model.apply(
                variables, out, boxes, classes, valid, batch.im_scale_ratio,
                method=lambda m, *a: m.to_detections(*a),
            )
            det = type(det)(*[np.asarray(x)[:n_real] for x in det])
            id_map_inv = {v: k2 for k2, v in meta.thing_dataset_id_to_contiguous_id.items()}
            predictions.extend(
                detections_to_coco_json(det, np.asarray(batch.image_id)[:n_real], None, id_map_inv)
            )

    results = {}
    if mode == "MABO":
        # MABO = mean over categories of best-overlap (here: overall mean of
        # the cummax curve at N proposals); also report per-score curves.
        for name in SCORE_NAMES:
            if all_curves[name]:
                c = np.concatenate(all_curves[name], axis=0)
                results[f"MABO_{name}"] = float(c[:, 0].mean())
                results[f"ABO_best_possible_{name}"] = float(c[:, -1].mean())
        combos = np.concatenate(all_combos, axis=0) if all_combos else np.zeros((0, 26))
        results["combinations_mean"] = combos.mean(axis=0).tolist()
    elif mode == "IoU3D":
        c = np.concatenate(all_curves["combined"], axis=0)
        for thr in (0.25, 0.5):
            results[f"detection_rate@{thr}"] = float((c[:, -1] >= thr).mean())
    else:
        helper = Omni3DEvaluationHelper(
            list(cfg.datasets.test), meta.thing_classes, meta.thing_dataset_id_to_contiguous_id
        )
        id_map_inv = {v: k for k, v in meta.thing_dataset_id_to_contiguous_id.items()}
        for name in cfg.datasets.test:
            records = get_dataset_dicts([name])
            gts = gts_from_records(records, id_map_inv)
            results[name] = helper.evaluate(name, gts, predictions)
            if cfg.vis_period:
                # eval-sample dumps + error stats (reference eval_boxes.py:515-533)
                from threedod.evaluation.inference import group_predictions_by_image
                from threedod.vis import visualize_from_instances

                id_map = meta.thing_dataset_id_to_contiguous_id
                contig = [
                    {**p, "category_id": id_map.get(p["category_id"], p["category_id"])}
                    for p in predictions
                ]
                grouped = group_predictions_by_image(contig, records)
                log_str = visualize_from_instances(
                    grouped, records, name, cfg.input.min_size_test,
                    os.path.join(cfg.output_dir, name), list(meta.thing_classes),
                    visualize_every=cfg.vis_period,
                )
                logging.getLogger(__name__).info(log_str.rstrip())
        # structured results artifact for tools/visualise_gt.py plots
        with open(os.path.join(cfg.output_dir, "results.json"), "w") as f:
            json.dump(results, f, indent=1, default=float)
    return results


def generate_pseudo_gt(cfg, meta, priors, proposal_function: str, out_name: str):
    """Best-scoring cube per GT -> Omni3D-format pseudo-GT json.

    Parity: eval_boxes.py do_train (:542-664).
    """
    model = build_model(cfg, priors=priors)
    records = get_dataset_dicts(cfg.datasets.train)
    loader = TestLoader(records, cfg, batch_size=1, load_maps=True)
    batch0, _ = next(iter(loader))
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        b, proposal_function=proposal_function,
    ))(batch0)

    @jax.jit
    def run(batch, key):
        return model.apply(variables, batch, proposal_function=proposal_function, key=key)

    # copy images/categories from the source jsons, replace annotations
    src_json = os.path.join(cfg.datasets.root, "Omni3D", f"{cfg.datasets.train[0]}.json")
    with open(src_json) as f:
        data = json.load(f)
    id_map_inv = {v: k for k, v in meta.thing_dataset_id_to_contiguous_id.items()}

    annotations = []
    ann_id = 0
    key = jax.random.PRNGKey(cfg.seed)
    rec_iter = iter(records)
    for batch, n_real in loader:
        key, k = jax.random.split(key)
        out, boxes, classes, valid = run(batch, k)
        for i in range(n_real):
            rec = next(rec_iter)
            ratio = float(np.asarray(batch.im_scale_ratio)[i])
            v = np.asarray(valid)[i]
            cubes = np.asarray(out.best_cubes)[i]
            scores = np.asarray(out.best_scores)[i]
            bx = np.asarray(boxes)[i] * ratio
            cls = np.asarray(classes)[i]
            from threedod.geometry import cuboid_verts
            import jax.numpy as jnp

            for j in range(len(v)):
                if not v[j]:
                    continue
                ann_id += 1
                center = cubes[j, :3].tolist()
                dims = cubes[j, 3:6].tolist()
                R = cubes[j, 6:].reshape(3, 3)
                corners = np.asarray(
                    cuboid_verts(jnp.asarray(cubes[j, :6]), jnp.asarray(R))
                ).tolist()
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": rec["image_id"],
                        "dataset_id": rec.get("dataset_id", 0),
                        "category_id": id_map_inv.get(int(cls[j]), int(cls[j])),
                        "category_name": meta.thing_classes[int(cls[j])],
                        "valid3D": True,
                        "behind_camera": False,
                        "bbox2D_proj": [float(x) for x in bx[j]],
                        "bbox2D_trunc": [float(x) for x in bx[j]],
                        "bbox2D_tight": [float(x) for x in bx[j]],
                        "bbox": [float(bx[j][0]), float(bx[j][1]), float(bx[j][2] - bx[j][0]), float(bx[j][3] - bx[j][1])],
                        "center_cam": center,
                        "dimensions": dims,
                        "R_cam": R.tolist(),
                        "pose": R.tolist(),
                        "bbox3D_cam": corners,
                        "truncation": 0.0,
                        "visibility": 1.0,
                        "lidar_pts": 100,
                        "segmentation_pts": 100,
                        "depth_error": 0.0,
                        "score": float(scores[j]),
                    }
                )
    data["annotations"] = annotations
    out_path = os.path.join(cfg.datasets.root, "Omni3D", f"{out_name}.json")
    with open(out_path, "w") as f:
        json.dump(data, f)
    logger.info("wrote %d pseudo-GT annotations to %s", len(annotations), out_path)
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--pseudo-gt-out", default="pseudo_gt_train")
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    # reuse train_net's setup for registration + priors
    from train_net import setup

    class A:
        config_file = args.config_file
        opts = args.opts

    cfg, meta, priors = setup(A)

    if cfg.train.pseudo_gt == "pseudo":
        out = generate_pseudo_gt(cfg, meta, priors, cfg.plot.proposal_func, args.pseudo_gt_out)
        print(out)
        return

    mode = cfg.plot.eval or "MABO"
    use_pred = cfg.plot.mode2d == "PRED"
    results = run_proposal_eval(cfg, meta, priors, mode, cfg.plot.proposal_func, use_pred)
    print(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
