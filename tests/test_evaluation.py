"""Evaluation tests: AP logic against hand-computable cases (2D + 3D)."""
import numpy as np
import jax.numpy as jnp

from threedod.evaluation import Omni3DEval, iou_2d_xywh, iou_3d_corners
from threedod.geometry import cuboid_verts


def make_gt(img, cat, bbox, depth=5.0, corners=None, ignore=False, gid=None):
    if corners is None:
        corners = np.asarray(
            cuboid_verts(jnp.asarray([0.0, 0, depth, 1, 1, 1]))
        ).tolist()
    return {
        "id": gid,
        "image_id": img,
        "category_id": cat,
        "bbox": bbox,
        "area": bbox[2] * bbox[3],
        "depth": depth,
        "ignore": ignore,
        "ignore2D": ignore,
        "ignore3D": ignore,
        "bbox3D": corners,
    }


def make_dt(img, cat, bbox, score, depth=5.0, corners=None):
    if corners is None:
        corners = np.asarray(
            cuboid_verts(jnp.asarray([0.0, 0, depth, 1, 1, 1]))
        ).tolist()
    return {
        "image_id": img,
        "category_id": cat,
        "bbox": bbox,
        "score": score,
        "depth": depth,
        "area": bbox[2] * bbox[3],
        "bbox3D": corners,
    }


class TestIoUHelpers:
    def test_iou2d_xywh(self):
        ious = iou_2d_xywh([[0, 0, 10, 10]], [[0, 0, 10, 10], [5, 0, 10, 10]])
        np.testing.assert_allclose(ious[0], [1.0, 50 / 150], atol=1e-6)

    def test_iou3d_matrix(self):
        c1 = np.asarray(cuboid_verts(jnp.asarray([0.0, 0, 5, 1, 1, 1])))
        c2 = np.asarray(cuboid_verts(jnp.asarray([0.5, 0, 5, 1, 1, 1])))
        m = iou_3d_corners(c1[None], np.stack([c1, c2]))
        np.testing.assert_allclose(m[0], [1.0, 1 / 3], atol=1e-4)

    def test_iou3d_nan_guard(self):
        c1 = np.asarray(cuboid_verts(jnp.asarray([0.0, 0, 5, 1, 1, 1])))
        bad = np.full_like(c1, np.nan)
        m = iou_3d_corners(np.stack([c1, bad]), c1[None])
        assert m[1, 0] == 0.0 and np.isfinite(m).all()


class TestOmni3DEval2D:
    def test_perfect_detection(self):
        gts = [make_gt(1, 1, [10, 10, 50, 50], gid=1)]
        dts = [make_dt(1, 1, [10, 10, 50, 50], 0.9)]
        ev = Omni3DEval(gts, dts, mode="2D")
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        assert abs(stats[0] - 1.0) < 1e-6

    def test_missed_gt_halves_recall(self):
        gts = [make_gt(1, 1, [10, 10, 50, 50], gid=1), make_gt(1, 1, [200, 200, 50, 50], gid=2)]
        dts = [make_dt(1, 1, [10, 10, 50, 50], 0.9)]
        ev = Omni3DEval(gts, dts, mode="2D")
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        # precision 1 up to recall 0.5 -> AP ~ 0.5 (101-pt interp)
        assert 0.45 < stats[0] < 0.55

    def test_false_positive_lowers_ap(self):
        gts = [make_gt(1, 1, [10, 10, 50, 50], gid=1)]
        dts = [
            make_dt(1, 1, [300, 300, 50, 50], 0.95),  # FP ranked first
            make_dt(1, 1, [10, 10, 50, 50], 0.9),
        ]
        ev = Omni3DEval(gts, dts, mode="2D")
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        assert 0.45 < stats[0] < 0.55  # precision 0.5 at recall 1

    def test_ignored_gt_not_counted(self):
        gts = [
            make_gt(1, 1, [10, 10, 50, 50], gid=1),
            make_gt(1, 1, [200, 200, 50, 50], ignore=True, gid=2),
        ]
        dts = [make_dt(1, 1, [10, 10, 50, 50], 0.9)]
        ev = Omni3DEval(gts, dts, mode="2D")
        ev.evaluate(); ev.accumulate()
        assert abs(ev.summarize()[0] - 1.0) < 1e-6

    def test_detection_on_ignored_gt_is_neutral(self):
        gts = [
            make_gt(1, 1, [10, 10, 50, 50], gid=1),
            make_gt(1, 1, [200, 200, 50, 50], ignore=True, gid=2),
        ]
        dts = [
            make_dt(1, 1, [10, 10, 50, 50], 0.9),
            make_dt(1, 1, [200, 200, 50, 50], 0.95),  # matches the ignore
        ]
        ev = Omni3DEval(gts, dts, mode="2D")
        ev.evaluate(); ev.accumulate()
        assert abs(ev.summarize()[0] - 1.0) < 1e-6


class TestOmni3DEval3D:
    def test_exact_3d_match(self):
        gts = [make_gt(1, 1, [10, 10, 50, 50], gid=1)]
        dts = [make_dt(1, 1, [10, 10, 50, 50], 0.9)]
        ev = Omni3DEval(gts, dts, mode="3D")
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        assert abs(stats[0] - 1.0) < 1e-5
        assert abs(stats[3] - 1.0) < 1e-5  # AP3D@50

    def test_partial_overlap_threshold_sensitivity(self):
        # overlapping cubes with IoU3D = 1/3: counts for thr <= 0.3, not above
        c_gt = np.asarray(cuboid_verts(jnp.asarray([0.0, 0, 5, 1, 1, 1]))).tolist()
        c_dt = np.asarray(cuboid_verts(jnp.asarray([0.5, 0, 5, 1, 1, 1]))).tolist()
        gts = [make_gt(1, 1, [10, 10, 50, 50], corners=c_gt, gid=1)]
        dts = [make_dt(1, 1, [10, 10, 50, 50], 0.9, corners=c_dt)]
        ev = Omni3DEval(gts, dts, mode="3D")
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        # thresholds 0.05..0.5; IoU=0.333 passes 6 of 10 -> AP = 0.6
        assert abs(stats[0] - 0.6) < 1e-5
        assert abs(stats[1] - 1.0) < 1e-5  # @15
        assert abs(stats[2] - 1.0) < 1e-5  # @25
        assert abs(stats[3] - 0.0) < 1e-5  # @50

    def test_depth_ranges(self):
        near = make_gt(1, 1, [10, 10, 50, 50], depth=5.0, gid=1)
        far_corners = np.asarray(cuboid_verts(jnp.asarray([0.0, 0, 50.0, 1, 1, 1]))).tolist()
        far = make_gt(1, 1, [100, 100, 50, 50], depth=50.0, corners=far_corners, gid=2)
        dts = [make_dt(1, 1, [10, 10, 50, 50], 0.9, depth=5.0)]
        ev = Omni3DEval([near, far], dts, mode="3D")
        ev.evaluate(); ev.accumulate()
        stats = ev.summarize()
        assert abs(stats[4] - 1.0) < 1e-5  # near AP = 1 (only near gt counted)
        assert stats[6] <= 0.0  # far AP: no detection -> 0 (or -1 if empty)

    def test_proximity_eval_ignores_far_fps(self):
        gts = [make_gt(1, 1, [10, 10, 50, 50], gid=1)]
        dts = [
            make_dt(1, 1, [10, 10, 50, 50], 0.9),
            make_dt(1, 1, [400, 400, 50, 50], 0.95),  # far from any gt
        ]
        ev = Omni3DEval(gts, dts, mode="2D", eval_prox=True)
        ev.evaluate(); ev.accumulate()
        assert abs(ev.summarize()[0] - 1.0) < 1e-6
        # without prox, the FP hurts
        ev2 = Omni3DEval(gts, dts, mode="2D", eval_prox=False)
        ev2.evaluate(); ev2.accumulate()
        assert ev2.summarize()[0] < 0.99


class TestIdSpaceConsistency:
    def test_oracle_detections_through_conversion_score_full_ap(self):
        """Regression: predictions go through detections_to_coco_json with
        the contiguous->dataset id map — GTs from gts_from_records must be
        mapped with the SAME map or every match fails and AP reads 0
        (caught live on a real-TPU 2000-iter run that trained to loss 1.9
        yet evaluated at AP 0.0)."""
        from threedod.evaluation.inference import (
            Omni3DEvaluationHelper,
            detections_to_coco_json,
            gts_from_records,
        )
        from threedod.models.roi_heads3d import Detections

        id_map = {10: 0, 20: 1}  # dataset id -> contiguous
        id_map_inv = {v: k for k, v in id_map.items()}
        corners = np.zeros((1, 2, 8, 3), np.float32)
        corners[0, :, :, :] = np.array(
            [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (4, 5)], np.float32
        )
        det = Detections(
            boxes=jnp.asarray([[[10.0, 10, 50, 50], [60, 60, 90, 100]]]),
            scores=jnp.asarray([[0.9, 0.8]]),
            scores_2d=jnp.asarray([[0.9, 0.8]]),
            classes=jnp.asarray([[0, 1]]),
            valid=jnp.asarray([[True, True]]),
            center_cam=jnp.asarray([[[0.0, 0, 4.5], [0, 0, 4.5]]]),
            dimensions=jnp.ones((1, 2, 3)),
            pose=jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3)),
            center_2d=jnp.zeros((1, 2, 2)),
            corners3d=jnp.asarray(corners),
        )
        preds = detections_to_coco_json(det, [7], np.ones(1), id_map_inv)
        assert sorted(p["category_id"] for p in preds) == [10, 20]

        records = [{
            "image_id": 7,
            "annotations": [
                {"category_id": 0, "bbox": [10.0, 10, 40, 40],
                 "center_cam": [0, 0, 4.5], "bbox3D_cam": corners[0, 0].tolist()},
                {"category_id": 1, "bbox": [60.0, 60, 30, 40],
                 "center_cam": [0, 0, 4.5], "bbox3D_cam": corners[0, 1].tolist()},
            ],
        }]
        gts = gts_from_records(records, id_map_inv)
        assert sorted(g["category_id"] for g in gts) == [10, 20]

        helper = Omni3DEvaluationHelper(["ds"], ["a", "b"], id_map)
        res = helper.evaluate("ds", gts, preds)
        assert abs(res["AP2D"] - 100.0) < 1e-6, res
        # percat tables are keyed by category NAME (VisualiseGT consumes them)
        assert set(res["percat2D"]) == {"a", "b"}
