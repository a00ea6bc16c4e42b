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
