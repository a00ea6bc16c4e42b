"""BoxNet propose-and-score pipeline tests (GT-box mode, synthetic scene)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threedod.config import Config
from threedod.data.batch import Batch, GroundTruth
from threedod.models.boxer import (
    accumulate_scores,
    box_fill_masks,
    disambiguate_ground_normal,
    ground_plane_from_depth,
    mabo_statistics,
    propose_and_score,
)
from threedod.models.boxnet import BoxNet
from threedod.structures import Cubes

H, W = 96, 128
K = jnp.asarray([[110.0, 0, 64], [0, 110, 48], [0, 0, 1]])


def synth_scene():
    """Floor at y=1.2 (cam 1.2m up) + one unit cube at (0, 0.7, 3)."""
    fy, cy = 110.0, 48.0
    vv = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5
    floor_z = jnp.where(vv > cy, fy * 1.2 / jnp.maximum(vv - cy, 1e-6), 30.0)
    depth = jnp.broadcast_to(floor_z, (H, W))
    # object at z=3: project box [x±0.5, y in 0.2..1.2] -> overwrite depth
    x1 = int(64 + 110 * (-0.5) / 3)
    x2 = int(64 + 110 * (0.5) / 3)
    y1 = int(48 + 110 * (0.2) / 3)
    y2 = int(48 + 110 * (1.2) / 3)
    depth = depth.at[y1:y2, x1:x2].set(3.0)
    ground = (jnp.broadcast_to(vv > cy, (H, W))).astype(jnp.float32)
    ground = ground.at[y1:y2, x1:x2].set(0.0)
    box2d = jnp.asarray([[x1, y1, x2, y2]], jnp.float32)
    gt_cube = Cubes(
        jnp.concatenate(
            [jnp.asarray([0.0, 0.7, 3.0, 1.0, 1.0, 1.0]), jnp.eye(3).ravel()]
        )[None, None, :]
    )
    return depth, ground, box2d, gt_cube


class TestGroundPlane:
    def test_normal_disambiguation(self):
        # back wall normal (z-dominant) -> rotated to y-up-ish
        n = np.asarray(disambiguate_ground_normal(jnp.asarray([0.1, 0.05, 0.99])))
        assert abs(n[1]) > abs(n[2]) and n[1] > 0
        n = np.asarray(disambiguate_ground_normal(jnp.asarray([0.99, 0.05, 0.1])))
        assert abs(n[1]) > abs(n[0]) and n[1] > 0
        n = np.asarray(disambiguate_ground_normal(jnp.asarray([0.0, -1.0, 0.0])))
        assert n[1] > 0

    def test_ground_plane_recovery(self):
        depth, ground, _, _ = synth_scene()
        normal, pts, pc_valid = ground_plane_from_depth(
            jax.random.PRNGKey(0), depth, K, ground
        )
        n = np.asarray(normal)
        # floor y=1.2 plane normal is ±y; disambiguated to +y
        assert abs(n[1]) > 0.95, n
        # object points excluded from the no-ground mask? some points valid
        assert bool(pc_valid.any())


class TestProposeAndScore:
    def test_pipeline_finds_cube(self):
        depth, ground, box2d, gt = synth_scene()
        masks = box_fill_masks(box2d, H, W)
        pm = jnp.asarray([[1.0, 1.0, 1.0]])
        ps = jnp.asarray([[0.25, 0.25, 0.25]])
        out = propose_and_score(
            jax.random.PRNGKey(0), "propose", box2d, masks, pm, ps, depth, K,
            (W, H), 512, ground_map=ground, gt_cubes=gt,
        )
        iou3d = np.asarray(out.iou3d)
        assert iou3d.shape == (1, 512)
        best_possible = iou3d.max()
        # with depth + priors centered at gt, the sampler should land a
        # proposal with decent 3D IoU
        assert best_possible > 0.25, best_possible
        # combined-score best pick should be positively correlated
        best_idx = int(np.asarray(out.scores["combined"])[0].argmax())
        assert iou3d[0, best_idx] > 0.05
        # scores shapes
        for name, s in out.scores.items():
            assert s.shape == (1, 512), name

    def test_accumulate_scores(self):
        scores = np.asarray([0.1, 0.9, 0.5])
        iou = np.asarray([0.8, 0.2, 0.5])
        acc = accumulate_scores(scores, iou)
        # order by score desc: [0.2 (s=.9), 0.5 (s=.5), 0.8 (s=.1)] -> cummax
        np.testing.assert_allclose(acc, [0.2, 0.5, 0.8])

    def test_mabo_statistics(self):
        scores = {n: np.random.RandomState(0).rand(2, 16) for n in
                  ("IoU2D", "seg", "dim", "combined", "random", "point_cloud", "seg_mod", "corner")}
        iou3d = np.random.RandomState(1).rand(2, 16)
        valid = np.asarray([True, False])
        curves, combos = mabo_statistics(scores, iou3d, valid)
        assert curves["combined"].shape == (1, 16)
        assert combos.shape == (1, 26)
        # curves are monotone non-decreasing
        assert (np.diff(curves["combined"], axis=1) >= -1e-9).all()


class TestBoxNetArch:
    def test_gt_mode_end_to_end(self):
        cfg = Config()
        cfg.shapes.canvas_height = H
        cfg.shapes.canvas_width = W
        cfg.shapes.max_gt = 4
        cfg.model.roi_heads.num_classes = 5
        cfg.model.roi_cube_head.number_of_proposals = 128
        cfg.model.dtype = "float32"
        cfg.model.meta_architecture = "BoxNet"

        depth, ground, box2d, gt = synth_scene()
        gtd = GroundTruth(
            boxes2d=jnp.zeros((1, 4, 4)).at[0, 0].set(box2d[0]),
            classes=jnp.asarray([[1, -1, -1, -1]], jnp.int32),
            boxes3d=jnp.zeros((1, 4, 9)).at[0, 0].set(
                jnp.asarray([64.0, 48.0, 3.0, 1, 1, 1, 0.0, 0.7, 3.0])
            ),
            poses=jnp.broadcast_to(jnp.eye(3), (1, 4, 3, 3)),
            valid=jnp.asarray([[True, False, False, False]]),
        )
        batch = Batch(
            image=jnp.zeros((1, H, W, 3)),
            image_hw=jnp.asarray([[H, W]], jnp.int32),
            K=K[None],
            im_scale_ratio=jnp.ones((1,)),
            image_id=jnp.zeros((1,), jnp.int32),
            gt=gtd,
            depth_map=depth[None],
            ground_map=ground[None],
        )
        from threedod.models import build_model

        model = build_model(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            batch, proposal_function="propose",
        )
        out, boxes, classes, valid = model.apply(
            variables, batch, proposal_function="propose", key=jax.random.PRNGKey(2)
        )
        assert out.best_cubes.shape == (1, 4, 15)
        assert np.asarray(valid).sum() == 1
        det = model.apply(
            variables, out, boxes, classes, valid, batch.im_scale_ratio,
            method=lambda m, *a: m.to_detections(*a),
        )
        assert det.corners3d.shape == (1, 4, 8, 3)
        assert float(det.scores[0, 0]) > 0
