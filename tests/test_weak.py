"""Weak Cube R-CNN (RCNN3DCombined / ROIHeads3DScore) tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threedod.config import Config
from threedod.data.batch import Batch, GroundTruth
from threedod.models import build_model
from threedod.models.weak_heads import (
    normal_to_rotation,
    pose_alignment_loss,
    project_cube_boxes,
    z_search_loss,
    masked_quantile,
)
from threedod.geometry import euler_to_matrix


class TestWeakLossPrimitives:
    def test_pose_alignment_zero_for_identical(self):
        R = jnp.broadcast_to(jnp.eye(3), (1, 4, 3, 3))
        fg = jnp.ones((1, 4), bool)
        loss, has = pose_alignment_loss(R, fg)
        assert bool(has)
        assert float(loss) < 0.02  # acos extrapolation region

    def test_pose_alignment_positive_for_mixed(self):
        Rs = euler_to_matrix(jnp.asarray([[0.0, 0, 0], [0.0, 1.2, 0.0]]))
        R = Rs[None]
        loss, has = pose_alignment_loss(R, jnp.ones((1, 2), bool))
        assert float(loss) > 0.3

    def test_pose_alignment_skips_single(self):
        R = jnp.broadcast_to(jnp.eye(3), (1, 4, 3, 3))
        fg = jnp.asarray([[True, False, False, False]])
        loss, has = pose_alignment_loss(R, fg)
        assert not bool(has)

    def test_normal_to_rotation_rows(self):
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        R = np.asarray(normal_to_rotation(n))[0]
        np.testing.assert_allclose(R[2], [0, 1, 0], atol=1e-6)  # last row = normal
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)

    def test_z_search_recovers_depth(self):
        # cube at z=5 but predicted z=3: gt box = projection at z=5
        K = jnp.tile(jnp.asarray([[100.0, 0, 64], [0, 100, 48], [0, 0, 1]])[None], (1, 1, 1))
        dims = jnp.asarray([[1.0, 1.0, 1.0]])
        pose = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        gt_center = jnp.asarray([[0.0, 0.0, 5.0]])
        gt_box = project_cube_boxes(gt_center, dims, pose, K, 128, 96)
        pred_center = jnp.asarray([[0.0, 0.0, 3.0]])
        loss = z_search_loss(gt_box, pred_center, dims, pose, jnp.asarray([3.0]), K, 128, 96)
        # best z should be ~5 -> |3-5|/2 = 1.0
        np.testing.assert_allclose(float(loss[0]), 1.0, atol=0.15)

    def test_z_search_zero_when_correct(self):
        K = jnp.tile(jnp.asarray([[100.0, 0, 64], [0, 100, 48], [0, 0, 1]])[None], (1, 1, 1))
        dims = jnp.asarray([[1.0, 1.0, 1.0]])
        pose = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        center = jnp.asarray([[0.0, 0.0, 5.0]])
        gt_box = project_cube_boxes(center, dims, pose, K, 128, 96)
        loss = z_search_loss(gt_box, center, dims, pose, jnp.asarray([5.0]), K, 128, 96)
        assert float(loss[0]) < 0.06

    def test_masked_quantile(self):
        vals = jnp.arange(100.0).reshape(10, 10)
        mask = vals < 50
        assert abs(float(masked_quantile(vals, mask, 0.5)) - 24.0) <= 1.0
        assert abs(float(masked_quantile(vals, mask, 0.9)) - 44.0) <= 1.0

    def test_box_window_masks_out_of_image(self):
        # a box extending past the right/bottom edge: out-of-image samples
        # must be masked, not clipped onto the border (which would bias
        # quantiles toward the border value for truncated objects)
        from threedod.models.weak_heads import _box_window

        img = jnp.arange(64.0).reshape(8, 8)
        box = jnp.asarray([4.0, 4.0, 12.0, 12.0])  # half outside
        win, valid = _box_window(img, box, s=8)
        assert win.shape == (8, 8) and valid.shape == (8, 8)
        v = np.asarray(valid)
        # the in-image quadrant is valid, the rest is not
        assert v[:4, :4].all()
        assert not v[4:, :].any() and not v[:, 4:].any()
        # masked median over the valid region uses only in-image values
        med = float(masked_quantile(win, valid, 0.5))
        in_img = np.asarray(win)[v]
        assert in_img.min() <= med <= in_img.max()

    def test_box_window_fully_inside(self):
        from threedod.models.weak_heads import _box_window

        img = jnp.arange(64.0).reshape(8, 8)
        win, valid = _box_window(img, jnp.asarray([1.0, 1.0, 6.0, 6.0]), s=8)
        assert bool(valid.all())

    def test_box_window_batch_matches_per_roi(self):
        # the fused-gather batch path must agree exactly with the per-ROI
        # reference (_box_window) for planes, mask stacks, and quantiles
        from threedod.models.weak_heads import (
            _box_window,
            _box_window_batch,
            _box_window_batch_masks,
            masked_quantile,
            masked_quantile_batch,
        )

        rng = np.random.RandomState(0)
        b, m, h, w, nroi = 4, 4, 24, 32, 16
        imgs = jnp.asarray(rng.rand(b, h, w).astype(np.float32))
        masks = jnp.asarray((rng.rand(b, m, h, w) > 0.5).astype(np.uint8))
        xy = rng.uniform(-8, 28, (nroi, 2)).astype(np.float32)
        wh = rng.uniform(2, 30, (nroi, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        # image-major ROI order — the batch fast path's contract (see
        # _box_window_batch docstring), matching the production call sites
        img_idx = jnp.repeat(jnp.arange(b), nroi // b)
        gt_idx = jnp.asarray(rng.randint(0, m, nroi))

        wins, valids = _box_window_batch(imgs, img_idx, boxes, s=8)
        mwins, mvalids = _box_window_batch_masks(masks, img_idx, gt_idx, boxes, s=8)
        for i in range(nroi):
            ref_w, ref_v = _box_window(imgs[int(img_idx[i])], boxes[i], s=8)
            assert np.array_equal(np.asarray(wins[i]), np.asarray(ref_w))
            assert np.array_equal(np.asarray(valids[i]), np.asarray(ref_v))
            ref_mw, ref_mv = _box_window(
                masks[int(img_idx[i]), int(gt_idx[i])], boxes[i], s=8
            )
            assert np.array_equal(np.asarray(mwins[i]), np.asarray(ref_mw))
            assert np.array_equal(np.asarray(mvalids[i]), np.asarray(ref_mv))

        q5, q9 = masked_quantile_batch(
            wins.reshape(nroi, -1), valids.reshape(nroi, -1), 0.5, 0.9
        )
        for i in range(nroi):
            assert float(q5[i]) == float(masked_quantile(wins[i], valids[i], 0.5))
            assert float(q9[i]) == float(masked_quantile(wins[i], valids[i], 0.9))


def weak_cfg():
    cfg = Config()
    cfg.shapes.canvas_height = 96
    cfg.shapes.canvas_width = 128
    cfg.shapes.max_gt = 8
    cfg.shapes.roi_batch = 32
    cfg.shapes.nms_candidates = 64
    cfg.shapes.max_detections = 8
    cfg.model.meta_architecture = "RCNN3DCombined"
    cfg.model.roi_heads.num_classes = 6
    cfg.model.roi_heads.batch_size_per_image = 32
    cfg.model.rpn.batch_size_per_image = 32
    cfg.model.rpn.pre_nms_topk_train = 128
    cfg.model.rpn.pre_nms_topk_test = 128
    cfg.model.rpn.post_nms_topk_train = 64
    cfg.model.rpn.post_nms_topk_test = 64
    cfg.model.dtype = "float32"
    cfg.shapes.ransac_hypotheses = 200
    return cfg


def weak_batch(b=2):
    rng = np.random.RandomState(0)
    m = 8
    xy = rng.uniform(5, 60, (b, m, 2)).astype(np.float32)
    wh = rng.uniform(16, 40, (b, m, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    masks = np.zeros((b, m, 24, 32), np.float32)
    masks[:, :, 6:18, 8:24] = 1.0
    gt = GroundTruth(
        boxes2d=jnp.asarray(boxes),
        classes=jnp.asarray(rng.randint(0, 6, (b, m)).astype(np.int32)),
        boxes3d=jnp.asarray(
            np.concatenate(
                [xy + wh / 2, 2 + rng.rand(b, m, 1) * 3, 0.3 + rng.rand(b, m, 3), rng.randn(b, m, 3)], -1
            ).astype(np.float32)
        ),
        poses=jnp.broadcast_to(jnp.eye(3), (b, m, 3, 3)),
        valid=jnp.asarray(np.tile([True] * 3 + [False] * 5, (b, 1))),
        masks=jnp.asarray(masks),
    )
    K = jnp.tile(jnp.asarray([[[110.0, 0, 64], [0, 110, 48], [0, 0, 1]]]), (b, 1, 1))
    return Batch(
        image=jnp.asarray(rng.randn(b, 96, 128, 3).astype(np.float32)),
        image_hw=jnp.asarray(np.tile([96, 128], (b, 1)).astype(np.int32)),
        K=K,
        im_scale_ratio=jnp.full((b,), 2.0),
        image_id=jnp.zeros((b,), jnp.int32),
        gt=gt,
        depth_map=jnp.full((b, 96, 128), 3.0),
        ground_map=jnp.concatenate(
            [jnp.zeros((b, 48, 128)), jnp.ones((b, 48, 128))], axis=1
        ),
    )


EXPECTED_WEAK = {
    "BoxHead/loss_cls", "BoxHead/loss_box_reg", "rpn/cls", "rpn/loc",
    "Cube/uncert", "Cube/loss_iou", "Cube/loss_pose", "Cube/loss_normal_vec",
    "Cube/loss_z", "Cube/loss_pseudo_gt_z",
    "Cube/loss_dims_w", "Cube/loss_dims_h", "Cube/loss_dims_l",
    "Cube/loss_depth",
}


class TestWeakArch:
    @pytest.fixture(scope="class")
    def setup_model(self):
        cfg = weak_cfg()
        model = build_model(cfg)
        batch = weak_batch()
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            batch, train=True,
        )
        return cfg, model, variables, batch

    def test_weak_losses_present_and_finite(self, setup_model):
        cfg, model, variables, batch = setup_model
        (losses, metrics), _ = model.apply(
            variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        assert set(losses.keys()) == EXPECTED_WEAK, sorted(losses)
        for k, v in losses.items():
            assert np.isfinite(float(v)), k

    def test_segmentation_loss_menu(self, setup_model):
        cfg, model, variables, batch = setup_model
        cfg.loss_functions = ("iou", "segmentation", "dims")
        (losses, _), _ = model.apply(
            variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        assert "Cube/loss_seg" in losses
        assert "Cube/loss_z" not in losses
        assert np.isfinite(float(losses["Cube/loss_seg"]))
        cfg.loss_functions = (
            "dims", "pose_alignment", "pose_ground", "iou", "z", "z_pseudo_gt_patch", "depth",
        )

    def test_gradients_flow(self, setup_model):
        cfg, model, variables, batch = setup_model

        def loss_fn(params):
            (losses, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, train=True, rngs={"sampling": jax.random.PRNGKey(3)},
                mutable=["batch_stats"],
            )
            return sum(jax.tree.leaves(losses))

        grads = jax.grad(loss_fn)(variables["params"])
        assert all(bool(jnp.isfinite(g).all()) for g in jax.tree.leaves(grads))
        # the cube head must receive gradient from the weak losses
        cube_grads = grads["roi_heads"]["cube_head"]
        total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(cube_grads))
        assert total > 0

    def test_inference_matches_rcnn3d_contract(self, setup_model):
        cfg, model, variables, batch = setup_model
        det = model.apply(variables, batch, train=False)
        assert det.boxes.shape == (2, cfg.shapes.max_detections, 4)
        assert det.corners3d.shape == (2, cfg.shapes.max_detections, 8, 3)
