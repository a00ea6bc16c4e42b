"""RCNN3D meta-architecture: train losses, inference shapes, gradients."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threedod.config import Config
from threedod.data.batch import Batch, GroundTruth
from threedod.models import build_model


def tiny_cfg(**overrides):
    cfg = Config()
    cfg.shapes.canvas_height = 128
    cfg.shapes.canvas_width = 160
    cfg.shapes.max_gt = 8
    cfg.shapes.roi_batch = 64
    cfg.shapes.nms_candidates = 128
    cfg.shapes.max_detections = 10
    cfg.model.roi_heads.num_classes = 10
    cfg.model.roi_heads.batch_size_per_image = 64
    cfg.model.rpn.batch_size_per_image = 64
    cfg.model.rpn.pre_nms_topk_train = 200
    cfg.model.rpn.pre_nms_topk_test = 200
    cfg.model.rpn.post_nms_topk_train = 100
    cfg.model.rpn.post_nms_topk_test = 100
    cfg.model.dtype = "float32"
    for k, v in overrides.items():
        obj = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)
    return cfg


def tiny_batch(b=2, with_gt=True, seed=0):
    rng = np.random.RandomState(seed)
    gt = None
    if with_gt:
        xy = rng.uniform(5, 60, (b, 8, 2)).astype(np.float32)
        wh = rng.uniform(20, 60, (b, 8, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], -1)
        gt = GroundTruth(
            boxes2d=jnp.asarray(boxes),
            classes=jnp.asarray(rng.randint(0, 10, (b, 8)).astype(np.int32)),
            boxes3d=jnp.asarray(
                np.concatenate(
                    [xy + wh / 2, 2 + rng.rand(b, 8, 1) * 3, 0.3 + rng.rand(b, 8, 3), rng.randn(b, 8, 3)],
                    -1,
                ).astype(np.float32)
            ),
            poses=jnp.broadcast_to(jnp.eye(3), (b, 8, 3, 3)),
            valid=jnp.asarray(np.tile([True, True, True, False, False, False, False, False], (b, 1))),
        )
    K = jnp.asarray(np.tile(np.array([[[140.0, 0, 80], [0, 140, 64], [0, 0, 1]]], np.float32), (b, 1, 1)))
    return Batch(
        image=jnp.asarray(rng.randn(b, 128, 160, 3).astype(np.float32)),
        image_hw=jnp.asarray(np.tile([128, 160], (b, 1)).astype(np.int32)),
        K=K,
        im_scale_ratio=jnp.full((b,), 3.75),
        image_id=jnp.zeros((b,), jnp.int32),
        gt=gt,
    )


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_cfg()
    model = build_model(cfg)
    batch = tiny_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=True
    )
    return cfg, model, variables, batch


EXPECTED_LOSSES = {
    "BoxHead/loss_cls", "BoxHead/loss_box_reg",
    "rpn/cls", "rpn/loc",
    "Cube/loss_dims", "Cube/loss_xy", "Cube/loss_z", "Cube/loss_pose",
    "Cube/loss_joint", "Cube/uncert",
}


class TestRCNN3D:
    def test_train_losses(self, model_and_vars):
        cfg, model, variables, batch = model_and_vars
        (losses, metrics), _ = model.apply(
            variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        assert set(losses.keys()) == EXPECTED_LOSSES
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
        # CE at init should be near log(C+1)
        assert abs(float(losses["BoxHead/loss_cls"]) - np.log(11)) < 0.5
        # confidence starts near e^-5 (uncertainty bias init)
        assert float(metrics["Cube/conf"]) < 0.02

    def test_inference_shapes(self, model_and_vars):
        cfg, model, variables, batch = model_and_vars
        det = model.apply(variables, batch, train=False)
        d = cfg.shapes.max_detections
        assert det.boxes.shape == (2, d, 4)
        assert det.scores.shape == (2, d)
        assert det.corners3d.shape == (2, d, 8, 3)
        assert det.pose.shape == (2, d, 3, 3)
        # poses are rotations
        P = np.asarray(det.pose).reshape(-1, 3, 3)
        np.testing.assert_allclose(P @ P.transpose(0, 2, 1), np.tile(np.eye(3), (len(P), 1, 1)), atol=1e-3)

    def test_gradients_finite(self, model_and_vars):
        cfg, model, variables, batch = model_and_vars

        def loss_fn(params):
            (losses, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, train=True, rngs={"sampling": jax.random.PRNGKey(3)},
                mutable=["batch_stats"],
            )
            return sum(jax.tree.leaves(losses))

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree.leaves(grads)
        assert all(bool(jnp.isfinite(g).all()) for g in leaves)
        total = sum(float(jnp.sum(g * g)) for g in leaves) ** 0.5
        assert total > 0

    def test_jit_stability(self, model_and_vars):
        cfg, model, variables, batch = model_and_vars
        f = jax.jit(lambda v, b: model.apply(v, b, train=False))
        d1 = f(variables, batch)
        d2 = f(variables, batch)
        np.testing.assert_allclose(np.asarray(d1.scores), np.asarray(d2.scores), atol=1e-6)

    def test_resnet_backbone_variant(self):
        cfg = tiny_cfg(**{"model.backbone": "resnet18"})
        model = build_model(cfg)
        batch = tiny_batch()
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=True
        )
        det = model.apply(variables, batch, train=False)
        assert det.boxes.shape[1] == cfg.shapes.max_detections

    def test_cube_pool_reuse_matches_repool(self, model_and_vars, monkeypatch):
        """Train path pools once and feeds the cube branch the fg-prefix
        SLICE of the box branch's pooled block (scale_roi_boxes==0, equal
        resolutions). Per-ROI pooling is independent, so losses must match
        an explicit re-pool of the fg boxes."""
        from threedod.models.roi_heads3d import ROIHeads3D

        cfg, model, variables, batch = model_and_vars
        rngs = {"sampling": jax.random.PRNGKey(7)}
        (reused, _), _ = model.apply(
            variables, batch, train=True, rngs=rngs, mutable=["batch_stats"]
        )

        orig = ROIHeads3D.cube_forward

        def no_reuse(self, *args, pooled=None, **kw):
            return orig(self, *args, pooled=None, **kw)

        monkeypatch.setattr(ROIHeads3D, "cube_forward", no_reuse)
        (repooled, _), _ = model.apply(
            variables, batch, train=True, rngs=rngs, mutable=["batch_stats"]
        )
        assert set(reused) == set(repooled)
        for k in reused:
            np.testing.assert_allclose(
                float(reused[k]), float(repooled[k]), atol=1e-6, err_msg=k
            )

    def test_2d_only_mode(self):
        cfg = tiny_cfg(**{"model.roi_cube_head.loss_w_3d": 0.0})
        model = build_model(cfg)
        batch = tiny_batch()
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, batch, train=True
        )
        (losses, _), _ = model.apply(
            variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        assert not any(k.startswith("Cube/") for k in losses)
