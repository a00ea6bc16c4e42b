"""ROIHeads3D: 2D box branch + 3D cube branch (supervised Cube R-CNN).

Parity target: cubercnn/modeling/roi_heads/roi_heads.py:1948-2851
(ROIHeads3D) and fast_rcnn.py (FastRCNNOutputs / fast_rcnn_inference):

  * label_and_sample_proposals with ignore regions and IoU-weighted
    multinomial fg/bg sampling (:2737-2840),
  * 2D box branch: CE + smooth-L1 normalized by total regions,
  * cube branch: per-class selection, cluster z-bins, dims priors
    (exp/sigmoid), allocentric pose, virtual depth, disentangled corner
    losses + chamfer pose, optional joint loss, inverse-z weighting,
    heteroscedastic uncertainty sqrt(2)*exp(-u) and the `uncert` penalty,
  * inference: class-wise NMS keeping per-class score vectors, cube
    prediction on detections, geometric-mean score fusion
    (s2d * conf)^(1/2) (:2682-2730).

TPU re-design: ragged Instances become fixed (B, S) sampled-ROI tensors;
sampled foreground occupies a static leading prefix so the cube branch runs
on a compact (B, Ffg) block; all losses are masked means.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..geometry.boxes2d import Box2BoxTransform, clip_boxes
from ..geometry.cuboids import backproject, cuboid_verts
from ..geometry.misc import (
    chamfer_corner_loss,
    compute_virtual_scale_from_focal_spaces,
    scaled_sigmoid,
    smooth_l1,
)
from ..geometry.rotations import R_from_allocentric, R_to_allocentric, so3_relative_angle
from ..ops.losses import cross_entropy, safely_reduce_losses, smooth_l1_loss
from ..ops.matcher import match_and_ignore, subsample_fg_bg
from ..ops.nms import batched_nms
from ..ops.roi_align import multilevel_roi_align_windowed
from ..ops.roi_align_pallas import pallas_roi_align_available
from .heads import BoxHeadMLP, BoxPredictor, CubeHeadNet
from .rpn import Proposals

E_CONSTANT = 2.71828183
SQRT_2_CONSTANT = 1.41421356


class SampledROIs(NamedTuple):
    boxes: jnp.ndarray  # (B, S, 4) proposal boxes
    classes: jnp.ndarray  # (B, S) gt class (bg = num_classes, ignore slots invalid)
    fg: jnp.ndarray  # (B, S) bool
    valid: jnp.ndarray  # (B, S) bool (sampled slot holds a real candidate)
    matched_gt_boxes: jnp.ndarray  # (B, S, 4)
    gt_boxes3d: jnp.ndarray  # (B, S, 9)
    gt_poses: jnp.ndarray  # (B, S, 3, 3)
    gt_index: jnp.ndarray  # (B, S) matched GT slot index (for mask lookup)


class Detections(NamedTuple):
    boxes: jnp.ndarray  # (B, D, 4) image coords (network res)
    scores: jnp.ndarray  # (B, D) final (possibly 3D-fused) scores
    scores_2d: jnp.ndarray  # (B, D) 2D classification scores
    classes: jnp.ndarray  # (B, D) int32
    valid: jnp.ndarray  # (B, D) bool
    center_cam: jnp.ndarray  # (B, D, 3)
    dimensions: jnp.ndarray  # (B, D, 3)
    pose: jnp.ndarray  # (B, D, 3, 3)
    center_2d: jnp.ndarray  # (B, D, 2) original-resolution 2D centers
    corners3d: jnp.ndarray  # (B, D, 8, 3)


def scale_Ks(K: jnp.ndarray, ratio: jnp.ndarray) -> jnp.ndarray:
    """K at network resolution: K / ratio with K[2,2] pinned to 1."""
    Ks = K / ratio[:, None, None]
    return Ks.at[:, 2, 2].set(1.0)


class ROIHeads3D(nn.Module):
    cfg: Any  # threedod.config.Config (static at trace time)
    priors: Optional[dict] = None

    def setup(self):
        c = self.cfg
        ch = c.model.roi_cube_head
        self.num_classes = c.model.roi_heads.num_classes
        # head MLPs compute in the model dtype (bf16 on TPU): the fc1
        # (S²·C x fc_dim) matmul over all pooled ROIs is the branch's
        # second-largest cost after the pool DMA; its logits-producing
        # predictor stays f32 (BoxPredictor pins dtype=f32 on its Denses)
        head_dtype = jnp.bfloat16 if c.model.dtype == "bfloat16" else jnp.float32
        self.box_head = BoxHeadMLP(
            num_fc=c.model.roi_box_head.num_fc,
            fc_dim=c.model.roi_box_head.fc_dim,
            dtype=head_dtype,
            pool_hw=c.model.roi_box_head.pooler_resolution,
        )
        self.box_predictor = BoxPredictor(num_classes=self.num_classes)
        self.transform = Box2BoxTransform(weights=(10.0, 10.0, 5.0, 5.0))
        if ch.loss_w_3d > 0:
            self.cube_head = CubeHeadNet(
                num_classes=self.num_classes,
                num_fc=ch.num_fc,
                fc_dim=ch.fc_dim,
                shared_fc=ch.shared_fc,
                z_type=ch.z_type,
                pose_type=ch.pose_type,
                cluster_bins=ch.cluster_bins,
                use_confidence=ch.use_confidence,
                dtype=head_dtype,
                pool_hw=ch.pooler_resolution,
            )
            C, bins = self.num_classes, max(ch.cluster_bins, 1)
            if ch.dims_priors_enabled and self.priors is not None:
                dims_init = np.asarray(self.priors["priors_dims_per_cat"], np.float32)[None]
            else:
                dims_init = np.ones((1, C, 2, 3), np.float32)
            self.priors_dims_per_cat = self.param(
                "priors_dims_per_cat", lambda k: jnp.asarray(dims_init)
            )
            if ch.cluster_bins > 1 and self.priors is not None and self.priors["priors_bins"]:
                zs = np.stack([np.asarray(p[1], np.float32) for p in self.priors["priors_bins"]])
                zst = np.stack([np.asarray(p[2], np.float32) for p in self.priors["priors_bins"]])
            else:
                zs = np.ones((C, bins), np.float32)
                zst = np.ones((C, bins, 2), np.float32)
            self.priors_z_scales = self.param("priors_z_scales", lambda k: jnp.asarray(zs))
            self.priors_z_stats = self.param("priors_z_stats", lambda k: jnp.asarray(zst))

    # ------------------------------------------------------------------
    # proposal labelling + sampling (train)
    # ------------------------------------------------------------------
    def label_and_sample(self, key, proposals: Proposals, gt) -> SampledROIs:
        c = self.cfg
        rh = c.model.roi_heads
        S = c.shapes.roi_batch

        def per_image(key_i, pboxes, pvalid, gtb, gtc, gtv, gtb3d, gtp):
            # append valid gt boxes to the candidate set (proposal_append_gt)
            cand = jnp.concatenate([pboxes, gtb], axis=0)
            cand_valid = jnp.concatenate([pvalid, gtv & (gtc >= 0)], axis=0)
            valid_gt = gtv & (gtc >= 0)
            ign_gt = gtv & (gtc < 0)

            m, in_ignore = match_and_ignore(
                gtb, valid_gt, ign_gt, cand,
                bg_thresh=rh.iou_thresholds[0], fg_thresh=rh.iou_thresholds[1],
                ignore_thresh=c.model.rpn.ignore_threshold,
            )
            labels = jnp.where(cand_valid, m.matched_labels, -1)
            labels = jnp.where(in_ignore & (labels == 0), -1, labels)

            idx, is_fg, sel_valid = subsample_fg_bg(
                key_i, labels, m.matched_ious, S, rh.positive_fraction
            )
            boxes = cand[idx]
            midx = m.matched_idxs[idx]
            classes = jnp.where(is_fg, gtc[midx], self.num_classes)
            classes = jnp.where(sel_valid, classes, self.num_classes)
            return SampledROIs(
                boxes=boxes,
                classes=classes,
                fg=is_fg,
                valid=sel_valid,
                matched_gt_boxes=gtb[midx],
                gt_boxes3d=gtb3d[midx],
                gt_poses=gtp[midx],
                gt_index=midx,
            )

        keys = jax.random.split(key, proposals.boxes.shape[0])
        return jax.vmap(per_image)(
            keys, proposals.boxes, proposals.valid,
            gt.boxes2d, gt.classes, gt.valid, gt.boxes3d, gt.poses,
        )

    # ------------------------------------------------------------------
    # pooled features
    # ------------------------------------------------------------------
    def _pool(self, features: Dict[str, jnp.ndarray], boxes: jnp.ndarray, resolution: int):
        # pool in the model compute dtype (features are bf16-born when
        # model.dtype is bf16 — the f32 cast adds no information, but doubles
        # the pooling HBM traffic, which is the hot path's bound); heads
        # consume the pooled block in f32.
        pool_dtype = (
            jnp.bfloat16 if self.cfg.model.dtype == "bfloat16" else jnp.float32
        )
        features = {k: v.astype(pool_dtype) for k, v in features.items()}
        sampling = max(self.cfg.model.roi_box_head.pooler_sampling_ratio, 2)

        from ..utils import debug

        if pallas_roi_align_available():
            # batched call — ONE pallas_call over the Y-stacked batch plane.
            # vmap here would lower the scalar-prefetch pallas_call to a
            # while loop over images (28 ms/step of the supervised train
            # step went to its per-image dynamic-slices + layout copies).
            from ..ops.roi_align_pallas import multilevel_roi_align_tpu

            # spatial_pad=True (heads consume the kernel's padded 8x8 grid
            # via SpatialPadDense, skipping the 7x7 slice+relayout) measured
            # NEUTRAL in-model on v5e (26.57 vs 26.57 ms/step bracketed,
            # detections bit-identical — DESIGN 17); per the two-stage gate
            # the simpler sliced program ships. The padded path stays
            # tested (tests/test_layout_equiv.py) for a future toolchain.
            pooled = multilevel_roi_align_tpu(
                features, boxes, output_size=resolution,
                sampling_ratio=sampling, spatial_pad=False,
            )
            return debug.sg("pool", pooled.astype(jnp.float32))

        # share the Pallas kernel's WINDOW_Y fit budget so CPU tests
        # exercise the exact level-bump rule the TPU path uses
        from ..ops.roi_align_pallas import WINDOW_Y

        pool_fn = functools.partial(
            multilevel_roi_align_windowed, window=WINDOW_Y,
            output_size=resolution, sampling_ratio=sampling,
        )
        return debug.sg(
            "pool", jax.vmap(pool_fn)(features, boxes).astype(jnp.float32)
        )

    # ------------------------------------------------------------------
    # 2D box branch
    # ------------------------------------------------------------------
    def box_branch_train(self, features, sampled: SampledROIs, pooled=None):
        b, s = sampled.classes.shape
        if pooled is None:
            pooled = self._pool(features, sampled.boxes, self.cfg.model.roi_box_head.pooler_resolution)
        feats = self.box_head(pooled.reshape(b * s, *pooled.shape[2:]))
        scores, deltas = self.box_predictor(feats)

        classes = sampled.classes.reshape(-1)
        valid = sampled.valid.reshape(-1)
        fg = sampled.fg.reshape(-1)

        loss_cls = cross_entropy(scores, classes, mask=valid)

        deltas_pc = deltas.reshape(b * s, self.num_classes, 4)
        cls_idx = jnp.clip(classes, 0, self.num_classes - 1)
        fg_deltas = jnp.take_along_axis(deltas_pc, cls_idx[:, None, None].repeat(4, -1), axis=1)[:, 0]
        gt_deltas = self.transform.get_deltas(
            sampled.boxes.reshape(-1, 4), sampled.matched_gt_boxes.reshape(-1, 4)
        )
        reg = smooth_l1_loss(fg_deltas, jax.lax.stop_gradient(gt_deltas)).sum(-1)
        normalize = jnp.maximum(jnp.sum(valid), 1.0)
        loss_reg = jnp.sum(reg * fg) / normalize

        # differentiable per-gt-class predicted boxes for the cube branch
        pred_boxes = self.transform.apply_deltas(
            fg_deltas, sampled.boxes.reshape(-1, 4)
        ).reshape(b, s, 4)

        losses = {"BoxHead/loss_cls": loss_cls, "BoxHead/loss_box_reg": loss_reg}
        return losses, pred_boxes

    # ------------------------------------------------------------------
    # cube transforms (shared between train fg-prefix and inference)
    # ------------------------------------------------------------------
    def cube_forward(
        self,
        features,
        boxes,  # (B, N, 4) src boxes for pooling/deltas
        box_classes,  # (B, N)
        Ks_scaled,  # (B, 3, 3)
        v2r,  # (B,) virtual->real depth scale
        pooled=None,  # optional precomputed pool of `boxes` (train-path reuse)
    ):
        c = self.cfg
        ch = c.model.roi_cube_head
        b, n = box_classes.shape

        boxes_scaled = boxes
        if ch.scale_roi_boxes > 0:
            ctr = (boxes[..., :2] + boxes[..., 2:]) * 0.5
            half = (boxes[..., 2:] - boxes[..., :2]) * 0.5 * ch.scale_roi_boxes
            boxes_scaled = jnp.concatenate([ctr - half, ctr + half], axis=-1)

        if pooled is None:
            pooled = self._pool(features, boxes_scaled, ch.pooler_resolution)
        raw = self.cube_head(pooled.reshape(b * n, *pooled.shape[2:]))
        deltas2d, z_raw, dims_raw, pose_raw, uncert_raw = raw

        flat_cls = jnp.clip(box_classes.reshape(-1), 0, self.num_classes - 1)
        rows = jnp.arange(b * n)

        cube_2d_deltas = deltas2d[rows, flat_cls]  # (BN, 2)
        cube_dims_norm = dims_raw[rows, flat_cls]  # (BN, 3)
        cube_pose = pose_raw[rows, flat_cls]  # (BN, 3, 3)
        cube_uncert = uncert_raw[rows, flat_cls] if uncert_raw is not None else None

        src = boxes.reshape(-1, 4)
        src_w = src[:, 2] - src[:, 0]
        src_h = src[:, 3] - src[:, 1]
        src_scales = jnp.sqrt(src_w**2 + src_h**2)
        src_cx = src[:, 0] + 0.5 * src_w
        src_cy = src[:, 1] + 0.5 * src_h

        cube_x = src_cx + src_w * cube_2d_deltas[:, 0]
        cube_y = src_cy + src_h * cube_2d_deltas[:, 1]
        cube_xy = jnp.stack([cube_x, cube_y], axis=1)

        aux = {}
        # --- z selection / transform -----------------------------------
        if ch.cluster_bins > 1:
            # closest 2D-scale bin per (roi, class)
            scales_diff = jnp.abs(
                jax.lax.stop_gradient(self.priors_z_scales)[flat_cls]
                - src_scales[:, None]
            )  # (BN, bins)
            assignments = scales_diff.argmin(axis=1)
            zc = z_raw.reshape(b * n, -1, self.num_classes)
            cube_z = zc[rows, assignments, flat_cls]
            z_stats = jax.lax.stop_gradient(self.priors_z_stats)[flat_cls]  # (BN, bins, 2)
            z_means = jnp.take_along_axis(z_stats[..., 0], assignments[:, None], axis=1)[:, 0]
            z_stds = jnp.take_along_axis(z_stats[..., 1], assignments[:, None], axis=1)[:, 0]
            aux["z_means"], aux["z_stds"] = z_means, z_stds
        else:
            cube_z = z_raw[rows, flat_cls]

        # --- dims priors -------------------------------------------------
        if ch.dims_priors_enabled:
            prior = jax.lax.stop_gradient(self.priors_dims_per_cat)[0][flat_cls]  # (BN, 2, 3)
            prior_mean, prior_std = prior[:, 0], prior[:, 1]
            aux["prior_dims_mean"], aux["prior_dims_std"] = prior_mean, prior_std
            if ch.dims_priors_func == "sigmoid":
                lo = jnp.clip(prior_mean - 3 * prior_std, 0.0)
                hi = prior_mean + 3 * prior_std
                cube_dims = scaled_sigmoid(cube_dims_norm, min=lo, max=hi)
            else:
                cube_dims = jnp.exp(jnp.clip(cube_dims_norm, None, 5.0)) * prior_mean
        else:
            cube_dims = jnp.exp(jnp.clip(cube_dims_norm, None, 5.0))

        # --- pose ---------------------------------------------------------
        Ks_per = jnp.repeat(Ks_scaled, n, axis=0)  # (BN, 3, 3)
        if ch.allocentric_pose:
            cube_pose_allo = cube_pose
            cube_pose = R_from_allocentric(
                Ks_per, cube_pose, jax.lax.stop_gradient(cube_x), jax.lax.stop_gradient(cube_y)
            )
            aux["pose_allocentric"] = cube_pose_allo

        # --- z transform ----------------------------------------------------
        if ch.z_type == "sigmoid":
            z_norm = jax.nn.sigmoid(cube_z)
            cube_z = z_norm * 100.0
        elif ch.z_type == "log":
            z_norm = cube_z
            cube_z = jnp.exp(cube_z)
        elif ch.z_type == "clusters":
            z_norm = cube_z
            z_mins = jnp.clip(aux["z_means"] - 3 * aux["z_stds"], 0)
            z_maxs = aux["z_means"] + 3 * aux["z_stds"]
            cube_z = scaled_sigmoid(cube_z, min=z_mins, max=z_maxs)
        else:
            z_norm = cube_z
        aux["z_norm"] = z_norm

        v2r_per = jnp.repeat(v2r, n, axis=0)
        if ch.virtual_depth:
            cube_z = cube_z * v2r_per

        return {
            "xy": cube_xy,
            "x": cube_x,
            "y": cube_y,
            "z": cube_z,
            "dims": cube_dims,
            "dims_norm": cube_dims_norm,
            "deltas_2d": cube_2d_deltas,
            "pose": cube_pose,
            "uncert": cube_uncert,
            "Ks_per": Ks_per,
            "v2r": v2r_per,
            "src_cx": src_cx,
            "src_cy": src_cy,
            "src_w": src_w,
            "src_h": src_h,
            **aux,
        }

    # ------------------------------------------------------------------
    # cube losses (train)
    # ------------------------------------------------------------------
    def cube_losses(self, out, gt_boxes3d, gt_poses, weight):
        """Disentangled corner losses. weight: (BN,) mask (fg & valid)."""
        c = self.cfg
        ch = c.model.roi_cube_head
        Ks = out["Ks_per"]
        v2r = out["v2r"]
        r2v = 1.0 / v2r

        gt_2d = gt_boxes3d[:, :2]
        gt_z = gt_boxes3d[:, 2]
        gt_dims = gt_boxes3d[:, 3:6]

        gt_3d = backproject(Ks, gt_2d, gt_z)
        gt_box3d = jnp.concatenate([gt_3d, gt_dims], axis=1)
        gt_corners = cuboid_verts(gt_box3d, gt_poses)

        n = gt_z.shape[0]
        losses = {}
        metrics = {}

        if ch.disentangled_loss:
            dis_z = jnp.concatenate(
                [backproject(Ks, gt_2d, out["z"]), gt_dims], axis=1
            )
            dis_z_corners = cuboid_verts(dis_z, gt_poses)
            loss_z = smooth_l1(dis_z_corners, gt_corners).reshape(n, -1).mean(1)

            pred_xy = jnp.stack([out["x"], out["y"]], axis=1)
            dis_xy = jnp.concatenate([backproject(Ks, pred_xy, gt_z), gt_dims], axis=1)
            dis_xy_corners = cuboid_verts(dis_xy, gt_poses)
            loss_xy = smooth_l1(dis_xy_corners, gt_corners).reshape(n, -1).mean(1)

            dis_pose_corners = cuboid_verts(gt_box3d, out["pose"])
            if ch.chamfer_pose:
                loss_pose = chamfer_corner_loss(dis_pose_corners, gt_corners)
            else:
                loss_pose = smooth_l1(dis_pose_corners, gt_corners).reshape(n, -1).mean(1)

            dis_dims = jnp.concatenate([gt_3d, out["dims"]], axis=1)
            dis_dims_corners = cuboid_verts(dis_dims, gt_poses)
            loss_dims = smooth_l1(dis_dims_corners, gt_corners).reshape(n, -1).mean(1)
        else:
            gt_deltas = (gt_2d - jnp.stack([out["src_cx"], out["src_cy"]], 1)) / jnp.stack(
                [out["src_w"], out["src_h"]], 1
            )
            loss_xy = smooth_l1(out["deltas_2d"], gt_deltas).mean(1)
            if ch.dims_priors_enabled:
                target = jnp.log(jnp.maximum(gt_dims, 1e-6) / jnp.maximum(out["prior_dims_mean"], 1e-6))
                loss_dims = smooth_l1(out["dims_norm"], target).mean(1)
            else:
                loss_dims = smooth_l1(out["dims_norm"], jnp.log(jnp.maximum(gt_dims, 1e-6))).mean(1)
            if ch.allocentric_pose:
                gt_allo = R_to_allocentric(
                    Ks, gt_poses, jax.lax.stop_gradient(out["x"]), jax.lax.stop_gradient(out["y"])
                )
                loss_pose = 1 - so3_relative_angle(out["pose_allocentric"], gt_allo, cos_angle=True)
            else:
                loss_pose = 1 - so3_relative_angle(out["pose"], gt_poses, cos_angle=True)
            if ch.z_type == "direct":
                loss_z = smooth_l1(out["z"], gt_z)
            elif ch.z_type == "sigmoid":
                loss_z = smooth_l1(out["z_norm"], jnp.clip(gt_z * r2v / 100.0, 0, 1))
            elif ch.z_type == "log":
                loss_z = smooth_l1(out["z_norm"], jnp.log(jnp.clip(gt_z * r2v, 0.01)))
            else:  # clusters
                loss_z = smooth_l1(
                    out["z_norm"], (gt_z * r2v - out["z_means"]) / jnp.maximum(out["z_stds"], 1e-6)
                )

        loss_joint = None
        if ch.loss_w_joint > 0:
            pred_xy = jnp.stack([out["x"], out["y"]], axis=1)
            joint = jnp.concatenate([backproject(Ks, pred_xy, out["z"]), out["dims"]], axis=1)
            joint_corners = cuboid_verts(joint, out["pose"])
            if ch.chamfer_pose and ch.disentangled_loss:
                loss_joint = chamfer_corner_loss(joint_corners, gt_corners)
            else:
                loss_joint = smooth_l1(joint_corners, gt_corners).reshape(n, -1).mean(1)

        # tracking metrics
        metrics["Cube/z_error"] = safely_reduce_losses(jnp.abs(out["z"] - gt_z), weight > 0)
        metrics["Cube/dims_error"] = safely_reduce_losses(
            jnp.abs(out["dims"] - gt_dims).mean(-1), weight > 0
        )
        metrics["Cube/xy_error"] = safely_reduce_losses(
            jnp.abs(out["xy"] - gt_2d).mean(-1), weight > 0
        )

        total_for_reporting = (
            loss_dims * ch.loss_w_dims + loss_pose * ch.loss_w_pose
            + loss_xy * ch.loss_w_xy + loss_z * ch.loss_w_z
        )
        metrics["Cube/total_3D_loss"] = safely_reduce_losses(
            jax.lax.stop_gradient(total_for_reporting), weight > 0
        ) * ch.loss_w_3d

        if ch.inverse_z_weight:
            inv_w = 1.0 / jnp.log(jnp.clip(gt_z, E_CONSTANT, None))
            loss_dims = loss_dims * inv_w
            loss_xy = loss_xy * inv_w
            loss_z = loss_z * inv_w
            loss_pose = loss_pose * inv_w
            if loss_joint is not None:
                loss_joint = loss_joint * inv_w

        if ch.use_confidence > 0 and out["uncert"] is not None:
            uncert_sf = SQRT_2_CONSTANT * jnp.exp(-out["uncert"])
            loss_dims = loss_dims * uncert_sf
            loss_xy = loss_xy * uncert_sf
            loss_z = loss_z * uncert_sf
            loss_pose = loss_pose * uncert_sf
            if loss_joint is not None:
                loss_joint = loss_joint * uncert_sf
            losses["Cube/uncert"] = ch.use_confidence * safely_reduce_losses(
                out["uncert"], weight > 0
            )
            metrics["Cube/conf"] = safely_reduce_losses(jnp.exp(-out["uncert"]), weight > 0)

        w3d = ch.loss_w_3d
        mask = weight > 0
        if ch.loss_w_dims > 0:
            losses["Cube/loss_dims"] = safely_reduce_losses(loss_dims, mask) * ch.loss_w_dims * w3d
        losses["Cube/loss_xy"] = safely_reduce_losses(loss_xy, mask) * ch.loss_w_xy * w3d
        losses["Cube/loss_z"] = safely_reduce_losses(loss_z, mask) * ch.loss_w_z * w3d
        losses["Cube/loss_pose"] = safely_reduce_losses(loss_pose, mask) * ch.loss_w_pose * w3d
        if loss_joint is not None:
            losses["Cube/loss_joint"] = safely_reduce_losses(loss_joint, mask) * ch.loss_w_joint * w3d
        return losses, metrics

    # ------------------------------------------------------------------
    # main entry points
    # ------------------------------------------------------------------
    def __call__(self, features, proposals: Proposals, K, im_scale_ratio, image_hw, gt=None, train: bool = False):
        c = self.cfg
        ch = c.model.roi_cube_head
        Ks_scaled = scale_Ks(K, im_scale_ratio)

        if ch.virtual_depth:
            focal = K[:, 1, 1]
            im_h_net = image_hw[:, 0].astype(jnp.float32)
            im_h_orig = im_h_net * im_scale_ratio
            v2r = compute_virtual_scale_from_focal_spaces(
                focal, im_h_orig, ch.virtual_focal, im_h_net
            )
        else:
            v2r = jnp.ones_like(im_scale_ratio)

        if train:
            key = self.make_rng("sampling")
            sampled = self.label_and_sample(key, proposals, gt)
            # one pool for both branches: the cube branch pools the fg
            # PREFIX of exactly the boxes the box branch pools, at the same
            # resolution/sampling ratio, so its pooled block is a slice of
            # the box branch's — pooling once saves a full Pallas pool
            # forward + RMW backward per step (reference pools twice:
            # roi_heads.py:2160 box pooler, :2237 cube pooler on the same
            # sampled proposals).
            res_box = c.model.roi_box_head.pooler_resolution
            reuse_pool = ch.scale_roi_boxes <= 0 and ch.pooler_resolution == res_box
            pooled_all = self._pool(features, sampled.boxes, res_box)
            losses, pred_boxes = self.box_branch_train(features, sampled, pooled=pooled_all)
            metrics = {
                "roi/num_fg": sampled.fg.sum() / sampled.fg.shape[0],
                "roi/num_bg": (sampled.valid & ~sampled.fg).sum() / sampled.fg.shape[0],
            }
            if ch.loss_w_3d > 0:
                # fg occupies the leading prefix (subsample_fg_bg contract)
                F = int(c.shapes.roi_batch * c.model.roi_heads.positive_fraction)
                fg_boxes = sampled.boxes[:, :F]
                fg_classes = sampled.classes[:, :F]
                fg_mask = (sampled.fg[:, :F] & sampled.valid[:, :F]).reshape(-1)
                out = self.cube_forward(
                    features, fg_boxes, fg_classes, Ks_scaled, v2r,
                    pooled=pooled_all[:, :F] if reuse_pool else None,
                )
                cube_losses, cube_metrics = self.cube_losses(
                    out,
                    sampled.gt_boxes3d[:, :F].reshape(-1, 9),
                    sampled.gt_poses[:, :F].reshape(-1, 3, 3),
                    fg_mask.astype(jnp.float32),
                )
                losses.update(cube_losses)
                metrics.update(cube_metrics)
            return losses, metrics

        # ------------------------- inference ---------------------------
        if gt is not None and not train:
            # oracle 2D boxes: bypass the 2D box head entirely and run the
            # cube head on ground-truth boxes (reference rcnn3d.py:111-113)
            det = self.oracle_detections(gt)
        else:
            det = self.box_branch_inference(features, proposals, image_hw)
        if ch.loss_w_3d > 0:
            out = self.cube_forward(features, det.boxes, det.classes, Ks_scaled, v2r)
            det = self.assemble_detections(det, out, im_scale_ratio)
        return det, {}

    def oracle_detections(self, gt) -> Detections:
        boxes = gt.boxes2d
        classes = jnp.maximum(gt.classes, 0)
        valid = gt.valid & (gt.classes >= 0)
        b, m = classes.shape
        ones = jnp.where(valid, 1.0, 0.0)
        zeros3 = jnp.zeros((b, m, 3))
        return Detections(
            boxes=boxes,
            scores=ones,
            scores_2d=ones,
            classes=classes,
            valid=valid,
            center_cam=zeros3,
            dimensions=zeros3,
            pose=jnp.broadcast_to(jnp.eye(3), (b, m, 3, 3)),
            center_2d=jnp.zeros((b, m, 2)),
            corners3d=jnp.zeros((b, m, 8, 3)),
        )

    def box_branch_inference(self, features, proposals: Proposals, image_hw) -> Detections:
        c = self.cfg
        b, k = proposals.scores.shape
        pooled = self._pool(features, proposals.boxes, c.model.roi_box_head.pooler_resolution)
        feats = self.box_head(pooled.reshape(b * k, *pooled.shape[2:]))
        scores, deltas = self.box_predictor(feats)
        probs = jax.nn.softmax(scores, axis=-1)[:, :-1].reshape(b, k, self.num_classes)
        boxes_pc = self.transform.apply_deltas(
            deltas, proposals.boxes.reshape(-1, 4)
        ).reshape(b, k, self.num_classes, 4)

        cand = c.shapes.nms_candidates
        d = c.shapes.max_detections
        thresh = c.model.roi_heads.score_thresh_test
        nms_t = c.model.roi_heads.nms_thresh_test

        def per_image(probs_i, boxes_i, pvalid_i, hw):
            flat_scores = probs_i.reshape(-1)  # (K*C,)
            flat_valid = (
                jnp.repeat(pvalid_i, self.num_classes)
                & (flat_scores > thresh)
                & jnp.isfinite(boxes_i.reshape(-1, 4)).all(-1)
            )
            masked = jnp.where(flat_valid, flat_scores, -jnp.inf)
            top_s, top_i = jax.lax.top_k(masked, min(cand, masked.shape[0]))
            top_boxes = boxes_i.reshape(-1, 4)[top_i]
            top_boxes = clip_boxes(top_boxes, hw[0].astype(jnp.float32), hw[1].astype(jnp.float32))
            top_cls = (top_i % self.num_classes).astype(jnp.int32)
            keep = batched_nms(top_boxes, top_s, top_cls, nms_t, valid=jnp.isfinite(top_s))
            kept = jnp.where(keep, top_s, -jnp.inf)
            fin_s, fin_i = jax.lax.top_k(kept, d)
            return (
                top_boxes[fin_i],
                jnp.where(jnp.isfinite(fin_s), fin_s, 0.0),
                top_cls[fin_i],
                jnp.isfinite(fin_s),
            )

        boxes, det_scores, det_cls, det_valid = jax.vmap(per_image)(
            probs, boxes_pc, proposals.valid, image_hw
        )
        zeros3 = jnp.zeros(boxes.shape[:2] + (3,))
        return Detections(
            boxes=boxes,
            scores=det_scores,
            scores_2d=det_scores,
            classes=det_cls,
            valid=det_valid,
            center_cam=zeros3,
            dimensions=zeros3,
            pose=jnp.broadcast_to(jnp.eye(3), boxes.shape[:2] + (3, 3)),
            center_2d=jnp.zeros(boxes.shape[:2] + (2,)),
            corners3d=jnp.zeros(boxes.shape[:2] + (8, 3)),
        )

    def assemble_detections(self, det: Detections, out, im_scale_ratio) -> Detections:
        """3D fields + geometric-mean score fusion (roi_heads.py:2682-2730)."""
        b, d = det.classes.shape
        center = backproject(out["Ks_per"], out["xy"], out["z"]).reshape(b, d, 3)
        dims = out["dims"].reshape(b, d, 3)
        pose = out["pose"].reshape(b, d, 3, 3)
        corners = cuboid_verts(jnp.concatenate([center, dims], axis=-1), pose)
        center_2d = out["xy"].reshape(b, d, 2) * im_scale_ratio[:, None, None]
        if out["uncert"] is not None:
            conf = jnp.exp(-out["uncert"]).reshape(b, d)
            scores = jnp.sqrt(jnp.maximum(det.scores_2d * conf, 0.0))
        else:
            scores = det.scores_2d
        return det._replace(
            scores=jnp.where(det.valid, scores, 0.0),
            center_cam=center,
            dimensions=dims,
            pose=pose,
            center_2d=center_2d,
            corners3d=corners,
        )
