"""ROIHeads3DScore: weak Cube R-CNN losses (2D-annotation-only supervision).

Parity target: cubercnn/modeling/roi_heads/roi_heads.py:663-1936
(ROIHeads3DScore) — the full weak-loss menu validated against
['dims','pose_alignment','pose_ground','pose_ground2','iou','segmentation',
 'z','z_pseudo_gt_patch','z_pseudo_gt_center','depth'] (:815-816):

  iou                GIoU of the projected cube box vs the GT 2D box (:1598)
  pose_alignment     pairwise SO3 pose-consistency within an image (:1055)
  pose_ground        ground-normal (RANSAC on depth+ground maps) vs pose
                     row 1 cosine, 0.1 confidence w/o ground map (:1607-1616)
  pose_ground2       full pseudo-rotation from the normal, SO3 angle (:1618)
  z                  50-step z-search matching projected area (:1151-1194)
  z_pseudo_gt_patch  median depth inside the projected box (:1196-1231)
  z_pseudo_gt_center depth at the projected center (:1256-1277)
  dims               z-score-beyond-1-sigma dims prior (:1233-1254)
  segmentation       differentiable convex-hull mask + focal loss (:1030)
  depth              depth-range (0.9-0.1 quantile in mask) vs cube z-extent
                     (:1279-1305)

All uncertainty-scaled by sqrt(2)*exp(-u) and weighted per config.

TPU re-design: the reference loops instances in Python for nearly every
loss; here each loss is one vectorised program over the static fg prefix
(B, F) with mask-weighted reductions, and the z-search is a batched
(F, 50) projection instead of a per-instance loop.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from ..geometry.boxes2d import giou_loss, matched_pairwise_iou
from ..geometry.cuboids import backproject, cuboid_verts, project_points
from ..geometry.hull import convex_hull_mask
from ..ops.losses import safely_reduce_losses, sigmoid_focal_loss
from ..geometry.rotations import so3_rotation_angle
from ..geometry.misc import smooth_l1
from .boxer import ground_plane_from_depth
from .roi_heads3d import ROIHeads3D, SQRT_2_CONSTANT, scale_Ks
from ..geometry.misc import compute_virtual_scale_from_focal_spaces


def project_cube_boxes(centers, dims, poses, Ks, im_w, im_h):
    """Projected (clamped) 2D boxes of cubes. All (N, ...) -> (N, 4)."""
    box6 = jnp.concatenate([centers, dims], axis=-1)
    corners = cuboid_verts(box6, poses)
    proj = project_points(Ks, corners)
    x = jnp.clip(proj[..., 0], int(-im_w / 2 + 1), int(im_w - 1 + im_w))
    y = jnp.clip(proj[..., 1], int(-im_h / 2 + 1), int(im_h - 1 + im_h))
    return jnp.stack([x.min(-1), y.min(-1), x.max(-1), y.max(-1)], axis=-1)


def pose_alignment_loss(poses, fg_mask):
    """Per-image pairwise pose-consistency: 1 - |cos(relative angle)|.

    poses (B, F, 3, 3), fg_mask (B, F). Returns scalar (mean over images
    with >= 2 fg), or 0 contribution when none qualify, plus a validity flag.
    """

    def per_image(R, m):
        cosang = so3_rotation_angle(
            jnp.einsum("nij,mkj->nmik", R, R, precision="highest").reshape(-1, 3, 3),
            cos_angle=True,
        ).reshape(R.shape[0], R.shape[0])
        pair = m[:, None] & m[None, :] & (jnp.triu(jnp.ones_like(cosang), k=1) > 0)
        loss = 1.0 - jnp.abs(cosang)
        s = jnp.sum(jnp.where(pair, loss, 0.0))
        n = jnp.sum(pair)
        has = n > 0
        return jnp.where(has, s / jnp.maximum(n, 1), 0.0), has

    per, has = jax.vmap(per_image)(poses, fg_mask)
    n_valid = jnp.sum(has)
    return jnp.sum(per) / jnp.maximum(n_valid, 1), n_valid > 0


def normal_to_rotation(normal):
    """Pseudo rotation whose rows are [t0, t1, normal] (reference :1307-1317)."""
    x1 = jnp.asarray([1.0, 0.0, 0.0])
    t0 = jnp.cross(normal, jnp.broadcast_to(x1, normal.shape))
    small = jnp.sum(t0 * t0, axis=-1, keepdims=True) < 1e-3
    y1 = jnp.asarray([0.0, 1.0, 0.0])
    t0 = jnp.where(small, jnp.cross(normal, jnp.broadcast_to(y1, normal.shape)), t0)
    t0 = t0 / jnp.maximum(jnp.linalg.norm(t0, axis=-1, keepdims=True), 1e-8)
    t1 = jnp.cross(normal, t0)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-8)
    return jnp.stack([t0, t1, normal], axis=-2)


def z_search_loss(gt_boxes, centers, dims, poses, z, Ks, im_w, im_h, max_count=50):
    """50-step depth search matching projected area (reference :1151-1194).

    All inputs flat (N, ...). Returns (N,) loss.
    """
    n = z.shape[0]
    gt_area = jnp.clip(gt_boxes[:, 2] - gt_boxes[:, 0], 0) * jnp.clip(
        gt_boxes[:, 3] - gt_boxes[:, 1], 0
    )
    proj0 = project_cube_boxes(centers, dims, poses, Ks, im_w, im_h)
    pred_area = jnp.clip(proj0[:, 2] - proj0[:, 0], 0) * jnp.clip(proj0[:, 3] - proj0[:, 1], 0)
    pred_cx = (proj0[:, 0] + proj0[:, 2]) * 0.5
    pred_cy = (proj0[:, 1] + proj0[:, 3]) * 0.5
    within = (
        (gt_boxes[:, 0] - max_count <= pred_cx) & (pred_cx <= gt_boxes[:, 2] + max_count)
        & (gt_boxes[:, 1] - max_count <= pred_cy) & (pred_cy <= gt_boxes[:, 3] + max_count)
    )
    steps = jnp.linspace(0.0, (max_count - 1) / 10.0, max_count)  # (T,)
    direction = jnp.where(gt_area < pred_area, 1.0, -1.0)  # grow z if pred too big
    z_cand = z[:, None] + direction[:, None] * steps[None, :]  # (N, T)
    # shifted cubes: keep x, y, dims, pose; vary z only (reference mutates
    # the raw tensor z entry)
    centers_c = jnp.repeat(centers[:, None, :], max_count, axis=1)
    centers_c = centers_c.at[..., 2].set(z_cand)
    dims_c = jnp.repeat(dims[:, None, :], max_count, axis=1)
    poses_c = jnp.repeat(poses[:, None], max_count, axis=1)
    Ks_c = jnp.repeat(Ks[:, None], max_count, axis=1)
    proj = project_cube_boxes(
        centers_c.reshape(-1, 3), dims_c.reshape(-1, 3), poses_c.reshape(-1, 3, 3),
        Ks_c.reshape(-1, 3, 3), im_w, im_h,
    ).reshape(n, max_count, 4)
    areas = jnp.clip(proj[..., 2] - proj[..., 0], 0) * jnp.clip(proj[..., 3] - proj[..., 1], 0)
    areas = jnp.where(areas == 0, 1e7, areas)
    best = jnp.argmin(jnp.abs(areas - gt_area[:, None]), axis=1)
    z_best = jnp.take_along_axis(z_cand, best[:, None], axis=1)[:, 0]
    loss = jnp.abs(z - z_best)
    return jnp.where(within, loss, 0.1 * max_count) / 2.0


# radix order-statistic machinery shared with the RPN subsampler — see
# ops/order_stats.py for the sort-vs-bisection rationale
from ..ops.order_stats import kth_smallest as _kth_smallest  # noqa: E402
from ..ops.order_stats import order_keys as _order_keys  # noqa: E402


def masked_quantile(values, mask, q):
    """Quantile of `values[mask]` with static shapes."""
    return masked_quantile_batch(values.ravel()[None], mask.ravel()[None], q)[0]


def masked_quantile_batch(values, mask, *qs):
    """Row-wise masked quantile: values/mask (N, K) -> one (N,) per q.

    Matches the sort-based definition bit-for-bit (v_sorted[floor(q*(n-1))]
    with masked entries pushed to +1e9) via _kth_smallest; multiple
    quantiles of the same rows share the key transform.
    """
    big = 1e9
    keys = _order_keys(jnp.where(mask, values, big))
    n = jnp.sum(mask, axis=-1)
    outs = []
    for q in qs:
        idx = jnp.clip((q * jnp.maximum(n - 1, 0)).astype(jnp.int32), 0, keys.shape[-1] - 1)
        outs.append(_kth_smallest(keys, idx))
    return outs[0] if len(outs) == 1 else tuple(outs)


BOX_SAMPLE_GRID = 32  # per-ROI quantile window (see _box_window)


def _box_window_indices(boxes, h, w, s=BOX_SAMPLE_GRID):
    """Per-ROI (N, s) row/col sample indices spanning each box, plus the
    (N, s, s) bool mask of samples whose *unclipped* coordinates fall
    inside the image."""
    t = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    ys = boxes[:, 1, None] + t[None, :] * jnp.maximum(boxes[:, 3] - boxes[:, 1], 1.0)[:, None]
    xs = boxes[:, 0, None] + t[None, :] * jnp.maximum(boxes[:, 2] - boxes[:, 0], 1.0)[:, None]
    valid = ((ys >= 0) & (ys < h))[:, :, None] & ((xs >= 0) & (xs < w))[:, None, :]
    yi = jnp.clip(ys.astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(xs.astype(jnp.int32), 0, w - 1)
    return yi, xi, valid


def _box_window(img, box, s=BOX_SAMPLE_GRID):
    """(s, s) nearest-pixel samples on a uniform grid spanning `box`,
    plus the (s, s) bool mask of samples whose *unclipped* coordinates fall
    inside the image.

    Per-ROI quantiles over image regions would otherwise sort the full
    image once per ROI (N sorts of H*W — ~100 ms/step at train shapes);
    an s x s nearest-sample window keeps actual pixel values (no
    interpolation) and shrinks each sort to s². For boxes larger than
    s x s pixels this subsamples the region — the same spirit as the
    reference's stride-2 subsampling (roi_heads.py:1216-1218), one level
    coarser; quantiles agree to within sampling noise. For boxes extending
    beyond the image, the reference intersects box with image; callers must
    AND the returned mask into their quantile mask — otherwise clipped
    out-of-image samples pile duplicates on the border row/col and bias
    the quantiles for truncated objects.
    """
    h, w = img.shape
    yi, xi, valid = _box_window_indices(box[None], h, w, s)
    return img[yi[0, :, None], xi[0, None, :]], valid[0]


def _box_window_batch(imgs, img_idx, boxes, s=BOX_SAMPLE_GRID):
    """Batched `_box_window` over N ROIs drawn from a (B, H, W) plane stack.

    REQUIRES image-major ROI order: img_idx == repeat(arange(B), N // B)
    (both weak-loss call sites construct exactly that; the argument is kept
    for the contract's visibility). The windows are computed as one-hot
    selector MATMULS: XLA lowers an (N, s, s) advanced-index read to a
    per-element scalar gather — measured ~26 ms at train shapes on a v5e,
    the dominant cost of the weak depth losses — while two
    highest-precision einsums compute the same values exactly in well
    under 1 ms (each output element is a dot with exactly one nonzero
    product, so f32 values are bit-exact).
    """
    del img_idx  # image-major contract, see docstring
    B, h, w = imgs.shape
    n = boxes.shape[0]
    assert n % B == 0, (n, B)
    f = n // B
    yi, xi, valid = _box_window_indices(boxes, h, w, s)
    sy = jax.nn.one_hot(yi.reshape(B, f * s), h, dtype=imgs.dtype)
    rows = jnp.einsum("bkh,bhw->bkw", sy, imgs, precision="highest")
    rows = rows.reshape(n, s, w)
    sx = jax.nn.one_hot(xi, w, dtype=imgs.dtype)
    win = jnp.einsum("nrw,ncw->nrc", rows, sx, precision="highest")
    return win, valid


def _box_window_batch_masks(masks, img_idx, gt_idx, boxes, s=BOX_SAMPLE_GRID):
    """Batched `_box_window` over (B, M, Hm, Wm) GT masks, selecting mask
    `gt_idx[n]` of image `img_idx[n]`. Same image-major contract and
    one-hot-matmul scheme as `_box_window_batch`; the per-ROI plane select
    and the row/col selections run in bf16 (0/1 mask values and
    one-nonzero-product dots are exact in bf16)."""
    del img_idx  # image-major contract, see _box_window_batch
    B, M, hm, wm = masks.shape
    n = boxes.shape[0]
    assert n % B == 0, (n, B)
    f = n // B
    yi, xi, valid = _box_window_indices(boxes, hm, wm, s)
    sg = jax.nn.one_hot(gt_idx.reshape(B, f), M, dtype=jnp.bfloat16)
    planes = jnp.einsum(
        "bfm,bmp->bfp", sg, masks.reshape(B, M, hm * wm).astype(jnp.bfloat16)
    ).reshape(n, hm, wm)
    sy = jax.nn.one_hot(yi, hm, dtype=jnp.bfloat16)
    rows = jnp.einsum("nrh,nhw->nrw", sy, planes)
    sx = jax.nn.one_hot(xi, wm, dtype=jnp.bfloat16)
    win = jnp.einsum("nrw,ncw->nrc", rows, sx)
    return win.astype(masks.dtype), valid


class ROIHeads3DScore(ROIHeads3D):
    """Weak-loss ROI head; shares box/cube plumbing with ROIHeads3D."""

    VALID_LOSSES = (
        "dims", "pose_alignment", "pose_ground", "pose_ground2", "iou",
        "segmentation", "z", "z_pseudo_gt_patch", "z_pseudo_gt_center", "depth",
    )

    def weak_cube_losses(
        self,
        out,  # cube_forward outputs on the fg prefix (flat BN = B*F)
        sampled,  # SampledROIs sliced to the fg prefix
        gt_masks,  # (B, M, Hm, Wm) or None
        depth_maps,  # (B, H, W)
        ground_maps,  # (B, H, W) or None
        K_scaled,  # (B, 3, 3)
        image_hw,  # (B, 2)
        rng_key,
    ):
        c = self.cfg
        ch = c.model.roi_cube_head
        loss_functions = set(c.loss_functions)
        unknown = loss_functions - set(self.VALID_LOSSES)
        assert not unknown, f"unknown weak losses: {unknown}"

        b, f = sampled.classes.shape
        n = b * f
        h, w = depth_maps.shape[1:3]
        fg = (sampled.fg & sampled.valid).reshape(-1)
        fg_f = fg.astype(jnp.float32)

        centers = backproject(out["Ks_per"], out["xy"], out["z"])  # (N, 3)
        dims = out["dims"]
        poses = out["pose"]
        gt_boxes = sampled.matched_gt_boxes.reshape(-1, 4)

        proj_boxes = project_cube_boxes(centers, dims, poses, out["Ks_per"], w, h)

        losses = {}
        metrics = {}
        per_loss = {}

        if "iou" in loss_functions:
            per_loss["loss_iou"] = (giou_loss(gt_boxes, proj_boxes), ch.loss_w_iou)

        if "pose_alignment" in loss_functions:
            align, has = pose_alignment_loss(
                poses.reshape(b, f, 3, 3), (sampled.fg & sampled.valid)
            )
            # broadcast to every instance (reference repeats the scalar)
            per_loss["loss_pose"] = (
                jnp.where(has, align, 0.0) * jnp.ones((n,)), ch.loss_w_pose,
            )

        ground_conf = None
        if "pose_ground" in loss_functions or "pose_ground2" in loss_functions:
            keys = jax.random.split(rng_key, b)

            def plane_of(key_i, d, g, K_i, hw):
                normal, _, _ = ground_plane_from_depth(key_i, d, K_i, g, valid_hw=hw)
                return normal

            if ground_maps is not None:
                normals = jax.vmap(plane_of)(keys, depth_maps, ground_maps, K_scaled, image_hw)
                has_ground = jnp.any(ground_maps > 0, axis=(1, 2))
                ground_conf = jnp.where(has_ground, 1.0, 0.1)
            else:
                normals = jax.vmap(lambda k2, d, K_i, hw: plane_of(k2, d, None, K_i, hw))(
                    keys, depth_maps, K_scaled, image_hw
                )
                ground_conf = jnp.full((b,), 0.1)
            normals_per = jnp.repeat(normals, f, axis=0)  # (N, 3)
            conf_per = jnp.repeat(ground_conf, f, axis=0)

            if "pose_ground" in loss_functions:
                pred_normal = poses[:, 1, :]
                cos = jnp.sum(normals_per * pred_normal, axis=-1) / (
                    jnp.maximum(jnp.linalg.norm(normals_per, axis=-1), 1e-8)
                    * jnp.maximum(jnp.linalg.norm(pred_normal, axis=-1), 1e-8)
                )
                per_loss["loss_normal_vec"] = (
                    (1.0 - jnp.abs(cos)) * conf_per, ch.loss_w_normal_vec,
                )
            else:
                ps_rot = normal_to_rotation(normals_per)
                rel = jnp.matmul(poses, jnp.swapaxes(ps_rot, -1, -2), precision="highest")
                cos = so3_rotation_angle(rel, cos_angle=True)
                per_loss["loss_normal_vec"] = ((1.0 - cos) * conf_per, ch.loss_w_normal_vec)

        if "z" in loss_functions:
            per_loss["loss_z"] = (
                z_search_loss(gt_boxes, centers, dims, poses, out["z"], out["Ks_per"], w, h),
                ch.loss_w_z,
            )

        if "z_pseudo_gt_patch" in loss_functions:
            # median depth inside the (clamped) projected box, subsampled 2x
            ds = depth_maps[:, ::2, ::2]
            img_idx = jnp.repeat(jnp.arange(b), f)
            boxes_cl = jnp.stack(
                [
                    jnp.clip(proj_boxes[:, 0], 0, w - 1),
                    jnp.clip(proj_boxes[:, 1], 0, h - 1),
                    jnp.clip(proj_boxes[:, 2], 0, w - 1),
                    jnp.clip(proj_boxes[:, 3], 0, h - 1),
                ],
                axis=1,
            )
            win, vm = _box_window_batch(ds, img_idx, boxes_cl / 2.0)
            gt_z = masked_quantile_batch(win.reshape(n, -1), vm.reshape(n, -1), 0.5)
            per_loss["loss_pseudo_gt_z"] = (
                smooth_l1(out["z"], jax.lax.stop_gradient(gt_z)), ch.loss_w_z,
            )
        elif "z_pseudo_gt_center" in loss_functions:
            img_idx = jnp.repeat(jnp.arange(b), f)
            x = jnp.clip(out["xy"][:, 0], 10, w - 11).astype(jnp.int32)
            y = jnp.clip(out["xy"][:, 1], 10, h - 11).astype(jnp.int32)
            gt_z = depth_maps[img_idx, y, x]
            per_loss["loss_pseudo_gt_z"] = (
                smooth_l1(out["z"], jax.lax.stop_gradient(gt_z)), ch.loss_w_z,
            )

        if "dims" in loss_functions:
            zsc = jnp.abs(dims - out["prior_dims_mean"]) / jnp.maximum(out["prior_dims_std"], 1e-6)
            zsc = jnp.maximum(zsc - 1.0, 0.0)
            per_loss["loss_dims_w"] = (zsc[:, 0], ch.loss_w_dims)
            per_loss["loss_dims_h"] = (zsc[:, 1], ch.loss_w_dims)
            per_loss["loss_dims_l"] = (zsc[:, 2], ch.loss_w_dims)

        # the depth loss only ever samples s x s windows of the GT masks, so
        # materialize the full (N, Hm, Wm) per-ROI mask gather only for the
        # segmentation loss, which consumes whole planes
        if "segmentation" in loss_functions and gt_masks is not None:
            img_idx = jnp.repeat(jnp.arange(b), f)
            masks_per = gt_masks[img_idx, sampled.gt_index.reshape(-1)].astype(jnp.float32)  # (N, Hm, Wm)
            hm, wm = masks_per.shape[1:]
            sub = h / hm  # mask canvas subsampling factor

            # rematerialized: the hull planes (N, Hm, Wm) and their VJP
            # intermediates dominate the weak step's backward residency
            # (DESIGN 9i: +4.6 ms in-model vs 1.6 standalone); recomputing
            # the corners->hull chain in the backward trades those bytes
            # for cheap FLOPs with bit-identical loss and gradients
            @jax.checkpoint
            def _seg_loss(centers_, dims_, poses_, ks_, masks_):
                box6 = jnp.concatenate([centers_, dims_], axis=-1)
                corners = project_points(ks_, cuboid_verts(box6, poses_))[..., :2]
                cx = jnp.clip(corners[..., 0], 0, w - 1) / sub
                cy = jnp.clip(corners[..., 1], 0, h - 1) / sub
                hulls = jax.vmap(lambda pts: convex_hull_mask(pts, hm, wm))(
                    jnp.stack([cx, cy], axis=-1)
                )  # (N, Hm, Wm)
                # reference quirk kept: focal loss with (inputs=gt mask,
                # targets=hull fill) — roi_heads.py:1052
                return sigmoid_focal_loss(masks_, hulls).mean(axis=(1, 2))

            seg = _seg_loss(centers, dims, poses, out["Ks_per"], masks_per)
            per_loss["loss_seg"] = (seg, ch.loss_w_seg)

        if "depth" in loss_functions:
            corner_z = cuboid_verts(jnp.concatenate([centers, dims], -1), poses)[..., 2]
            pred_range = corner_z.max(-1) - corner_z.min(-1)
            ds = depth_maps[:, ::2, ::2]
            img_idx = jnp.repeat(jnp.arange(b), f)
            dwin, dvm = _box_window_batch(ds, img_idx, gt_boxes / 2.0)
            if gt_masks is not None:
                # sample depth + instance mask on the same window grid
                # inside the GT box; quantiles restricted to mask==1
                hm, wm = gt_masks.shape[2:]
                mask_scale = jnp.asarray([wm / w, hm / h, wm / w, hm / h])
                mwin, _ = _box_window_batch_masks(
                    gt_masks, img_idx, sampled.gt_index.reshape(-1),
                    gt_boxes * mask_scale[None, :],
                )
                sel = (mwin.astype(jnp.float32) > 0.5) & dvm
            else:
                sel = dvm
            sel2 = sel.reshape(n, -1)
            dwin2 = dwin.reshape(n, -1)
            q9, q1 = masked_quantile_batch(dwin2, sel2, 0.9, 0.1)
            gt_range = jnp.where(jnp.any(sel2, axis=-1), q9 - q1, 0.0)
            per_loss["loss_depth"] = (
                smooth_l1(jax.lax.stop_gradient(gt_range), pred_range), ch.loss_w_depth,
            )

        # ---- reporting + uncertainty scaling + reduction -----------------
        total_report = 0.0
        for name, (vals, wgt) in per_loss.items():
            total_report = total_report + jax.lax.stop_gradient(vals) * wgt
        metrics["Cube/total_3D_loss"] = safely_reduce_losses(total_report, fg) * ch.loss_w_3d

        gt_2d = sampled.gt_boxes3d.reshape(-1, 9)[:, :2]
        gt_z_true = sampled.gt_boxes3d.reshape(-1, 9)[:, 2]
        gt_dims = sampled.gt_boxes3d.reshape(-1, 9)[:, 3:6]
        metrics["Cube/z_error"] = safely_reduce_losses(jnp.abs(out["z"] - gt_z_true), fg)
        metrics["Cube/dims_error"] = safely_reduce_losses(jnp.abs(dims - gt_dims).mean(-1), fg)
        metrics["Cube/xy_error"] = safely_reduce_losses(jnp.abs(out["xy"] - gt_2d).mean(-1), fg)
        metrics["Cube/2D IoU"] = safely_reduce_losses(
            matched_pairwise_iou(gt_boxes, proj_boxes), fg
        )

        uncert_sf = None
        if ch.use_confidence > 0 and out["uncert"] is not None:
            uncert_sf = SQRT_2_CONSTANT * jnp.exp(-out["uncert"])
            losses["Cube/uncert"] = ch.use_confidence * safely_reduce_losses(out["uncert"], fg)
            metrics["Cube/conf"] = safely_reduce_losses(jnp.exp(-out["uncert"]), fg)

        for name, (vals, wgt) in per_loss.items():
            if uncert_sf is not None:
                vals = vals * uncert_sf
            losses[f"Cube/{name}"] = safely_reduce_losses(vals, fg) * wgt * ch.loss_w_3d

        return losses, metrics

    def __call__(
        self,
        features,
        proposals,
        K,
        im_scale_ratio,
        image_hw,
        gt=None,
        train: bool = False,
        depth_maps=None,
        ground_maps=None,
    ):
        c = self.cfg
        ch = c.model.roi_cube_head
        if not train:
            return super().__call__(
                features, proposals, K, im_scale_ratio, image_hw, gt=gt, train=False
            )

        Ks_scaled = scale_Ks(K, im_scale_ratio)
        if ch.virtual_depth:
            focal = K[:, 1, 1]
            im_h_net = image_hw[:, 0].astype(jnp.float32)
            v2r = compute_virtual_scale_from_focal_spaces(
                focal, im_h_net * im_scale_ratio, ch.virtual_focal, im_h_net
            )
        else:
            v2r = jnp.ones_like(im_scale_ratio)

        key = self.make_rng("sampling")
        k_sample, k_weak = jax.random.split(key)
        sampled = self.label_and_sample(k_sample, proposals, gt)
        # pool once for both branches (see roi_heads3d.__call__: the cube
        # branch's fg-prefix pool is an exact slice of the box branch's)
        res_box = c.model.roi_box_head.pooler_resolution
        reuse_pool = ch.scale_roi_boxes <= 0 and ch.pooler_resolution == res_box
        pooled_all = self._pool(features, sampled.boxes, res_box)
        losses, pred_boxes = self.box_branch_train(features, sampled, pooled=pooled_all)
        metrics = {
            "roi/num_fg": sampled.fg.sum() / sampled.fg.shape[0],
            "roi/num_bg": (sampled.valid & ~sampled.fg).sum() / sampled.fg.shape[0],
        }
        if ch.loss_w_3d > 0:
            F = int(c.shapes.roi_batch * c.model.roi_heads.positive_fraction)
            prefix = jax.tree.map(lambda x: x[:, :F], sampled)
            out = self.cube_forward(
                features, prefix.boxes, prefix.classes, Ks_scaled, v2r,
                pooled=pooled_all[:, :F] if reuse_pool else None,
            )
            weak_losses, weak_metrics = self.weak_cube_losses(
                out, prefix, gt.masks, depth_maps, ground_maps, Ks_scaled, image_hw, k_weak
            )
            losses.update(weak_losses)
            metrics.update(weak_metrics)
        return losses, metrics
