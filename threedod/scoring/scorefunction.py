"""Cube scoring functions — fully vectorised over (instances x proposals).

Parity target: ProposalNetwork/scoring/scorefunction.py:
  score_point_cloud (:9-43)  AABB point counts,
  score_iou (:47)            2D IoU vs reference box,
  score_corners (:58-85)     chamfer of projected corners vs the mask's
                             min-area rectangle (cv2.minAreaRect -> here an
                             angle-sweep rotating rectangle, no OpenCV),
  score_segmentation (:88-106)   hull-fill mask IoU at 4x subsample,
  score_mod_segmentation (:108-126) intersection^5 / union,
  score_dimensions (:144-160) prior gaussian x aspect-ratio penalty,
  score_ratios (:164-169).

The reference scores each instance in a Python loop over 1000 cubes; here a
single vmapped program scores every (instance, proposal) pair at once — the
shape the TPU wants (SURVEY.md §7 design stance).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.boxes2d import matched_pairwise_iou
from ..geometry.hull import convex_hull_mask
from ..structures.cubes import Cubes


def score_point_cloud(point_cloud: jnp.ndarray, cubes: Cubes, pc_valid=None) -> jnp.ndarray:
    """Points inside each cube's AABB. point_cloud (M, 3) -> (N, P)."""
    verts = cubes.get_all_corners()  # (N, P, 8, 3)
    lo = verts.min(axis=2)  # (N, P, 3)
    hi = verts.max(axis=2)
    pc = point_cloud[None, None]  # (1, 1, M, 3)
    inside = jnp.all((pc > lo[..., None, :]) & (pc < hi[..., None, :]), axis=-1)
    if pc_valid is not None:
        inside = inside & pc_valid[None, None, :]
    return inside.sum(axis=-1)


def score_iou(gt_box: jnp.ndarray, proposal_boxes: jnp.ndarray) -> jnp.ndarray:
    """2D IoU of each proposal's projected box vs the reference box.

    gt_box (4,), proposal_boxes (P, 4) -> (P,).
    """
    return matched_pairwise_iou(jnp.broadcast_to(gt_box, proposal_boxes.shape), proposal_boxes)


def min_area_rect(mask: jnp.ndarray, num_angles: int = 90) -> jnp.ndarray:
    """Rotating min-area rectangle of a binary mask -> 4 corners (4, 2).

    cv2.minAreaRect replacement: sweep `num_angles` orientations in [0, 90°),
    take masked min/max extents of the rotated pixel coordinates, pick the
    angle with the smallest area, reconstruct corners analytically.
    """
    h, w = mask.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    m = mask > 0.5
    any_pix = m.any()
    thetas = jnp.linspace(0.0, jnp.pi / 2, num_angles, endpoint=False)
    c, s = jnp.cos(thetas), jnp.sin(thetas)
    # rotated coordinates u = x cosθ + y sinθ, v = -x sinθ + y cosθ
    u = xx[None] * c[:, None, None] + yy[None] * s[:, None, None]
    v = -xx[None] * s[:, None, None] + yy[None] * c[:, None, None]
    big = 1e9
    u_min = jnp.where(m[None], u, big).min(axis=(1, 2))
    u_max = jnp.where(m[None], u, -big).max(axis=(1, 2))
    v_min = jnp.where(m[None], v, big).min(axis=(1, 2))
    v_max = jnp.where(m[None], v, -big).max(axis=(1, 2))
    area = (u_max - u_min) * (v_max - v_min)
    i = jnp.argmin(area)
    ci, si = c[i], s[i]
    corners_uv = jnp.asarray(
        [
            [u_min[i], v_min[i]],
            [u_max[i], v_min[i]],
            [u_max[i], v_max[i]],
            [u_min[i], v_max[i]],
        ]
    )
    # rotate back: x = u cosθ - v sinθ, y = u sinθ + v cosθ
    corners = jnp.stack(
        [
            corners_uv[:, 0] * ci - corners_uv[:, 1] * si,
            corners_uv[:, 0] * si + corners_uv[:, 1] * ci,
        ],
        axis=1,
    )
    return jnp.where(any_pix, corners, jnp.zeros_like(corners))


def score_corners(segmentation_mask: jnp.ndarray, bube_corners: jnp.ndarray) -> jnp.ndarray:
    """Chamfer from the mask's min-area-rect corners to projected corners.

    segmentation_mask (H, W); bube_corners (P, 8, 2) -> (P,) in [0, 1].
    """
    rect = min_area_rect(segmentation_mask)  # (4, 2)
    # distance from each rect corner to nearest bube corner, averaged
    d = jnp.linalg.norm(rect[None, :, None, :] - bube_corners[:, None, :, :], axis=-1)
    scores = d.min(axis=-1).mean(axis=-1)  # (P,)
    max_score = jnp.maximum(scores.max(), 1e-9)
    return 1.0 - scores / max_score


def _bube_mask(corners: jnp.ndarray, h: int, w: int, sub: int = 4) -> jnp.ndarray:
    """Hard hull-fill of projected corners on a `sub`-subsampled grid."""
    return convex_hull_mask(corners / sub, h // sub, w // sub) > 0.5


def score_segmentation(segmentation_mask: jnp.ndarray, bube_corners: jnp.ndarray, sub: int = 4) -> jnp.ndarray:
    """Hull-fill mask IoU at 4x subsample. (H, W), (P, 8, 2) -> (P,)."""
    h, w = segmentation_mask.shape
    seg = segmentation_mask[::sub, ::sub] > 0.5

    def one(corners):
        bm = _bube_mask(corners, h, w, sub)
        inter = jnp.sum(seg & bm)
        union = jnp.sum(seg | bm)
        return jnp.where(inter == 0, 0.0, inter / jnp.maximum(union, 1))

    return jax.vmap(one)(bube_corners)


def score_mod_segmentation(segmentation_mask: jnp.ndarray, bube_corners: jnp.ndarray, sub: int = 4) -> jnp.ndarray:
    """intersection^5 / union variant (reference :108-126)."""
    h, w = segmentation_mask.shape
    seg = segmentation_mask[::sub, ::sub] > 0.5

    def one(corners):
        bm = _bube_mask(corners, h, w, sub)
        inter = jnp.sum(seg & bm).astype(jnp.float32)
        union = jnp.sum(seg | bm).astype(jnp.float32)
        return jnp.where(inter == 0, 0.0, inter**5 / jnp.maximum(union, 1))

    return jax.vmap(one)(bube_corners)


def score_segmentation_pair(segmentation_mask: jnp.ndarray, bube_corners: jnp.ndarray, sub: int = 4):
    """(score_segmentation, score_mod_segmentation) from ONE hull fill.

    The hull rasterization over P proposals dominates both scores; computing
    inter/union counts once halves the propose-and-score segmentation stage.
    """
    h, w = segmentation_mask.shape
    seg = segmentation_mask[::sub, ::sub] > 0.5

    def one(corners):
        bm = _bube_mask(corners, h, w, sub)
        return jnp.sum(seg & bm).astype(jnp.float32), jnp.sum(seg | bm).astype(jnp.float32)

    inter, union = jax.vmap(one)(bube_corners)
    safe_u = jnp.maximum(union, 1)
    iou = jnp.where(inter == 0, 0.0, inter / safe_u)
    mod = jnp.where(inter == 0, 0.0, inter**5 / safe_u)
    return iou, mod


def score_dimensions(prior_mean, prior_std, dimensions, gt_box, pred_boxes) -> jnp.ndarray:
    """Prior gaussian x 2D-aspect-ratio penalty (reference :144-160).

    dimensions (P, 3); gt_box (4,); pred_boxes (P, 4) -> (P,).
    """
    std = jnp.maximum(prior_std, 1e-6)
    dim_scores = jnp.exp(-0.5 * ((dimensions - prior_mean) / std) ** 2).mean(axis=1)
    gt_ratio = (gt_box[2] - gt_box[0]) / jnp.maximum(gt_box[3] - gt_box[1], 1e-6)
    pred_ratios = (pred_boxes[:, 2] - pred_boxes[:, 0]) / jnp.maximum(
        pred_boxes[:, 3] - pred_boxes[:, 1], 1e-6
    )
    diff = jnp.abs(gt_ratio - pred_ratios)
    max_diff = jnp.maximum(diff.max(), 1e-9)
    return (1.0 - diff / max_diff) * dim_scores


def score_ratios(gt_box, pred_boxes) -> jnp.ndarray:
    diff = jnp.abs(pred_boxes - gt_box[None]).sum(axis=1)
    return 1.0 - diff / jnp.maximum(diff.max(), 1e-9)


def combined_score(iou2d, dims, corners) -> jnp.ndarray:
    """The thesis' winning combination IoU2D * dims * corners
    (reference roi_heads.py:540, eval_boxes.py:264-265)."""
    return iou2d * dims * corners
