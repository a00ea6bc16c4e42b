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
    m = mask > 0.5
    any_pix = m.any()
    big = 1e9
    # Directional extremes of a pixel set lie on its convex hull, and every
    # hull vertex is a row-wise min-x or max-x pixel of its row — so the
    # angle sweep only needs the <=2H row-extreme candidates, not the full
    # (angles x H x W) rotated grid (identical extents, ~2500x less work).
    xs_row = jnp.arange(w, dtype=jnp.float32)[None, :]
    row_has = m.any(axis=1)  # (H,)
    xmin_row = jnp.where(m, xs_row, big).min(axis=1)
    xmax_row = jnp.where(m, xs_row, -big).max(axis=1)
    ys_row = jnp.arange(h, dtype=jnp.float32)
    cand_x = jnp.concatenate([xmin_row, xmax_row])  # (2H,)
    cand_y = jnp.concatenate([ys_row, ys_row])
    cand_ok = jnp.concatenate([row_has, row_has])
    thetas = jnp.linspace(0.0, jnp.pi / 2, num_angles, endpoint=False)
    c, s = jnp.cos(thetas), jnp.sin(thetas)
    # rotated coordinates u = x cosθ + y sinθ, v = -x sinθ + y cosθ
    u = cand_x[None, :] * c[:, None] + cand_y[None, :] * s[:, None]  # (A, 2H)
    v = -cand_x[None, :] * s[:, None] + cand_y[None, :] * c[:, None]
    u_min = jnp.where(cand_ok[None], u, big).min(axis=1)
    u_max = jnp.where(cand_ok[None], u, -big).max(axis=1)
    v_min = jnp.where(cand_ok[None], v, big).min(axis=1)
    v_max = jnp.where(cand_ok[None], v, -big).max(axis=1)
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


def hull_row_intervals(corners: jnp.ndarray, height: int):
    """Per-row pixel interval of a convex hull's hard rasterisation.

    corners (P2, 2) -> (lo, hi, feasible) each (height,): the hull covers
    pixel centers x in [lo, hi] on row y (empty when hi < lo or not
    feasible). Hard half-plane semantics (pixel center inside iff
    cross(edge, p - v1) >= 0 for every CCW hull edge) — the same fill rule
    as cv2.fillPoly up to boundary rounding, which is what the reference's
    score_segmentation uses (scorefunction.py:88-106).

    A convex polygon intersects each scan row in one interval, so the
    (H x W x edges) rasterisation collapses to (H x edges) bound
    arithmetic — the propose-and-score segmentation stage drops ~100x in
    compute.
    """
    from ..geometry.hull import convex_hull_order

    hull = convex_hull_order(corners)
    v1 = hull
    e = jnp.roll(hull, -1, axis=0) - hull  # CCW edges; interior: s >= 0
    ys = jnp.arange(height, dtype=corners.dtype)  # (H,)
    # s(x, y) = e_x (y - v1_y) - e_y (x - v1_x) >= 0
    num = e[:, 0, None] * (ys[None, :] - v1[:, 1, None])  # (E, H)
    base = v1[:, 0, None] + num / jnp.where(e[:, 1, None] == 0, 1.0, e[:, 1, None])
    big = jnp.asarray(1e9, corners.dtype)
    degenerate = (jnp.sum(e * e, axis=1) < 1e-12)[:, None]
    upper = jnp.where((e[:, 1, None] > 0) & ~degenerate, base, big)
    lower = jnp.where((e[:, 1, None] < 0) & ~degenerate, base, -big)
    feas = jnp.all(
        jnp.where((e[:, 1, None] == 0) & ~degenerate, num >= 0, True), axis=0
    )  # horizontal edges constrain the row, not x
    lo = jnp.ceil(jnp.max(lower, axis=0))
    hi = jnp.floor(jnp.min(upper, axis=0))
    return lo, hi, feas


def _seg_inter_union(segmentation_mask: jnp.ndarray, bube_corners: jnp.ndarray, sub: int):
    """(intersection, union, bube-empty) pixel counts of the hard hull fill
    vs the mask on the `sub`-subsampled grid, via row intervals + per-row
    prefix sums — no (P, H, W) rasterisation."""
    h, w = segmentation_mask.shape
    hs, ws = h // sub, w // sub
    seg = segmentation_mask[::sub, ::sub] > 0.5
    n_seg = jnp.sum(seg)
    # per-row prefix sums, P[r, k] = number of seg pixels in cols [0, k)
    pref = jnp.concatenate(
        [jnp.zeros((hs, 1), jnp.int32), jnp.cumsum(seg.astype(jnp.int32), axis=1)],
        axis=1,
    )  # (hs, ws+1)

    def one(corners):
        lo, hi, feas = hull_row_intervals(corners / sub, hs)
        loc = jnp.clip(lo, 0, ws).astype(jnp.int32)
        hic = jnp.clip(hi + 1, 0, ws).astype(jnp.int32)
        n_row = jnp.where(feas, jnp.maximum(hic - loc, 0), 0)
        rows = jnp.arange(hs)
        inter_row = pref[rows, jnp.where(feas, hic, 0)] - pref[rows, jnp.where(feas, loc, 0)]
        inter = jnp.sum(jnp.where(feas & (hic > loc), inter_row, 0))
        n_bube = jnp.sum(n_row)
        return inter, n_seg + n_bube - inter, n_bube == 0

    return jax.vmap(one)(bube_corners)


def score_segmentation(segmentation_mask: jnp.ndarray, bube_corners: jnp.ndarray, sub: int = 4) -> jnp.ndarray:
    """Hull-fill mask IoU at 4x subsample. (H, W), (P, 8, 2) -> (P,)."""
    inter, union, empty = _seg_inter_union(segmentation_mask, bube_corners, sub)
    return jnp.where((inter == 0) | empty, 0.0, inter / jnp.maximum(union, 1))


def score_mod_segmentation(segmentation_mask: jnp.ndarray, bube_corners: jnp.ndarray, sub: int = 4) -> jnp.ndarray:
    """intersection^5 / union variant (reference :108-126)."""
    inter, union, empty = _seg_inter_union(segmentation_mask, bube_corners, sub)
    inter = inter.astype(jnp.float32)
    return jnp.where((inter == 0) | empty, 0.0, inter**5 / jnp.maximum(union.astype(jnp.float32), 1))


def score_segmentation_pair(segmentation_mask: jnp.ndarray, bube_corners: jnp.ndarray, sub: int = 4):
    """(score_segmentation, score_mod_segmentation) from ONE interval pass."""
    inter, union, empty = _seg_inter_union(segmentation_mask, bube_corners, sub)
    dead = (inter == 0) | empty
    safe_u = jnp.maximum(union, 1)
    iou = jnp.where(dead, 0.0, inter / safe_u)
    mod = jnp.where(dead, 0.0, inter.astype(jnp.float32) ** 5 / safe_u.astype(jnp.float32))
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
