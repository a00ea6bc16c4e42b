"""ROIHeadsBoxer / BoxNet: the propose-and-score detection system.

Parity target: cubercnn/modeling/roi_heads/roi_heads.py:79-660
(ROIHeads_Boxer) + meta_arch BoxNet (rcnn3d.py:594-892):
  * per-image point cloud from the depth map (every 5th pixel), RANSAC
    ground plane + wall-vs-floor normal disambiguation (:345-428),
  * `predict_cubes` dispatch over the 7 proposal samplers (:283-302),
  * per-GT scoring (IoU2D, point-cloud density, segmentation IoU, mod-seg,
    dims prior, corner chamfer) and the combined score
    IoU2D * dims * corners (:524-541),
  * `accumulate_scores` = sort-by-score then cummax of IoU3D (:277-281),
  * 26 score-combination ablations for MABO (:552-578),
  * best-scoring cube per GT -> Instances / pseudo-GT output (:640-660).

TPU re-design: the reference loops over instances in Python and round-trips
CPU<->GPU per score; here one jitted program scores all
(instances x proposals) at once. Object masks are pluggable: SAM (on-device,
models/sam.py) or a 2D-box fill fallback.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.iou3d import iou3d_pairs
from ..geometry.plane import fit_plane_ransac
from ..proposals.proposals import propose_batch
from ..scoring.scorefunction import (
    score_corners,
    score_dimensions,
    score_iou,
    score_point_cloud,
    score_segmentation_pair,
)
from ..structures.cubes import Cubes

SCORE_NAMES = ("IoU2D", "seg", "dim", "combined", "random", "point_cloud", "seg_mod", "corner")

# the 26 MABO score-combination ablations (reference :552-578); each entry is
# a tuple of base-score names whose product forms the combination.
COMBINATION_DEFS = (
    ("IoU2D", "seg_mod"),
    ("IoU2D", "dim"),
    ("IoU2D", "corner"),
    ("IoU2D", "point_cloud"),
    ("IoU2D", "seg_mod", "dim"),
    ("IoU2D", "seg_mod", "corner"),
    ("IoU2D", "seg_mod", "point_cloud"),
    ("IoU2D", "dim", "corner"),
    ("IoU2D", "dim", "point_cloud"),
    ("IoU2D", "corner", "point_cloud"),
    ("IoU2D", "seg_mod", "point_cloud"),
    ("IoU2D", "seg_mod", "dim", "point_cloud"),
    ("IoU2D", "seg_mod", "corner", "point_cloud"),
    ("IoU2D", "dim", "corner", "point_cloud"),
    ("IoU2D", "seg_mod", "dim", "corner", "point_cloud"),
    ("seg_mod", "dim"),
    ("seg_mod", "corner"),
    ("seg_mod", "point_cloud"),
    ("seg_mod", "dim", "corner"),
    ("seg_mod", "dim", "point_cloud"),
    ("seg_mod", "corner", "point_cloud"),
    ("seg_mod", "dim", "corner", "point_cloud"),
    ("dim", "corner"),
    ("dim", "point_cloud"),
    ("dim", "corner", "point_cloud"),
    ("corner", "point_cloud"),
)


class BoxerOutput(NamedTuple):
    best_cubes: jnp.ndarray  # (N, 15)
    best_scores: jnp.ndarray  # (N,)
    best_boxes2d: jnp.ndarray  # (N, 4) projected 2D box of the best cube
    scores: dict  # name -> (N, P) raw scores
    iou3d: Optional[jnp.ndarray]  # (N, P) vs gt cubes when available
    cubes: Cubes  # all proposals (N, P, 15)
    normal: jnp.ndarray  # (3,) estimated ground normal


def disambiguate_ground_normal(normal: jnp.ndarray) -> jnp.ndarray:
    """Wall-vs-floor fixups (reference roi_heads.py:410-426).

    Camera coords: +y down. If the plane looks like a back wall (|n.z|
    dominant) rotate 90° about x; if a side wall (|n.x| dominant) rotate 90°
    about y; finally flip so n.y >= 0 (the reference convention).
    """
    nx, ny, nz = normal[0], normal[1], normal[2]
    is_back = jnp.abs(nz) > jnp.abs(ny)
    n1 = jnp.where(is_back, jnp.stack([nx, nz, -ny]), normal)
    nx, ny, nz = n1[0], n1[1], n1[2]
    is_side = jnp.abs(nx) > jnp.abs(ny)
    n2 = jnp.where(is_side, jnp.stack([-nz, nx, ny]), n1)
    return jnp.where(n2[1] < 0, -n2, n2)


def ground_plane_from_depth(
    key, depth_map: jnp.ndarray, K_scaled: jnp.ndarray, ground_map=None,
    stride: int = 5, thresh: float = 0.05, hypotheses: int = 1000,
    valid_hw=None,
):
    """Point cloud + RANSAC ground plane (reference :345-428).

    Returns (normal (3,), points (M, 3), points_valid (M,), no_ground_mask).
    """
    h, w = depth_map.shape
    ys = jnp.arange(0, h - (h % stride), stride)
    xs = jnp.arange(0, w - (w % stride), stride)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    z = depth_map[yy, xx]
    fx, fy = K_scaled[0, 0], K_scaled[1, 1]
    cx, cy = K_scaled[0, 2], K_scaled[1, 2]
    x3 = (xx - cx) * z / fx
    y3 = (yy - cy) * z / fy
    points = jnp.stack([x3.ravel(), y3.ravel(), z.ravel()], axis=-1)

    in_image = jnp.ones(points.shape[0], bool)
    if valid_hw is not None:
        in_image = ((yy < valid_hw[0]) & (xx < valid_hw[1])).ravel()
    pos_depth = z.ravel() > 1e-6

    if ground_map is not None:
        g = ground_map[yy, xx].ravel() > 0
        fit_mask = g & in_image & pos_depth
        no_ground = (~g) & in_image & pos_depth
    else:
        fit_mask = in_image & pos_depth
        no_ground = in_image & pos_depth

    eq, _ = fit_plane_ransac(points, key, thresh=thresh, num_hypotheses=hypotheses, valid_mask=fit_mask)
    normal = disambiguate_ground_normal(eq[:3])
    return normal, points, no_ground


def propose_and_score(
    key,
    proposal_function: str,
    boxes: jnp.ndarray,  # (N, 4) reference 2D boxes (network res)
    masks: jnp.ndarray,  # (N, H, W) instance masks
    prior_means: jnp.ndarray,  # (N, 3)
    prior_stds: jnp.ndarray,  # (N, 3)
    depth_map: jnp.ndarray,  # (H, W)
    K_scaled: jnp.ndarray,
    im_shape,  # (w, h) static python
    number_of_proposals: int = 1000,
    ground_map=None,
    gt_cubes: Optional[Cubes] = None,
    valid_hw=None,
    use_ground_normal: bool = True,
) -> BoxerOutput:
    """The full propose-and-score pipeline for one image, all instances."""
    k_plane, k_prop, k_rand = jax.random.split(key, 3)
    normal, points, pc_valid = ground_plane_from_depth(
        k_plane, depth_map, K_scaled, ground_map, valid_hw=valid_hw
    )

    cubes = propose_batch(
        k_prop, proposal_function, boxes, depth_map, prior_means, prior_stds,
        im_shape, K_scaled, number_of_proposals,
        ground_normal=normal if (use_ground_normal and proposal_function == "propose") else None,
    )
    n, p = cubes.num_instances, cubes.num_proposals

    bube = cubes.get_bube_corners(K_scaled, clamp=im_shape)  # (N, P, 8, 2)
    prop_boxes = jnp.stack(
        [
            bube[..., 0].min(-1), bube[..., 1].min(-1),
            bube[..., 0].max(-1), bube[..., 1].max(-1),
        ],
        axis=-1,
    )  # (N, P, 4)

    iou2d = jax.vmap(score_iou)(boxes, prop_boxes)
    pc = score_point_cloud(points, cubes, pc_valid).astype(jnp.float32)
    seg, seg_mod = jax.vmap(score_segmentation_pair)(masks, bube)
    corner = jax.vmap(score_corners)(masks, bube)
    dim = jax.vmap(score_dimensions)(prior_means, prior_stds, cubes.dimensions, boxes, prop_boxes)
    combined = iou2d * dim * corner
    rand = jax.random.uniform(k_rand, (n, p))

    scores = {
        "IoU2D": iou2d, "seg": seg, "dim": dim, "combined": combined,
        "random": rand, "point_cloud": pc, "seg_mod": seg_mod, "corner": corner,
    }

    iou3d = None
    if gt_cubes is not None:
        gt_corners = gt_cubes.get_all_corners()[:, 0]  # (N, 8, 3)
        prop_corners = cubes.get_all_corners()  # (N, P, 8, 3)
        _, iou3d = iou3d_pairs(
            jnp.repeat(gt_corners, p, axis=0), prop_corners.reshape(n * p, 8, 3)
        )
        iou3d = iou3d.reshape(n, p)

    best = jnp.argmax(combined, axis=1)  # (N,)
    rows = jnp.arange(n)
    return BoxerOutput(
        best_cubes=cubes.tensor[rows, best],
        best_scores=combined[rows, best],
        best_boxes2d=prop_boxes[rows, best],
        scores=scores,
        iou3d=iou3d,
        cubes=cubes,
        normal=normal,
    )


def box_fill_masks(boxes: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Fallback object masks: filled 2D boxes (SAM stand-in)."""
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    return (
        (xx >= boxes[:, 0, None, None]) & (xx <= boxes[:, 2, None, None])
        & (yy >= boxes[:, 1, None, None]) & (yy <= boxes[:, 3, None, None])
    ).astype(jnp.float32)


def accumulate_scores(scores: np.ndarray, iou3d: np.ndarray) -> np.ndarray:
    """Sort by score desc, cummax of IoU3D (reference :277-281). Host-side."""
    idx = np.argsort(scores)[::-1]
    return np.maximum.accumulate(iou3d[idx])


def mabo_statistics(scores: dict, iou3d: np.ndarray, valid: np.ndarray):
    """Per-score accumulated curves + the 26 combination ablations.

    scores: name -> (N, P) numpy; iou3d (N, P); valid (N,).
    Returns (curves: name -> (Nv, P), combinations (Nv, 26)).
    """
    scores = {k: np.asarray(v)[valid] for k, v in scores.items()}
    iou3d = np.asarray(iou3d)[valid]
    nv, p = iou3d.shape
    curves = {
        name: np.stack([accumulate_scores(s[i], iou3d[i]) for i in range(nv)])
        if nv else np.zeros((0, p))
        for name, s in scores.items()
    }
    combos = np.zeros((nv, len(COMBINATION_DEFS)))
    for ci, parts in enumerate(COMBINATION_DEFS):
        prod = np.ones((nv, p))
        for name in parts:
            prod = prod * scores[name]
        for i in range(nv):
            combos[i, ci] = accumulate_scores(prod[i], iou3d[i])[0]
    return curves, combos
