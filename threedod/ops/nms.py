"""Fixed-size jittable NMS (hard greedy suppression with masks).

Replaces Detectron2's CUDA ``batched_nms`` (reference fast_rcnn.py:105,
rcnn3d.py:225, roi_heads.py:183). The greedy scan runs as a fori_loop over
score-sorted candidates with a precomputed IoU matrix — O(N^2) memory but
static shapes, so it compiles once and runs entirely on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.boxes2d import pairwise_iou


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS keep-mask in the *given* order space.

    boxes (N, 4), scores (N,); returns keep (N,) bool. Invalid entries are
    never kept. N is static; sort + scan happen on device.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    sorted_boxes = boxes[order]
    sorted_valid = valid[order]

    iou = pairwise_iou(sorted_boxes, sorted_boxes)  # (N, N)
    suppress_src = iou > iou_threshold

    def body(i, keep):
        # candidate i survives if valid and not suppressed by any kept j < i
        earlier = jnp.arange(n) < i
        suppressed = jnp.any(keep & earlier & suppress_src[:, i])
        return keep.at[i].set(sorted_valid[i] & ~suppressed)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    # scatter back to original order
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Class/level-wise NMS via the coordinate-offset trick (d2 parity)."""
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), bool)
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = idxs.astype(boxes.dtype) * (max_coord * 2.0)
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold, valid)


def topk_by_mask(scores: jnp.ndarray, keep: jnp.ndarray, k: int):
    """Top-k indices among kept entries; invalid slots padded (returns valid mask)."""
    masked = jnp.where(keep, scores, -jnp.inf)
    vals, idx = jax.lax.top_k(masked, k)
    return idx, jnp.isfinite(vals)
