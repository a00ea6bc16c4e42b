"""Fixed-size jittable NMS (hard greedy suppression with masks).

Replaces Detectron2's CUDA ``batched_nms`` (reference fast_rcnn.py:105,
rcnn3d.py:225, roi_heads.py:183). TPU re-design: the greedy recursion
  keep[i] = valid[i] and not any(keep[j] for j < i with IoU(i, j) > t)
has a unique solution (well-founded on the score order), so instead of an
N-step sequential scan — ~26 us of loop overhead per step on TPU, ~130 ms
per forward at N=1000 x 5 levels — it is solved by Jacobi fixpoint
iteration: whole-vector rounds of `keep <- valid & ~any(sup & keep)` until
stable. Each round is one fused VPU pass over the (N, N) suppression
matrix; rounds needed = the longest suppression chain (typically < 16,
never more than N). Exactness is guaranteed by the fixpoint check, not by
an iteration budget.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.boxes2d import pairwise_iou


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS keep-mask in the *given* order space.

    boxes (N, 4), scores (N,); returns keep (N,) bool. Invalid entries are
    never kept. N is static; sort + fixpoint rounds happen on device.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    sorted_boxes = boxes[order]
    sorted_valid = valid[order]

    iou = pairwise_iou(sorted_boxes, sorted_boxes)  # (N, N)
    # sup[i, j]: candidate j (earlier in score order, valid) can suppress i
    earlier = jnp.arange(n)[None, :] < jnp.arange(n)[:, None]
    sup = (iou > iou_threshold) & earlier & sorted_valid[None, :]

    def cond(carry):
        keep, prev, first = carry
        return first | jnp.any(keep != prev)

    def body(carry):
        keep, _, _ = carry
        new = sorted_valid & ~jnp.any(sup & keep[None, :], axis=1)
        return new, keep, jnp.zeros((), bool)

    keep_sorted, _, _ = jax.lax.while_loop(
        cond, body, (sorted_valid, sorted_valid, jnp.ones((), bool))
    )
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
