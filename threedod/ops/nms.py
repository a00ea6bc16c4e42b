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


def _pack_bits(mask: jnp.ndarray) -> jnp.ndarray:
    """Pack a (..., W*32) bool mask into (..., W) uint32 words (bit k of
    word w = element w*32+k)."""
    w = mask.shape[-1] // 32
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    words = mask.reshape(*mask.shape[:-1], w, 32).astype(jnp.uint32) * weights
    return words.sum(-1, dtype=jnp.uint32)


def _nms_core(boxes, scores, iou_threshold, valid):
    """Shared greedy-NMS fixpoint in score-sorted space.

    Returns (order, sorted_boxes, sorted_key, keep_sorted) where
    sorted_key = descending sort of `where(valid, scores, -inf)` (equal to
    the true score on every valid — hence every kept — entry).

    The suppression matrix is materialized ONCE as bitpacked uint32 words
    ((N, N/32), 32x smaller than the pred matrix and ~32x smaller than the
    f32 matmul form XLA otherwise rematerializes into every fixpoint
    round); each Jacobi round is then a word-AND + any-reduce over the
    packed words. Bit-identical to the unpacked recursion
    `keep <- valid & ~any(sup & keep)` — only the storage changed.
    """
    n = boxes.shape[0]
    key = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-key)
    sorted_key = key[order]
    sorted_boxes = boxes[order]
    sorted_valid = valid[order]

    # pad the word axis BEFORE building the matrix: padding the (N, 4)
    # boxes/valid costs bytes, padding the (N, N) pred matrix afterwards
    # materializes a full extra copy (~0.5 ms/step at train RPN shapes)
    npad = -(-n // 32) * 32
    if npad != n:
        boxes_j = jnp.pad(sorted_boxes, ((0, npad - n), (0, 0)))
        valid_j = jnp.pad(sorted_valid, (0, npad - n))
    else:
        boxes_j, valid_j = sorted_boxes, sorted_valid

    iou = pairwise_iou(sorted_boxes, boxes_j)  # (N, NPAD)
    # sup[i, j]: candidate j (earlier in score order, valid) can suppress i
    earlier = jnp.arange(npad)[None, :] < jnp.arange(n)[:, None]
    sup = (iou > iou_threshold) & earlier & valid_j[None, :]
    # barrier: keep the one-time pack from being fused (and the IoU matrix
    # from being recomputed) inside the while body
    supw = jax.lax.optimization_barrier(_pack_bits(sup))  # (N, W) uint32

    def cond(carry):
        keep, prev, first = carry
        return first | jnp.any(keep != prev)

    def body(carry):
        keep, _, _ = carry
        kpad = jnp.pad(keep, (0, npad - n)) if npad != n else keep
        kw = _pack_bits(kpad)  # (W,)
        hit = jnp.any((supw & kw[None, :]) != 0, axis=-1)
        new = sorted_valid & ~hit
        return new, keep, jnp.zeros((), bool)

    keep_sorted, _, _ = jax.lax.while_loop(
        cond, body, (sorted_valid, sorted_valid, jnp.ones((), bool))
    )
    return order, sorted_boxes, sorted_key, keep_sorted


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy NMS keep-mask in the *given* order space.

    boxes (N, 4), scores (N,); returns keep (N,) bool. Invalid entries are
    never kept. N is static; sort + fixpoint rounds happen on device.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    order, _, _, keep_sorted = _nms_core(boxes, scores, iou_threshold, valid)
    # scatter back to original order
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def nms_sorted(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float, valid: jnp.ndarray | None = None):
    """Greedy NMS returning (sorted_boxes, sorted_key, keep_sorted) in
    score-DESCENDING space, skipping the scatter back to caller order.

    For callers that only take a top-k over the kept set, selecting in
    sorted space is exactly equivalent to selecting in the original order
    (and saves the keep-scatter, ~0.7 ms/step at RPN shapes): among
    equal-valued entries the stable argsort orders ranks by original
    index, so top-k's index tie-break picks the same winners in the same
    output order either way. sorted_key equals the true score on every
    kept entry (-inf on invalid/padded ones).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    _, sorted_boxes, sorted_key, keep_sorted = _nms_core(boxes, scores, iou_threshold, valid)
    return sorted_boxes, sorted_key, keep_sorted


def nms_mask_blocked(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
    block: int = 256,
) -> jnp.ndarray:
    """Exact greedy NMS keep-mask, blocked over the score order.

    Same semantics as :func:`nms_mask` (equivalence-tested). Different
    schedule: the whole-array Jacobi fixpoint re-reads a materialized
    (N, N) suppression matrix every round (~R x N^2 bytes of HBM traffic);
    this version walks score-ordered blocks of `block` candidates. Earlier
    blocks are FINAL when a block is processed, so each block needs one
    (block, <=N) cross-suppression pass against kept-so-far plus a tiny
    (block, block) in-block fixpoint — total one N^2 IoU evaluation with
    no materialized full matrix, independent of chain length.

    Measured on v5e (40 instances x N=2000, bit-identical results):
    standalone with heavily clustered boxes 8.1 -> 5.9 ms/call; but
    IN-MODEL (rpn.predict_proposals, clustered score maps) the delta is
    zero within relay noise — the fixpoint there is matrix-build bound,
    not chain bound. Per the two-stage shipping gate the RPN call-site
    keeps the simpler fixpoint; use this variant where candidate sets are
    larger or peak memory matters (no (N, N) f32 IoU materialized).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    if n <= block:
        return nms_mask(boxes, scores, iou_threshold, valid=valid)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    sorted_boxes = boxes[order]
    sorted_valid = valid[order]
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        sorted_boxes = jnp.pad(sorted_boxes, ((0, pad), (0, 0)))
        sorted_valid = jnp.pad(sorted_valid, (0, pad))
    npad = nb * block
    pos = jnp.arange(npad)

    def body(i, keep):
        start = i * block
        blk = jax.lax.dynamic_slice(sorted_boxes, (start, 0), (block, 4))
        blk_valid = jax.lax.dynamic_slice(sorted_valid, (start,), (block,))
        # suppression by kept boxes from earlier (final) blocks
        iou_prior = pairwise_iou(blk, sorted_boxes)  # (block, npad)
        earlier_kept = keep & (pos < start)
        alive = blk_valid & ~jnp.any(
            (iou_prior > iou_threshold) & earlier_kept[None, :], axis=1
        )
        # in-block greedy: small fixpoint on the (block, block) submatrix
        iou_blk = jax.lax.dynamic_slice(iou_prior, (0, start), (block, block))
        tri = jnp.arange(block)[None, :] < jnp.arange(block)[:, None]
        sup = (iou_blk > iou_threshold) & tri & alive[None, :]

        def cond(c):
            k, prev, first = c
            return first | jnp.any(k != prev)

        def step(c):
            k, _, _ = c
            return alive & ~jnp.any(sup & k[None, :], axis=1), k, jnp.zeros((), bool)

        kb, _, _ = jax.lax.while_loop(cond, step, (alive, alive, jnp.ones((), bool)))
        return jax.lax.dynamic_update_slice(keep, kb, (start,))

    keep_sorted = jax.lax.fori_loop(0, nb, body, jnp.zeros((npad,), bool))[:n]
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


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
