"""Proposal/anchor <-> GT matching and IoU-weighted subsampling.

Parity targets:
  detectron2 Matcher with allow_low_quality_matches (RPN) as configured by
  the reference (rpn.py:43-110),
  subsample_labels with `torch.multinomial(matched_ious + eps)` IoU-weighted
  sampling (reference rpn.py:275-328) — reproduced exactly-in-distribution
  with the Gumbel top-k trick (weighted sampling without replacement), which
  is static-shape and fully on-device.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.boxes2d import box_area, pairwise_intersection, pairwise_ioa, pairwise_iou
from .order_stats import top_take_mask


class MatchResult(NamedTuple):
    matched_idxs: jnp.ndarray  # (R,) best gt index per candidate
    matched_labels: jnp.ndarray  # (R,) -1 ignore / 0 bg / 1 fg
    matched_ious: jnp.ndarray  # (R,) iou with matched gt
    forced: jnp.ndarray = None  # (R,) candidate is some gt's argmax anchor
    #                             (set when allow_low_quality; saves callers
    #                             recomputing the IoU matrix for force-keep)


def match_candidates(
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    candidates: jnp.ndarray,
    bg_thresh: float,
    fg_thresh: float,
    allow_low_quality: bool = False,
    iou: jnp.ndarray | None = None,
) -> MatchResult:
    """Match candidates (R, 4) against padded GT (M, 4).

    Labels: iou < bg_thresh -> 0; bg_thresh <= iou < fg_thresh -> -1;
    iou >= fg_thresh -> 1. With allow_low_quality, each gt's argmax anchor is
    forced fg (d2 RPN semantics). A precomputed (M, R) IoU matrix may be
    passed in (match_and_ignore shares one intersection matrix between the
    matcher and the ignore-region test).
    """
    if iou is None:
        iou = pairwise_iou(gt_boxes, candidates)  # (M, R)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)

    matched_ious = iou.max(axis=0)
    matched_idxs = iou.argmax(axis=0)

    labels = jnp.where(matched_ious >= fg_thresh, 1, jnp.where(matched_ious < bg_thresh, 0, -1))

    forced = jnp.zeros(candidates.shape[0], bool)
    if allow_low_quality:
        # for each valid gt, its best candidate(s) become fg
        best_per_gt = iou.max(axis=1, keepdims=True)  # (M, 1)
        is_best = (iou >= best_per_gt) & gt_valid[:, None] & (best_per_gt > 0)
        forced = jnp.any(is_best, axis=0)
        labels = jnp.where(forced, 1, labels)

    # no gt at all -> everything bg
    any_gt = jnp.any(gt_valid)
    labels = jnp.where(any_gt, labels, 0)
    matched_ious = jnp.where(any_gt, jnp.maximum(matched_ious, 0.0), 0.0)
    return MatchResult(matched_idxs, labels, matched_ious, forced)


def best_candidate_mask(gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray, candidates: jnp.ndarray) -> jnp.ndarray:
    """(R,) bool: candidate is the argmax-IoU anchor of some valid GT.

    Parity: reference rpn.py:71-84 — these anchors are force-kept as fg even
    after subsampling.
    """
    iou = pairwise_iou(gt_boxes, candidates)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    best = iou.max(axis=1, keepdims=True)
    is_best = (iou >= best) & gt_valid[:, None] & (best > 0)
    return jnp.any(is_best, axis=0)


def apply_ignore_regions(
    labels: jnp.ndarray,
    candidates: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_is_ignore: jnp.ndarray,
    ignore_thresh: float,
) -> jnp.ndarray:
    """Background candidates inside ignore regions -> label -1.

    Parity: rpn.py:93-105 / roi_heads.py:2796-2808 (pairwise_ioa >= thresh).
    """
    any_ign = jnp.any(gt_is_ignore)
    ioa = pairwise_ioa(gt_boxes, candidates)  # fraction of candidate inside gt
    ioa = jnp.where(gt_is_ignore[:, None], ioa, 0.0)
    in_ignore = ioa.max(axis=0) >= ignore_thresh
    return jnp.where(any_ign & in_ignore & (labels == 0), -1, labels)


def match_and_ignore(
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    gt_is_ignore: jnp.ndarray,
    candidates: jnp.ndarray,
    bg_thresh: float,
    fg_thresh: float,
    ignore_thresh: float,
    allow_low_quality: bool = False,
):
    """Fused matcher + ignore-region test over ONE (M, R) intersection matrix.

    match_candidates and apply_ignore_regions each built their own (M, R)
    intersection against the same candidate set (at RPN anchor counts
    ~85k x 8 images that is the label path's dominant traffic —
    tools/measure_rpn.py: 2.6 + 1.2 ms/step standalone). The IoU (valid GT)
    and IoA (ignore GT) views share the intersection areas, so computing it
    once is exact and saves a full broadcast min/max/mul pass.

    Returns (MatchResult, in_ignore (R,) bool). Callers apply the ignore
    mask AFTER subsampling, matching the reference order (rpn.py:93-105):
    ``labels = where(in_ignore & (labels == 0), -1, labels)``.
    """
    inter = pairwise_intersection(gt_boxes, candidates)  # (M, R)
    a_gt = box_area(gt_boxes)[:, None]
    a_cand = box_area(candidates)[None, :]
    union = a_gt + a_cand - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
    m = match_candidates(
        gt_boxes, gt_valid, candidates, bg_thresh, fg_thresh,
        allow_low_quality=allow_low_quality, iou=iou,
    )
    ioa = jnp.where(a_cand > 0, inter / jnp.maximum(a_cand, 1e-12), 0.0)
    ioa = jnp.where(gt_is_ignore[:, None], ioa, 0.0)
    in_ignore = jnp.any(gt_is_ignore) & (ioa.max(axis=0) >= ignore_thresh)
    return m, in_ignore


def weighted_topk_sample(key: jax.Array, weights: jnp.ndarray, mask: jnp.ndarray, k: int):
    """k-sample without replacement ~ weights (Gumbel top-k; exact).

    Returns (indices (k,), picked_valid (k,)). Entries with mask False are
    never picked; if fewer than k are available, the tail is marked invalid.
    """
    g = jax.random.gumbel(key, weights.shape)
    keys = jnp.where(mask, jnp.log(jnp.maximum(weights, 1e-20)) + g, -jnp.inf)
    vals, idx = jax.lax.top_k(keys, k)
    return idx, jnp.isfinite(vals)


def subsample_fg_bg(
    key: jax.Array,
    labels: jnp.ndarray,
    matched_ious: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    eps: float = 1e-4,
):
    """IoU-weighted fg/bg subsampling with static output size.

    Returns (indices (num_samples,), is_fg (num_samples,), valid
    (num_samples,)). Selected fg always occupy the leading slots, so
    downstream fg-only heads can slice a static prefix.

    Distributional parity with reference subsample_labels (rpn.py:275-328):
    both fg and bg are drawn without replacement with probability
    proportional to matched_iou + eps.
    """
    r = labels.shape[0]
    k_fg_max = int(num_samples * positive_fraction)
    kf, kb = jax.random.split(key)

    is_fg = labels == 1
    is_bg = labels == 0
    w = matched_ious + eps

    # "rank among fg < take" == "key >= take-th largest fg key": the
    # selected SET is identical, but the threshold comes from a 32-pass
    # radix bisection (ops/order_stats.py) instead of a double argsort —
    # at RPN anchor counts (~85k) the four full SortOps this replaces were
    # the single largest cost of the whole train-step forward (~13 ms/step
    # measured on v5e; see docs/DESIGN.md 9e).
    g_fg = jax.random.gumbel(kf, (r,))
    fg_val = jnp.log(w) + g_fg
    fg_key = jnp.where(is_fg, fg_val, -jnp.inf)
    n_fg = jnp.sum(is_fg)
    fg_take = jnp.minimum(n_fg, k_fg_max)
    if k_fg_max > 0:
        fg_selected = top_take_mask(fg_val[None], is_fg[None], fg_take[None])[0]
    else:
        fg_selected = jnp.zeros((r,), bool)

    g_bg = jax.random.gumbel(kb, (r,))
    bg_val = jnp.log(w) + g_bg
    bg_key = jnp.where(is_bg, bg_val, -jnp.inf)
    bg_take = jnp.minimum(jnp.sum(is_bg), num_samples - fg_take)
    bg_selected = top_take_mask(bg_val[None], is_bg[None], bg_take[None])[0]

    # priority ordering: fg first (by key), then bg (by key)
    BIG = 1e9
    prio = jnp.where(fg_selected, BIG + fg_key, jnp.where(bg_selected, bg_key, -jnp.inf))
    vals, idx = jax.lax.top_k(prio, num_samples)
    valid = jnp.isfinite(vals)
    picked_fg = fg_selected[idx] & valid
    return idx, picked_fg, valid
