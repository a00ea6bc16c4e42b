"""Brute-force, from-first-principles AP calculator used ONLY to certify
`omni3d_eval.Omni3DEval`'s COCOeval transcription (reference semantics:
cubercnn/evaluation/omni3d_evaluation.py:1369-1562 evaluateImg, :1174-1311
accumulate). This module intentionally shares NO matching or accumulation
code with the production evaluator: the greedy matcher is written as an
explicit two-pass candidate scan and the PR interpolation as a direct
"best precision at recall >= r" maximisation, so a transcription bug in
either implementation shows up as a disagreement.

The 2D IoU is computed locally; the 3D IoU backend (polyhedral clipping) is
shared — it is certified separately by golden values and Monte-Carlo tests
(tests/test_iou3d.py), and an independent IoU would decouple the comparison
from the thing under test (matcher/accumulator semantics).

Semantics replicated (independently derived from the COCO definition plus
the Omni3D extensions):
  * gt ignore = ignore flag OR range (area in 2D, depth in 3D) outside the
    bucket; matching prefers any non-ignored gt over every ignored one.
  * greedy per-detection matching in score order; candidate needs
    IoU >= threshold; among candidates the highest IoU wins, equal IoUs go
    to the later gt (matching the reference's scan order).
  * matched-to-ignored, out-of-range-unmatched, and (proximity mode)
    no-gt-in-proximity detections are ignored, not false positives.
  * matching always runs with the largest maxDets; smaller maxDets truncate
    each image's detection list only at accumulation time.
  * detections pool across images in sorted(image_id) order with a stable
    descending-score sort (tie order matters and must match).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from .omni3d_eval import iou_3d_corners


class _Params:
    """Thresholds restated independently from the reference definition
    (omni3d_evaluation.py:1020-1086), NOT imported from omni3d_eval."""

    def __init__(self, mode: str):
        # The threshold GRIDS use np.linspace like COCOeval because the
        # reference's exact float values are part of the spec:
        # np.linspace(0, 1, 101)[70] == 0.7000000000000001, so a recall
        # plateau at exactly 7/10 falls BELOW the 0.70 threshold — an
        # `i/100.0` grid (exactly 0.7) disagrees by a whole precision cell
        # on tie-heavy cases (caught by the round-5 bulk certifier, seed
        # 423). Everything else here stays independently restated.
        self.recThrs = list(np.linspace(0.0, 1.00, 101, endpoint=True))
        self.maxDets = [1, 10, 100]
        self.proximity_thresh = 0.3
        if mode == "2D":
            self.iouThrs = list(np.linspace(0.5, 0.95, 10, endpoint=True))
            self.areaRng = [[0, 1e10], [0, 1024], [1024, 9216], [9216, 1e10]]
        else:
            self.iouThrs = list(np.linspace(0.05, 0.5, 10, endpoint=True))
            self.areaRng = [[0, 1e5], [0, 10], [10, 35], [35, 1e5]]


def _iou2d(d: np.ndarray, g: np.ndarray) -> np.ndarray:
    """Plain XYWH IoU, written independently of omni3d_eval.iou_2d_xywh."""
    out = np.zeros((len(d), len(g)))
    for i, (dx, dy, dw, dh) in enumerate(d):
        for j, (gx, gy, gw, gh) in enumerate(g):
            ix = max(0.0, min(dx + dw, gx + gw) - max(dx, gx))
            iy = max(0.0, min(dy + dh, gy + gh) - max(dy, gy))
            inter = ix * iy
            union = dw * dh + gw * gh - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def _match_image(dt, gt, iou, in_prox, thr, arng, mode):
    """Greedy matching for one (image, category, area-range, threshold).

    Returns (dt_tp, dt_ignore, n_gt_counted): booleans per detection and the
    number of gts that count toward recall.
    """
    rng_key = "area" if mode == "2D" else "depth"
    ig_key = "ignore2D" if mode == "2D" else "ignore3D"
    g_ig = [
        bool(g.get(ig_key, g.get("ignore", False)))
        or g[rng_key] < arng[0]
        or g[rng_key] > arng[1]
        for g in gt
    ]
    eff_thr = min(thr, 1.0 - 1e-10)

    taken = [False] * len(gt)
    match_of = [-1] * len(dt)
    for i in range(len(dt)):
        if in_prox is not None and len(gt) and not in_prox[i].any():
            continue  # will be ignored below anyway; cannot match out of prox
        best, best_iou = -1, eff_thr
        # pass 1: only non-ignored gts may win outright
        for j in range(len(gt)):
            if g_ig[j] or taken[j]:
                continue
            if in_prox is not None and not in_prox[i, j]:
                continue
            if iou[i, j] >= best_iou:
                best, best_iou = j, iou[i, j]
        if best == -1:
            # pass 2: fall back to ignored gts
            best_iou = eff_thr
            for j in range(len(gt)):
                if not g_ig[j] or taken[j]:
                    continue
                if in_prox is not None and not in_prox[i, j]:
                    continue
                if iou[i, j] >= best_iou:
                    best, best_iou = j, iou[i, j]
        if best >= 0:
            taken[best] = True
            match_of[i] = best

    dt_tp, dt_ig = [], []
    for i, d in enumerate(dt):
        m = match_of[i]
        if m >= 0:
            ig = g_ig[m]
            tp = not ig
        else:
            tp = False
            ig = d[rng_key] < arng[0] or d[rng_key] > arng[1]
        if in_prox is not None and (len(gt) == 0 or not in_prox[i].any()):
            ig = True
            tp = False
        dt_tp.append(tp)
        dt_ig.append(ig)
    n_counted = sum(1 for f in g_ig if not f)
    return dt_tp, dt_ig, n_counted


def bruteforce_eval(
    gts: List[dict], dts: List[dict], mode: str = "2D", eval_prox: bool = False
) -> Dict[str, np.ndarray]:
    """Full precision[T,R,K,A,M] / recall[T,K,A,M] tables plus the stats
    vector, shaped exactly like Omni3DEval's, computed the slow way."""
    p = _Params(mode)
    img_ids = sorted({g["image_id"] for g in gts} | {d["image_id"] for d in dts})
    cat_ids = sorted({g["category_id"] for g in gts})
    T, R = len(p.iouThrs), len(p.recThrs)
    K, A, M = len(cat_ids), len(p.areaRng), len(p.maxDets)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))

    for d in dts:
        if "area" not in d:
            d["area"] = d["bbox"][2] * d["bbox"][3]

    for k, cat in enumerate(cat_ids):
        # per-image sorted+truncated detections and IoUs for this category
        per_img = {}
        for img in img_ids:
            gt = [g for g in gts if g["image_id"] == img and g["category_id"] == cat]
            dt = [d for d in dts if d["image_id"] == img and d["category_id"] == cat]
            order = sorted(range(len(dt)), key=lambda i: -dt[i]["score"])
            dt = [dt[i] for i in order][: p.maxDets[-1]]
            if mode == "2D":
                iou = _iou2d(
                    np.array([d["bbox"] for d in dt], float).reshape(-1, 4),
                    np.array([g["bbox"] for g in gt], float).reshape(-1, 4),
                )
            elif len(dt) and len(gt):
                iou = np.asarray(
                    iou_3d_corners(
                        np.asarray([d["bbox3D"] for d in dt]),
                        np.asarray([g["bbox3D"] for g in gt]),
                    )
                )
            else:
                iou = np.zeros((len(dt), len(gt)))
            prox = None
            if eval_prox:
                prox = (
                    _iou2d(
                        np.array([d["bbox"] for d in dt], float).reshape(-1, 4),
                        np.array([g["bbox"] for g in gt], float).reshape(-1, 4),
                    )
                    > p.proximity_thresh
                )
            per_img[img] = (dt, gt, iou, prox)

        for a, arng in enumerate(p.areaRng):
            for t, thr in enumerate(p.iouThrs):
                # matching at the full maxDets; truncate later per maxDet
                pooled = []  # (score, tp, ig) per image in img-id order
                npig = 0
                any_img = False
                for img in img_ids:
                    dt, gt, iou, prox = per_img[img]
                    if not dt and not gt:
                        continue
                    any_img = True
                    tp, ig, ng = _match_image(dt, gt, iou, prox, thr, arng, mode)
                    npig += ng
                    pooled.append(([d["score"] for d in dt], tp, ig))
                if not any_img or npig == 0:
                    continue
                for m, maxdet in enumerate(p.maxDets):
                    scores, tps, igs = [], [], []
                    for sc, tp, ig in pooled:
                        scores += sc[:maxdet]
                        tps += tp[:maxdet]
                        igs += ig[:maxdet]
                    order = sorted(range(len(scores)), key=lambda i: -scores[i])
                    seq = [(tps[i], igs[i]) for i in order]
                    rc, pr = [], []
                    n_tp = n_fp = 0
                    for tp, ig in seq:
                        if ig:
                            continue
                        n_tp += int(tp)
                        n_fp += int(not tp)
                        rc.append(n_tp / npig)
                        pr.append(n_tp / (n_tp + n_fp))
                    recall[t, k, a, m] = rc[-1] if rc else 0.0
                    for ri, r in enumerate(p.recThrs):
                        best = 0.0
                        for j in range(len(rc)):
                            if rc[j] >= r and pr[j] > best:
                                best = pr[j]
                        precision[t, ri, k, a, m] = best

    def _mean(s):
        s = s[s > -1]
        return float(s.mean()) if s.size else -1.0

    def _ap(ti=None, a=0, m=M - 1):
        s = precision if ti is None else precision[ti : ti + 1]
        return _mean(s[:, :, :, a, m])

    def _ar(maxd_i, a=0):
        return _mean(recall[:, :, a, maxd_i])

    stats = np.zeros((12,))
    thr_idx = {round(v, 2): i for i, v in enumerate(p.iouThrs)}
    if mode == "2D":
        stats[0] = _ap()
        stats[1] = _ap(thr_idx[0.5])
        stats[2] = _ap(thr_idx[0.75])
        stats[3:6] = [_ap(a=i) for i in (1, 2, 3)]
        stats[6:9] = [_ar(i) for i in (0, 1, 2)]
        stats[9:12] = [_ar(M - 1, a=i) for i in (1, 2, 3)]
    else:
        stats[0] = _ap()
        stats[1] = _ap(thr_idx[0.15])
        stats[2] = _ap(thr_idx[0.25])
        stats[3] = _ap(thr_idx[0.5])
        stats[4:7] = [_ap(a=i) for i in (1, 2, 3)]
        stats[7:10] = [_ar(i) for i in (0, 1, 2)]
        stats[10] = _ar(M - 1, a=1)
        stats[11] = _ar(M - 1, a=3)
    return {"precision": precision, "recall": recall, "stats": stats}
