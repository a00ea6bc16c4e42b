"""Omni3D AP evaluation (2D + 3D), COCOeval-compatible, dependency-free.

Parity target: cubercnn/evaluation/omni3d_evaluation.py —
  Omni3DParams (:1020-1086): 2D IoU thresholds .5:.05:.95, 3D thresholds
    .05:.05:.50, depth-based "area" ranges all/near/medium/far
    [0,1e5]/[0,10]/[10,35]/[35,1e5],
  Omni3Deval.evaluate/evaluateImg (:1369-1562): greedy matcher with ignore
    handling, mergesort tie-breaking, and proximity evaluation for
    non-exhaustively annotated datasets (2D IoU > 0.3 neighbourhood),
  accumulate (:1174-1311): precision[T,R,K,A,M] with cummax PR interpolation,
  summarize (:1564-1706): AP, AP@15/25/50, AP near/medium/far, AR.

pycocotools is not available in this environment; the COCO index, the 2D
IoU matrix (maskUtils.iou semantics) and the full accumulation logic are
implemented in numpy. 3D IoU runs on-device through the framework's
polyhedral-clipping kernel (threedod.geometry.iou3d).
"""
from __future__ import annotations

import datetime
import logging
import time
from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

# safeguard mirroring the reference MAX_DTS_CROSS_GTS_FOR_IOU3D
MAX_PAIRS_DEVICE_IOU3D = 2_000_000

# native eval core (C++, native/evalc.cpp) — role parity with pycocotools'
# C extensions; built by `python native/setup.py`, optional at runtime.
try:
    from . import _evalc  # type: ignore

    HAS_NATIVE_EVAL = True
except ImportError:  # pragma: no cover - depends on local build
    from ..utils.native_build import ensure_native_built

    ensure_native_built()
    try:
        from . import _evalc  # type: ignore

        HAS_NATIVE_EVAL = True
    except ImportError:
        _evalc = None
        HAS_NATIVE_EVAL = False


def iou_2d_xywh(dts: np.ndarray, gts: np.ndarray, iscrowd=None) -> np.ndarray:
    """maskUtils.iou parity for XYWH boxes: (D, 4) x (G, 4) -> (D, G)."""
    if len(dts) == 0 or len(gts) == 0:
        return np.zeros((len(dts), len(gts)))
    if _evalc is not None and iscrowd is None:
        return _evalc.iou2d(
            np.ascontiguousarray(dts, np.float64), np.ascontiguousarray(gts, np.float64)
        )
    d = np.asarray(dts, np.float64)
    g = np.asarray(gts, np.float64)
    if iscrowd is None:
        iscrowd = np.zeros(len(g), bool)
    else:
        iscrowd = np.asarray(iscrowd, bool)
    x1 = np.maximum(d[:, None, 0], g[None, :, 0])
    y1 = np.maximum(d[:, None, 1], g[None, :, 1])
    x2 = np.minimum(d[:, None, 0] + d[:, None, 2], g[None, :, 0] + g[None, :, 2])
    y2 = np.minimum(d[:, None, 1] + d[:, None, 3], g[None, :, 1] + g[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_d = (d[:, 2] * d[:, 3])[:, None]
    area_g = (g[:, 2] * g[:, 3])[None, :]
    union = np.where(iscrowd[None, :], area_d, area_d + area_g - inter)
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


_IOU3D_FN = None
_IOU3D_PAIRS_FN = None
# Chunk re-probed in r4 after the lane-dense clip kernel landed: warm
# steady-state 3D evaluate is identical at 2048 and 8192 (7.09 vs 7.13 s
# on 2000 images), and the first-EVER compile is load-noise either way
# (probe: 14 s at 8192 vs 156 s at 2048 on a quiet box; live eval: 95 s
# at 2048 vs 249 s at 8192 under load) — always one-time, covered by the
# persistent cache. 2048 stays (status quo). Historical r3 note (the old
# vmapped kernel): compile was super-linear (2048 ->
# ~2-5 s total, 4096 -> ~12 s, 8192 -> ~25 s compile + 95 s first exec).
# Steady-state cost of the smaller chunk is ~44 vs 34 us/pair — +0.4 s on
# a 2k-image dataset — while the first 3D eval in a fresh process drops
# from ~2 min to seconds (VERDICT r2 #5; tools/bench_eval_compile.py).
_IOU3D_CHUNK = 2048


def iou_3d_pairs_chunked(d_pairs: np.ndarray, g_pairs: np.ndarray) -> np.ndarray:
    """Element-wise IoU3D over (P, 8, 3) pair arrays, in fixed-size chunks.

    One jit compile total (the chunk shape is static; the tail is padded
    with zero boxes, which the kernel scores 0), a handful of device
    dispatches for an entire dataset — vs one ragged-shape compile + round
    trip per (image, category) block in the naive path.
    """
    global _IOU3D_PAIRS_FN
    if _IOU3D_PAIRS_FN is None:
        import jax

        from ..geometry.iou3d import iou3d_pairs

        _IOU3D_PAIRS_FN = jax.jit(lambda a, b: iou3d_pairs(a, b)[1])
    n = d_pairs.shape[0]
    out = np.empty((n,), np.float32)
    for s in range(0, n, _IOU3D_CHUNK):
        e = min(s + _IOU3D_CHUNK, n)
        a, b = d_pairs[s:e], g_pairs[s:e]
        if e - s < _IOU3D_CHUNK:
            pad = np.zeros((_IOU3D_CHUNK - (e - s), 8, 3), np.float32)
            a = np.concatenate([a, pad])
            b = np.concatenate([b, pad])
        out[s:e] = np.asarray(_IOU3D_PAIRS_FN(a, b))[: e - s]
    return out


def iou_3d_corners(d_corners: np.ndarray, g_corners: np.ndarray) -> np.ndarray:
    """(D, 8, 3) x (G, 8, 3) -> IoU3D matrix via the device kernel.

    Mirrors the reference's guarded box3d_overlap (omni3d_evaluation.py:
    65-166): degenerate (zero-volume / non-finite) boxes score 0 without
    poisoning the batch.
    """
    global _IOU3D_FN
    if len(d_corners) == 0 or len(g_corners) == 0:
        return np.zeros((len(d_corners), len(g_corners)))
    if _IOU3D_FN is None:
        import jax

        from ..geometry.iou3d import box3d_overlap

        _IOU3D_FN = jax.jit(lambda a, b: box3d_overlap(a, b)[1])
    d = np.asarray(d_corners, np.float32)
    g = np.asarray(g_corners, np.float32)
    bad_d = ~np.isfinite(d).all(axis=(1, 2))
    bad_g = ~np.isfinite(g).all(axis=(1, 2))
    d = np.where(bad_d[:, None, None], 0.0, d)
    g = np.where(bad_g[:, None, None], 0.0, g)
    out = np.array(_IOU3D_FN(d, g))  # copy: jax buffers are read-only
    out[bad_d, :] = 0.0
    out[:, bad_g] = 0.0
    return out


class Omni3DParams:
    """Evaluation parameters (reference omni3d_evaluation.py:1020-1086)."""

    def __init__(self, mode: str = "2D"):
        self.imgIds: list = []
        self.catIds: list = []
        self.recThrs = np.linspace(0.0, 1.00, 101, endpoint=True)
        self.maxDets = [1, 10, 100]
        if mode == "2D":
            self.iouThrs = np.linspace(0.5, 0.95, 10, endpoint=True)
            self.areaRng = [[0, 1e10], [0, 32**2], [32**2, 96**2], [96**2, 1e10]]
            self.areaRngLbl = ["all", "small", "medium", "large"]
        elif mode == "3D":
            self.iouThrs = np.linspace(0.05, 0.5, 10, endpoint=True)
            self.areaRng = [[0, 1e5], [0, 10], [10, 35], [35, 1e5]]
            self.areaRngLbl = ["all", "near", "medium", "far"]
        else:
            raise ValueError(f"mode {mode} not supported")
        self.useCats = 1
        self.mode = mode
        self.proximity_thresh = 0.3


class Omni3DEval:
    """COCOeval-compatible evaluator over plain gt/dt record lists.

    gts: list of dicts with keys {id, image_id, category_id, bbox (XYWH),
      area, depth, ignore2D, ignore3D, bbox3D (8x3 corners)}.
    dts: list of dicts with keys {image_id, category_id, bbox (XYWH), score,
      depth, area, bbox3D}.
    """

    def __init__(self, gts: List[dict], dts: List[dict], mode: str = "2D", eval_prox: bool = False):
        self.mode = mode
        self.eval_prox = eval_prox
        self.params = Omni3DParams(mode)
        self._raw_gts = gts
        self._raw_dts = dts

        self.params.imgIds = sorted({g["image_id"] for g in gts} | {d["image_id"] for d in dts})
        self.params.catIds = sorted({g["category_id"] for g in gts})

        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for i, g in enumerate(gts):
            g.setdefault("id", i + 1)
            g.setdefault("ignore2D", g.get("ignore", False))
            g.setdefault("ignore3D", g.get("ignore", False))
            self._gts[g["image_id"], g["category_id"]].append(g)
        for i, d in enumerate(dts):
            d.setdefault("id", i + 1)
            if "area" not in d:
                d["area"] = d["bbox"][2] * d["bbox"][3]
            self._dts[d["image_id"], d["category_id"]].append(d)

        self.evalImgs: list = []
        self._iou3d_cache: Dict[tuple, np.ndarray] = {}
        self.eval: dict = {}
        self.stats: np.ndarray = np.array([])
        self.evals_per_cat_area: Optional[dict] = None

    # ------------------------------------------------------------------
    def computeIoU(self, imgId, catId):
        p = self.params
        gt = self._gts[imgId, catId]
        dt = self._dts[imgId, catId]
        if len(gt) == 0 and len(dt) == 0:
            return [], None

        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds][: p.maxDets[-1]]

        if self.mode == "2D":
            ious = iou_2d_xywh([d["bbox"] for d in dt], [g["bbox"] for g in gt])
        elif len(dt) > 0 and len(gt) > 0:
            cached = self._iou3d_cache.get((imgId, catId))
            if cached is not None:
                ious = cached
            else:
                ious = iou_3d_corners(
                    np.asarray([d["bbox3D"] for d in dt]),
                    np.asarray([g["bbox3D"] for g in gt]),
                )
        else:
            ious = []

        in_prox = None
        if self.eval_prox:
            ious2d = iou_2d_xywh([d["bbox"] for d in dt], [g["bbox"] for g in gt])
            in_prox = ious2d > p.proximity_thresh if not isinstance(ious2d, list) else []
        return ious, in_prox

    def evaluateImg(self, imgId, catId, aRng, maxDet):
        p = self.params
        gt = self._gts[imgId, catId]
        dt = self._dts[imgId, catId]
        if len(gt) == 0 and len(dt) == 0:
            return None

        flag_range = "area" if self.mode == "2D" else "depth"
        flag_ignore = "ignore2D" if self.mode == "2D" else "ignore3D"

        for g in gt:
            g["_ignore"] = int(
                bool(g[flag_ignore]) or g[flag_range] < aRng[0] or g[flag_range] > aRng[1]
            )

        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[:maxDet]]

        ious_full, in_prox_full = self.ious[imgId, catId]
        ious = ious_full[:, gtind] if len(ious_full) > 0 else ious_full
        if self.eval_prox:
            in_prox = in_prox_full[:, gtind] if len(in_prox_full) > 0 else in_prox_full

        T = len(p.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))

        if len(ious) != 0:
            if _evalc is not None:
                prox_arg = (
                    np.ascontiguousarray(in_prox, np.uint8) if self.eval_prox else None
                )
                dtm, gtm, dtIg8 = _evalc.greedy_match(
                    np.ascontiguousarray(ious, np.float64),
                    np.ascontiguousarray(p.iouThrs, np.float64),
                    np.ascontiguousarray(gtIg, np.int64),
                    prox_arg,
                    np.ascontiguousarray([g["id"] for g in gt], np.int64),
                    np.ascontiguousarray([d["id"] for d in dt], np.int64),
                )
                dtIg = dtIg8.astype(np.float64)
            else:
                for tind, t in enumerate(p.iouThrs):
                    for dind, d in enumerate(dt):
                        iou = min(t, 1 - 1e-10)
                        m = -1
                        for gind in range(G):
                            if self.eval_prox and not in_prox[dind, gind]:
                                continue
                            if gtm[tind, gind] > 0:
                                continue
                            if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                                break
                            if ious[dind, gind] < iou:
                                continue
                            iou = ious[dind, gind]
                            m = gind
                        if m == -1:
                            continue
                        dtIg[tind, dind] = gtIg[m]
                        dtm[tind, dind] = gt[m]["id"]
                        gtm[tind, m] = d["id"]

        a = np.array(
            [d[flag_range] < aRng[0] or d[flag_range] > aRng[1] for d in dt]
        ).reshape((1, D))
        dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        if self.eval_prox and len(in_prox) > 0:
            dt_far = in_prox.any(1) == 0
            dtIg = np.logical_or(dtIg, np.repeat(dt_far.reshape((1, D)), T, 0))

        return {
            "image_id": imgId,
            "category_id": catId,
            "aRng": aRng,
            "maxDet": maxDet,
            "dtIds": [d["id"] for d in dt],
            "gtIds": [g["id"] for g in gt],
            "dtMatches": dtm,
            "gtMatches": gtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    def _precompute_ious_3d(self):
        """Batch every (image, category) IoU3D block into chunked pairwise
        device calls (see iou_3d_pairs_chunked). Produces values identical
        to per-block box3d_overlap: that path is itself iou3d_pairs over
        the same repeat/tile pair ordering."""
        p = self.params
        blocks, d_list, g_list = [], [], []
        for imgId in p.imgIds:
            for catId in p.catIds:
                gt = self._gts[imgId, catId]
                dt = self._dts[imgId, catId]
                if not gt or not dt:
                    continue
                inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
                dt = [dt[i] for i in inds][: p.maxDets[-1]]
                dc = np.asarray([d["bbox3D"] for d in dt], np.float32)
                gc = np.asarray([g["bbox3D"] for g in gt], np.float32)
                blocks.append(((imgId, catId), len(dt), len(gt)))
                d_list.append(np.repeat(dc, len(gt), axis=0))
                g_list.append(np.tile(gc, (len(dt), 1, 1)))
        if not blocks:
            return
        d_pairs = np.concatenate(d_list)
        g_pairs = np.concatenate(g_list)
        # degenerate guard, same semantics as iou_3d_corners: any pair
        # touching a non-finite box scores 0
        bad = ~(
            np.isfinite(d_pairs).all(axis=(1, 2)) & np.isfinite(g_pairs).all(axis=(1, 2))
        )
        d_pairs[bad] = 0.0
        g_pairs[bad] = 0.0
        iou = iou_3d_pairs_chunked(d_pairs, g_pairs)
        iou[bad] = 0.0
        off = 0
        for key, nd, ng in blocks:
            self._iou3d_cache[key] = iou[off : off + nd * ng].reshape(nd, ng)
            off += nd * ng

    def evaluate(self):
        tic = time.time()
        p = self.params
        self._iou3d_cache: Dict[tuple, np.ndarray] = {}
        if self.mode == "3D":
            self._precompute_ious_3d()
        self.ious = {
            (imgId, catId): self.computeIoU(imgId, catId)
            for imgId in p.imgIds
            for catId in p.catIds
        }
        maxDet = p.maxDets[-1]
        self.evalImgs = [
            self.evaluateImg(imgId, catId, areaRng, maxDet)
            for catId in p.catIds
            for areaRng in p.areaRng
            for imgId in p.imgIds
        ]
        self._paramsEval = p
        logger.info("evaluate() DONE (t=%.2fs).", time.time() - tic)

    # ------------------------------------------------------------------
    def accumulate(self, p=None):
        assert self.evalImgs, "run evaluate() first"
        if p is None:
            p = self.params
        p.catIds = p.catIds if p.useCats == 1 else [-1]
        T, R, K, A, M = (
            len(p.iouThrs), len(p.recThrs), len(p.catIds), len(p.areaRng), len(p.maxDets),
        )
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        scores = -np.ones((T, R, K, A, M))

        _pe = self._paramsEval
        I0 = len(_pe.imgIds)
        A0 = len(_pe.areaRng)
        setK = set(_pe.catIds)
        setA = set(map(tuple, _pe.areaRng))
        setM = set(_pe.maxDets)
        setI = set(_pe.imgIds)
        catid_list = [k for k in p.catIds if k in setK]
        k_list = [n for n, k in enumerate(p.catIds) if k in setK]
        m_list = [m for m in p.maxDets if m in setM]
        a_list = [n for n, a in enumerate(map(tuple, p.areaRng)) if a in setA]
        i_list = [n for n, i in enumerate(p.imgIds) if i in setI]

        has_pre = self.evals_per_cat_area is not None
        evals_per_cat_area = self.evals_per_cat_area if has_pre else {}

        for k, (k0, catId) in enumerate(zip(k_list, catid_list)):
            Nk = k0 * A0 * I0
            for a, a0 in enumerate(a_list):
                Na = a0 * I0
                if has_pre:
                    E = evals_per_cat_area[(catId, a)]
                else:
                    E = [self.evalImgs[Nk + Na + i] for i in i_list]
                    E = [e for e in E if e is not None]
                    evals_per_cat_area[(catId, a)] = E
                if len(E) == 0:
                    continue
                for m, maxDet in enumerate(m_list):
                    dtScores = np.concatenate([e["dtScores"][:maxDet] for e in E])
                    inds = np.argsort(-dtScores, kind="mergesort")
                    dtScoresSorted = dtScores[inds]
                    dtm = np.concatenate([e["dtMatches"][:, :maxDet] for e in E], axis=1)[:, inds]
                    dtIg = np.concatenate([e["dtIgnore"][:, :maxDet] for e in E], axis=1)[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(np.logical_not(dtm), np.logical_not(dtIg))
                    tp_sum = np.cumsum(tps, axis=1).astype(float)
                    fp_sum = np.cumsum(fps, axis=1).astype(float)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        ss = np.zeros((R,))
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        pr = pr.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds_r = np.searchsorted(rc, p.recThrs, side="left")
                        for ri, pi in enumerate(inds_r):
                            if pi < nd:
                                q[ri] = pr[pi]
                                ss[ri] = dtScoresSorted[pi]
                        precision[t, :, k, a, m] = np.array(q)
                        scores[t, :, k, a, m] = np.array(ss)

        self.evals_per_cat_area = evals_per_cat_area
        self.eval = {
            "params": p,
            "counts": [T, R, K, A, M],
            "date": datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
            "precision": precision,
            "recall": recall,
            "scores": scores,
        }

    # ------------------------------------------------------------------
    def _summarize(self, ap=1, iouThr=None, areaRng="all", maxDets=100):
        p = self.params
        aind = [i for i, a in enumerate(p.areaRngLbl) if a == areaRng]
        mind = [i for i, m in enumerate(p.maxDets) if m == maxDets]
        if ap == 1:
            s = self.eval["precision"]
            if iouThr is not None:
                t = np.where(np.isclose(iouThr, p.iouThrs))[0]
                s = s[t]
            s = s[:, :, :, aind, mind]
        else:
            s = self.eval["recall"]
            if iouThr is not None:
                t = np.where(np.isclose(iouThr, p.iouThrs))[0]
                s = s[t]
            s = s[:, :, aind, mind]
        if len(s[s > -1]) == 0:
            return -1.0
        return float(np.mean(s[s > -1]))

    def summarize(self):
        """stats vector; in 3D mode includes AP15/25/50 and near/med/far."""
        if not self.eval:
            raise RuntimeError("run accumulate() first")
        if self.mode == "2D":
            stats = np.zeros((12,))
            stats[0] = self._summarize(1)
            stats[1] = self._summarize(1, iouThr=0.5, maxDets=self.params.maxDets[2])
            stats[2] = self._summarize(1, iouThr=0.75, maxDets=self.params.maxDets[2])
            stats[3] = self._summarize(1, areaRng="small", maxDets=self.params.maxDets[2])
            stats[4] = self._summarize(1, areaRng="medium", maxDets=self.params.maxDets[2])
            stats[5] = self._summarize(1, areaRng="large", maxDets=self.params.maxDets[2])
            stats[6] = self._summarize(0, maxDets=self.params.maxDets[0])
            stats[7] = self._summarize(0, maxDets=self.params.maxDets[1])
            stats[8] = self._summarize(0, maxDets=self.params.maxDets[2])
            stats[9] = self._summarize(0, areaRng="small", maxDets=self.params.maxDets[2])
            stats[10] = self._summarize(0, areaRng="medium", maxDets=self.params.maxDets[2])
            stats[11] = self._summarize(0, areaRng="large", maxDets=self.params.maxDets[2])
        else:
            stats = np.zeros((12,))
            stats[0] = self._summarize(1)  # AP3D (mean over 0.05:0.05:0.50)
            stats[1] = self._summarize(1, iouThr=0.15, maxDets=self.params.maxDets[2])
            stats[2] = self._summarize(1, iouThr=0.25, maxDets=self.params.maxDets[2])
            stats[3] = self._summarize(1, iouThr=0.50, maxDets=self.params.maxDets[2])
            stats[4] = self._summarize(1, areaRng="near", maxDets=self.params.maxDets[2])
            stats[5] = self._summarize(1, areaRng="medium", maxDets=self.params.maxDets[2])
            stats[6] = self._summarize(1, areaRng="far", maxDets=self.params.maxDets[2])
            stats[7] = self._summarize(0, maxDets=self.params.maxDets[0])
            stats[8] = self._summarize(0, maxDets=self.params.maxDets[1])
            stats[9] = self._summarize(0, maxDets=self.params.maxDets[2])
            stats[10] = self._summarize(0, areaRng="near", maxDets=self.params.maxDets[2])
            stats[11] = self._summarize(0, areaRng="far", maxDets=self.params.maxDets[2])
        self.stats = stats
        return stats

    def per_category_ap(self) -> Dict[int, float]:
        """AP per category id (mean over IoU thresholds, area 'all')."""
        out = {}
        prec = self.eval["precision"]
        for k, cat in enumerate(self.params.catIds):
            s = prec[:, :, k, 0, -1]
            out[cat] = float(np.mean(s[s > -1])) if (s > -1).any() else -1.0
        return out
