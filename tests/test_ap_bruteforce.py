"""Certification of the COCOeval transcription: Omni3DEval (production,
vectorised/native) vs ap_bruteforce (independent first-principles
implementation) must agree to 1e-6 on randomized fixtures covering ignores,
depth ranges, proximity mode, empty images, and tie-heavy score
distributions (reference semantics: omni3d_evaluation.py:1369-1562,
:1174-1311)."""
from __future__ import annotations

import copy

import numpy as np
import pytest

from threedod.evaluation.ap_bruteforce import bruteforce_eval
from threedod.evaluation.omni3d_eval import Omni3DEval


def _corners_from_cwh(cx, cy, cz, w, h, le):
    """Axis-aligned 8-corner box (both evaluators share the IoU backend, so
    any consistent corner ordering compares the matchers, not the IoU)."""
    sx, sy, sz = w / 2, h / 2, le / 2
    pts = []
    for dz in (-1, 1):
        for dy in (-1, 1):
            for dx in (-1, 1):
                pts.append([cx + dx * sx, cy + dy * sy, cz + dz * sz])
    return pts


def _edge_wh(rng):
    """Width/height whose product lands EXACTLY on a 2D area-range boundary
    (1024 / 9216): COCO range membership is inclusive on both ends, so a
    boundary value belongs to two buckets and any </<= slip in either
    implementation shows up."""
    if rng.rand() < 0.5:
        return (32.0, 32.0) if rng.rand() < 0.5 else (16.0, 64.0)
    return (96.0, 96.0) if rng.rand() < 0.5 else (48.0, 192.0)


def _edge_depth(rng):
    """Depth exactly on a 3D area-range boundary (10 / 35 meters)."""
    return 10.0 if rng.rand() < 0.5 else 35.0


def _random_case(rng, mode, eval_prox, tie_heavy, edge_heavy=False):
    n_imgs = rng.randint(1, 4)
    n_cats = rng.randint(1, 3)
    gts, dts = [], []
    gid = 0
    for img in range(n_imgs):
        for cat in range(1, n_cats + 1):
            for _ in range(rng.randint(0, 6)):
                x, y = rng.uniform(0, 80, 2)
                w, h = rng.uniform(5, 60, 2)
                depth = rng.uniform(0.5, 60)
                if edge_heavy and rng.rand() < 0.5:
                    w, h = _edge_wh(rng)
                if edge_heavy and rng.rand() < 0.5:
                    depth = _edge_depth(rng)
                gid += 1
                g = {
                    "id": gid,
                    "image_id": img,
                    "category_id": cat,
                    "bbox": [x, y, w, h],
                    "area": w * h,
                    "depth": depth,
                    "ignore2D": bool(rng.rand() < 0.25),
                    "ignore3D": bool(rng.rand() < 0.25),
                }
                if mode == "3D":
                    g["bbox3D"] = _corners_from_cwh(
                        x / 10, y / 10, depth, w / 10, h / 10, rng.uniform(0.5, 4)
                    )
                gts.append(g)
            for _ in range(rng.randint(0, 8)):
                # jittered copies of gt-like boxes + pure noise
                x, y = rng.uniform(0, 80, 2)
                w, h = rng.uniform(5, 60, 2)
                depth = rng.uniform(0.5, 60)
                if edge_heavy and rng.rand() < 0.5:
                    w, h = _edge_wh(rng)
                if edge_heavy and rng.rand() < 0.5:
                    depth = _edge_depth(rng)
                score = (
                    round(rng.rand() * 4) / 4.0 if tie_heavy else float(rng.rand())
                )
                d = {
                    "image_id": img,
                    "category_id": cat,
                    "bbox": [x, y, w, h],
                    "score": score,
                    "depth": depth,
                }
                if mode == "3D":
                    d["bbox3D"] = _corners_from_cwh(
                        x / 10, y / 10, depth, w / 10, h / 10, rng.uniform(0.5, 4)
                    )
                dts.append(d)
    # overlap injection: clone some gts as near-duplicate detections so
    # matching actually fires (incl. equal-IoU ties on exact duplicates)
    for g in gts:
        if rng.rand() < 0.6:
            d = {
                "image_id": g["image_id"],
                "category_id": g["category_id"],
                "bbox": [
                    g["bbox"][0] + rng.uniform(-2, 2),
                    g["bbox"][1] + rng.uniform(-2, 2),
                    g["bbox"][2] * rng.uniform(0.9, 1.1),
                    g["bbox"][3] * rng.uniform(0.9, 1.1),
                ],
                "score": round(rng.rand() * 4) / 4.0 if tie_heavy else float(rng.rand()),
                "depth": g["depth"] + rng.uniform(-1, 1),
            }
            if mode == "3D":
                d["bbox3D"] = (np.asarray(g["bbox3D"]) + rng.uniform(-0.2, 0.2, (1, 3))).tolist()
            dts.append(d)
        if rng.rand() < 0.3 and mode == "2D":
            # exact duplicate detection -> IoU tie between two dts and a gt
            dts.append(
                {
                    "image_id": g["image_id"],
                    "category_id": g["category_id"],
                    "bbox": list(g["bbox"]),
                    "score": round(rng.rand() * 4) / 4.0 if tie_heavy else float(rng.rand()),
                    "depth": g["depth"],
                }
            )
    if not gts:
        gts.append(
            {
                "id": 1,
                "image_id": 0,
                "category_id": 1,
                "bbox": [1.0, 1.0, 5.0, 5.0],
                "area": 25.0,
                "depth": 5.0,
                "ignore2D": False,
                "ignore3D": False,
                **({"bbox3D": _corners_from_cwh(0.1, 0.1, 5, 0.5, 0.5, 1)} if mode == "3D" else {}),
            }
        )
    return gts, dts


def _eval_once(gts, dts, mode, eval_prox):
    ev = Omni3DEval(copy.deepcopy(gts), copy.deepcopy(dts), mode=mode, eval_prox=eval_prox)
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    return ev, stats


def _run_both(gts, dts, mode, eval_prox):
    """Tri-way certification: production evaluator (native `_evalc` matcher
    when built) vs its pure-numpy fallback (BIT-equal required) vs the
    from-scratch brute-force oracle (1e-6)."""
    import threedod.evaluation.omni3d_eval as oe

    ev, stats = _eval_once(gts, dts, mode, eval_prox)
    if oe._evalc is not None:
        saved = oe._evalc
        try:
            oe._evalc = None
            ev_np, stats_np = _eval_once(gts, dts, mode, eval_prox)
        finally:
            oe._evalc = saved
        np.testing.assert_array_equal(
            ev.eval["precision"], ev_np.eval["precision"],
            err_msg=f"native/numpy matcher drift mode={mode} prox={eval_prox}",
        )
        np.testing.assert_array_equal(ev.eval["recall"], ev_np.eval["recall"])
        np.testing.assert_array_equal(stats, stats_np)
    bf = bruteforce_eval(copy.deepcopy(gts), copy.deepcopy(dts), mode=mode, eval_prox=eval_prox)
    np.testing.assert_allclose(
        ev.eval["precision"], bf["precision"], atol=1e-6,
        err_msg=f"precision mismatch mode={mode} prox={eval_prox}",
    )
    np.testing.assert_allclose(
        ev.eval["recall"], bf["recall"], atol=1e-6,
        err_msg=f"recall mismatch mode={mode} prox={eval_prox}",
    )
    np.testing.assert_allclose(stats, bf["stats"], atol=1e-6)


@pytest.mark.parametrize("seed", range(40))
def test_bruteforce_agreement_2d(seed):
    rng = np.random.RandomState(seed)
    gts, dts = _random_case(rng, "2D", eval_prox=False, tie_heavy=seed % 2 == 0)
    _run_both(gts, dts, "2D", eval_prox=False)


@pytest.mark.parametrize("seed", range(40, 75))
def test_bruteforce_agreement_2d_prox(seed):
    rng = np.random.RandomState(seed)
    gts, dts = _random_case(rng, "2D", eval_prox=True, tie_heavy=seed % 2 == 0)
    _run_both(gts, dts, "2D", eval_prox=True)


@pytest.mark.parametrize("seed", range(75, 105))
def test_bruteforce_agreement_3d(seed):
    rng = np.random.RandomState(seed)
    gts, dts = _random_case(rng, "3D", eval_prox=seed % 3 == 0, tie_heavy=seed % 2 == 0)
    _run_both(gts, dts, "3D", eval_prox=seed % 3 == 0)


# ---------------------------------------------------------------------------
# bulk certification (round 5): 395 additional randomized cases crossing
# eval_prox x ignore2D/3D x exact area/depth-range boundaries x score ties,
# bringing the certified corpus to N=500; every case also asserts the
# native `_evalc` matcher and the numpy fallback are BIT-equal (_run_both).
# Chunked 25/19-per-test to keep pytest collection readable.
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("chunk", range(12))
def test_bruteforce_bulk_2d_edges(chunk):
    for seed in range(200 + chunk * 25, 200 + (chunk + 1) * 25):
        rng = np.random.RandomState(seed)
        prox = seed % 3 == 0
        gts, dts = _random_case(
            rng, "2D", eval_prox=prox, tie_heavy=seed % 2 == 0, edge_heavy=True
        )
        _run_both(gts, dts, "2D", eval_prox=prox)


@pytest.mark.parametrize("chunk", range(5))
def test_bruteforce_bulk_3d_edges(chunk):
    for seed in range(600 + chunk * 19, 600 + (chunk + 1) * 19):
        rng = np.random.RandomState(seed)
        prox = seed % 3 == 0
        gts, dts = _random_case(
            rng, "3D", eval_prox=prox, tie_heavy=seed % 2 == 0, edge_heavy=True
        )
        _run_both(gts, dts, "3D", eval_prox=prox)
