#!/usr/bin/env python
"""Micro-benchmark the RPN label/proposal pipeline pieces on the chip.

The train forward's remaining hotspot is "RPN labels+proposals" (~9 ms,
docs/DESIGN.md 9e); this tool times its constituents standalone at the
production shapes (bs8 @ 512x672, 85k anchors) so the next optimization
targets the real cost, not a guess. All variants are timed back-to-back in
one process (deltas are the trustworthy signal on the shared relay host).

Usage: python tools/measure_rpn.py [--short 5] [--long 25]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from bench_all import BATCH, timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--short", type=int, default=5)
    ap.add_argument("--long", type=int, default=25)
    args = ap.parse_args()

    from threedod.config import Config
    from threedod.models.rpn import RPN
    from threedod.ops.matcher import apply_ignore_regions, match_candidates, subsample_fg_bg
    from threedod.ops.nms import nms_mask

    cfg = Config()
    cfg.shapes.canvas_height = 512
    cfg.shapes.canvas_width = 672

    # production level shapes at 512x672 (strides 4..64), 3 anchors/cell
    shapes = {"p2": (128, 168), "p3": (64, 84), "p4": (32, 42), "p5": (16, 21), "p6": (8, 11)}
    rpn = RPN(cfg, shapes)
    A = int(rpn.anchors_cat.shape[0])
    M = cfg.shapes.max_gt
    B = BATCH
    rng = np.random.RandomState(0)

    logits = {
        f: jnp.asarray(rng.randn(B, h * w * 3).astype(np.float32))
        for f, (h, w) in shapes.items()
    }
    regs = {
        f: jnp.asarray(0.1 * rng.randn(B, h * w * 3, 4).astype(np.float32))
        for f, (h, w) in shapes.items()
    }
    image_hw = jnp.asarray(np.tile([512, 672], (B, 1)).astype(np.int32))
    xy = rng.uniform(10, 300, (B, M, 2)).astype(np.float32)
    wh = rng.uniform(40, 160, (B, M, 2)).astype(np.float32)
    gtb = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    gtv = jnp.asarray(np.tile([True] * 6 + [False] * (M - 6), (B, 1)))
    r = cfg.model.rpn

    def t_scalar(fn, *a):
        jfn = jax.jit(fn)

        def run(k):
            t0 = time.perf_counter()
            s = jnp.zeros((), jnp.float32)
            for i in range(k):
                s = s + jfn(*a, i).astype(jnp.float32)
            jax.device_get(s)
            return time.perf_counter() - t0

        return timed(run, short=args.short, long=args.long) * 1e3

    res = {}

    # 1. per-level pre-NMS top_k (train k=2000), all levels x B
    def f_topk(lg, _i):
        s = jnp.zeros((), jnp.float32)
        for f in rpn.in_features:
            k = min(r.pre_nms_topk_train, lg[f].shape[1])
            v, idx = jax.vmap(lambda x: jax.lax.top_k(x, k))(lg[f] + _i * 0.0)
            s = s + v.sum() + idx.sum().astype(jnp.float32) * 1e-20
        return s

    res["pre_nms_topk_all_levels"] = t_scalar(f_topk, logits)

    # 2. NMS at 2000 candidates x 5 levels x B
    boxes2k = jnp.asarray(
        np.concatenate(
            [xy2 := rng.uniform(0, 600, (B * 5, 2000, 2)).astype(np.float32),
             xy2 + rng.uniform(5, 120, (B * 5, 2000, 2)).astype(np.float32)], -1
        )
    )
    scores2k = jnp.asarray(rng.randn(B * 5, 2000).astype(np.float32))

    def f_nms(bx, sc, _i):
        keep = jax.vmap(lambda b2, s2: nms_mask(b2, s2 + _i * 0.0, r.nms_thresh))(bx, sc)
        return keep.sum().astype(jnp.float32)

    res["nms_2000_x40"] = t_scalar(f_nms, boxes2k, scores2k)

    # 3. matcher at (M, A)
    def f_match(gb, gv, _i):
        def per(g, v):
            m = match_candidates(
                g + _i * 0.0, v, rpn.anchors_cat,
                bg_thresh=r.iou_thresholds[0], fg_thresh=r.iou_thresholds[1],
                allow_low_quality=True,
            )
            return m.matched_ious.sum() + m.matched_idxs.sum().astype(jnp.float32) * 1e-20

        return jax.vmap(per)(gb, gv).sum()

    res["match_candidates_x8"] = t_scalar(f_match, gtb, gtv)

    # 4. subsampler (radix path)
    labels = jnp.asarray(rng.randint(-1, 2, (B, A)).astype(np.int32))
    ious = jnp.asarray(rng.rand(B, A).astype(np.float32))

    def f_sub(lb, io, _i):
        def per(l, o, k):
            idx, fg, v = subsample_fg_bg(
                k, l, o + _i * 0.0, r.batch_size_per_image, r.positive_fraction
            )
            return idx.sum().astype(jnp.float32) + fg.sum() + v.sum()

        keys = jax.random.split(jax.random.PRNGKey(0), B)
        return jax.vmap(per)(lb, io, keys).sum()

    res["subsample_x8"] = t_scalar(f_sub, labels, ious)

    # 5. ignore regions
    def f_ign(lb, gb, gv, _i):
        def per(l, g, v):
            return apply_ignore_regions(
                l, rpn.anchors_cat, g + _i * 0.0, v, r.ignore_threshold
            ).sum().astype(jnp.float32)

        return jax.vmap(per)(lb, gb, gv).sum()

    res["ignore_regions_x8"] = t_scalar(f_ign, labels, gtb, gtv)

    # 5b. fused matcher + ignore (one shared intersection matrix) — compare
    # against rows 3 + 5, which build two
    def f_fused(gb, gv, _i):
        from threedod.ops.matcher import match_and_ignore

        def per(g, v):
            m, in_ign = match_and_ignore(
                g + _i * 0.0, v, ~v & (g[:, 0] >= 0), rpn.anchors_cat,
                bg_thresh=r.iou_thresholds[0], fg_thresh=r.iou_thresholds[1],
                ignore_thresh=r.ignore_threshold, allow_low_quality=True,
            )
            return (
                m.matched_ious.sum()
                + m.matched_idxs.sum().astype(jnp.float32) * 1e-20
                + in_ign.sum().astype(jnp.float32) * 1e-20
            )

        return jax.vmap(per)(gb, gv).sum()

    res["match_and_ignore_x8"] = t_scalar(f_fused, gtb, gtv)

    # 6. whole predict_proposals (train mode)
    def f_pp(lg, rg, _i):
        lg2 = {k: v + _i * 0.0 for k, v in lg.items()}
        p = rpn.predict_proposals(lg2, rg, image_hw, train=True)
        return p.boxes.sum() + p.scores.sum()

    res["predict_proposals_train"] = t_scalar(f_pp, logits, regs)

    # 7. final cross-level topk (post-NMS select) alone
    big = jnp.asarray(rng.randn(B, sum(min(2000, h * w * 3) for h, w in shapes.values())).astype(np.float32))

    def f_post(x, _i):
        v, idx = jax.vmap(lambda s: jax.lax.top_k(s, r.post_nms_topk_train))(x + _i * 0.0)
        return v.sum() + idx.sum().astype(jnp.float32) * 1e-20

    res["post_nms_topk"] = t_scalar(f_post, big)

    print(json.dumps({k: round(v, 2) for k, v in res.items()}), flush=True)


if __name__ == "__main__":
    main()
