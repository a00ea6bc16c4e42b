#!/usr/bin/env python
"""Per-stage TPU attribution for the propose+score path (BoxNet).

bench_all's `propose_score_8x1000` row times the whole
`models/boxer.propose_and_score` program (reference equivalent: the
unvectorized per-GT python loop at
/root/reference/cubercnn/modeling/roi_heads/roi_heads.py:524-578 plus
ProposalNetwork/scoring). This tool times each stage as its own jit at the
bench's exact shapes (8 instances x 1000 proposals, 480x640 maps), plus the
full fused program, so regressions land on a named stage instead of the
row total (the r2 searchsorted regression hid this way for a round).

Stage list: plane RANSAC, proposal sampling, bube corners + 2D boxes,
each scorer, IoU3D vs GT, and `full` (the real fused program).

Timing per CLAUDE.md: chained scalar reductions, device_get, difference of
two iteration counts, one process.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(run, k_a=3, k_b=13):
    run(2)
    t_a = run(k_a)
    t_b = run(k_b)
    return (t_b - t_a) / (k_b - k_a)


def loop_runner(jfn, *args, key_arg=False):
    def run(k):
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float32)
        for i in range(k):
            a = (jax.random.PRNGKey(i),) + args if key_arg else args
            s = s + jfn(*a)
        jax.device_get(s)
        return time.perf_counter() - t0
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--n-inst", type=int, default=8)
    ap.add_argument("--n-prop", type=int, default=1000)
    args = ap.parse_args()
    want = set(args.only.split(",")) if args.only else None

    from threedod.geometry.iou3d import iou3d_pairs
    from threedod.models.boxer import (
        box_fill_masks,
        ground_plane_from_depth,
        propose_and_score,
    )
    from threedod.proposals.proposals import propose_batch
    from threedod.scoring.scorefunction import (
        score_corners,
        score_dimensions,
        score_iou,
        score_point_cloud,
        score_segmentation_pair,
    )
    from threedod.structures import Cubes

    n_inst, n_prop = args.n_inst, args.n_prop
    h, w = 480, 640
    rng = np.random.RandomState(2)
    fy = 530.0
    K = jnp.asarray([[fy, 0, w / 2], [0, fy, h / 2], [0, 0, 1.0]])
    vv = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    floor = jnp.where(vv > h / 2, fy * 1.4 / jnp.maximum(vv - h / 2, 1e-6), 30.0)
    depth = jnp.broadcast_to(floor, (h, w))
    ground = (jnp.broadcast_to(vv > h / 2, (h, w))).astype(jnp.float32)
    xy = rng.uniform(20, w // 2, (n_inst, 2)).astype(np.float32)
    wh = rng.uniform(60, 160, (n_inst, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    masks = box_fill_masks(boxes, h, w)
    pm = jnp.asarray(np.tile([[1.0, 1.0, 1.0]], (n_inst, 1)))
    ps = jnp.asarray(np.tile([[0.3, 0.3, 0.3]], (n_inst, 1)))
    gt = Cubes(
        jnp.tile(
            jnp.concatenate([jnp.asarray([0.0, 0.7, 3.0, 1, 1, 1]), jnp.eye(3).ravel()])[
                None, None, :
            ],
            (n_inst, 1, 1),
        )
    )

    rows = {}

    def go(name, make):
        if want is not None and name not in want:
            return
        t = timed(make())
        rows[name] = t * 1e3
        print(f"{name:16s} {t * 1e3:9.2f} ms", flush=True)

    # ---- stage inputs (fixed; stages then time independently) -----------
    normal, points, pc_valid = jax.jit(
        lambda k: ground_plane_from_depth(k, depth, K, ground)
    )(jax.random.PRNGKey(0))
    cubes = jax.jit(
        lambda k: propose_batch(
            k, "propose", boxes, depth, pm, ps, (w, h), K, n_prop,
            ground_normal=normal,
        )
    )(jax.random.PRNGKey(0))
    bube = jax.jit(lambda c: c.get_bube_corners(K, clamp=(w, h)))(cubes)
    prop_boxes = jnp.stack(
        [bube[..., 0].min(-1), bube[..., 1].min(-1),
         bube[..., 0].max(-1), bube[..., 1].max(-1)], axis=-1,
    )

    go("plane", lambda: loop_runner(
        jax.jit(lambda k: ground_plane_from_depth(k, depth, K, ground)[0].sum()),
        key_arg=True,
    ))
    go("sample", lambda: loop_runner(
        jax.jit(lambda k: propose_batch(
            k, "propose", boxes, depth, pm, ps, (w, h), K, n_prop,
            ground_normal=normal,
        ).tensor.astype(jnp.float32).sum()),
        key_arg=True,
    ))
    go("bube", lambda: loop_runner(
        jax.jit(lambda c: c.get_bube_corners(K, clamp=(w, h)).astype(jnp.float32).sum()),
        cubes,
    ))
    go("score_iou2d", lambda: loop_runner(
        jax.jit(lambda b, pb: jax.vmap(score_iou)(b, pb).sum()), boxes, prop_boxes,
    ))
    go("score_pc", lambda: loop_runner(
        jax.jit(lambda pts, c: score_point_cloud(pts, c, pc_valid).astype(jnp.float32).sum()),
        points, cubes,
    ))
    go("score_seg", lambda: loop_runner(
        jax.jit(lambda m, bb: sum(
            s.sum() for s in jax.vmap(score_segmentation_pair)(m, bb)
        )), masks, bube,
    ))
    go("score_corner", lambda: loop_runner(
        jax.jit(lambda m, bb: jax.vmap(score_corners)(m, bb).sum()), masks, bube,
    ))
    go("score_dims", lambda: loop_runner(
        jax.jit(lambda d, b, pb: jax.vmap(score_dimensions)(pm, ps, d, b, pb).sum()),
        cubes.dimensions, boxes, prop_boxes,
    ))
    gt_corners = gt.get_all_corners()[:, 0]
    go("iou3d_gt", lambda: loop_runner(
        jax.jit(lambda g, c: iou3d_pairs(
            jnp.repeat(g, n_prop, axis=0),
            c.get_all_corners().reshape(n_inst * n_prop, 8, 3),
        )[1].sum()), gt_corners, cubes,
    ))
    go("full", lambda: loop_runner(
        jax.jit(lambda k: propose_and_score(
            k, "propose", boxes, masks, pm, ps, depth, K, (w, h), n_prop,
            ground_map=ground, gt_cubes=gt,
        ).iou3d.sum()),
        key_arg=True,
    ))

    print("\nsummary (ms):")
    for k, v in rows.items():
        print(f"  {k:16s} {v:9.2f}")
    if "full" in rows:
        named = sum(v for k, v in rows.items() if k != "full")
        print(f"  {'sum(stages)':16s} {named:9.2f}   (fusion gap = {rows['full'] - named:+.2f})")


if __name__ == "__main__":
    main()
