#!/usr/bin/env python
"""Stage profile of the weak train step (RCNN3DCombined) by cumulative
loss-menu ablation.

The weak step's cost is the supervised skeleton (backbone/RPN/box branch
fwd+bwd) plus the weak 3D loss menu (weak_heads.py). Each menu entry is one
vectorised program, so attributing wall clock per loss needs one compiled
step per cumulative subset — this tool measures them back-to-back in one
process (CLAUDE.md: absolute timings drift across processes; trust deltas
within one process).

Prints one JSON line per stage with the cumulative ms/step and the delta
vs the previous stage.

Usage: python tools/profile_weak.py [--long 13]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from bench_all import BATCH, _train_batch, det_cfg, timed


def time_step(losses_subset, batch_np, w3d, short, long):
    from threedod.models import build_model
    from threedod.train import Trainer

    cfg = det_cfg("dla34")
    cfg.model.meta_architecture = "RCNN3DCombined"
    cfg.solver.ims_per_batch = BATCH
    cfg.loss_functions = tuple(losses_subset)
    cfg.model.roi_cube_head.loss_w_3d = w3d
    model = build_model(cfg)
    trainer = Trainer(cfg, model)
    state = trainer.init_state(jax.random.PRNGKey(0), batch_np)
    step = trainer.make_train_step()
    holder = {"state": state}

    def run(k):
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float32)
        for i in range(k):
            new_state, _out = step(holder["state"], batch_np, jax.random.PRNGKey(i))
            total = _out.total
            holder["state"] = new_state
            s = s + total.astype(jnp.float32)
        jax.device_get(s)
        return time.perf_counter() - t0

    run(2)
    d_s = run(short)
    d_l = run(long)
    return (d_l - d_s) / (long - short)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--short", type=int, default=3)
    ap.add_argument("--long", type=int, default=13)
    args = ap.parse_args()

    rng = np.random.RandomState(3)
    cfg0 = det_cfg("dla34")
    batch = _train_batch(cfg0, rng, weak=True)

    # cumulative build-up of the bench menu, then +segmentation (the full
    # 8-loss validation menu of DESIGN 8b)
    order = ["iou", "pose_alignment", "pose_ground", "z",
             "z_pseudo_gt_patch", "dims", "depth", "segmentation"]
    stages = [("skeleton_no3d", [], 0.0), ("cube_fwd_bwd", [], 1.0)]
    for i in range(len(order)):
        stages.append(("+" + order[i], order[: i + 1], 1.0))

    prev = None
    for name, subset, w3d in stages:
        t = time_step(subset, batch, w3d, args.short, args.long)
        ms = t * 1e3
        print(json.dumps({
            "stage": name,
            "ms_per_step": round(ms, 1),
            "delta_ms": None if prev is None else round(ms - prev, 1),
        }), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
