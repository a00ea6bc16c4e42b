#!/usr/bin/env python
"""Stage profile of the SUPERVISED train step by cumulative loss ablation.

Motivation (docs/DESIGN.md 9f): profile_bwd attributes the supervised
backward as 52 ms total, yet stop-gradient seams at the trunk, the pooled
ROI blocks, and the RPN head each change nothing (deltas within noise) —
so the cost must live DOWNSTREAM of every seam, in the box/cube head and
loss-section backward. The cube loss menu is Python-gated by config
(roi_heads3d.py: `loss_w_3d > 0`, `disentangled_loss`, `chamfer_pose`,
`loss_w_joint > 0`, `use_confidence > 0`), so re-jitting with terms removed
truly deletes their fwd+bwd from the program (the same cumulative-ablation
methodology as profile_weak.py; reference's equivalent is hand-timed phase
logs, omni3d_evaluation.py:548-631). All variants are timed back-to-back
in ONE process (CLAUDE.md: absolute timings drift across processes).

Stages (cumulative):
  skeleton_no3d   — loss_w_3d = 0: RPN + 2D box-branch losses only
  +cube_plain     — w3d on, xy/z/dims/pose as plain regressions
                    (disentangled off, chamfer off, joint off, conf off)
  +disentangled   — disentangled corner losses
  +chamfer        — chamfer corner distance for the pose term
  +joint          — joint corner loss
  +confidence     — uncertainty-weighted fusion (production config)

Usage: python tools/profile_sup.py [--short 3] [--long 13]
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

from bench_all import BATCH, _train_batch, det_cfg


def time_step(batch_np, short, long, **cube_overrides):
    from threedod.models import build_model
    from threedod.train import Trainer

    cfg = det_cfg("dla34")
    cfg.solver.ims_per_batch = BATCH
    for k, v in cube_overrides.items():
        setattr(cfg.model.roi_cube_head, k, v)
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
    batch = _train_batch(cfg0, rng, weak=False)

    base = dict(disentangled_loss=False, chamfer_pose=False,
                loss_w_joint=0.0, use_confidence=0.0)
    stages = [
        ("skeleton_no3d", dict(base, loss_w_3d=0.0)),
        ("+cube_plain", dict(base)),
        ("+disentangled", dict(base, disentangled_loss=True)),
        ("+chamfer", dict(base, disentangled_loss=True, chamfer_pose=True)),
        ("+joint", dict(base, disentangled_loss=True, chamfer_pose=True,
                        loss_w_joint=1.0)),
        ("+confidence", {}),  # production config
    ]

    prev = None
    for name, over in stages:
        t = time_step(batch, args.short, args.long, **over)
        ms = t * 1e3
        print(json.dumps({
            "stage": name,
            "ms_per_step": round(ms, 1),
            "delta_ms": None if prev is None else round(ms - prev, 1),
        }), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
