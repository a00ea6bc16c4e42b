#!/usr/bin/env python
"""Backward-pass attribution for the train step (supervised or weak).

The compiled train step is one fused XLA program, so its backward cost has
no natural stage boundaries to hand-time. This tool measures it by deltas
between otherwise-identical re-jitted steps (the repo's established
cumulative-ablation methodology — docs/DESIGN.md 9d/9e; all variants timed
back-to-back in ONE process because absolute timings drift across
processes on the shared relay host):

  full        — the production train step (grads + optimizer + guards)
  noopt       — value_and_grad only (grads reduced to a scalar); delta vs
                full = optimizer.update + divergence guards + param writes
  fwd         — loss value only; noopt - fwd = total backward cost
  sg:trunk    — stop_gradient at the backbone features: backward excludes
                the trunk+FPN; noopt - this = trunk backward
  sg:pool     — stop_gradient at the pooled ROI blocks: backward excludes
                the Pallas pool RMW; noopt - this = pool backward
  sg:rpnhead  — stop_gradient at the RPN head outputs: backward excludes
                everything upstream of the RPN/ROI losses except via the
                pool path

Usage: python tools/profile_bwd.py [--weak] [--short 3] [--long 13]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weak", action="store_true")
    ap.add_argument("--short", type=int, default=3)
    ap.add_argument("--long", type=int, default=13)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from threedod.models import build_model
    from threedod.train import Trainer
    from threedod.utils import debug

    cfg = det_cfg("dla34")
    if args.weak:
        cfg.model.meta_architecture = "RCNN3DCombined"
    cfg.solver.ims_per_batch = BATCH
    rng = np.random.RandomState(3)
    batch = _train_batch(cfg, rng, args.weak)
    model = build_model(cfg)
    trainer = Trainer(cfg, model)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    def loss_fn(params, key):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch, train=True, rngs={"sampling": key}, mutable=["batch_stats"],
        )
        losses, _ = out
        return sum(jax.tree.leaves(losses))

    # full production step (donates state -> chain it)
    step = trainer.make_train_step()
    holder = {"state": state}

    def run_full(k):
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float32)
        for i in range(k):
            new_state, _out = step(holder["state"], batch, jax.random.PRNGKey(i))
            total = _out.total
            holder["state"] = new_state
            s = s + total.astype(jnp.float32)
        jax.device_get(s)
        return time.perf_counter() - t0

    full_ms = timed(run_full, short=args.short, long=args.long) * 1e3
    params = holder["state"].params  # state was donated; reuse final params

    def grad_scalar(key):
        total, grads = jax.value_and_grad(loss_fn)(params, key)
        # reduce grads to one scalar so every gradient is computed but no
        # optimizer state is built; the 1e-20 weight keeps the term
        # numerically negligible while preventing XLA from dead-code
        # eliminating the whole backward pass (a *0.0 weight would)
        return total + sum(
            jnp.sum(g).astype(jnp.float32) for g in jax.tree.leaves(grads)
        ) * 1e-20

    # Build every scalar variant FIRST, then time them in interleaved
    # rounds taking per-variant minima: the relay host's load drifts over
    # minutes, so back-to-back sequential measurement of the variants
    # (the earlier scheme) can mask 10-20 ms deltas entirely.
    variants = {"noopt": jax.jit(grad_scalar), "fwd": jax.jit(lambda k: loss_fn(params, k))}
    for stage in ("trunk", "pool", "rpnhead"):
        debug.SG_STAGES = frozenset({stage})
        try:
            f = jax.jit(grad_scalar)
            f(jax.random.PRNGKey(0)).block_until_ready()  # trace+compile NOW
        finally:
            debug.SG_STAGES = frozenset()
        variants[f"sg:{stage}"] = f

    def run_k(fn, k):
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float32)
        for i in range(k):
            s = s + fn(jax.random.PRNGKey(i)).astype(jnp.float32)
        jax.device_get(s)
        return time.perf_counter() - t0

    for fn in variants.values():  # warm every executable once
        run_k(fn, 2)
    per_iter = {name: [] for name in variants}
    for _round in range(args.rounds):
        for name, fn in variants.items():
            d_short = run_k(fn, args.short)
            d_long = run_k(fn, args.long)
            per_iter[name].append((d_long - d_short) / (args.long - args.short) * 1e3)
    results = {name: min(v) for name, v in per_iter.items()}
    results["full"] = full_ms

    out = {
        "system": "weak" if args.weak else "supervised",
        "ms": {k: round(v, 1) for k, v in results.items()},
        "round_spread_ms": {
            k: [round(x, 1) for x in v] for k, v in per_iter.items()
        },
        "derived_ms": {
            "optimizer+guards": round(results["full"] - results["noopt"], 1),
            "backward_total": round(results["noopt"] - results["fwd"], 1),
            "trunk_bwd": round(results["noopt"] - results["sg:trunk"], 1),
            "pool_bwd": round(results["noopt"] - results["sg:pool"], 1),
            "rpn+roi_input_bwd": round(results["noopt"] - results["sg:rpnhead"], 1),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
