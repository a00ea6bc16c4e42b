#!/usr/bin/env python
"""Profile train or inference steps with jax.profiler.

Parity target: the reference's tracing story is hand-timed phases
(omni3d_evaluation.py:548-631) plus a profiling config
(configs/Base_Omni3D_prof.yaml); the TPU-native equivalent is a real
profiler trace. Writes a TensorBoard-loadable trace directory
(`tensorboard --logdir <out>` -> Profile tab, or xprof).

Usage:
  python tools/profile_step.py --config-file configs/Base_Omni3D_prof.yaml \
      [--mode train|infer] [--steps 5] [--out output/profile]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--mode", choices=["train", "infer"], default="train")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="output/profile")
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train_net import setup

    from threedod.data import TrainLoader, get_dataset_dicts
    from threedod.models import build_model
    from threedod.parallel import make_mesh_for_batch, shard_batch
    from threedod.train import Trainer

    cfg, meta, priors = setup(args)
    model = build_model(cfg, priors=priors)
    mesh = make_mesh_for_batch(cfg.solver.ims_per_batch)
    trainer = Trainer(cfg, model, mesh=mesh)

    dicts = get_dataset_dicts(cfg.datasets.train)
    load_maps = cfg.model.meta_architecture == "RCNN3DCombined"
    loader = TrainLoader(dicts, cfg, seed=cfg.seed, load_maps=load_maps)
    batch = next(iter(loader))
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed), batch)
    sharded = shard_batch(batch, mesh)

    if args.mode == "train":
        step = trainer.make_train_step()

        def one(st, i):
            st, _out = step(st, sharded, jax.random.PRNGKey(i))
            total = _out.total
            return st, total
    else:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        infer = jax.jit(lambda v, b: model.apply(v, b, train=False))

        def one(st, i):
            det = infer(variables, sharded)
            return st, det.scores.sum()

    # compile outside the trace so the trace shows steady-state steps
    state, x = one(state, 0)
    jax.block_until_ready(x)

    os.makedirs(args.out, exist_ok=True)
    try:
        with jax.profiler.trace(args.out):
            for i in range(args.steps):
                state, x = one(state, i + 1)
            jax.device_get(jnp.asarray(x).sum())
        print(f"trace written to {args.out}")
    except Exception as e:  # device tracing can be unsupported over relays
        print(f"device trace unavailable ({type(e).__name__}: {e})")

    # chained-scalar wall timing (difference of two counts — see bench.py)
    import time

    def run(k):
        nonlocal state
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float32)
        for i in range(k):
            state, x = one(state, i + 100)
            s = s + jnp.asarray(x).sum().astype(jnp.float32)
        jax.device_get(s)
        return time.perf_counter() - t0

    run(2)
    steps = max(args.steps, 3)  # difference-of-two-counts needs steps > short
    short = max(2, steps // 5)
    d_s = run(short)
    d_l = run(steps)
    dt = (d_l - d_s) / (steps - short)
    print(f"{args.mode}: {dt * 1000:.1f} ms/step "
          f"({cfg.solver.ims_per_batch / dt:.1f} im/s)")


if __name__ == "__main__":
    main()
