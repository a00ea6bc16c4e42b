#!/usr/bin/env python
"""Capture a jax.profiler trace of a train/infer step and print the top HLO
ops by device self-time.

This is the op-level complement to the ablation ladders (profile_weak.py,
profile_bwd.py): one run attributes the WHOLE compiled step — forward,
backward, optimizer — to individual fusions, with no re-jitting. Parity
context: the reference's profiling story is hand-timed phase logs
(omni3d_evaluation.py:548-631); on TPU the native equivalent is an xplane
trace, which this tool reduces to a flat JSON table.

Usage:
  python tools/trace_ops.py [--weak] [--mode train|infer] [--top 40]
      [--out output/trace_ops]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def summarize_xspace(trace_dir: str, top: int):
    """Reduce the newest .xplane.pb under trace_dir to an op-stats table."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "framework_op_stats^", {"tqx": "out:csv"}
    )
    if isinstance(data, bytes):
        data = data.decode()
    import csv
    import io

    rows = list(csv.DictReader(io.StringIO(data)))
    # device-side ops only, ranked by total self time
    dev = [r for r in rows if r.get("Host/device", r.get("device_or_host", "")).lower().startswith("dev")]
    if not dev:
        dev = rows
    def f(r, k):
        try:
            return float(r.get(k, 0) or 0)
        except ValueError:
            return 0.0

    key_self = None
    for cand in ("Total self-time (us)", "total_self_time_us", "Total self time (us)", "Total self-time (μs)"):
        if dev and cand in dev[0]:
            key_self = cand
            break
    if key_self is None:
        # dump available columns for debugging
        print(json.dumps({"columns": list(dev[0].keys()) if dev else []}))
        return
    dev.sort(key=lambda r: -f(r, key_self))
    total = sum(f(r, key_self) for r in dev)
    out = []
    for r in dev[:top]:
        name_key = "Operation" if "Operation" in r else ("Op name" if "Op name" in r else list(r.keys())[0])
        out.append(
            {
                "op": r.get("Type", r.get("Category", ""))[:24],
                "name": r[name_key][:110],
                "self_us": round(f(r, key_self), 1),
                "pct": round(100 * f(r, key_self) / max(total, 1e-9), 2),
            }
        )
    print(json.dumps({"total_device_us": round(total, 1)}))
    for row in out:
        print(json.dumps(row))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weak", action="store_true")
    ap.add_argument("--mode", choices=["train", "infer"], default="train")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--out", default="output/trace_ops")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--analyze-only", default="", help="existing trace dir")
    args = ap.parse_args()

    if args.analyze_only:
        summarize_xspace(args.analyze_only, args.top)
        return

    from bench_all import BATCH, _train_batch, det_cfg, make_image_batch

    from threedod.models import build_model
    from threedod.train import Trainer

    cfg = det_cfg("dla34")
    if args.weak:
        cfg.model.meta_architecture = "RCNN3DCombined"
    cfg.solver.ims_per_batch = BATCH
    rng = np.random.RandomState(3)

    if args.mode == "train":
        batch = _train_batch(cfg, rng, args.weak)
        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = trainer.make_train_step()
        rl = jnp.asarray(np.inf, jnp.float32)
        holder = {"state": state}

        def one(i):
            new_state, total, *_ = step(holder["state"], batch, jax.random.PRNGKey(i), rl)
            holder["state"] = new_state
            return total
    else:
        batch = make_image_batch(rng, BATCH)
        model = build_model(cfg)
        variables = jax.jit(
            lambda b: model.init(
                {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
                b, train=False,
            )
        )(batch)
        infer = jax.jit(lambda v, b: model.apply(v, b, train=False))

        def one(i):
            return infer(variables, batch).scores.sum()

    # compile + settle outside the trace
    jax.device_get(one(0) * 0 + one(1) * 0)
    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        s = jnp.zeros((), jnp.float32)
        for i in range(args.steps):
            s = s + one(2 + i).astype(jnp.float32)
        jax.device_get(s)
    summarize_xspace(args.out, args.top)


if __name__ == "__main__":
    main()
