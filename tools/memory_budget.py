#!/usr/bin/env python
"""Per-device HBM budget for the production training recipe (v5e, measured).

The reference's headline recipe scales global batch across devices with a
fixed per-device share (b0=196 over 48 GPUs — /root/reference/README.md:
221-245). Under pure data parallelism the per-device footprint of a bs-N
step on ONE chip equals the per-device footprint of the DP-8 recipe at
global batch 8N (params/optimizer replicated, batch sharded), so this tool
measures the real thing: it runs the production-shape supervised train
step (512x672, 512 ROIs, bf16) at several per-device batch sizes on the
real chip and reports `device.memory_stats()` peaks + step time, proving
which v5e-8 global-batch recipes fit.

Usage: python tools/memory_budget.py [--batches 8,16,32]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import jax
import jax.numpy as jnp
import numpy as np


def fmt(n):
    return f"{n / 2**30:.2f} GiB"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--backbone", default="dla34")
    args = ap.parse_args()

    import bench_all
    from threedod.models import build_model
    from threedod.train import Trainer

    dev = jax.devices()[0]
    rows = []
    for bs in [int(b) for b in args.batches.split(",")]:
        cfg = bench_all.det_cfg(args.backbone)
        cfg.solver.ims_per_batch = bs
        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        rng = np.random.RandomState(0)
        bench_all.BATCH = bs  # _train_batch sizes off the module global
        batch = bench_all._train_batch(cfg, rng, weak=False)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = trainer.make_train_step()

        holder = {"state": state}
        def run(k):
            t0 = time.perf_counter()
            s = jnp.zeros((), jnp.float32)
            for i in range(k):
                new_state, out = step(holder["state"], batch, jax.random.PRNGKey(i))
                holder["state"] = new_state
                s = s + out.total.astype(jnp.float32)
            jax.device_get(s)
            return time.perf_counter() - t0

        run(2)
        t_a = run(3)
        t_b = run(11)
        ms = (t_b - t_a) / 8 * 1e3
        # the axon relay device reports no live memory_stats; the AOT
        # executable's memory_analysis gives the compiler's HBM budget
        # (arguments + outputs + temps + program), which is what the DP-8
        # recipe fit depends on
        mem = step.lower(holder["state"], batch, jax.random.PRNGKey(0)).compile().memory_analysis()
        try:
            total = (
                mem.argument_size_in_bytes
                + mem.output_size_in_bytes
                + mem.temp_size_in_bytes
                + mem.generated_code_size_in_bytes
            )
            detail = (
                f"args {fmt(mem.argument_size_in_bytes)} + out "
                f"{fmt(mem.output_size_in_bytes)} + temp {fmt(mem.temp_size_in_bytes)}"
            )
        except AttributeError:
            total, detail = 0, str(mem)[:120]
        rows.append((bs, ms, total))
        print(
            f"bs{bs:3d}: {ms:7.1f} ms/step  {bs / ms * 1e3:6.1f} im/s  "
            f"HBM {fmt(total)} ({detail})  (x8 global batch {bs * 8})",
            flush=True,
        )
        # free before the next config
        del holder, state, step, trainer, model
    print("\nv5e HBM is ~16 GiB/chip; a row fits the v5e-8 DP recipe iff its peak fits.")


if __name__ == "__main__":
    main()
