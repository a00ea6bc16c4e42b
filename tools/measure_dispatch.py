#!/usr/bin/env python
"""Quantify per-step dispatch/relay overhead vs on-device compute.

Hypothesis (docs/DESIGN.md 9f anomaly): severing the backward at any seam
changes nothing because a large fixed per-step cost — host->relay dispatch
latency, not HBM/MXU work — dominates the supervised train step. If true,
the right fix is not kernel surgery but amortizing dispatch: run K steps
per dispatch with `lax.scan` (multi-step training), the standard TPU
pattern the reference cannot express (its loop is host-side Python,
train_net.py:186-330).

Three probes, all timed by iteration-count differencing in ONE process:
  1. noop chain   — x = x + 1 on a (8,8) f32; pure dispatch cost.
  2. matmul chain — one 2048^3 bf16 matmul (~17 GFLOP, ~0.09 ms on v5e
                    at 197 TFLOP/s); dispatch + a small real kernel.
  3. scanK matmul — the same matmul inside lax.scan(K) in one jit;
                    per-matmul time shows what amortization recovers.

Usage: python tools/measure_dispatch.py [--short 10] [--long 60] [--scan 32]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def timed_per_iter(fn, x, short, long):
    def run(k):
        y = x
        t0 = time.perf_counter()
        for _ in range(k):
            y = fn(y)
        jax.device_get(jnp.sum(y[0] if isinstance(y, tuple) else y))
        return time.perf_counter() - t0

    run(3)
    d_s = run(short)
    d_l = run(long)
    return (d_l - d_s) / (long - short)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--short", type=int, default=10)
    ap.add_argument("--long", type=int, default=60)
    ap.add_argument("--scan", type=int, default=32)
    args = ap.parse_args()

    # 1. no-op chain
    noop = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 8), jnp.float32)
    t_noop = timed_per_iter(noop, x, args.short, args.long)
    print(json.dumps({"probe": "noop_chain", "ms_per_step": round(t_noop * 1e3, 3)}), flush=True)

    # 2. single matmul per dispatch
    a = jnp.ones((2048, 2048), jnp.bfloat16)

    @jax.jit
    def mm(y):
        return jnp.tanh(y @ a)

    y = jnp.ones((2048, 2048), jnp.bfloat16)
    t_mm = timed_per_iter(mm, y, args.short, args.long)
    print(json.dumps({"probe": "matmul_chain", "ms_per_step": round(t_mm * 1e3, 3)}), flush=True)

    # 3. K matmuls inside one jit via scan
    K = args.scan

    @jax.jit
    def mm_scan(y):
        def body(c, _):
            return jnp.tanh(c @ a), ()

        out, _ = jax.lax.scan(body, y, None, length=K)
        return out

    t_scan = timed_per_iter(mm_scan, y, max(3, args.short // 4), max(8, args.long // 4))
    print(json.dumps({
        "probe": f"scan{K}_matmul",
        "ms_per_dispatch": round(t_scan * 1e3, 3),
        "ms_per_matmul": round(t_scan * 1e3 / K, 4),
    }), flush=True)

    # derived
    print(json.dumps({
        "derived_dispatch_overhead_ms": round(
            max(0.0, t_mm * 1e3 - t_scan * 1e3 / K), 3
        )
    }), flush=True)


if __name__ == "__main__":
    main()
