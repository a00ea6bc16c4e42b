#!/usr/bin/env python
"""Probe the 3D-eval first-compile tax (DESIGN 9b caveat, VERDICT r2 #5).

Measures XLA:TPU compile wall time of the polyhedral-clipping IoU3D kernel
at several chunk sizes, plus the cost of an AOT export/import round trip
(jax.export), to decide how to get a fresh process under 30 s.

Usage: python tools/bench_eval_compile.py [--sizes 512 2048 8192] [--aot]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[512, 2048, 8192])
    ap.add_argument("--aot", action="store_true", help="probe jax.export round trip")
    args = ap.parse_args()

    from threedod.geometry.iou3d import iou3d_pairs

    fn = lambda a, b: iou3d_pairs(a, b)[1]

    rng = np.random.RandomState(0)

    def corners(n):
        ctr = rng.randn(n, 1, 3) * 3
        return jnp.asarray((rng.randn(n, 8, 3) * 0.5 + ctr).astype(np.float32))

    for n in args.sizes:
        a, b = corners(n), corners(n)
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(a, b)
        t1 = time.perf_counter()
        compiled = lowered.compile()
        t2 = time.perf_counter()
        out = compiled(a, b)
        jax.device_get(out)
        t3 = time.perf_counter()
        print(
            f"chunk {n:6d}: trace+lower {t1 - t0:6.1f}s  compile {t2 - t1:6.1f}s  "
            f"first-exec {t3 - t2:6.1f}s"
        )

        if args.aot:
            from jax import export as jexport

            t0 = time.perf_counter()
            exp = jexport.export(jax.jit(fn))(a, b)
            blob = exp.serialize()
            t1 = time.perf_counter()
            reloaded = jexport.deserialize(blob)
            t2 = time.perf_counter()
            out = reloaded.call(a, b)
            jax.device_get(out)
            t3 = time.perf_counter()
            print(
                f"  aot: export+serialize {t1 - t0:6.1f}s ({len(blob) / 1e6:.1f} MB)  "
                f"deserialize {t2 - t1:6.1f}s  first-call {t3 - t2:6.1f}s"
            )


if __name__ == "__main__":
    main()
