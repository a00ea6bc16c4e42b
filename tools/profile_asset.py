#!/usr/bin/env python
"""Per-stage TPU attribution for the GDINO+SAM asset pipeline.

The asset step (tools/generate_ground_segmentations.py; reference
cubercnn/data/generate_ground_segmentations.py:129-206) runs GroundingDINO
(Swin-T @ 800px) to find the prompt box, then SAM (ViT-B @ 1024px) to mask
it. bench_all's `gdino_sam_asset_step` row gives the end-to-end number; this
tool breaks it into stages so the hot one can be attacked:

  swin, bert, enhancer x6 (deformable self-attn + bi-attn), decoder x6,
  ms_deform_sample alone (encoder + decoder geometry), SAM encoder,
  SAM decoder, and the two full jits for cross-check.

Timing per CLAUDE.md: chain a scalar reduction through every iteration,
force with device_get, and difference two iteration counts in one process.

Usage: python tools/profile_asset.py [--only swin,deform_enc] [--size 800]
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


def timed(run, k_a=3, k_b=11):
    run(2)  # compile + warm
    t_a = run(k_a)
    t_b = run(k_b)
    return (t_b - t_a) / (k_b - k_a)


def loop_runner(jfn, *args):
    def run(k):
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float32)
        for _ in range(k):
            s = s + jfn(*args)
        jax.device_get(s)
        return time.perf_counter() - t0
    return run


def shapes_for(size: int):
    return [(size // 8 // (2 ** i), size // 8 // (2 ** i)) for i in range(3)] + [
        (size // 64, size // 64)
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--sam-size", type=int, default=1024)
    args = ap.parse_args()
    want = set(args.only.split(",")) if args.only else None

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    rows = {}

    def go(name, make):
        if want is not None and name not in want:
            return
        t = timed(make())
        rows[name] = t * 1e3
        print(f"{name:18s} {t * 1e3:9.2f} ms")

    size = args.size
    shapes = shapes_for(size)
    S = sum(h * w for h, w in shapes)
    dim, heads, L, P = 256, 8, 4, 4
    d = dim // heads

    # ---- Swin-T backbone ------------------------------------------------
    def make_swin():
        from threedod.models.gdino.swin import SwinT

        m = SwinT(dtype=dt)
        x = jnp.asarray(rng.randn(1, size, size, 3).astype(np.float32))
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        f = jax.jit(lambda p, x: sum(
            v.astype(jnp.float32).sum() for v in m.apply(p, x).values()
        ))
        return loop_runner(f, params, x)

    go("swin", make_swin)

    # ---- BERT (12 layers, 4 tokens) ------------------------------------
    def make_bert():
        from threedod.models.gdino.bert import BertEncoder

        m = BertEncoder(dtype=dt)
        ids = jnp.asarray([[101, 2598, 1012, 102]], jnp.int32)
        mask = jnp.ones_like(ids, bool)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), ids, mask)
        f = jax.jit(lambda p: m.apply(p, ids, mask).astype(jnp.float32).sum())
        return loop_runner(f, params)

    go("bert", make_bert)

    # ---- deformable sampling alone -------------------------------------
    def deform_runner(lq):
        from threedod.models.gdino.deformable import ms_deform_sample

        value = jnp.asarray(rng.randn(1, S, heads, d).astype(np.float32), dt)
        loc = jnp.asarray(rng.rand(1, lq, heads, L, P, 2).astype(np.float32), dt)
        w = jax.nn.softmax(
            jnp.asarray(rng.randn(1, lq, heads, L, P).astype(np.float32), dt), axis=-1
        )
        f = jax.jit(lambda v, l, w: ms_deform_sample(
            v, shapes, l, w
        ).astype(jnp.float32).sum())
        return loop_runner(f, value, loc, w)

    go("deform_enc", lambda: deform_runner(S))
    go("deform_dec", lambda: deform_runner(900))

    # ---- one enhancer layer (x6 = encoder) ------------------------------
    def make_enh():
        from threedod.models.gdino.model import EnhancerLayer

        m = EnhancerLayer(dim, L, dtype=dt)
        vis = jnp.asarray(rng.randn(1, S, dim).astype(np.float32), dt)
        txt = jnp.asarray(rng.randn(1, 4, dim).astype(np.float32), dt)
        mask = jnp.ones((1, 4), bool)
        pos = jnp.asarray(rng.randn(1, S, dim).astype(np.float32), dt)
        ref = jnp.asarray(rng.rand(1, S, L, 2).astype(np.float32))
        params = jax.jit(
            lambda k: m.init(k, vis, txt, mask, pos, ref, shapes)
        )(jax.random.PRNGKey(0))
        f = jax.jit(lambda p, v, t: sum(
            o.astype(jnp.float32).sum()
            for o in m.apply(p, v, t, mask, pos, ref, shapes)
        ))
        return loop_runner(f, params, vis, txt)

    go("enhancer1", make_enh)

    # ---- one decoder layer (x6 = decoder) -------------------------------
    def make_dec():
        from threedod.models.gdino.model import DecoderLayer

        m = DecoderLayer(dim, L, dtype=dt)
        q = jnp.asarray(rng.randn(1, 900, dim).astype(np.float32), dt)
        qpos = jnp.asarray(rng.randn(1, 900, dim).astype(np.float32), dt)
        txt = jnp.asarray(rng.randn(1, 4, dim).astype(np.float32), dt)
        mask = jnp.ones((1, 4), bool)
        vis = jnp.asarray(rng.randn(1, S, dim).astype(np.float32), dt)
        refb = jnp.asarray(rng.rand(1, 900, 4).astype(np.float32))
        params = jax.jit(
            lambda k: m.init(k, q, qpos, txt, mask, vis, refb, shapes)
        )(jax.random.PRNGKey(0))
        f = jax.jit(lambda p, q_, v: m.apply(
            p, q_, qpos, txt, mask, v, refb, shapes
        ).astype(jnp.float32).sum())
        return loop_runner(f, params, q, vis)

    go("decoder1", make_dec)

    # ---- full GDINO -----------------------------------------------------
    def make_gdino():
        from threedod.models.gdino import GroundingDINO

        m = GroundingDINO(dtype=dt)
        ids = jnp.asarray([[101, 2598, 1012, 102]], jnp.int32)
        mask = jnp.ones_like(ids, bool)
        x = jnp.asarray(rng.randn(1, size, size, 3).astype(np.float32))
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x, ids, mask)
        f = jax.jit(lambda p, x: sum(
            jnp.where(jnp.isfinite(o), o, 0.0).astype(jnp.float32).sum()
            for o in m.apply(p, x, ids, mask)
        ))
        return loop_runner(f, params, x)

    go("gdino_full", make_gdino)

    # ---- SAM ------------------------------------------------------------
    def make_sam(which):
        from threedod.models.sam import Sam

        m = Sam(img_size=args.sam_size, dtype=dt)
        x = jnp.asarray(rng.randn(1, args.sam_size, args.sam_size, 3).astype(np.float32))
        boxes = jnp.asarray([[100.0, 100.0, 600.0, 600.0]])
        params = jax.jit(m.init)(jax.random.PRNGKey(1), x, boxes)["params"]

        if which == "enc":
            f = jax.jit(lambda p, x: m.apply(
                {"params": p}, x, method="encode_image"
            ).astype(jnp.float32).sum())
            return loop_runner(f, params, x)
        if which == "dec":
            emb = jax.jit(lambda p, x: m.apply({"params": p}, x, method="encode_image"))(params, x)
            f = jax.jit(lambda p, e, b: m.apply(
                {"params": p}, e, b, method="decode_boxes"
            ).astype(jnp.float32).sum())
            return loop_runner(f, params, emb, boxes)
        f = jax.jit(lambda p, x, b: m.apply(
            {"params": p}, x, b
        ).astype(jnp.float32).sum())
        return loop_runner(f, params, x, boxes)

    go("sam_enc", lambda: make_sam("enc"))
    go("sam_dec", lambda: make_sam("dec"))
    go("sam_full", lambda: make_sam("full"))

    print("\nsummary (ms):")
    for k, v in rows.items():
        print(f"  {k:18s} {v:9.2f}")
    if "enhancer1" in rows and "decoder1" in rows:
        print(f"  encoder x6       {rows['enhancer1'] * 6:9.2f}")
        print(f"  decoder x6       {rows['decoder1'] * 6:9.2f}")


if __name__ == "__main__":
    main()
