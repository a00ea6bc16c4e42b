#!/usr/bin/env python
"""Measured whole-step roofline table for Cube R-CNN on TPU.

For every pipeline stage (DLA trunk, trunk+FPN, RPN head, proposal
selection, ROI pool, ROI heads, full inference, full supervised/weak train
step) this measures wall time with the chained-scalar/device_get
methodology (block_until_ready is unreliable over the axon relay — see
bench.py), pulls XLA's own FLOP/byte estimates from
compiled.cost_analysis(), and prints a roofline table: achieved TFLOP/s,
achieved GB/s, and % of v5e peak (394 TFLOP/s bf16, 819 GB/s HBM).

The stage rows measure each sub-program standalone on captured
intermediates, so stage times add up to slightly more than the fused full
step (XLA fuses across stage seams in the full program); the deltas are
the fusion benefit, not measurement error.

Usage: python tools/roofline.py [--batch 8] [--iters 20] [--train] [--weak]
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

PEAK_TFLOPS = 394.0  # v5e bf16
PEAK_GBS = 819.0     # v5e HBM


def timed(fn, args, iters, warmup=2):
    """Difference-of-two-counts timing; returns seconds/iter."""
    def run(k):
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float32)
        for _ in range(k):
            out = fn(*args)
            leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
            s = s + sum(jnp.sum(l).astype(jnp.float32) for l in leaves[:4])
        jax.device_get(s)
        return time.perf_counter() - t0

    run(warmup)
    iters = max(iters, 3)  # difference-of-two-counts needs iters > short
    short = max(2, iters // 5)
    d_s = run(short)
    d_l = run(iters)
    return (d_l - d_s) / (iters - short)


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=672)
    ap.add_argument("--train", action="store_true", help="add train-step rows")
    ap.add_argument("--weak", action="store_true", help="add the weak train step too")
    args = ap.parse_args()

    from threedod.config import Config
    from threedod.data.batch import Batch
    from threedod.models import build_model

    cfg = Config()
    cfg.shapes.canvas_height = args.height
    cfg.shapes.canvas_width = args.width
    cfg.shapes.max_detections = 100
    cfg.model.roi_heads.num_classes = 38
    cfg.model.backbone = "dla34"
    cfg.model.dtype = "bfloat16"

    B, H, W = args.batch, args.height, args.width
    rng = np.random.RandomState(0)
    K = np.tile(np.array([[[530.0, 0, W / 2], [0, 530.0, H / 2], [0, 0, 1]]], np.float32), (B, 1, 1))
    batch = Batch(
        image=jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        image_hw=jnp.asarray(np.tile([H, W], (B, 1)).astype(np.int32)),
        K=jnp.asarray(K),
        im_scale_ratio=jnp.full((B,), 730.0 / H),
        image_id=jnp.zeros((B,), jnp.int32),
    )

    model = build_model(cfg)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, b, train=False)
    )(batch)

    img = batch.image.astype(jnp.bfloat16)

    # --- stages ---
    from threedod.models.backbones import build_backbone
    from threedod.models.backbones.dla import build_dla

    stages = {}

    dla = build_dla("dla34", dtype=jnp.bfloat16)
    dla_vars = jax.jit(lambda x: dla.init({"params": jax.random.PRNGKey(0)}, x, train=False))(img)
    dla_fn = jax.jit(lambda v, x: dla.apply(v, x, train=False))
    stages["dla_trunk"] = (dla_fn, (dla_vars, img))

    bb = build_backbone("dla34", cfg.model.fpn_out_channels, dtype=jnp.bfloat16)
    bb_vars = jax.jit(lambda x: bb.init({"params": jax.random.PRNGKey(0)}, x, train=False))(img)
    bb_fn = jax.jit(lambda v, x: bb.apply(v, x, train=False))
    stages["backbone+fpn"] = (bb_fn, (bb_vars, img))

    # --- post-trunk stages on captured intermediates ----------------------
    from threedod.data.batch import normalize_image
    from threedod.models.roi_heads3d import ROIHeads3D
    from threedod.models.rpn import RPN

    feats = jax.jit(
        lambda v, b: model.apply(
            v, normalize_image(b.image, cfg.model, b.image_hw), train=False,
            method=lambda m, x, train: m.backbone(x, train=train),
        )
    )(variables, batch)
    rpn_feats = {f: feats[f] for f in cfg.model.rpn.in_features}
    feature_shapes = {f: (rpn_feats[f].shape[1], rpn_feats[f].shape[2]) for f in rpn_feats}
    rpn = RPN(cfg, feature_shapes)

    rpnhead_fn = jax.jit(
        lambda v, f: model.apply(
            v, f, train=False, method=lambda m, ff, train: m.rpn_head(ff, train=train)
        )
    )
    stages["rpn_head"] = (rpnhead_fn, (variables, rpn_feats))

    logits, regs = rpnhead_fn(variables, rpn_feats)
    prop_fn = jax.jit(
        lambda lg, rg, hw: rpn.predict_proposals(lg, rg, hw, train=False)
    )
    stages["proposal_sel"] = (prop_fn, (logits, regs, batch.image_hw))

    proposals = prop_fn(logits, regs, batch.image_hw)
    roi_feats = {f: feats[f] for f in cfg.model.roi_heads.in_features}
    res = cfg.model.roi_cube_head.pooler_resolution

    pool_fn = jax.jit(
        lambda v, f, bx: model.apply(
            v, f, bx, train=False,
            method=lambda m, ff, bb_, train: m.roi_heads._pool(ff, bb_, res),
        )
    )
    stages["roi_pool"] = (pool_fn, (variables, roi_feats, proposals.boxes))

    roih_fn = jax.jit(
        lambda v, f, p, K, r, hw: model.apply(
            v, f, p, K, r, hw, train=False,
            method=lambda m, ff, pp, kk, rr, hh, train: m.roi_heads(
                ff, pp, kk, rr, hh, gt=None, train=False
            ),
        )
    )
    stages["roi_heads"] = (
        roih_fn,
        (variables, roi_feats, proposals, batch.K, batch.im_scale_ratio, batch.image_hw),
    )

    # full model
    full_fn = jax.jit(lambda v, b: model.apply(v, b, train=False))
    stages["full_infer"] = (full_fn, (variables, batch))

    rows = []
    for name, (fn, a) in stages.items():
        t = timed(fn, a, args.iters)
        fl, by = cost(lambda *aa: fn(*aa), *a)
        tf = fl / t / 1e12
        gb = by / t / 1e9
        rows.append((name, t * 1e3, fl / 1e9, by / 1e9, tf, gb,
                     100 * tf / PEAK_TFLOPS, 100 * gb / PEAK_GBS))

    # --- train rows (donated state -> custom chained runner) --------------
    if args.train or args.weak:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_all import _train_batch, det_cfg

        from threedod.models import build_model as build_model2
        from threedod.train import Trainer

        for weak in ([False, True] if args.weak else [False]):
            name = "weak_train" if weak else "sup_train"
            tcfg = det_cfg("dla34")
            if weak:
                tcfg.model.meta_architecture = "RCNN3DCombined"
            tcfg.solver.ims_per_batch = args.batch
            trng = np.random.RandomState(3)
            tb = _train_batch(tcfg, trng, weak)
            tmodel = build_model2(tcfg)
            trainer = Trainer(tcfg, tmodel)
            state = trainer.init_state(jax.random.PRNGKey(0), tb)
            step = trainer.make_train_step()
            c = step.lower(state, tb, jax.random.PRNGKey(0)).compile().cost_analysis()
            if isinstance(c, list):
                c = c[0]
            fl, by = float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))

            holder = {"state": state}

            def run(k):
                t0 = time.perf_counter()
                s = jnp.zeros((), jnp.float32)
                for i in range(k):
                    new_state, _out = step(holder["state"], tb, jax.random.PRNGKey(i))
                    total = _out.total
                    holder["state"] = new_state
                    s = s + total.astype(jnp.float32)
                jax.device_get(s)
                return time.perf_counter() - t0

            run(2)
            d_s, d_l = run(3), run(13)
            t = (d_l - d_s) / 10
            tf, gb = fl / t / 1e12, by / t / 1e9
            rows.append((name, t * 1e3, fl / 1e9, by / 1e9, tf, gb,
                         100 * tf / PEAK_TFLOPS, 100 * gb / PEAK_GBS))

    hdr = f"{'stage':<16}{'ms':>8}{'GFLOP':>9}{'GB':>8}{'TF/s':>8}{'GB/s':>8}{'%MXU':>7}{'%HBM':>7}"
    print(hdr)
    for r in rows:
        print(f"{r[0]:<16}{r[1]:>8.2f}{r[2]:>9.1f}{r[3]:>8.2f}{r[4]:>8.1f}{r[5]:>8.1f}{r[6]:>7.1f}{r[7]:>7.1f}")
    infer_row = next(r for r in rows if r[0] == "full_infer")
    print(f"\nfull_infer: {args.batch / (infer_row[1] / 1e3):.1f} im/s (bs{args.batch})")


if __name__ == "__main__":
    main()
