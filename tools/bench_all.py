#!/usr/bin/env python
"""Benchmark every driver BASELINE config back-to-back in one process.

BASELINE.md north star lists five benchmark configs: DLA34-FPN inference,
ResNet34-FPN batched inference, DA-V2 ViT-S depth + ground plane,
1000-cube proposal+scoring, and the full weak pipeline (train step); the
supervised train step is added as the sixth row. bench.py keeps its
one-line contract for the driver; this tool produces the full measured
table for docs/DESIGN.md.

Timing methodology (CLAUDE.md relay gotchas): block_until_ready does not
reliably wait on the axon relay, so each measurement chains a scalar
reduction of every iteration's output and forces it with device_get; the
constant dispatch overhead is cancelled by timing two iteration counts
and differencing. All rows are measured in ONE process back-to-back —
absolute stage timings drift ±30-50% across processes on a loaded box.

Usage: python tools/bench_all.py [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8
H, W = 512, 672


def timed(run_k, short=5, long=25, repeats=1):
    """Difference-of-iteration-counts timing (relay-safe; see CLAUDE.md).

    repeats>1: repeat the (short, long) pair in-process and take the MEDIAN
    per-iteration time — the DA-V2 row swung 2x across sessions on
    byte-identical code (DESIGN 14), so drift-prone rows report a median
    with the min/max spread printed for the record."""
    run_k(2)  # warmup/compile
    samples = []
    for _ in range(max(1, repeats)):
        d_short = run_k(short)
        d_long = run_k(long)
        samples.append((d_long - d_short) / (long - short))
    if repeats > 1:
        samples.sort()
        print(f"    [timed] spread over {repeats}: "
              f"{samples[0]*1e3:.2f}..{samples[-1]*1e3:.2f} ms/iter", flush=True)
        return samples[len(samples) // 2]
    return samples[0]


def make_image_batch(rng, b=None, h=H, w=W):
    if b is None:
        b = BATCH  # read at call time so --batch overrides take effect
    from threedod.data.batch import Batch

    K = np.tile(
        np.array([[[530.0, 0, w / 2], [0, 530.0, h / 2], [0, 0, 1]]], np.float32),
        (b, 1, 1),
    )
    return Batch(
        image=jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
        image_hw=jnp.asarray(np.tile([h, w], (b, 1)).astype(np.int32)),
        K=jnp.asarray(K),
        im_scale_ratio=jnp.full((b,), 730.0 / h),
        image_id=jnp.zeros((b,), jnp.int32),
    )


def det_cfg(backbone: str):
    from threedod.config import Config

    cfg = Config()
    cfg.shapes.canvas_height = H
    cfg.shapes.canvas_width = W
    cfg.shapes.max_detections = 100
    cfg.model.roi_heads.num_classes = 38
    cfg.model.backbone = backbone
    cfg.model.dtype = "bfloat16"
    return cfg


def bench_infer(backbone: str):
    from threedod.models import build_model

    cfg = det_cfg(backbone)
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    batch = make_image_batch(rng)
    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            b,
            train=False,
        )
    )(batch)
    infer = jax.jit(lambda v, b: model.apply(v, b, train=False))

    def run(k):
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float32)
        for _ in range(k):
            det = infer(variables, batch)
            s = s + det.scores.sum().astype(jnp.float32)
        jax.device_get(s)
        return time.perf_counter() - t0

    t = timed(run)
    return BATCH / t, "images/sec"


def bench_depth_ground(batch: int = 1):
    """DA-V2 ViT-S depth forward + RANSAC ground plane, per image.

    The bs1 row is dominated by relay dispatch latency (3.5-8.6 ms/img
    spread across captures with unchanged code — DESIGN 14); the bs8 row
    measures the actual compute path."""
    from threedod.models.boxer import ground_plane_from_depth
    from threedod.models.depth import DepthAnythingV2

    # bf16 compute dtype = the production asset path (generate_depth_maps.py)
    model = DepthAnythingV2(encoder="vits", max_depth=20.0, dtype=jnp.bfloat16)
    rng = np.random.RandomState(1)
    # 518 is DA-V2's standard input size (14 * 37)
    x = jnp.asarray(rng.randn(batch, 518, 518, 3).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    K = jnp.asarray([[530.0, 0, 259.0], [0, 530.0, 259.0], [0, 0, 1.0]])

    @jax.jit
    def depth_and_plane(p, img, key):
        d = model.apply(p, img)
        normal, pts, no_ground = jax.vmap(
            lambda dd, kk: ground_plane_from_depth(kk, dd, K)
        )(d, jax.random.split(key, d.shape[0]))
        return d, normal

    def run(k):
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float32)
        for i in range(k):
            d, n = depth_and_plane(params, x, jax.random.PRNGKey(i))
            s = s + d.sum().astype(jnp.float32) + n.sum().astype(jnp.float32)
        jax.device_get(s)
        return time.perf_counter() - t0

    t = timed(run, repeats=3)
    return batch / t, "images/sec"


def bench_asset_pipeline(gdino_size=800, sam_size=1024):
    """Text-prompted box -> mask asset step, per image: GroundingDINO
    (swin-T, bf16, the generate_ground_segmentations.py contract) forward +
    best_box_for_prompt + SAM ViT-B mask for that box. Random-init weights —
    throughput only."""
    from threedod.models.gdino import GroundingDINO, best_box_for_prompt
    from threedod.models.sam import Sam

    rng = np.random.RandomState(5)
    gmodel = GroundingDINO(dtype=jnp.bfloat16)
    ids = jnp.asarray([[101, 2598, 1012, 102]], jnp.int32)  # "ground."
    tok_mask = jnp.ones_like(ids, bool)
    gx = jnp.asarray(rng.randn(1, gdino_size, gdino_size, 3).astype(np.float32))
    gparams = jax.jit(gmodel.init)(jax.random.PRNGKey(0), gx, ids, tok_mask)

    smodel = Sam(img_size=sam_size, dtype=jnp.bfloat16)
    sx = jnp.asarray(rng.randn(1, sam_size, sam_size, 3).astype(np.float32))
    sparams = jax.jit(smodel.init)(
        jax.random.PRNGKey(1), sx, jnp.zeros((1, 4))
    )["params"]

    hw = jnp.asarray([[float(sam_size), float(sam_size)]])

    # two jits, not one: a single fused GDINO+SAM program is a ~30 min
    # XLA:TPU compile whose remote_compile RPC the axon relay drops
    # (broken pipe, observed twice); split compiles are minutes and the
    # box stays on device between them. Params are ARGUMENTS, not closure
    # captures — closed-over arrays embed as program constants and the
    # weight-sized payload trips the relay's HTTP 413 body limit.
    @jax.jit
    def gdino_step(p, gimg):
        logits, boxes = gmodel.apply(p, gimg, ids, tok_mask)
        box, score = best_box_for_prompt(logits, boxes, hw)
        return box

    @jax.jit
    def sam_step(p, simg, box):
        return smodel.apply({"params": p}, simg, box.reshape(1, 4))

    def run(k):
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float32)
        for i in range(k):
            box = gdino_step(gparams, gx)
            mask = sam_step(sparams, sx, box)
            s = s + box.sum().astype(jnp.float32) + jnp.asarray(mask[0], jnp.float32).sum()
        jax.device_get(s)
        return time.perf_counter() - t0

    t = timed(run, short=3, long=10)
    return 1.0 / t, "images/sec"


def bench_propose_score():
    """1000-cube proposal + scoring over 8 instances (one scene)."""
    from threedod.models.boxer import box_fill_masks, propose_and_score
    from threedod.structures import Cubes

    n_inst, n_prop = 8, 1000
    h, w = 480, 640
    rng = np.random.RandomState(2)
    fy = 530.0
    K = jnp.asarray([[fy, 0, w / 2], [0, fy, h / 2], [0, 0, 1.0]])
    vv = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
    floor = jnp.where(vv > h / 2, fy * 1.4 / jnp.maximum(vv - h / 2, 1e-6), 30.0)
    depth = jnp.broadcast_to(floor, (h, w))
    ground = (jnp.broadcast_to(vv > h / 2, (h, w))).astype(jnp.float32)
    xy = rng.uniform(20, w // 2, (n_inst, 2)).astype(np.float32)
    wh = rng.uniform(60, 160, (n_inst, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    masks = box_fill_masks(boxes, h, w)
    pm = jnp.asarray(np.tile([[1.0, 1.0, 1.0]], (n_inst, 1)))
    ps = jnp.asarray(np.tile([[0.3, 0.3, 0.3]], (n_inst, 1)))
    gt = Cubes(
        jnp.tile(
            jnp.concatenate([jnp.asarray([0.0, 0.7, 3.0, 1, 1, 1]), jnp.eye(3).ravel()])[
                None, None, :
            ],
            (n_inst, 1, 1),
        )
    )

    @jax.jit
    def one(key):
        return propose_and_score(
            key, "propose", boxes, masks, pm, ps, depth, K, (w, h), n_prop,
            ground_map=ground, gt_cubes=gt,
        )

    def run(k):
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float32)
        for i in range(k):
            out = one(jax.random.PRNGKey(i))
            s = s + out.iou3d.sum().astype(jnp.float32)
        jax.device_get(s)
        return time.perf_counter() - t0

    t = timed(run, short=3, long=13)
    return 1.0 / t, "scenes/sec (8x1000 cubes)"


def _train_batch(cfg, rng, weak: bool):
    from threedod.data.batch import GroundTruth

    b = BATCH
    h, w = cfg.shapes.canvas_height, cfg.shapes.canvas_width
    m = cfg.shapes.max_gt
    batch = make_image_batch(rng, b, h, w)
    xy = rng.uniform(10, w // 2, (b, m, 2)).astype(np.float32)
    wh = rng.uniform(40, 160, (b, m, 2)).astype(np.float32)
    gt = GroundTruth(
        boxes2d=jnp.asarray(np.concatenate([xy, xy + wh], -1)),
        classes=jnp.asarray(rng.randint(0, 38, (b, m)).astype(np.int32)),
        boxes3d=jnp.asarray(
            np.concatenate(
                [xy + wh / 2, 2 + rng.rand(b, m, 1) * 4, 0.3 + rng.rand(b, m, 3), rng.randn(b, m, 3)],
                -1,
            ).astype(np.float32)
        ),
        poses=jnp.broadcast_to(jnp.eye(3), (b, m, 3, 3)),
        valid=jnp.asarray(np.tile([True] * 6 + [False] * (m - 6), (b, 1))),
    )
    batch = batch.replace(gt=gt)
    if weak:
        masks = np.zeros((b, m, h // 4, w // 4), np.float32)
        masks[:, :, 20:80, 30:120] = 1.0
        batch = batch.replace(
            gt=batch.gt.replace(masks=jnp.asarray(masks)),
            depth_map=jnp.asarray(2.0 + rng.rand(b, h, w).astype(np.float32)),
            ground_map=jnp.asarray((rng.rand(b, h, w) > 0.5).astype(np.float32)),
        )
    return batch


def bench_train(weak: bool):
    from threedod.models import build_model
    from threedod.train import Trainer

    cfg = det_cfg("dla34")
    if weak:
        cfg.model.meta_architecture = "RCNN3DCombined"
    cfg.solver.ims_per_batch = BATCH
    rng = np.random.RandomState(3)
    batch = _train_batch(cfg, rng, weak)
    model = build_model(cfg)
    trainer = Trainer(cfg, model)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = trainer.make_train_step()

    # train step donates state: chain it through the loop
    holder = {"state": state}

    def run(k):
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float32)
        for i in range(k):
            new_state, _out = step(holder["state"], batch, jax.random.PRNGKey(i))
            total = _out.total
            holder["state"] = new_state
            s = s + total.astype(jnp.float32)
        jax.device_get(s)
        return time.perf_counter() - t0

    t = timed(run, short=3, long=13)
    return t * 1000.0, "ms/step (bs8)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument(
        "--only", default="",
        help="comma list of row names, e.g. dla34_infer_512px_bs8,gdino_sam_asset_step"
    )
    ap.add_argument(
        "--batch", type=int, default=0,
        help="override the detection batch size (default 8) — used by the round-4 batch-scaling study",
    )
    args = ap.parse_args()
    if args.batch:
        global BATCH
        BATCH = args.batch

    rows = {}
    want = set(args.only.split(",")) if args.only else None

    def go(name, fn, *a):
        if want is not None and name not in want:
            return
        t0 = time.perf_counter()
        try:
            value, unit = fn(*a)
        except Exception as e:  # relay flaps must not lose the other rows
            rows[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"{name:28s} FAILED: {type(e).__name__} "
                  f"(after {time.perf_counter()-t0:.0f}s)", flush=True)
        else:
            rows[name] = {"value": round(value, 2), "unit": unit}
            print(f"{name:28s} {value:10.2f} {unit}   (measured in {time.perf_counter()-t0:.0f}s)", flush=True)
        if args.json:  # write incrementally so a later crash keeps prior rows
            with open(args.json, "w") as f:
                json.dump(rows, f, indent=1)

    go("dla34_infer_512px_bs8", bench_infer, "dla34")
    go("resnet34_infer_512px_bs8", bench_infer, "resnet34")
    go("dav2_vits_depth_ground", bench_depth_ground)
    go("dav2_vits_depth_ground_bs8", bench_depth_ground, 8)
    go("gdino_sam_asset_step", bench_asset_pipeline)
    go("propose_score_1000", bench_propose_score)
    go("supervised_train_step", bench_train, False)
    go("weak_train_step", bench_train, True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
