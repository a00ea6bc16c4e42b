#!/usr/bin/env python
"""Hardware gate measurement for the staged Pallas kernels (DESIGN 9c).

Two kernel families are CPU-interpret-parity pinned but held off the bench
path until measured on a real v5e:

  * the fused-trunk family (ops/fused_conv.py, gate ENABLE_ON_TPU)
  * group-block-diagonal ROI pooling (ops/roi_align_pallas.POOL_GROUP)

This tool runs both measurements back-to-back in one process on the real
chip and prints one JSON line per experiment. Timing follows bench.py's
relay-safe methodology: chain a scalar reduction of every iteration's
output, force with device_get, difference two iteration counts.

Usage:  python tools/measure_fused.py [--only pool|trunk|model|kernels]
"""
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


def timed(fn, *args, short=5, long=25, warmup=2):
    """Seconds per iteration, dispatch overhead cancelled (bench.py scheme)."""
    def run(k):
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float32)
        for _ in range(k):
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            s = s + leaf.sum().astype(jnp.float32)
        jax.device_get(s)
        return time.perf_counter() - t0

    run(warmup)
    d_short = run(short)
    d_long = run(long)
    return (d_long - d_short) / (long - short)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def fpn_features(rng, c=256):
    """Per-image FPN pyramid at the bench canvas (512x672)."""
    shapes = {"p2": (128, 168), "p3": (64, 84), "p4": (32, 42),
              "p5": (16, 21), "p6": (8, 11)}
    return {
        k: jnp.asarray(rng.randn(h, w, c).astype(np.float32)).astype(jnp.bfloat16)
        for k, (h, w) in shapes.items()
    }


def bench_pool_groups():
    """POOL_GROUP in {1, 2, 4} on the production pool workload
    (1000 ROIs x C=256 bf16, mixed scales covering both window classes)."""
    from threedod.ops import roi_align_pallas as rap

    rng = np.random.RandomState(3)
    feats = fpn_features(rng)
    n = 1000
    xy = rng.uniform(0, 500, (n, 2)).astype(np.float32)
    wh = np.exp(rng.uniform(np.log(8), np.log(400), (n, 2))).astype(np.float32)
    boxes = jnp.asarray(np.clip(np.concatenate([xy, xy + wh], -1), 0, 660))

    ref = None
    for g in (1, 2, 4):
        rap.POOL_GROUP = g
        try:
            fn = jax.jit(lambda f, b: rap.multilevel_roi_align_tpu(f, b))
            out = np.asarray(fn(feats, boxes).astype(jnp.float32))
            if g == 1:
                ref = out
                err = 0.0
            else:
                err = float(np.abs(out - ref).max())
            t = timed(fn, feats, boxes)
            emit(experiment="pool_group", group=g,
                 us_per_1k_rois=round(t * 1e6, 1), parity_max_abs_err=err)
        except Exception as e:
            emit(experiment="pool_group", group=g,
                 error=f"{type(e).__name__}: {str(e)[:300]}")
    rap.POOL_GROUP = 1

    # expanded-taps weight build (TAPS_EXPANDED): 2 selector matmuls/step
    # instead of 4, taps pre-broadcast in XLA. Same workload; parity must
    # be exact vs the 4-matmul build at the same POOL_GROUP.
    saved_te, saved_g = rap.TAPS_EXPANDED, rap.POOL_GROUP
    try:
        for g in (1, 2):
            rap.POOL_GROUP = g
            rap.TAPS_EXPANDED = False
            fn = jax.jit(lambda f, b: rap.multilevel_roi_align_tpu(f, b))
            ref4 = np.asarray(fn(feats, boxes).astype(jnp.float32))
            t4 = timed(fn, feats, boxes)
            rap.TAPS_EXPANDED = True
            try:
                fn2 = jax.jit(lambda f, b: rap.multilevel_roi_align_tpu(f, b))
                out2 = np.asarray(fn2(feats, boxes).astype(jnp.float32))
                err = float(np.abs(out2 - ref4).max())
                t2 = timed(fn2, feats, boxes)
                emit(experiment="taps_expanded", group=g,
                     us_per_1k_rois_4matmul=round(t4 * 1e6, 1),
                     us_per_1k_rois_expanded=round(t2 * 1e6, 1),
                     parity_max_abs_err=err)
            except Exception as e:
                emit(experiment="taps_expanded", group=g,
                     error=f"{type(e).__name__}: {str(e)[:300]}")
    finally:
        rap.TAPS_EXPANDED, rap.POOL_GROUP = saved_te, saved_g


def kernel_cases():
    """Representative DLA34/FPN/RPN shapes at bs8 512x672 bf16."""
    from threedod.ops import fused_conv as fc

    rng = np.random.RandomState(11)

    def arr(*shape, scale=0.05):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)

    def bf(x):
        return x.astype(jnp.bfloat16)

    cases = []
    # BasicBlock at DLA level3/4-class shapes (also the ResNet layer body)
    for (h, w, c) in ((32, 42, 128), (16, 21, 256), (64, 84, 64)):
        x = bf(arr(BATCH, h, w, c, scale=0.5))
        bb = (arr(3, 3, c, c), arr(c, scale=0.1), arr(3, 3, c, c), arr(c, scale=0.1))
        ht = fc.pick_row_tile(h, w, c)
        if ht is None:
            continue
        cases.append((
            f"basic_block_{h}x{w}x{c}",
            lambda x, *bb, ht=ht: fc.fused_basic_block(x, *bb, ht=ht),
            fc.basic_block_reference, (x,) + bb,
        ))
    # stride-2 stage head (DLA Tree bottom / ResNet downsample)
    for (h2, w2, cin, cout) in ((64, 84, 64, 128), (32, 42, 128, 256)):
        x = bf(arr(BATCH, h2, w2, cin, scale=0.5))
        bbd = (arr(3, 3, cin, cout), arr(cout, scale=0.1),
               arr(3, 3, cout, cout), arr(cout, scale=0.1))
        wp_, bp_ = arr(1, 1, cin, cout), arr(cout, scale=0.1)
        ht = fc.pick_row_tile_down(h2 // 2, w2 // 2, cin, cout)
        if ht is None:
            continue
        cases.append((
            f"block_down_{h2}x{w2}x{cin}to{cout}",
            lambda x, *a, ht=ht: fc.fused_block_down(*((x,) + a), pool_residual=True, ht=ht),
            lambda x, *a: fc.block_down_reference(*((x,) + a), pool_residual=True),
            (x,) + bbd + (wp_, bp_),
        ))
    # FPN level at p2 (the widest plane — most of the FPN's bytes)
    for (h, w, cl) in ((128, 168, 64), (64, 84, 128)):
        f = bf(arr(BATCH, h, w, cl, scale=0.5))
        prev = bf(arr(BATCH, h // 2, w // 2, 256, scale=0.5))
        wl, bl = arr(cl, 256), arr(256, scale=0.1)
        wo, bo = arr(3, 3, 256, 256), arr(256, scale=0.1)
        cases.append((
            f"fpn_level_{h}x{w}x{cl}",
            lambda f, p, *a: fc.fused_fpn_level(f, p, *a, emit_cur=True, ht=8),
            fc.fpn_level_reference, (f, prev, wl, bl, wo, bo),
        ))
    # RPN head at p3
    x = bf(arr(BATCH, 64, 84, 256, scale=0.5))
    wc, bc = arr(3, 3, 256, 256), arr(256, scale=0.1)
    wh_, bh_ = arr(256, 15), arr(15, scale=0.1)
    ht = fc.pick_row_tile(64, 84, 256)
    if ht is not None:
        cases.append((
            "rpn_head_64x84x256",
            lambda x, *a, ht=ht: fc.fused_conv_relu_head(x, *a, ht=ht),
            fc.conv_relu_head_reference, (x, wc, bc, wh_, bh_),
        ))
    return cases


def bench_kernels():
    for name, fused, ref, args in kernel_cases():
        try:
            rfn = jax.jit(ref)
            ffn = jax.jit(fused)
            r = rfn(*args)
            f = ffn(*args)
            r0 = np.asarray(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32))
            f0 = np.asarray(jax.tree_util.tree_leaves(f)[0].astype(jnp.float32))
            err = float(np.abs(r0 - f0).max())
            t_ref = timed(rfn, *args)
            t_fused = timed(ffn, *args)
            emit(experiment="fused_kernel", kernel=name,
                 xla_us=round(t_ref * 1e6, 1), fused_us=round(t_fused * 1e6, 1),
                 speedup=round(t_ref / t_fused, 3), parity_max_abs_err=err)
        except Exception as e:
            emit(experiment="fused_kernel", kernel=name,
                 error=f"{type(e).__name__}: {str(e)[:300]}")


def _bench_batch(rng):
    from threedod.data.batch import Batch

    K = np.tile(np.array([[[530.0, 0, 336.0], [0, 530.0, 256.0], [0, 0, 1]]],
                         np.float32), (BATCH, 1, 1))
    return Batch(
        image=jnp.asarray(rng.randn(BATCH, 512, 672, 3).astype(np.float32)),
        image_hw=jnp.asarray(np.tile([512, 672], (BATCH, 1)).astype(np.int32)),
        K=jnp.asarray(K),
        im_scale_ratio=jnp.full((BATCH,), 730.0 / 512.0),
        image_id=jnp.zeros((BATCH,), jnp.int32),
    )


def _bench_model(backbone="dla34"):
    from threedod.config import Config
    from threedod.models import build_model

    cfg = Config()
    cfg.shapes.canvas_height = 512
    cfg.shapes.canvas_width = 672
    cfg.shapes.max_detections = 100
    cfg.model.roi_heads.num_classes = 38
    cfg.model.backbone = backbone
    cfg.model.dtype = "bfloat16"
    return build_model(cfg)


def trace_cases():
    """Record every fused-kernel call site (kind + exact shapes) the
    production models hit at the bench config, via jax.eval_shape with
    recording stubs — shape propagation only, nothing compiles or runs."""
    from threedod.ops import fused_conv as fc

    rec = []

    def spec(a):
        return (tuple(int(s) for s in a.shape), str(a.dtype))

    def bb(x, w1, b1, w2, b2, interpret=False, ht=32):
        rec.append(("bb", {"x": spec(x), "ht": ht}))
        return fc.basic_block_reference(x, w1, b1, w2, b2)

    def tt(x, children, bb_a, bb_b, wr, br, *, two_blocks=False,
           include_input_child=False, root_residual=False,
           interpret=False, ht=32):
        rec.append(("tt", {
            "x": spec(x), "children": tuple(int(c.shape[-1]) for c in children),
            "two_blocks": two_blocks, "include_input_child": include_input_child,
            "root_residual": root_residual, "cout": int(wr.shape[-1]), "ht": ht,
        }))
        return fc.tree_tail_reference(
            x, children, bb_a, bb_b, wr, br, two_blocks=two_blocks,
            include_input_child=include_input_child, root_residual=root_residual)

    def bd(x, w1, b1, w2, b2, wproj=None, bproj=None, *, pool_residual=True,
           interpret=False, ht=16):
        rec.append(("bd", {
            "x": spec(x), "cout": int(w1.shape[-1]), "proj": wproj is not None,
            "pool_residual": pool_residual, "ht": ht,
        }))
        return fc.block_down_reference(x, w1, b1, w2, b2, wproj, bproj,
                                       pool_residual=pool_residual)

    def rpn(x, wc, bc, wh, bh, *, interpret=False, ht=32):
        rec.append(("rpn", {"x": spec(x), "n_out": int(wh.shape[-1]), "ht": ht}))
        return fc.conv_relu_head_reference(x, wc, bc, wh, bh)

    def fpn(f, prev, wlat, blat, wout, bout, *, emit_cur=True, interpret=False,
            ht=16):
        rec.append(("fpn", {
            "f": spec(f), "prev": spec(prev), "c": int(wlat.shape[-1]),
            "emit_cur": emit_cur, "ht": ht,
        }))
        r = fc.fpn_level_reference(f, prev, wlat, blat, wout, bout)
        return r if emit_cur else r[0]

    stubs = {"fused_basic_block": bb, "fused_tree_tail": tt,
             "fused_block_down": bd, "fused_conv_relu_head": rpn,
             "fused_fpn_level": fpn}
    saved = {k: getattr(fc, k) for k in stubs}
    state = (fc.ENABLE_ON_TPU, fc.IGNORE_HW_TABLE, fc.FORCE_INTERPRET)
    # FORCE_INTERPRET activates the call sites on any backend; the kernels
    # themselves are stubbed, so nothing pallas ever traces or compiles.
    fc.ENABLE_ON_TPU = fc.IGNORE_HW_TABLE = fc.FORCE_INTERPRET = True
    for k, v in stubs.items():
        setattr(fc, k, v)
    try:
        rng = np.random.RandomState(0)
        batch = _bench_batch(rng)
        for backbone in ("dla34", "resnet34"):
            model = _bench_model(backbone)
            vshapes = jax.eval_shape(lambda b: model.init(
                {"params": jax.random.PRNGKey(0),
                 "sampling": jax.random.PRNGKey(1)}, b, train=False), batch)
            jax.eval_shape(lambda v, b: model.apply(v, b, train=False),
                           vshapes, batch)
    finally:
        for k, v in saved.items():
            setattr(fc, k, v)
        fc.ENABLE_ON_TPU, fc.IGNORE_HW_TABLE, fc.FORCE_INTERPRET = state

    uniq, seen = [], set()
    for kind, d in rec:
        key = (kind, tuple(sorted((k, tuple(v) if isinstance(v, (tuple, list))
                                   else v) for k, v in d.items())))
        if key not in seen:
            seen.add(key)
            uniq.append((kind, d))
    return uniq


def _replay_fns(kind, d, rng):
    """(label, winners_key, fused_fn, ref_fn, args) for one traced case."""
    from threedod.ops import fused_conv as fc

    def arr(*shape, scale=0.1, dt=jnp.bfloat16):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale).astype(dt)

    ht = d["ht"]
    if kind == "bb":
        (B, H, W, C), _ = d["x"]
        x = arr(B, H, W, C, scale=0.5)
        a = (x, arr(3, 3, C, C, dt=jnp.float32), arr(C, dt=jnp.float32),
             arr(3, 3, C, C, dt=jnp.float32), arr(C, dt=jnp.float32))
        return (f"bb_{H}x{W}x{C}", ("bb", H, W, C, C, False),
                lambda *a: fc.fused_basic_block(*a, ht=ht),
                fc.basic_block_reference, a)
    if kind == "tt":
        (B, H, W, C), _ = d["x"]
        x = arr(B, H, W, C, scale=0.5)
        children = tuple(arr(B, H, W, ck, scale=0.5) for ck in d["children"])
        mk_bb = lambda: (arr(3, 3, C, C, dt=jnp.float32), arr(C, dt=jnp.float32),
                         arr(3, 3, C, C, dt=jnp.float32), arr(C, dt=jnp.float32))
        bb_a = mk_bb() if d["two_blocks"] else None
        bb_b = mk_bb()
        rows = 2 * C + sum(d["children"]) + (C if d["include_input_child"] else 0)
        wr = arr(rows, d["cout"], dt=jnp.float32)
        br = arr(d["cout"], dt=jnp.float32)
        kw = dict(two_blocks=d["two_blocks"],
                  include_input_child=d["include_input_child"],
                  root_residual=d["root_residual"])
        label = (f"tt_{H}x{W}x{C}_{'2b' if d['two_blocks'] else '1b'}"
                 f"_ch{','.join(map(str, d['children'])) or '0'}")
        return (label, ("tt", H, W, C, d["cout"], bool(d["two_blocks"])),
                lambda *a: fc.fused_tree_tail(*a, ht=ht, **kw),
                lambda *a: fc.tree_tail_reference(*a, **kw),
                (x, children, bb_a, bb_b, wr, br))
    if kind == "bd":
        (B, H2, W2, Cin), _ = d["x"]
        co = d["cout"]
        x = arr(B, H2, W2, Cin, scale=0.5)
        a = [x, arr(3, 3, Cin, co, dt=jnp.float32), arr(co, dt=jnp.float32),
             arr(3, 3, co, co, dt=jnp.float32), arr(co, dt=jnp.float32)]
        if d["proj"]:
            a += [arr(Cin, co, dt=jnp.float32), arr(co, dt=jnp.float32)]
        kw = dict(pool_residual=d["pool_residual"])
        label = f"bd_{H2}x{W2}x{Cin}to{co}{'_pool' if d['pool_residual'] else ''}"
        return (label, ("bd", H2 // 2, W2 // 2, Cin, co, bool(d["pool_residual"])),
                lambda *a: fc.fused_block_down(*a, ht=ht, **kw),
                lambda *a: fc.block_down_reference(*a, **kw), tuple(a))
    if kind == "rpn":
        (B, H, W, C), _ = d["x"]
        n_out = d["n_out"]
        a = (arr(B, H, W, C, scale=0.5), arr(3, 3, C, 256, dt=jnp.float32),
             arr(256, dt=jnp.float32), arr(256, n_out, dt=jnp.float32),
             arr(n_out, dt=jnp.float32))
        return (f"rpn_{H}x{W}x{C}", ("rpn", H, W, C, n_out, False),
                lambda *a: fc.fused_conv_relu_head(*a, ht=ht),
                fc.conv_relu_head_reference, a)
    if kind == "fpn":
        (B, H, W, Cl), _ = d["f"]
        (_, Hp, Wp_, C), _ = d["prev"]
        emit = d["emit_cur"]
        a = (arr(B, H, W, Cl, scale=0.5), arr(B, Hp, Wp_, C, scale=0.5),
             arr(Cl, C, dt=jnp.float32), arr(C, dt=jnp.float32),
             arr(3, 3, C, C, dt=jnp.float32), arr(C, dt=jnp.float32))
        return (f"fpn_{H}x{W}x{Cl}{'_emit' if emit else ''}",
                ("fpn", H, W, Cl, C, bool(emit)),
                lambda *a: fc.fused_fpn_level(*a, emit_cur=emit, ht=ht),
                lambda *a: fc.fpn_level_reference(*a) if emit
                else fc.fpn_level_reference(*a)[0], a)
    raise ValueError(kind)


def bench_sweep(start=0, filt=None):
    """Trace the production models' fused call sites, then replay each
    standalone on the chip vs its XLA reference: parity + timing + the
    HW_WINNERS key, ready to paste into ops/fused_conv.py. ``start``/``filt``
    resume or subset an interrupted sweep (case order is deterministic)."""
    cases = trace_cases()
    emit(experiment="sweep", traced_cases=len(cases))
    cases = cases[start:]
    rng = np.random.RandomState(7)
    winners = {}
    for kind, d in cases:
        if filt and filt not in f"{kind}_{d}":
            continue
        # try the picker's tile first; when it loses or crashes the Mosaic
        # compiler, retry with ht=8 (smaller VMEM working set)
        cand = [d["ht"]] + ([8] if d["ht"] != 8 else [])
        for ht in cand:
            label, key, fused, ref, args = _replay_fns(kind, dict(d, ht=ht), rng)
            try:
                rfn = jax.jit(ref)
                ffn = jax.jit(fused)
                r0 = np.asarray(jax.tree_util.tree_leaves(rfn(*args))[0]
                                .astype(jnp.float32))
                f0 = np.asarray(jax.tree_util.tree_leaves(ffn(*args))[0]
                                .astype(jnp.float32))
                err = float(np.abs(r0 - f0).max())
                rel = err / max(1e-6, float(np.abs(r0).max()))
                t_ref = timed(rfn, *args)
                t_fused = timed(ffn, *args)
                sp = t_ref / t_fused
                ok = rel < 0.02 and sp >= 1.1
                emit(experiment="sweep_kernel", kernel=label, ht=ht,
                     key=list(key), xla_us=round(t_ref * 1e6, 1),
                     fused_us=round(t_fused * 1e6, 1), speedup=round(sp, 3),
                     parity_max_abs_err=err, parity_rel=round(rel, 5),
                     winner=ok)
                if ok:
                    winners[key] = ht
                    break
            except Exception as e:
                emit(experiment="sweep_kernel", kernel=label, ht=ht,
                     key=list(key),
                     error=f"{type(e).__name__}: {str(e)[:200]}")
    emit(experiment="sweep_winners",
         table={repr(k): v for k, v in sorted(winners.items())})
    return winners


def bench_model(backbone="dla34"):
    """Full inference step, stock vs fused trunk (bench.py config)."""
    from threedod.ops import fused_conv as fc

    rng = np.random.RandomState(0)
    batch = _bench_batch(rng)
    model = _bench_model(backbone)
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        b, train=False))(batch)

    results = {}
    for name, gate in (("stock", False), ("fused", True)):
        fc.ENABLE_ON_TPU = gate
        try:
            infer = jax.jit(lambda v, b: model.apply(v, b, train=False))
            det = infer(variables, batch)
            scores = np.asarray(det.scores.astype(jnp.float32))
            t = timed(infer, variables, batch)
            results[name] = (t, scores)
            emit(experiment="model_infer", backbone=backbone, fused=name,
                 ms_per_step=round(t * 1e3, 2),
                 ims_per_s=round(BATCH / t, 1))
        except Exception as e:
            emit(experiment="model_infer", backbone=backbone, fused=name,
                 error=f"{type(e).__name__}: {str(e)[:300]}")
    fc.ENABLE_ON_TPU = False
    if "stock" in results and "fused" in results:
        s0 = np.sort(results["stock"][1].ravel())[::-1]
        s1 = np.sort(results["fused"][1].ravel())[::-1]
        emit(experiment="model_parity", backbone=backbone,
             sorted_score_max_abs_diff=float(np.abs(s0 - s1).max()),
             speedup=round(results["stock"][0] / results["fused"][0], 3))


def bench_model_groups(backbone="dla34"):
    """Model-level ablation of the HW_WINNERS table by kernel kind: the
    standalone sweep's XLA references overstate in-context cost (inside the
    full program XLA fuses those subgraphs with their neighbours, and a
    pallas_call boundary breaks that), so each kind must justify itself in
    the full model, measured back-to-back in one process."""
    from threedod.ops import fused_conv as fc

    rng = np.random.RandomState(0)
    batch = _bench_batch(rng)
    model = _bench_model(backbone)
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        b, train=False))(batch)

    full = dict(fc.HW_WINNERS)
    kinds = sorted({k[0] for k in full})
    tables = [("stock", {})] + [
        (kind, {k: v for k, v in full.items() if k[0] == kind})
        for kind in kinds
    ]
    results = {}
    for name, table in tables:
        fc.HW_WINNERS = table
        fc.ENABLE_ON_TPU = bool(table)
        try:
            infer = jax.jit(lambda v, b: model.apply(v, b, train=False))
            jax.device_get(infer(variables, batch).scores.sum())
            t = timed(infer, variables, batch)
            results[name] = t
            emit(experiment="model_group", backbone=backbone, group=name,
                 n_entries=len(table), ms_per_step=round(t * 1e3, 2),
                 delta_ms_vs_stock=None if name == "stock"
                 else round((t - results["stock"]) * 1e3, 2))
        except Exception as e:
            emit(experiment="model_group", backbone=backbone, group=name,
                 error=f"{type(e).__name__}: {str(e)[:200]}")
    fc.HW_WINNERS = full
    fc.ENABLE_ON_TPU = False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only",
                    choices=["pool", "trunk", "model", "kernels", "sweep",
                             "groups"],
                    default=None)
    ap.add_argument("--backbone", default="dla34")
    ap.add_argument("--from", dest="start", type=int, default=0,
                    help="resume the sweep at this traced-case index")
    ap.add_argument("--filter", default=None,
                    help="only sweep cases whose kind/spec contains this")
    args = ap.parse_args()

    import bench
    if "cpu" not in os.environ.get("JAX_PLATFORMS", "").lower():
        if not bench.wait_for_tpu():
            emit(error="TPU relay unreachable after retries")
            sys.exit(2)
    emit(backend=jax.default_backend(), devices=str(jax.devices()))

    if args.only in (None, "pool"):
        bench_pool_groups()
    if args.only in ("kernels", "trunk"):
        bench_kernels()
    if args.only in (None, "sweep"):
        bench_sweep(start=args.start, filt=args.filter)
    if args.only in (None, "model"):
        bench_model("dla34")
        bench_model("resnet34")
    if args.only == "groups":
        bench_model_groups(args.backbone)


if __name__ == "__main__":
    main()
