"""Pallas TPU kernel for multilevel ROIAlign (the framework's hottest op).

Replaces Detectron2's CUDA ROIAlignV2 on the hot path (reference pooler
construction roi_heads.py:801-806, 2075-2080). Profiling on TPU v5e showed
element-gather ROIAlign at ~60 GB/s effective (92 ms of a 138 ms Cube R-CNN
forward); the XLA windowed formulation (ops/roi_align.py
multilevel_roi_align_windowed) cut that to ~50 ms but still round-trips the
(N, 48, 48, C) windows through HBM. This kernel keeps them in VMEM:

  per grid step (R ROIs):
    1. async-DMA each ROI's (32, 48, C) window from the stacked padded
       level buffer in HBM into VMEM (double-buffered across grid steps so
       step i's compute overlaps step i+1's DMAs),
    2. ONE transpose-free MXU matmul per ROI applies the full separable
       interpolation: (S², H·W) x (H·W, C), with the outer-product weight
       matrix M = ay ⊗ ax built on the MXU from per-axis tap weights
       (precomputed in XLA) via constant 0/1 selector matmuls,
    3. write the (S², C) pooled block ((S, S) split is a free reshape
       outside).

Traffic = windows read once + outputs written once — no intermediates.
Semantics identical to multilevel_roi_align_windowed *at the same window
budget* (same Ay/Ax weights, same level-bump rule — the fallback in
multilevel_roi_align_tpu is invoked with window=WINDOW_Y so the two paths
assign identical levels); parity-tested against it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import assign_fpn_levels

# Tests set this to run the kernels on CPU via the Pallas interpreter
# (forward AND backward RMW semantics hold there), so the CPU suite pins the
# real kernel — not only the XLA windowed oracle. Read at trace time by both
# pallas_call sites.
FORCE_INTERPRET = False

# Group-block-diagonal pooling (see _kernel): fuse POOL_GROUP ROIs into one
# m=POOL_GROUP*S² matmul, dividing the pooling op count by POOL_GROUP (the
# kernel is MXU-op-latency bound, not FLOP bound). Measured on a real v5e
# (tools/measure_fused.py --only pool, production 1k-ROI mixed-scale
# workload): g=2 bit-exact vs g=1 and 1.08x faster (1359 vs 1468 us/1k
# ROIs); g=4 crashes the axon Mosaic compiler (kept interpret-tested for
# when the toolchain catches up). bench.py's per-round parity gate pins the
# enabled configuration on hardware every round.
POOL_GROUP = 2

# Level-buffer assembly form (see _pallas_forward): True = pad+concat the
# levels into the Y-stacked plane, False = zeros + update-slice chain.
# Values identical (interpret-parity pinned); the forms differ only in
# which operands XLA relayouts for the kernel operand. Measured in-model
# on v5e (bracketed, DESIGN 17): 26.19 / 26.64(DUS) / 26.96 ms/step —
# noise-level, no confirmed win, so the incumbent DUS form stays default.
BUFFER_CONCAT = False

# Expanded-taps weight build (see _kernel/build_m): when True, the per-axis
# tap weights arrive pre-broadcast to (R, S², WINDOW) rows (an XLA
# broadcast outside the kernel — free fusion there; Mosaic can't lower the
# broadcast-reshape in-kernel), so M = ay ⊗ ax takes 2 selector matmuls per
# grid step instead of 4 (the t_y/t_x spread stage folds into the row
# dimension). Bit-identical (selector matmuls move single elements; the
# final VPU product is unchanged). The kernel is MXU-op-latency bound, so
# -2 ops/step is the point; +10 KB/ROI of tap-input DMA is ~1% of the
# window bytes. OFF until the two-stage hardware gate passes (interpret
# parity is pinned for both settings by the CPU suite).
TAPS_EXPANDED = False

# Grouped RMW backward (see _bwd_kernel / _pallas_backward): when True and
# the call is batched with B >= rois_per_step, ROIs are reordered
# image-interleaved (k-th processed ROI comes from image k % B), so every
# in-step group of R <= B ROIs is pairwise DISJOINT in the Y-stacked plane
# (different images own different row bands — a window spills at most
# WINDOW_Y - 1 rows past its level, strictly inside its image's h_stack
# band). The kernel then runs the group's reads/adds/writes concurrently
# and drains all writes at the step boundary, cutting the per-ROI
# serialized RMW latency ~R-fold. BIT-IDENTICAL accumulation: only
# same-image ROIs share dbuf cells, and the interleave preserves each
# image's ROI order (one per step, steps in original order).
BWD_GROUPED = True

# Pipelined RMW backward (see _bwd_kernel): when True, the next ROI's
# window read is issued before the in-flight write drains whenever the two
# windows are provably disjoint (precomputed conf flags). Measured on v5e
# (train shapes, bs8 x 512 clustered ROIs): NEUTRAL-to-slightly-slower
# (12.8 vs 12.55 ms fwd+bwd with the narrow windows; 14.9 vs 14.9 at the
# old 48-wide windows) — the RMW is HBM-traffic bound, not latency bound,
# so overlapping read/write DMAs buys nothing and the extra pl.when
# branches cost scalar-core time. Kept behind the flag (interpret-parity
# pinned) for a future toolchain; the traffic lever that DID transfer is
# the narrow f32 window family (BWD_X below).
BWD_PIPELINE = False

WINDOW_Y = 32        # rows per ROI window. Canonical FPN assignment
                     # (floor(k0+log2(sqrt(area)/224))) bounds sqrt(area) to
                     # <28 cells at the assigned level, but the *max extent*
                     # of a non-square ROI can exceed the 30-cell tap budget
                     # (32 - 2 taps): ROIs with aspect > (30/28)^2 ~ 1.15
                     # near the top of a bucket take the level bump below and
                     # pool one level coarser than canonical Detectron2
                     # (tests/test_ops.py::test_window_bump_rate measures the
                     # affected fraction; docs/DESIGN.md §9 records the
                     # synth-AP effect).
WINDOW_X = 48        # cols per ROI window: 32 + 16 slack so the dynamic x
                     # start can be rounded down to the 16-sublane tile
                     # (bf16 tiling; also valid for f32's 8)
S_PAD = 8  # output bins padded 7 -> 8 (f32 sublane tile)

# Two window classes. Canonical FPN assignment puts sqrt(area) in [14, 28)
# cells at the assigned level — EXCEPT on the clamped ends, where p2 absorbs
# every smaller ROI. Those small ROIs (max extent <= 14 cells -> taps fit in
# 16 rows / 16+16-slack cols) dominate real detection workloads, and their
# windows carry 3x fewer bytes (16x32 vs 32x48). The kernel DMAs only the
# small window for them; the pooling matmul is unchanged because the tap
# weights beyond the small window are exactly zero (the VMEM scratch is
# zeroed once at grid start so stale cells can never be NaN/Inf garbage —
# afterwards stale cells only ever hold finite feature bytes).
SMALL_Y = 16
SMALL_X = 32
SMALL_MAX_CELLS = 14.0

# Backward x-window family: the grad buffer is f32, whose Mosaic sublane
# tile is 8 (not bf16's 16), so the RMW windows only need 7 columns of
# align slack instead of 15 — 32-tap budget + 7 = 40 (big), 16 + 7 = 24
# (small). 17-25% less read+write traffic on a traffic-bound kernel, with
# identical results (the trimmed columns carry exactly-zero tap weights).
BWD_X = 40
BWD_SMALL_X = 24
BWD_ALIGN = 8


def _rois_per_step(itemsize: int) -> int:
    # window scratch: 2 (phases) * R * 32 * 48 * C * itemsize; ~12.6 MB at
    # C=256 bf16 R=8 — under the ~16 MB VMEM budget
    return 8 if itemsize <= 2 else 2


def _kernel(scal_ref, nxt_ref, ay_ref, ax_ref, buf_ref, out_ref, win, sem,
            taps_expanded: bool = False):
    """One grid step: pool ROIS_PER_STEP ROIs.

    scal/nxt: (1, 3, R) int32 SMEM blocks — rows (y0, x0, cls) for THIS
    grid step's ROIs and for the NEXT step's (clipped to the last step);
    blocked SMEM instead of whole-array scalar prefetch so on-chip use is
    O(R), independent of total ROI count (a batched 8000-ROI call's
    prefetch arrays blew the 16 MB scoped-VMEM budget by exactly their
    growth). y0 is global into the y-stacked level plane (batch plane
    offset folded in); ay/ax: (R, S_PAD, WINDOW) blocks in VMEM;
    buf_ref: full (H_stack, W, C) in HBM; out block
    (R, S_PAD, S_PAD, C); win scratch (2, R, WINDOW, WINDOW, C) + DMA sems,
    double-buffered across grid steps: step i's compute overlaps step i+1's
    window DMAs (without this the DMA queue drains at every step boundary —
    measured ~475 GB/s vs ~800 GB/s pipelined at the 32x48 window size).
    Small-class ROIs (cls == 1) DMA only the (SMALL_Y, SMALL_X) corner of
    their slot; the rest of the slot holds zeros/stale finite values that
    the pooling matmul multiplies by exactly-zero tap weights. (A dedicated
    small scratch + per-class K=512 matmul was tried and measured SLOWER —
    the extra small-m construction matmuls cost more than the smaller K
    saves; so did a batched-einsum pooling of all R ROIs. See DESIGN 9b.)
    """
    r = ay_ref.shape[0]
    c = buf_ref.shape[-1]
    i = pl.program_id(0)
    num = pl.num_programs(0)
    phase = jax.lax.rem(i, 2)

    def dma_big(sref, j, ph):
        return pltpu.make_async_copy(
            buf_ref.at[
                pl.ds(sref[0, 0, j], WINDOW_Y),
                pl.ds(pl.multiple_of(sref[0, 1, j], 16), WINDOW_X),
                :,
            ],
            win.at[ph, j],
            sem.at[ph, j],
        )

    def dma_small(sref, j, ph):
        return pltpu.make_async_copy(
            buf_ref.at[
                pl.ds(sref[0, 0, j], SMALL_Y),
                pl.ds(pl.multiple_of(sref[0, 1, j], 16), SMALL_X),
                :,
            ],
            win.at[ph, j, pl.ds(0, SMALL_Y), pl.ds(0, SMALL_X), :],
            sem.at[ph, j],
        )

    def start(sref, j, ph):
        small = sref[0, 2, j] == 1

        @pl.when(small)
        def _():
            dma_small(sref, j, ph).start()

        @pl.when(jnp.logical_not(small))
        def _():
            dma_big(sref, j, ph).start()

    def wait(sref, j, ph):
        small = sref[0, 2, j] == 1

        @pl.when(small)
        def _():
            dma_small(sref, j, ph).wait()

        @pl.when(jnp.logical_not(small))
        def _():
            dma_big(sref, j, ph).wait()

    @pl.when(i == 0)
    def _():
        # one-time scratch zero so small-window slots never expose garbage
        # (NaN/Inf bits) to the zero-weight taps of the pooling matmul
        win[...] = jnp.zeros_like(win)
        for j in range(r):
            start(scal_ref, j, phase)

    @pl.when(i + 1 < num)
    def _():
        for j in range(r):
            start(nxt_ref, j, 1 - phase)

    # f32 windows would otherwise go through the MXU's default bf16-truncated
    # passes (~1e-2 abs error); bf16 windows are already exact in native mode
    # (bf16 multiply, f32 accumulate).
    dt = ay_ref.dtype
    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    # One transpose-free matmul per ROI. The separable bilinear pooling
    #   o[sy, sx, c] = sum_{h,w} ay[sy, h] * ax[sx, w] * win[h, w, c]
    # is a single (S², H·W) x (H·W, C) MXU matmul against the window viewed
    # as (H·W, C) — a free view because WINDOW_X is a multiple of the
    # sublane tile. The earlier two-matmul form needed two VPU relayouts
    # (transposes) per ROI, which dominated the kernel time. The outer
    # product M = ay ⊗ ax is built on the MXU via constant 0/1 selector
    # matmuls (exact single-element copies): Mosaic cannot lower the
    # broadcast-reshape form ("unsupported shape cast"). The construction
    # is batched over all R ROIs of the step — 4 matmuls per STEP, not per
    # ROI: the kernel is MXU-op-latency bound (measured 1.3 us/ROI at 5
    # matmuls/ROI vs 0.7 us DMA), so op count, not FLOPs, is what matters.
    ss = S_PAD * S_PAD

    def build_m(taps_y, taps_x, wy, wx):
        """All R ROIs' outer-product weight matrices (R*S², wy*wx) in 4
        matmuls total — or 2 with taps_expanded, where taps arrive
        pre-broadcast to (R, S², WINDOW) rows so the spread-to-rows stage
        is already folded in. (Mosaic requires 32-bit matmul accumulators;
        the f32->dt casts are exact because selector matmuls move single
        elements.)"""
        hw = wy * wx
        hh = jax.lax.broadcasted_iota(jnp.int32, (wy, hw), 0)
        ch = jax.lax.broadcasted_iota(jnp.int32, (wy, hw), 1)
        col_y = (ch // wx == hh).astype(dt)  # col (h,w) <- ay col h
        ww = jax.lax.broadcasted_iota(jnp.int32, (wx, hw), 0)
        cw = jax.lax.broadcasted_iota(jnp.int32, (wx, hw), 1)
        col_x = (cw % wx == ww).astype(dt)   # col (h,w) <- ax col w
        if taps_expanded:
            # taps are (R, S², WINDOW): one matmul spreads each axis's taps
            # straight to the (R*S², h*w) weight rows
            return jnp.dot(
                taps_y.reshape(r * ss, wy), col_y,
                preferred_element_type=jnp.float32, precision=prec,
            ).astype(dt) * jnp.dot(
                taps_x.reshape(r * ss, wx), col_x,
                preferred_element_type=jnp.float32, precision=prec,
            ).astype(dt)
        # spread taps to the flattened (h, w) axis for all R ROIs at once
        t_y = jnp.dot(
            taps_y.reshape(r * S_PAD, wy), col_y,
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)
        t_x = jnp.dot(
            taps_x.reshape(r * S_PAD, wx), col_x,
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)
        # scatter rows (j, sy) / (j, sx) -> (j, sy, sx)
        rr = jax.lax.broadcasted_iota(jnp.int32, (r * ss, r * S_PAD), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (r * ss, r * S_PAD), 1)
        j_row = rr // ss
        sel_y = ((j_row * S_PAD + (rr % ss) // S_PAD) == cc).astype(dt)
        sel_x = ((j_row * S_PAD + rr % S_PAD) == cc).astype(dt)
        return jnp.dot(
            sel_y, t_y, preferred_element_type=jnp.float32, precision=prec
        ).astype(dt) * jnp.dot(
            sel_x, t_x, preferred_element_type=jnp.float32, precision=prec
        ).astype(dt)

    m_all = build_m(ay_ref[...], ax_ref[...], WINDOW_Y, WINDOW_X)

    g = POOL_GROUP
    if g > 1 and r % g == 0:
        # group-block-diagonal pooling: fuse g ROIs into one m=g*S² matmul.
        # m=S²=64 pads to the 128-row MXU tile anyway, so a (g·64, g·hw)
        # block-diagonal matmul does the same useful work per tile-pass as
        # g separate (64, hw) matmuls while dividing the pooling op count
        # by g — the kernel is MXU-op-latency bound, not FLOP bound
        # (DESIGN 9b item 4). The off-diagonal blocks are exact zeros, so
        # the f32 accumulation is unchanged (CPU-interpret parity: exact
        # in f32, identical bf16 rounding to the per-ROI path).
        hw = WINDOW_Y * WINDOW_X
        rows = jax.lax.broadcasted_iota(jnp.int32, (g * ss, g * hw), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (g * ss, g * hw), 1)
        group_mask = ((rows // ss) == (cols // hw)).astype(dt)
        for q in range(r // g):
            for j in range(g):
                wait(scal_ref, g * q + j, phase)
            mq = m_all[g * q * ss : (g * q + g) * ss]
            o = jnp.dot(
                jnp.concatenate([mq] * g, axis=1) * group_mask,
                win[phase, g * q : g * q + g].reshape(g * hw, c),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            for j in range(g):
                out_ref[g * q + j] = o[j * ss : (j + 1) * ss].astype(out_ref.dtype)
    else:
        for j in range(r):
            wait(scal_ref, j, phase)
            o = jnp.dot(
                m_all[j * ss : (j + 1) * ss],
                win[phase, j].reshape(WINDOW_Y * WINDOW_X, c),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            out_ref[j] = o.astype(out_ref.dtype)


def _axis_weights(coords, origin, limit, n, s, r, window):
    """(N, s*r) sample coords -> (N, S_PAD, window) bin-averaged tap weights.

    ROIAlignV2 border rule (matches ops/roi_align.py round-5 fix): a sample
    zeroes only outside [-1, limit]; inside the band its coordinate clamps
    into [0, limit-1], so border samples take the edge cell at FULL weight.
    Taps beyond a level's rows still carry exactly-zero weight (the +1 tap
    at a clamped coordinate has frac == 0), preserving the batched-plane
    no-cross-image-spill invariant (_prep docstring)."""
    lim = limit[:, None].astype(coords.dtype)
    band = (coords >= -1.0) & (coords <= lim)
    cc = jnp.clip(coords, 0.0, lim - 1.0)
    f0 = jnp.floor(cc)
    frac = cc - f0
    i0 = f0.astype(jnp.int32) - origin[:, None]
    tap_idx = jnp.arange(window)[None, None, :]
    w_tap = (
        (tap_idx == i0[:, :, None]) * ((1.0 - frac)[:, :, None])
        + (tap_idx == i0[:, :, None] + 1) * frac[:, :, None]
    ) * band[:, :, None]
    w = w_tap.reshape(n, s, r, window).mean(axis=2)
    return jnp.pad(w, ((0, 0), (0, S_PAD - s), (0, 0)))


def _prep(features, boxes, output_size, strides, sampling_ratio, rois_per_step,
          win_x=WINDOW_X, small_x=SMALL_X, align=16):
    """Shared forward/backward geometry: padded buffer dims, level
    assignment (with the fit-budget bump), window origins, and per-axis tap
    weights, all padded to the grid multiple.

    win_x/small_x/align parameterize the x-window family: the forward's
    bf16 feature buffer needs 16-sublane-aligned slices (win_x=48 = 32-tap
    budget + 15 align slack), while the backward's f32 grad buffer only
    needs 8 — its narrower windows (40/24) move 17-25% fewer RMW bytes for
    identical results (the extra columns carry exactly-zero tap weights
    either way). The y window and the level-bump rule are shared, so both
    passes always agree on level assignment and sampling positions.

    Batched form: features (B, H_l, W_l, C) + boxes (B, N, 4). The B images
    stack along Y in the SAME plane (image b's rows start at b*h_stack), so
    the unmodified single-plane kernels pool/accumulate the whole batch in
    ONE pallas_call — y origins just gain an img*h_stack offset. This
    replaces vmap-over-images, which lowers a scalar-prefetch pallas_call
    to a lax.map-style while loop (per-image dynamic-slice/update-slice of
    the full stacked buffer + layout copies: measured 28 of the 80 ms
    supervised train step, trace 2026-08-20). Cross-image window spill is
    impossible: each image's plane ends with a WINDOW_Y tail, y origins are
    clipped inside the assigned level, and taps beyond a level's rows carry
    exactly-zero weight; the backward RMW therefore never writes a nonzero
    value into another image's rows either."""
    batched = boxes.ndim == 3
    if not batched:
        features = {k: v[None] for k, v in features.items()}
        boxes = boxes[None]
    names = sorted(features.keys())
    level_ids = [int(n[1:]) for n in names]
    lmin, lmax = min(level_ids), max(level_ids)
    c = features[names[0]].shape[-1]
    bsz = boxes.shape[0]
    # levels stack along Y in ONE (H_stack, w0, C) plane (sum of level
    # heights + a WINDOW_Y tail so any window fits) instead of a
    # (L, max_h, w0, C) cube: the buffer is rebuilt from the FPN outputs
    # every step, and the stacked form moves ~4.5x fewer bytes. Windows
    # near a level's bottom edge read into the next level's rows — exactly
    # zero tap weight there (the limit masks in _axis_weights), so reads
    # are harmless and the backward's RMW adds zeros. Width padded so the
    # clip bound (w0 - WINDOW_X) is 16-aligned — otherwise right-edge ROIs
    # get a rounded-down origin whose window misses their last taps.
    w0 = max(features[names[0]].shape[2], win_x)
    w0 = win_x + -(-(w0 - win_x) // align) * align
    dtype = features[names[0]].dtype

    hs = [features[nm].shape[1] for nm in names]
    ws = [features[nm].shape[2] for nm in names]
    offs = np.concatenate([[0], np.cumsum(hs)[:-1]]).astype(np.int32)
    h_stack = int(sum(hs)) + WINDOW_Y
    hs_a = jnp.asarray(hs)
    ws_a = jnp.asarray(ws)
    offs_a = jnp.asarray(offs)
    strides_arr = jnp.asarray([float(strides[nm]) for nm in names])

    n_img = boxes.shape[1]
    boxes = boxes.reshape(-1, 4)
    n = boxes.shape[0]  # total ROIs across the batch
    assign = assign_fpn_levels(boxes, lmin, lmax) - lmin
    ext = jnp.maximum(boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1])
    ext_cells = ext / float(strides[names[0]])
    # fit budget: y window 32 (-2 taps); x window 48 covers 31 (-2 taps,
    # -15 worst-case align slack) >= the y budget, so y governs the bump
    need = jnp.ceil(jnp.log2(jnp.maximum(ext_cells / (WINDOW_Y - 2), 1e-6)))
    assign = jnp.maximum(assign, jnp.clip(need, 0, lmax - lmin).astype(jnp.int32))

    lvl_h = hs_a[assign]
    lvl_w = ws_a[assign]
    scale = 1.0 / strides_arr[assign]

    s, r = output_size, sampling_ratio
    b = boxes * scale[:, None] - 0.5
    x1, y1 = b[:, 0], b[:, 1]
    bw = jnp.maximum(b[:, 2] - x1, 1e-6)
    bh = jnp.maximum(b[:, 3] - y1, 1e-6)
    grid = (jnp.arange(s * r) + 0.5) / r
    sx = x1[:, None] + grid[None, :] * (bw / s)[:, None]
    sy = y1[:, None] + grid[None, :] * (bh / s)[:, None]

    # window class: max extent <= 14 cells at the assigned level -> the taps
    # fit in the (SMALL_Y, SMALL_X) window (span*13/14 + 2 taps <= 16 rows;
    # x adds <= 15 cells of 16-align slack within the 32 cols)
    ext_lvl = ext * scale
    small = (ext_lvl <= SMALL_MAX_CELLS).astype(jnp.int32)

    # y origin: local to the assigned level, clipped inside its rows; taps
    # past the level's last row carry zero weight, so a window that spills
    # into the next level's rows (or the tail pad) reads only dead taps
    fy = jnp.floor(sy[:, 0]).astype(jnp.int32)
    y0w = jnp.clip(fy, 0, jnp.maximum(lvl_h - 1, 0))
    # x origin rounded down to the 16-sublane tile (Mosaic slice constraint
    # for bf16; also satisfies f32's 8); both clip bounds are 16-aligned
    fx = jnp.floor(sx[:, 0]).astype(jnp.int32)
    x0w = jnp.where(
        small == 1,
        jnp.clip(fx, 0, w0 - small_x),
        jnp.clip(fx, 0, w0 - win_x),
    )
    x0w = (x0w // align) * align

    ay = _axis_weights(sy, y0w, lvl_h, n, s, r, WINDOW_Y).astype(dtype)
    ax = _axis_weights(sx, x0w, lvl_w, n, s, r, win_x).astype(dtype)

    # fold the level offset in: kernels index the stacked plane directly —
    # plus the image's plane offset in the Y-stacked batch
    img_id = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), n_img)
    y0g = img_id * h_stack + offs_a[assign] + y0w

    # pad N to the grid multiple (padded ROIs carry zero weights -> no-ops;
    # class "small" so they DMA the cheap window)
    n_pad = -(-n // rois_per_step) * rois_per_step
    if n_pad != n:
        pad = n_pad - n
        y0g = jnp.pad(y0g, (0, pad))
        x0w = jnp.pad(x0w, (0, pad))
        small = jnp.pad(small, (0, pad), constant_values=1)
        ay = jnp.pad(ay, ((0, pad), (0, 0), (0, 0)))
        ax = jnp.pad(ax, ((0, pad), (0, 0), (0, 0)))
    return dict(
        names=names, c=c, h_stack=h_stack, w0=w0, offs=offs, hs=hs,
        n=n, n_pad=n_pad, y0w=y0g, x0w=x0w, ay=ay, ax=ax,
        small=small, b=bsz, n_img=n_img, batched=batched,
    )


def _pallas_forward(
    features: dict,
    boxes: jnp.ndarray,
    output_size: int = 7,
    strides: dict | None = None,
    sampling_ratio: int = 2,
    spatial_pad: bool = False,
) -> jnp.ndarray:
    """Forward-only multilevel ROIAlign via the Pallas kernel.

    features: dict of per-level (H_l, W_l, C) maps for one image, or
    (B, H_l, W_l, C) with boxes (B, N, 4) — the batch rides the Y-stacked
    plane in ONE pallas_call (see _prep). Returns (N, S, S, C) or
    (B, N, S, S, C).
    """
    if strides is None:
        strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
    dtype = next(iter(features.values())).dtype
    rois_per_step = _rois_per_step(jnp.dtype(dtype).itemsize)
    p = _prep(features, boxes, output_size, strides, sampling_ratio, rois_per_step)
    names, c, h_stack, w0 = p["names"], p["c"], p["h_stack"], p["w0"]
    n, n_pad = p["n"], p["n_pad"]
    y0w, x0w, ay, ax = p["y0w"], p["x0w"], p["ay"], p["ax"]
    small = p["small"]
    s = output_size
    b = p["b"]

    if BUFFER_CONCAT:
        # pad+concat instead of zeros + update-slice chain: the DUS chain
        # inherits the conv outputs' batch-minor layout and XLA then
        # relayouts the WHOLE ~200 MB plane for the kernel operand; a
        # concat lets layout assignment place the target layout on the
        # (smaller) per-level pads instead. Same values either way.
        parts = []
        for nm in names:
            fl = features[nm] if p["batched"] else features[nm][None]
            h, w = fl.shape[1:3]
            parts.append(jnp.pad(fl, ((0, 0), (0, 0), (0, w0 - w), (0, 0))))
        tail = h_stack - sum(p["hs"])
        parts.append(jnp.zeros((b, tail, w0, c), dtype))
        buf = jnp.concatenate(parts, axis=1)
    else:
        buf = jnp.zeros((b, h_stack, w0, c), dtype)
        for off, nm in zip(p["offs"], names):
            fl = features[nm] if p["batched"] else features[nm][None]
            h, w = fl.shape[1:3]
            buf = buf.at[:, int(off) : int(off) + h, :w].set(fl)
    buf = buf.reshape(b * h_stack, w0, c)

    ss = S_PAD * S_PAD
    if TAPS_EXPANDED:
        # pre-broadcast each axis's taps to the (S², WINDOW) row layout the
        # 2-matmul build consumes: row (sy, sx) carries ay[sy] / ax[sx]
        ay = jnp.broadcast_to(
            ay[:, :, None, :], (n_pad, S_PAD, S_PAD, WINDOW_Y)
        ).reshape(n_pad, ss, WINDOW_Y)
        ax = jnp.broadcast_to(
            ax[:, None, :, :], (n_pad, S_PAD, S_PAD, WINDOW_X)
        ).reshape(n_pad, ss, WINDOW_X)
    tap_rows = ss if TAPS_EXPANDED else S_PAD

    # per-step scalar rows (y0, x0, cls) as blocked SMEM — on-chip scalar
    # footprint is O(rois_per_step), independent of total ROI count
    steps = n_pad // rois_per_step
    scal = (
        jnp.stack([y0w, x0w, small], 0)
        .reshape(3, steps, rois_per_step)
        .transpose(1, 0, 2)
    )
    scal_spec = pl.BlockSpec(
        (1, 3, rois_per_step), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
    )
    nxt_spec = pl.BlockSpec(
        (1, 3, rois_per_step),
        lambda i: (jnp.minimum(i + 1, steps - 1), 0, 0),
        memory_space=pltpu.SMEM,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(steps,),
        in_specs=[
            scal_spec,
            nxt_spec,
            pl.BlockSpec(
                (rois_per_step, tap_rows, WINDOW_Y),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (rois_per_step, tap_rows, WINDOW_X),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # buf stays in HBM
        ],
        out_specs=pl.BlockSpec(
            # (R, 64, C) rows (sy, sx) — the (S_PAD, S_PAD) split happens as a
            # free row-major reshape outside the kernel (an in-kernel (64, C)
            # -> (8, 8, C) split is not bf16-tile aligned and would relayout)
            (rois_per_step, S_PAD * S_PAD, c),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rois_per_step, WINDOW_Y, WINDOW_X, c), dtype),
            pltpu.SemaphoreType.DMA((2, rois_per_step)),
        ],
    )

    itemsize = jnp.dtype(dtype).itemsize
    out = pl.pallas_call(
        functools.partial(_kernel, taps_expanded=TAPS_EXPANDED),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, S_PAD * S_PAD, c), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * S_PAD * S_PAD * WINDOW_Y * WINDOW_X * c,
            bytes_accessed=n_pad * WINDOW_Y * WINDOW_X * c * itemsize,
            transcendentals=0,
        ),
        # scratch (2*R*32*48*C) + blocks + Mosaic stack temporaries land at
        # 16.004 MB at C=256 bf16 — 4 KB over the default 16 MB scoped-vmem
        # limit (v5e has 128 MB VMEM; observed as an AOT "stack OOM" only at
        # inference ROI counts). Give explicit headroom.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=FORCE_INTERPRET,
    )(scal, scal, ay, ax, buf)
    out = out.reshape(n_pad, S_PAD, S_PAD, c)[:n]
    if not spatial_pad:
        # the 8x8 -> 7x7 slice + its relayout copy cost ~1.3 ms/step at
        # inference ROI counts; spatial_pad=True hands the padded grid to
        # the heads (SpatialPadDense folds the selection into fc1's kernel)
        out = out[:, :s, :s]
    sp = out.shape[1]
    return out.reshape(b, p["n_img"], sp, sp, c) if p["batched"] else out


def _bwd_kernel(scal_ref, nxt_ref, ay_ref, ax_ref, g_ref, dbuf_in, dbuf_ref, win, rsem, wsem,
                grouped: bool = False):
    del dbuf_in  # aliased to dbuf_ref (the output) — all access goes there
    """Backward: accumulate dwin = Mᵀ·g into the stacked f32 grad buffer.

    scal/nxt: (1, 4, R) int32 SMEM blocks — rows (y0, x0, cls, conf) for
    this grid step's ROIs / the next step's (clipped; see _kernel for why
    blocked SMEM replaces whole-array scalar prefetch).

    Windows of different ROIs overlap, so the accumulation is a
    read-modify-write per ROI with at most ONE write in flight, pipelined
    by a precomputed conflict flag: conf[i] == 1 iff ROI i's window
    intersects ROI i-1's (processing order). When the next ROI's window is
    disjoint from the in-flight write, its read DMA is issued BEFORE
    waiting on that write — hiding the read latency behind the write (and
    behind the next step's compute); when it conflicts, the write is
    drained first, which preserves the exact serialized-RMW semantics.
    Writes are always waited within their own iteration, so only the
    immediately-preceding write can be in flight — pairwise-adjacent
    conflict flags are sufficient for full-chain correctness.

    The Mᵀ factor is built like the forward's M but
    transposed-by-construction — selector matmuls with (hw, WINDOW)/
    (S_PAD, ss) iota masks, no relayouts. Small-class ROIs
    read-modify-write only the (SMALL_Y, BWD_SMALL_X) corner (their dwin is
    exactly zero elsewhere — the tap weights are zero).
    """
    r = ay_ref.shape[0]
    c = g_ref.shape[-1]
    i = pl.program_id(0)
    num = pl.num_programs(0)
    dt = ay_ref.dtype
    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    ss, hw = S_PAD * S_PAD, WINDOW_Y * BWD_X
    # rowsT (hw, WINDOW): rowsT[(h,w), h'] = (h == h'); colsT (S_PAD, ss)
    rh = jax.lax.broadcasted_iota(jnp.int32, (hw, WINDOW_Y), 0)
    ch = jax.lax.broadcasted_iota(jnp.int32, (hw, WINDOW_Y), 1)
    rowsT_y = (rh // BWD_X == ch).astype(dt)
    rw = jax.lax.broadcasted_iota(jnp.int32, (hw, BWD_X), 0)
    cw = jax.lax.broadcasted_iota(jnp.int32, (hw, BWD_X), 1)
    rowsT_x = (rw % BWD_X == cw).astype(dt)
    rs = jax.lax.broadcasted_iota(jnp.int32, (S_PAD, ss), 0)
    cs = jax.lax.broadcasted_iota(jnp.int32, (S_PAD, ss), 1)
    colsT_y = (cs // S_PAD == rs).astype(dt)
    colsT_x = (cs % S_PAD == rs).astype(dt)

    def expandT(rowsT, vec, colsT):
        # (hw, W) @ [(S_PAD, W) -> transposed via (W, ss) two-step]: compute
        # t = vec @ colsT (S_PAD rows -> ss cols? no): build (hw, ss) as
        # rowsT @ (vec^T expanded): vecT[(w), (s)] achieved by
        # (rowsT @ vec^T); vec^T = dot(vec, I) transpose-free via
        # dot_general on the other side: (hw, W) x (W, ss) where the middle
        # (W, ss) = vecᵀ expanded = dot(vec_cols...)
        t = jax.lax.dot_general(
            rowsT, vec, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)  # (hw, S_PAD)
        return jnp.dot(t, colsT, preferred_element_type=jnp.float32, precision=prec).astype(dt)

    def dst_small(sref, j):
        return dbuf_ref.at[
            pl.ds(sref[0, 0, j], SMALL_Y),
            pl.ds(pl.multiple_of(sref[0, 1, j], BWD_ALIGN), BWD_SMALL_X),
            :,
        ]

    def dst_big(sref, j):
        return dbuf_ref.at[
            pl.ds(sref[0, 0, j], WINDOW_Y),
            pl.ds(pl.multiple_of(sref[0, 1, j], BWD_ALIGN), BWD_X),
            :,
        ]

    def slot_small(slot):
        return win.at[slot, pl.ds(0, SMALL_Y), pl.ds(0, BWD_SMALL_X), :]

    def rd(sref, j, slot, act):
        small = sref[0, 2, j] == 1

        @pl.when(small)
        def _():
            cp = pltpu.make_async_copy(dst_small(sref, j), slot_small(slot), rsem.at[slot])
            cp.start() if act == "start" else cp.wait()

        @pl.when(jnp.logical_not(small))
        def _():
            cp = pltpu.make_async_copy(dst_big(sref, j), win.at[slot], rsem.at[slot])
            cp.start() if act == "start" else cp.wait()

    def wr(sref, j, slot, act):
        small = sref[0, 2, j] == 1

        @pl.when(small)
        def _():
            cp = pltpu.make_async_copy(slot_small(slot), dst_small(sref, j), wsem.at[slot])
            cp.start() if act == "start" else cp.wait()

        @pl.when(jnp.logical_not(small))
        def _():
            cp = pltpu.make_async_copy(win.at[slot], dst_big(sref, j), wsem.at[slot])
            cp.start() if act == "start" else cp.wait()

    def drain_then_read(sref, j, slot, nsref, nj, nslot):
        """Issue the next read around the in-flight write: before it when
        disjoint (overlap), after it when conflicting (exact RMW chain)."""

        @pl.when(nsref[0, 3, nj] == 1)
        def _():
            wr(sref, j, slot, "wait")

        rd(nsref, nj, nslot, "start")

        @pl.when(nsref[0, 3, nj] == 0)
        def _():
            wr(sref, j, slot, "wait")

    if grouped:
        # concurrent group schedule (see BWD_GROUPED): the step's R ROIs
        # are pairwise disjoint by construction (one per image), so all
        # reads launch together, adds land as their reads drain, all
        # writes fly together, and the step boundary drains every write
        # (slot reuse next step would clobber in-flight buffers; the
        # drain also serializes each image's own RMW chain, which is
        # exactly one lane per step).
        for j in range(r):
            rd(scal_ref, j, j, "start")
        # batched Mᵀ build, mirroring the forward's build_m: ALL R ROIs'
        # (hw, ss) transposed weight matrices in 4 matmuls instead of 3
        # per ROI (the kernel is MXU-op-latency bound once the RMW chain
        # is grouped). Values bit-identical to the per-ROI expandT: the
        # selector matmuls move single elements in f32 accumulation.
        ayf = ay_ref[...].reshape(r * S_PAD, WINDOW_Y)
        axf = ax_ref[...].reshape(r * S_PAD, BWD_X)
        t_y = jax.lax.dot_general(
            rowsT_y, ayf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)  # (hw, r*S_PAD): [(h,w), (j,sy)] = ay_j[sy, h]
        t_x = jax.lax.dot_general(
            rowsT_x, axf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)
        rr2 = jax.lax.broadcasted_iota(jnp.int32, (r * S_PAD, r * ss), 0)
        cc2 = jax.lax.broadcasted_iota(jnp.int32, (r * S_PAD, r * ss), 1)
        same_j = (rr2 // S_PAD) == (cc2 // ss)
        sel_y = (same_j & ((rr2 % S_PAD) == (cc2 % ss) // S_PAD)).astype(dt)
        sel_x = (same_j & ((rr2 % S_PAD) == (cc2 % ss) % S_PAD)).astype(dt)
        mT_all = jnp.dot(
            t_y, sel_y, preferred_element_type=jnp.float32, precision=prec
        ).astype(dt) * jnp.dot(
            t_x, sel_x, preferred_element_type=jnp.float32, precision=prec
        ).astype(dt)  # (hw, r*ss)
        for j in range(r):
            small = scal_ref[0, 2, j] == 1
            dwin = jnp.dot(
                mT_all[:, j * ss : (j + 1) * ss],
                g_ref[j].astype(dt),
                preferred_element_type=jnp.float32, precision=prec,
            )
            rd(scal_ref, j, j, "wait")

            @pl.when(small)
            def _():
                win[j, pl.ds(0, SMALL_Y), pl.ds(0, BWD_SMALL_X), :] = (
                    win[j, pl.ds(0, SMALL_Y), pl.ds(0, BWD_SMALL_X), :]
                    + dwin.reshape(WINDOW_Y, BWD_X, c)[:SMALL_Y, :BWD_SMALL_X]
                )

            @pl.when(jnp.logical_not(small))
            def _():
                win[j] = win[j] + dwin.reshape(WINDOW_Y, BWD_X, c)

            wr(scal_ref, j, j, "start")
        for j in range(r):
            wr(scal_ref, j, j, "wait")
        return

    if not BWD_PIPELINE:
        # strictly serialized schedule: write drains before the next read
        for j in range(r):
            small = scal_ref[0, 2, j] == 1
            rd(scal_ref, j, j, "start")
            mT = expandT(rowsT_y, ay_ref[j], colsT_y) * expandT(rowsT_x, ax_ref[j], colsT_x)
            dwin = jnp.dot(
                mT, g_ref[j].astype(dt), preferred_element_type=jnp.float32, precision=prec
            )
            rd(scal_ref, j, j, "wait")

            @pl.when(small)
            def _():
                win[j, pl.ds(0, SMALL_Y), pl.ds(0, BWD_SMALL_X), :] = (
                    win[j, pl.ds(0, SMALL_Y), pl.ds(0, BWD_SMALL_X), :]
                    + dwin.reshape(WINDOW_Y, BWD_X, c)[:SMALL_Y, :BWD_SMALL_X]
                )

            @pl.when(jnp.logical_not(small))
            def _():
                win[j] = win[j] + dwin.reshape(WINDOW_Y, BWD_X, c)

            wr(scal_ref, j, j, "start")
            wr(scal_ref, j, j, "wait")
        return

    @pl.when(i == 0)
    def _():
        rd(scal_ref, 0, 0, "start")

    for j in range(r):
        small = scal_ref[0, 2, j] == 1
        mT = expandT(rowsT_y, ay_ref[j], colsT_y) * expandT(rowsT_x, ax_ref[j], colsT_x)
        dwin = jnp.dot(
            mT, g_ref[j].astype(dt), preferred_element_type=jnp.float32, precision=prec
        )
        rd(scal_ref, j, j, "wait")

        @pl.when(small)
        def _():
            win[j, pl.ds(0, SMALL_Y), pl.ds(0, BWD_SMALL_X), :] = (
                win[j, pl.ds(0, SMALL_Y), pl.ds(0, BWD_SMALL_X), :]
                + dwin.reshape(WINDOW_Y, BWD_X, c)[:SMALL_Y, :BWD_SMALL_X]
            )

        @pl.when(jnp.logical_not(small))
        def _():
            win[j] = win[j] + dwin.reshape(WINDOW_Y, BWD_X, c)

        wr(scal_ref, j, j, "start")
        if j + 1 < r:
            drain_then_read(scal_ref, j, j, scal_ref, j + 1, j + 1)
        else:
            # cross-step prefetch: next step's first read rides this step's
            # write drain (same schedule, slot 0)
            @pl.when(i + 1 < num)
            def _():
                drain_then_read(scal_ref, j, j, nxt_ref, 0, 0)

            @pl.when(i + 1 == num)
            def _():
                wr(scal_ref, j, j, "wait")


def _pallas_backward(features, boxes, g, output_size, strides, sampling_ratio):
    """dfeatures for the Pallas forward: same geometry, serialized RMW
    accumulation in f32. Returns a dict matching `features`. Batched inputs
    accumulate the whole batch in one kernel over the Y-stacked plane; the
    RMW chain crosses image boundaries with conf=0 by construction (plane
    offsets differ by >= h_stack > any window extent)."""
    dtype = next(iter(features.values())).dtype
    rois_per_step = _rois_per_step(jnp.dtype(dtype).itemsize)
    p = _prep(features, boxes, output_size, strides, sampling_ratio, rois_per_step,
              win_x=BWD_X, small_x=BWD_SMALL_X, align=BWD_ALIGN)
    names, c, h_stack, w0 = p["names"], p["c"], p["h_stack"], p["w0"]
    n, n_pad = p["n"], p["n_pad"]
    y0w, x0w, ay, ax = p["y0w"], p["x0w"], p["ay"], p["ax"]
    small = p["small"]
    s = output_size
    b = p["b"]

    # grouped schedule eligibility (see BWD_GROUPED): batched, no pad
    # ROIs, and every in-step group of rois_per_step spans distinct images
    # under the interleave (requires rois_per_step <= B)
    n_img = p["n_img"]
    grouped = (
        BWD_GROUPED and p["batched"] and n_pad == n
        and b >= rois_per_step and n == b * n_img
    )
    g = g.reshape(n, s, s, c)
    if grouped:
        # image-interleaved ROI order: processed ROI k comes from image
        # k % b (pure reshape-transposes, no gathers); per-image order is
        # preserved so each dbuf cell sees the same accumulation sequence
        def interleave(x):
            return jnp.swapaxes(
                x.reshape((b, n_img) + x.shape[1:]), 0, 1
            ).reshape((n,) + x.shape[1:])

        y0w = interleave(y0w)
        x0w = interleave(x0w)
        small = interleave(small)
        ay = interleave(ay)
        ax = interleave(ax)
        g = interleave(g)

    # cotangent rows (sy, sx) padded to (S_PAD^2, C), f32
    gp = jnp.zeros((n_pad, S_PAD, S_PAD, c), jnp.float32)
    gp = gp.at[:n, :s, :s].set(g.astype(jnp.float32))
    gp = gp.reshape(n_pad, S_PAD * S_PAD, c)

    dbuf = jnp.zeros((b * h_stack, w0, c), jnp.float32)

    # pairwise-adjacent window conflicts for the pipelined RMW: conf[i] = 1
    # iff ROI i's window intersects ROI i-1's (per-ROI extents by class).
    # One trailing element so the kernel's guarded cross-step read at
    # roi == n_pad stays in bounds.
    wy = jnp.where(small == 1, SMALL_Y, WINDOW_Y)
    wx = jnp.where(small == 1, BWD_SMALL_X, BWD_X)
    ovl_y = (y0w[1:] < y0w[:-1] + wy[:-1]) & (y0w[:-1] < y0w[1:] + wy[1:])
    ovl_x = (x0w[1:] < x0w[:-1] + wx[:-1]) & (x0w[:-1] < x0w[1:] + wx[1:])
    conf = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), (ovl_y & ovl_x).astype(jnp.int32)]
    )

    # per-step scalar rows (y0, x0, cls, conf) as blocked SMEM (see _kernel)
    steps = n_pad // rois_per_step
    scal = (
        jnp.stack([y0w, x0w, small, conf], 0)
        .reshape(4, steps, rois_per_step)
        .transpose(1, 0, 2)
    )
    scal_spec = pl.BlockSpec(
        (1, 4, rois_per_step), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
    )
    nxt_spec = pl.BlockSpec(
        (1, 4, rois_per_step),
        lambda i: (jnp.minimum(i + 1, steps - 1), 0, 0),
        memory_space=pltpu.SMEM,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(steps,),
        in_specs=[
            scal_spec,
            nxt_spec,
            pl.BlockSpec(
                (rois_per_step, S_PAD, WINDOW_Y), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (rois_per_step, S_PAD, BWD_X), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (rois_per_step, S_PAD * S_PAD, c), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # dbuf (aliased to output)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((rois_per_step, WINDOW_Y, BWD_X, c), jnp.float32),
            pltpu.SemaphoreType.DMA((rois_per_step,)),
            pltpu.SemaphoreType.DMA((rois_per_step,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, grouped=grouped),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(dbuf.shape, jnp.float32),
        # operands: scal, nxt, ay, ax, g, dbuf -> dbuf is operand 5
        input_output_aliases={5: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * S_PAD * S_PAD * WINDOW_Y * BWD_X * c,
            bytes_accessed=2 * n_pad * WINDOW_Y * BWD_X * c * 4,
            transcendentals=0,
        ),
        # same headroom as the forward: the f32 RMW scratch + blocks sit
        # near the 16 MB default scoped-vmem limit at C=256
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=FORCE_INTERPRET,
    )(scal, scal, ay, ax, gp, dbuf)

    out = out.reshape(b, h_stack, w0, c)
    dfeat = {}
    for off, nm in zip(p["offs"], names):
        hw_shape = features[nm].shape[1:3] if p["batched"] else features[nm].shape[:2]
        h, w = hw_shape
        d = out[:, int(off) : int(off) + h, :w].astype(features[nm].dtype)
        dfeat[nm] = d if p["batched"] else d[0]
    return dfeat


@functools.lru_cache(maxsize=None)
def _make_pooler(output_size: int, strides_t: tuple, sampling_ratio: int,
                 spatial_pad: bool = False):
    """custom_vjp wrapper: pallas_call is not auto-differentiable, and the
    train path differentiates pooling w.r.t. the FPN features (backbone
    gradients). Forward runs the window-DMA kernel; backward runs the
    matching Pallas RMW-accumulation kernel (same windows/weights, so
    gradients land exactly where the forward sampled). The previous
    XLA packed-gather VJP spent ~70 ms/step at train ROI counts in
    scatter-adds; the RMW kernel is bounded by 2x window traffic instead.
    Boxes get no gradient (reference CUDA ROIAlign propagates none either,
    and proposals are stop_gradient'ed upstream)."""
    strides = dict(strides_t)

    @jax.custom_vjp
    def pool(features, boxes):
        return _pallas_forward(
            features, boxes, output_size, strides, sampling_ratio,
            spatial_pad=spatial_pad,
        )

    def fwd(features, boxes):
        return pool(features, boxes), (features, boxes)

    def bwd(res, g):
        features, boxes = res
        if spatial_pad:
            # pad row/col gradients are exactly zero under the
            # SpatialPadDense contract (zero-padded fc kernels); the
            # backward kernel keeps its s x s interface
            g = g[..., :output_size, :output_size, :]
        dfeat = _pallas_backward(features, boxes, g, output_size, strides, sampling_ratio)
        return dfeat, jnp.zeros_like(boxes)

    pool.defvjp(fwd, bwd)
    return pool


def multilevel_roi_align_tpu(
    features: dict,
    boxes: jnp.ndarray,
    output_size: int = 7,
    strides: dict | None = None,
    sampling_ratio: int = 2,
    spatial_pad: bool = False,
) -> jnp.ndarray:
    """Differentiable drop-in multilevel ROIAlign (Pallas forward).

    Accepts one image ((H,W,C) levels + (N,4) boxes) or a batch
    ((B,H,W,C) + (B,N,4)) — batched calls run ONE kernel over the
    Y-stacked batch plane instead of vmap (which lowers scalar-prefetch
    pallas_calls to a while loop over images; see _prep).

    Falls back to the XLA windowed path when the channel count is not a
    multiple of the 128-lane tile (Mosaic cannot fold the (W, C) window
    axes into one matmul operand otherwise). The fallback shares the Pallas
    kernel's WINDOW_Y fit budget so both paths apply one level-bump rule."""
    if strides is None:
        strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
    c = next(iter(features.values())).shape[-1]
    if c % 128:
        from .roi_align import multilevel_roi_align_windowed

        fb = functools.partial(
            multilevel_roi_align_windowed,
            output_size=output_size, strides=strides,
            sampling_ratio=sampling_ratio, window=WINDOW_Y,
        )
        if boxes.ndim == 3:
            return jax.vmap(fb)(features, boxes)
        return fb(features, boxes)
    pool = _make_pooler(
        output_size, tuple(sorted(strides.items())), sampling_ratio,
        spatial_pad=spatial_pad and output_size == S_PAD - 1,
    )
    return pool(features, boxes)


@functools.lru_cache(maxsize=None)
def pallas_roi_align_available() -> bool:
    return jax.default_backend() == "tpu"
