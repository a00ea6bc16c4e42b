"""ROIAlign (V2 semantics: aligned=True) as gather-based bilinear sampling.

Replaces Detectron2's CUDA ROIAlignV2 (pooler construction at reference
roi_heads.py:801-806, 2075-2080). On TPU the op is expressed as one fused
gather+lerp program vmapped over ROIs; multi-level FPN pooling computes the
assignment level per ROI and selects among per-level pooled results (XLA
turns the 5-way select into cheap masked adds — no dynamic shapes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROIAlign on a single feature map.

    Args:
      features: (H, W, C) feature map.
      boxes: (N, 4) XYXY boxes in *image* coordinates.
      output_size: pooled spatial size S.
      spatial_scale: feature stride reciprocal (1/stride).
      sampling_ratio: bilinear samples per bin edge (fixed for static shapes;
        the reference's adaptive `sampling_ratio=0` is data-dependent).

    Returns (N, S, S, C).
    """
    h, w, c = features.shape
    s = output_size
    r = sampling_ratio

    # aligned=True: shift by half a pixel so sample coords are pixel-centered
    boxes = boxes * spatial_scale - 0.5
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)

    bin_w = bw / s
    bin_h = bh / s

    # sample grid: for bin i, samples at (i + (k + 0.5)/r) * bin
    grid = (jnp.arange(s * r) + 0.5) / r  # (s*r,) in bin units
    sx = x1[:, None] + grid[None, :] * bin_w[:, None]  # (N, s*r)
    sy = y1[:, None] + grid[None, :] * bin_h[:, None]

    def bilinear(fmap, xs, ys):
        # xs, ys: (N, S) -> sample the outer-product grid (N, S, S, C)
        # ROIAlignV2 border rule (torchvision/detectron2
        # bilinear_interpolate): a sample is zero only when its coordinate
        # leaves [-1, dim]; inside that band the coordinate is clamped into
        # [0, dim-1], so edge samples take the border value at FULL weight
        # (round-5 fix — the previous tap-validity masking gave them only
        # the in-range fraction, a real numeric drift for ROIs touching the
        # feature boundary).
        band_x = (xs >= -1.0) & (xs <= w)  # (N, S)
        band_y = (ys >= -1.0) & (ys <= h)
        xs = jnp.clip(xs, 0.0, w - 1.0)
        ys = jnp.clip(ys, 0.0, h - 1.0)
        Y = ys[:, :, None]  # (N, S, 1)
        X = xs[:, None, :]  # (N, 1, S)
        y0f = jnp.floor(Y)
        x0f = jnp.floor(X)
        dy = (Y - y0f)[..., None]
        dx = (X - x0f)[..., None]
        y0 = y0f.astype(jnp.int32)
        x0 = x0f.astype(jnp.int32)

        def gather(yi, xi):
            yi, xi = jnp.broadcast_arrays(yi, xi)
            # taps stay in range by construction (clamped coords; the +1
            # tap at the border carries frac == 0)
            return fmap[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]

        v00 = gather(y0, x0)
        v01 = gather(y0, x0 + 1)
        v10 = gather(y0 + 1, x0)
        v11 = gather(y0 + 1, x0 + 1)
        out = (
            v00 * (1 - dy) * (1 - dx)
            + v01 * (1 - dy) * dx
            + v10 * dy * (1 - dx)
            + v11 * dy * dx
        )  # (N, S, S, C)
        return out * (band_y[:, :, None] & band_x[:, None, :])[..., None]

    samples = bilinear(features, sx, sy)
    # average within each bin: (N, s, r, s, r, C) -> (N, s, s, C)
    n = boxes.shape[0]
    samples = samples.reshape(n, s, r, s, r, c).mean(axis=(2, 4))
    return samples


def assign_fpn_levels(
    boxes: jnp.ndarray,
    min_level: int = 2,
    max_level: int = 6,
    canonical_size: float = 224.0,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN level per ROI: floor(k0 + log2(sqrt(area)/224)), clamped.

    Detectron2 ROIPooler assignment rule.
    """
    area = jnp.maximum(
        (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1e-6
    )
    lvl = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(area) / canonical_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def multilevel_roi_align_dense(
    features: dict,
    boxes: jnp.ndarray,
    output_size: int = 7,
    strides: dict | None = None,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """FPN ROIAlign, reference implementation: pool from EVERY level, select.

    Simple but does 5x the gather work; kept as the correctness oracle for
    the packed version below.
    """
    if strides is None:
        strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
    names = sorted(features.keys())
    level_ids = [int(n[1:]) for n in names]
    assign = assign_fpn_levels(boxes, min(level_ids), max(level_ids))

    pooled = 0.0
    for name in names:
        lvl = int(name[1:])
        p = roi_align(
            features[name],
            boxes,
            output_size=output_size,
            spatial_scale=1.0 / strides[name],
            sampling_ratio=sampling_ratio,
        )
        pooled = pooled + p * (assign == lvl)[:, None, None, None]
    return pooled


def multilevel_roi_align_windowed(
    features: dict,
    boxes: jnp.ndarray,
    output_size: int = 7,
    strides: dict | None = None,
    sampling_ratio: int = 2,
    window: int = 48,
) -> jnp.ndarray:
    """FPN ROIAlign as window-slice + separable interpolation matmuls.

    The TPU-fast path. Element gathers (the packed variant below) run at
    ~60 GB/s effective on TPU; this formulation replaces them with
      1. one stacked padded level buffer (L, H2, W2, C) — levels share p2's
         padded geometry, built once per forward (~27 MB),
      2. a (window, window, C) dynamic-slice per ROI — a contiguous windowed
         gather XLA handles near memory bandwidth,
      3. exact bilinear sampling + bin averaging folded into two per-axis
         interpolation matrices Ay/Ax (out = Ay @ win @ Ax^T per channel) —
         dense (S, window) matmuls on the MXU instead of scattered taps.
    The FPN assignment rule bounds a ROI's extent at its assigned level to
    ~28 cells + 2 taps <= `window` for square-ish boxes; extreme-aspect ROIs
    (long side > (window-2) cells, where fixed-ratio sampling is already
    sparse) get their level bumped until they fit — the one documented
    deviation from the dense oracle (reference uses adaptive sampling_ratio
    there, which we also do not replicate; see `roi_align` docstring).

    Numerics match `multilevel_roi_align` exactly (same taps, same border
    masking) for all ROIs within the window bound.
    """
    if strides is None:
        strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
    names = sorted(features.keys())
    level_ids = [int(n[1:]) for n in names]
    lmin, lmax = min(level_ids), max(level_ids)
    c = features[names[0]].shape[-1]
    # buffer at least one window big (tiny test canvases)
    h0 = max(features[names[0]].shape[0], window)
    w0 = max(features[names[0]].shape[1], window)
    dtype = features[names[0]].dtype

    # 1. stacked padded buffer (L, h0, w0, C)
    buf = jnp.zeros((len(names), h0, w0, c), dtype)
    hs, ws = [], []
    for i, n in enumerate(names):
        h, w = features[n].shape[:2]
        hs.append(h)
        ws.append(w)
        buf = buf.at[i, :h, :w].set(features[n])
    hs = jnp.asarray(hs)
    ws = jnp.asarray(ws)
    strides_arr = jnp.asarray([float(strides[n]) for n in names])

    # 2. level assignment with extreme-aspect bump
    assign = assign_fpn_levels(boxes, lmin, lmax) - lmin  # (N,)
    ext = jnp.maximum(boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1])
    ext_cells_at_lmin = ext / float(strides[names[0]])
    need = jnp.ceil(jnp.log2(jnp.maximum(ext_cells_at_lmin / (window - 2), 1e-6)))
    assign = jnp.maximum(assign, jnp.clip(need, 0, lmax - lmin).astype(jnp.int32))

    lvl_h = hs[assign]
    lvl_w = ws[assign]
    scale = 1.0 / strides_arr[assign]

    s, r = output_size, sampling_ratio
    n = boxes.shape[0]
    b = boxes * scale[:, None] - 0.5
    x1, y1 = b[:, 0], b[:, 1]
    bw = jnp.maximum(b[:, 2] - x1, 1e-6)
    bh = jnp.maximum(b[:, 3] - y1, 1e-6)
    grid = (jnp.arange(s * r) + 0.5) / r  # (sr,)
    sx = x1[:, None] + grid[None, :] * (bw / s)[:, None]  # (N, sr)
    sy = y1[:, None] + grid[None, :] * (bh / s)[:, None]

    # 3. window origin per ROI (covers all taps; clamped into the buffer)
    y0w = jnp.clip(jnp.floor(sy[:, 0]).astype(jnp.int32), 0, h0 - window)
    x0w = jnp.clip(jnp.floor(sx[:, 0]).astype(jnp.int32), 0, w0 - window)

    def axis_weights(coords, origin, limit):
        """(N, sr) sample coords -> (N, s, window) bin-averaged tap weights.

        ROIAlignV2 border rule: zero only outside [-1, limit]; inside the
        band, clamp into [0, limit-1] so border samples take the edge cell
        at full weight (matches roi_align above and d2/torchvision)."""
        lim = limit[:, None].astype(coords.dtype)  # (N, 1)
        band = (coords >= -1.0) & (coords <= lim)
        cc = jnp.clip(coords, 0.0, lim - 1.0)
        f0 = jnp.floor(cc)
        frac = cc - f0
        i0 = f0.astype(jnp.int32) - origin[:, None]  # tap0, window-local
        tap_idx = jnp.arange(window)[None, None, :]
        w_tap = (
            (tap_idx == i0[:, :, None]) * ((1.0 - frac)[:, :, None])
            + (tap_idx == i0[:, :, None] + 1) * frac[:, :, None]
        ) * band[:, :, None]  # (N, sr, window)
        # bin-average the r samples of each output cell
        return w_tap.reshape(n, s, r, window).mean(axis=2)

    ay = axis_weights(sy, y0w, lvl_h).astype(dtype)  # (N, s, window)
    ax = axis_weights(sx, x0w, lvl_w).astype(dtype)

    # 4. window slice + two separable matmuls
    def slice_one(lvl, y0, x0):
        return jax.lax.dynamic_slice(buf, (lvl, y0, x0, 0), (1, window, window, c))[0]

    wins = jax.vmap(slice_one)(assign, y0w, x0w)  # (N, window, window, C)
    # pin full precision for f32 inputs: TPU's default f32 matmul is
    # bf16-grade (measured 1e-2 abs error vs the exact packed-gather path);
    # bf16 inputs are already exact in native mode (bf16 mul, f32 acc)
    prec = None if wins.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    t = jnp.einsum("nsh,nhwc->nswc", ay, wins, precision=prec)  # (N, s, window, C)
    return jnp.einsum("ntw,nswc->nstc", ax, t, precision=prec)  # (N, s, s, C)


def multilevel_roi_align(
    features: dict,
    boxes: jnp.ndarray,
    output_size: int = 7,
    strides: dict | None = None,
    sampling_ratio: int = 2,
    fit_window: int | None = None,
) -> jnp.ndarray:
    """FPN ROIAlign via a single packed gather.

    `fit_window`: when set, apply the same extreme-aspect level bump as the
    windowed/Pallas paths (extent > fit_window-2 cells -> coarser level) so
    tap positions — and therefore gradients — match them exactly. Used as
    the backward of the Pallas kernel (its element-scatter VJP is ~2x
    cheaper than the windowed path's slice-scatter VJP at train ROI
    counts).

    All pyramid levels are flattened into one (sum HW, C) buffer; each ROI
    computes its sample coordinates in its *assigned* level's geometry and
    gathers with flat indices — one gather pass instead of pooling every
    level and selecting (5x less HBM traffic than the dense variant, which
    is what replaces the reference's per-level CUDA pooler loop).
    """
    if strides is None:
        strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
    names = sorted(features.keys())
    level_ids = [int(n[1:]) for n in names]
    c = features[names[0]].shape[-1]

    flat = jnp.concatenate([features[n].reshape(-1, c) for n in names], axis=0)
    hs = np.asarray([features[n].shape[0] for n in names])
    ws = np.asarray([features[n].shape[1] for n in names])
    offsets = np.concatenate([[0], np.cumsum(hs * ws)[:-1]])
    strides_arr = np.asarray([strides[n] for n in names], np.float32)

    assign = assign_fpn_levels(boxes, min(level_ids), max(level_ids)) - min(level_ids)
    if fit_window is not None:
        ext = jnp.maximum(boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1])
        ext_cells = ext / float(strides[names[0]])
        need = jnp.ceil(jnp.log2(jnp.maximum(ext_cells / (fit_window - 2), 1e-6)))
        assign = jnp.maximum(
            assign, jnp.clip(need, 0, len(names) - 1).astype(jnp.int32)
        )
    lvl_h = jnp.asarray(hs)[assign]  # (N,)
    lvl_w = jnp.asarray(ws)[assign]
    lvl_off = jnp.asarray(offsets)[assign]
    lvl_scale = 1.0 / jnp.asarray(strides_arr)[assign]

    s, r = output_size, sampling_ratio
    b = boxes * lvl_scale[:, None] - 0.5
    x1, y1 = b[:, 0], b[:, 1]
    bw = jnp.maximum(b[:, 2] - x1, 1e-6)
    bh = jnp.maximum(b[:, 3] - y1, 1e-6)
    grid = (jnp.arange(s * r) + 0.5) / r
    sx = x1[:, None] + grid[None, :] * (bw / s)[:, None]  # (N, sr)
    sy = y1[:, None] + grid[None, :] * (bh / s)[:, None]

    # ROIAlignV2 border rule (see roi_align): band-mask outside [-1, dim],
    # clamp inside so border samples take the edge cell at full weight
    h_f = lvl_h[:, None].astype(sy.dtype)
    w_f = lvl_w[:, None].astype(sx.dtype)
    band_y = (sy >= -1.0) & (sy <= h_f)  # (N, sr)
    band_x = (sx >= -1.0) & (sx <= w_f)
    sy = jnp.clip(sy, 0.0, h_f - 1.0)
    sx = jnp.clip(sx, 0.0, w_f - 1.0)

    Y = sy[:, :, None]  # (N, sr, 1)
    X = sx[:, None, :]  # (N, 1, sr)
    y0f = jnp.floor(Y)
    x0f = jnp.floor(X)
    dy = (Y - y0f)[..., None]
    dx = (X - x0f)[..., None]
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    h_lim = lvl_h[:, None, None]
    w_lim = lvl_w[:, None, None]
    off = lvl_off[:, None, None]

    def gather(yi, xi):
        yi, xi = jnp.broadcast_arrays(yi, xi)
        # taps in range by construction (clamped coords; +1 tap at the
        # border carries frac == 0)
        idx = off + jnp.clip(yi, 0, h_lim - 1) * w_lim + jnp.clip(xi, 0, w_lim - 1)
        return flat[idx]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    samples = (
        v00 * (1 - dy) * (1 - dx)
        + v01 * (1 - dy) * dx
        + v10 * dy * (1 - dx)
        + v11 * dy * dx
    ) * (band_y[:, :, None] & band_x[:, None, :])[..., None]  # (N, sr, sr, C)
    n = boxes.shape[0]
    return samples.reshape(n, s, r, s, r, c).mean(axis=(2, 4))
