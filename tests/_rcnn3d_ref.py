"""End-to-end torch reference RCNN3D (whole-model parity stand-in).

Composes the existing per-component torch stand-ins into ONE reference
Cube R-CNN inference forward with exact detectron2 GeneralizedRCNN module
naming, so a `build_fake_sd`-layout checkpoint loads verbatim into both
this model and (through the real zoo converter) the flax RCNN3D. This is
the strongest available proxy for real-weights AP parity: it certifies the
COMPOSITION — preprocess -> DLA trunk -> FPN -> RPN proposal selection ->
ROIAlignV2 box branch -> class-wise NMS -> cube head 3D transforms ->
score fusion -> postprocess — not just each stage (VERDICT r4 item 2).

Reference call stack transcribed (semantics, not code):
  * preprocess + forward: cubercnn/modeling/meta_arch/rcnn3d.py:50-124
  * d2 FPN over 5 DLA levels: cubercnn/modeling/backbone/dla.py:463-507
  * RPN proposal selection: detectron2 find_top_rpn_proposals semantics as
    configured by configs/Base.yaml (pre/post NMS top-k, nms 0.7)
  * ROIAlignV2 + level assignment: detectron2 ROIPooler
    (roi_heads.py:2075-2080); the bilinear border rule is torchvision's
    bilinear_interpolate (clamp into [0, dim-1] inside the [-1, dim] band)
  * fast_rcnn inference: cubercnn/modeling/roi_heads/fast_rcnn.py:101-114
  * cube transforms + assembly: roi_heads.py:2339-2436, 2682-2730 (via
    test_heads_parity's _torch_transform_chain)

Known, deliberate divergences of the flax framework (documented here and
asserted around in the test):
  * fixed sampling_ratio (>= 2) instead of d2's adaptive sampling_ratio=0
    — this stand-in uses the same fixed ratio;
  * the extreme-aspect FPN level bump (ops/roi_align.py:190-195): ROIs
    whose long side exceeds (window-2) cells at the d2-assigned level pool
    one level coarser. Mirrored here behind `fit_window` so composition
    parity stays bit-meaningful; the test also reports how many ROIs it
    affected.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from test_convert_backbones import _torch_dla, _torch_levels  # noqa: F401
from test_heads_parity import (  # noqa: F401
    _TorchCubeHead,
    _torch_transform_chain,
)

SCALE_CLAMP = math.log(1000.0 / 16)


# ---------------------------------------------------------------------------
# geometry mirrors (detectron2 semantics, independent transcription)
# ---------------------------------------------------------------------------
def apply_deltas_t(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """d2 Box2BoxTransform.apply_deltas; deltas (..., k*4), boxes (..., 4)."""
    w = (boxes[..., 2] - boxes[..., 0]).clamp(min=0)
    h = (boxes[..., 3] - boxes[..., 1]).clamp(min=0)
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    wx, wy, ww, wh = weights
    d = deltas.reshape(deltas.shape[:-1] + (-1, 4))
    dx, dy = d[..., 0] / wx, d[..., 1] / wy
    dw = (d[..., 2] / ww).clamp(max=SCALE_CLAMP)
    dh = (d[..., 3] / wh).clamp(max=SCALE_CLAMP)
    pcx = dx * w[..., None] + cx[..., None]
    pcy = dy * h[..., None] + cy[..., None]
    pw = torch.exp(dw) * w[..., None]
    ph = torch.exp(dh) * h[..., None]
    out = torch.stack([pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], dim=-1)
    return out.reshape(deltas.shape)


def clip_boxes_t(boxes, h, w):
    return torch.stack([
        boxes[:, 0].clamp(0, w), boxes[:, 1].clamp(0, h),
        boxes[:, 2].clamp(0, w), boxes[:, 3].clamp(0, h),
    ], dim=1)


def nms_t(boxes, scores, thresh):
    """Exact greedy NMS (torchvision.ops.nms semantics; IoU > thresh
    suppresses). Returns kept indices in descending score order."""
    order = torch.argsort(scores, descending=True, stable=True)
    keep = []
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    areas = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        bi = boxes[i]
        xx1 = torch.maximum(boxes[:, 0], bi[0])
        yy1 = torch.maximum(boxes[:, 1], bi[1])
        xx2 = torch.minimum(boxes[:, 2], bi[2])
        yy2 = torch.minimum(boxes[:, 3], bi[3])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas + areas[i] - inter).clamp(min=1e-12)
        suppressed |= iou > thresh
    return torch.as_tensor(keep, dtype=torch.long)


def roi_align_v2_t(fmap_chw, boxes, out_size, spatial_scale, sampling_ratio):
    """ROIAlignV2 (aligned=True, fixed sampling ratio) on one feature map.

    torchvision bilinear_interpolate border semantics: a sample is zero
    only when its coordinate leaves [-1, dim]; inside that band it clamps
    into [0, dim-1]. fmap_chw (C, H, W); boxes (N, 4) image coords."""
    c, h, w = fmap_chw.shape
    s, r = out_size, sampling_ratio
    n = boxes.shape[0]
    if n == 0:
        return torch.zeros((0, c, s, s))
    b = boxes * spatial_scale - 0.5
    x1, y1 = b[:, 0], b[:, 1]
    bw = (b[:, 2] - x1).clamp(min=1e-6)
    bh = (b[:, 3] - y1).clamp(min=1e-6)
    grid = (torch.arange(s * r, dtype=torch.float32) + 0.5) / r
    sx = x1[:, None] + grid[None, :] * (bw / s)[:, None]  # (N, sr)
    sy = y1[:, None] + grid[None, :] * (bh / s)[:, None]

    def axis(coords, limit):
        band = (coords >= -1.0) & (coords <= limit)
        cc = coords.clamp(0.0, limit - 1.0)
        f0 = torch.floor(cc)
        frac = cc - f0
        i0 = f0.long()
        return band, i0, frac

    band_y, iy, fy = axis(sy, float(h))
    band_x, ix, fx = axis(sx, float(w))
    iy1 = (iy + 1).clamp(max=h - 1)
    ix1 = (ix + 1).clamp(max=w - 1)

    # gather the 4 taps for the (N, sr, sr) outer grid
    fm = fmap_chw.reshape(c, -1)

    def take(yi, xi):
        idx = (yi[:, :, None] * w + xi[:, None, :]).reshape(n, -1)  # (N, sr*sr)
        return fm[:, idx.reshape(-1)].reshape(c, n, sy.shape[1], sx.shape[1])

    v00 = take(iy, ix)
    v01 = take(iy, ix1)
    v10 = take(iy1, ix)
    v11 = take(iy1, ix1)
    dy = fy[:, :, None]
    dx = fx[:, None, :]
    out = (
        v00 * (1 - dy) * (1 - dx)
        + v01 * (1 - dy) * dx
        + v10 * dy * (1 - dx)
        + v11 * dy * dx
    )
    out = out * (band_y[:, :, None] & band_x[:, None, :]).to(out.dtype)
    out = out.reshape(c, n, s, r, s, r).mean(dim=(3, 5))  # (C, N, s, s)
    return out.permute(1, 0, 2, 3).contiguous()


def assign_levels_t(boxes, lmin=2, lmax=6, fit_window=None, stride0=4.0):
    """d2 ROIPooler rule + (optional) the flax window-fit bump."""
    area = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])).clamp(min=1e-6)
    lvl = torch.floor(4 + torch.log2(area.sqrt() / 224.0 + 1e-8)).clamp(lmin, lmax).long()
    bumped = torch.zeros(len(boxes), dtype=torch.bool)
    if fit_window is not None:
        ext = torch.maximum(boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1])
        need = torch.ceil(torch.log2((ext / stride0 / (fit_window - 2)).clamp(min=1e-6)))
        need = need.clamp(0, lmax - lmin).long() + lmin
        bumped = need > lvl
        lvl = torch.maximum(lvl, need)
    return lvl, bumped


def multilevel_roi_align_t(feats_chw, boxes, out_size, sampling_ratio, fit_window=None):
    """d2 ROIPooler over p2..p6 dict of (C, H, W) maps; boxes (N, 4)."""
    names = sorted(feats_chw.keys())
    lmin, lmax = int(names[0][1:]), int(names[-1][1:])
    lvl, bumped = assign_levels_t(boxes, lmin, lmax, fit_window=fit_window)
    c = feats_chw[names[0]].shape[0]
    out = torch.zeros((len(boxes), c, out_size, out_size))
    for name in names:
        li = int(name[1:])
        sel = (lvl == li).nonzero(as_tuple=True)[0]
        if len(sel) == 0:
            continue
        out[sel] = roi_align_v2_t(
            feats_chw[name], boxes[sel], out_size, 1.0 / (2.0 ** li), sampling_ratio
        )
    return out, bumped


def generate_anchors_t(feature_shapes, strides, sizes, aspect_ratios):
    """d2 DefaultAnchorGenerator (offset 0): centers at stride * i."""
    out = {}
    for name, (h, w) in feature_shapes.items():
        stride = strides[name]
        cell = []
        for size in sizes[name]:
            area = float(size) ** 2
            for ar in aspect_ratios:
                cw = math.sqrt(area / ar)
                ch = ar * cw
                cell.append([-cw / 2, -ch / 2, cw / 2, ch / 2])
        cell = torch.tensor(cell, dtype=torch.float32)  # (A, 4)
        xs = torch.arange(w, dtype=torch.float32) * stride
        ys = torch.arange(h, dtype=torch.float32) * stride
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        shifts = torch.stack([gx, gy, gx, gy], dim=-1).reshape(-1, 1, 4)
        out[name] = (shifts + cell[None]).reshape(-1, 4)
    return out


# ---------------------------------------------------------------------------
# the reference model (exact d2 module naming for state-dict load)
# ---------------------------------------------------------------------------
class _RPNHeadT(nn.Module):
    def __init__(self, cin, num_anchors):
        super().__init__()
        self.conv = nn.Conv2d(cin, 256, 3, padding=1)
        self.objectness_logits = nn.Conv2d(256, num_anchors, 1)
        self.anchor_deltas = nn.Conv2d(256, num_anchors * 4, 1)

    def forward(self, f):
        t = F.relu(self.conv(f))
        return self.objectness_logits(t), self.anchor_deltas(t)


class TorchRefRCNN3D(nn.Module):
    """d2-named module tree; drive with `forward_infer` below."""

    def __init__(self, cfg, backbone="dla34", trunk_channels=(64, 128, 256, 512)):
        super().__init__()
        num_classes = cfg.model.roi_heads.num_classes
        ch = cfg.model.roi_cube_head
        a = len(cfg.model.rpn.aspect_ratios) * len(cfg.model.rpn.anchor_sizes[0])
        fpn_c = cfg.model.fpn_out_channels

        self.backbone = nn.Module()
        self.backbone.bottom_up = _torch_dla(backbone)
        chans = {"p2": trunk_channels[0], "p3": trunk_channels[1],
                 "p4": trunk_channels[2], "p5": trunk_channels[3],
                 "p6": trunk_channels[3]}
        for lvl in range(2, 7):
            setattr(self.backbone, f"fpn_lateral{lvl}", nn.Conv2d(chans[f"p{lvl}"], fpn_c, 1))
            setattr(self.backbone, f"fpn_output{lvl}", nn.Conv2d(fpn_c, fpn_c, 3, padding=1))

        self.proposal_generator = nn.Module()
        self.proposal_generator.rpn_head = _RPNHeadT(fpn_c, a)

        rh = nn.Module()
        rh.box_head = nn.Module()
        rh.box_head.fc1 = nn.Linear(7 * 7 * fpn_c, cfg.model.roi_box_head.fc_dim)
        rh.box_head.fc2 = nn.Linear(cfg.model.roi_box_head.fc_dim, cfg.model.roi_box_head.fc_dim)
        rh.box_predictor = nn.Module()
        rh.box_predictor.cls_score = nn.Linear(cfg.model.roi_box_head.fc_dim, num_classes + 1)
        rh.box_predictor.bbox_pred = nn.Linear(cfg.model.roi_box_head.fc_dim, num_classes * 4)
        rh.cube_head = _TorchCubeHead(
            num_classes, ch.shared_fc, ch.pose_type, ch.cluster_bins,
            ch.use_confidence > 0, in_dim=7 * 7 * fpn_c, fc_dim=ch.fc_dim,
            num_fc=ch.num_fc,
        )
        bins = max(ch.cluster_bins, 1)
        rh.priors_dims_per_cat = nn.Parameter(torch.zeros(1, num_classes, 2, 3))
        rh.priors_z_scales = nn.Parameter(torch.zeros(num_classes, bins))
        rh.priors_z_stats = nn.Parameter(torch.zeros(num_classes, bins, 2))
        self.roi_heads = rh
        self.cfg = cfg

    # -- stages -----------------------------------------------------------
    def features(self, x_nchw):
        """trunk + FPN -> {p2..p6: (B, 256, H, W)} (dla.py:463-482 + d2 FPN)."""
        with torch.no_grad():
            trunk = {}
            y = self.backbone.bottom_up.base_layer(x_nchw)
            y = self.backbone.bottom_up.level0(y)
            y = self.backbone.bottom_up.level1(y)
            y = self.backbone.bottom_up.level2(y); trunk["p2"] = y
            y = self.backbone.bottom_up.level3(y); trunk["p3"] = y
            y = self.backbone.bottom_up.level4(y); trunk["p4"] = y
            y = self.backbone.bottom_up.level5(y); trunk["p5"] = y
            trunk["p6"] = F.max_pool2d(trunk["p5"], kernel_size=1, stride=2)

            outs = {}
            prev = None
            for lvl in range(6, 1, -1):
                cur = getattr(self.backbone, f"fpn_lateral{lvl}")(trunk[f"p{lvl}"])
                if prev is not None:
                    cur = cur + F.interpolate(prev, size=cur.shape[-2:], mode="nearest")
                prev = cur
                outs[f"p{lvl}"] = getattr(self.backbone, f"fpn_output{lvl}")(cur)
            return outs

    def rpn_proposals(self, feats, image_hw):
        """Per-image proposal boxes/scores (d2 find_top_rpn_proposals, eval)."""
        r = self.cfg.model.rpn
        in_features = list(r.in_features)
        strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
        sizes = {f: r.anchor_sizes[i] for i, f in enumerate(in_features)}
        shapes = {f: tuple(feats[f].shape[-2:]) for f in in_features}
        anchors = generate_anchors_t(shapes, strides, sizes, r.aspect_ratios)
        bsz = feats[in_features[0]].shape[0]
        out = []
        with torch.no_grad():
            heads = {f: self.proposal_generator.rpn_head(feats[f]) for f in in_features}
            for i in range(bsz):
                lvl_boxes, lvl_scores = [], []
                for f in in_features:
                    lg, rg = heads[f]
                    a = lg.shape[1]
                    # NHWC (h, w, a) flatten order to match anchor order
                    lg_i = lg[i].permute(1, 2, 0).reshape(-1)
                    rg_i = rg[i].permute(1, 2, 0).reshape(-1, 4)
                    k = min(r.pre_nms_topk_test, lg_i.numel())
                    scores, idx = lg_i.topk(k)
                    boxes = apply_deltas_t(rg_i[idx], anchors[f][idx])
                    h, w = float(image_hw[i][0]), float(image_hw[i][1])
                    boxes = clip_boxes_t(boxes, h, w)
                    ok = (
                        (boxes[:, 2] - boxes[:, 0] > r.min_box_size)
                        & (boxes[:, 3] - boxes[:, 1] > r.min_box_size)
                        & torch.isfinite(boxes).all(1) & torch.isfinite(scores)
                    )
                    boxes, scores = boxes[ok], scores[ok]
                    keep = nms_t(boxes, scores, r.nms_thresh)
                    lvl_boxes.append(boxes[keep])
                    lvl_scores.append(scores[keep])
                boxes = torch.cat(lvl_boxes)
                scores = torch.cat(lvl_scores)
                order = torch.argsort(scores, descending=True, stable=True)
                order = order[: r.post_nms_topk_test]
                out.append((boxes[order], scores[order]))
        return out

    def detect_image(self, feats_i_chw, prop_boxes, image_hw_i, fit_window=None):
        """fast_rcnn inference for ONE image (fast_rcnn.py:101-114 +
        threedod shapes: top-`nms_candidates` truncation is NOT mirrored —
        the test sizes nms_candidates >= K*C so both agree)."""
        c = self.cfg
        num_classes = c.model.roi_heads.num_classes
        sampling = max(c.model.roi_box_head.pooler_sampling_ratio, 2)
        with torch.no_grad():
            pooled, bumped = multilevel_roi_align_t(
                feats_i_chw, prop_boxes, c.model.roi_box_head.pooler_resolution,
                sampling, fit_window=fit_window,
            )
            x = pooled.flatten(start_dim=1)
            x = F.relu(self.roi_heads.box_head.fc1(x))
            x = F.relu(self.roi_heads.box_head.fc2(x))
            scores = self.roi_heads.box_predictor.cls_score(x)
            deltas = self.roi_heads.box_predictor.bbox_pred(x)
            probs = F.softmax(scores, dim=-1)[:, :-1]  # (K, C)
            boxes_pc = apply_deltas_t(deltas, prop_boxes, (10.0, 10.0, 5.0, 5.0))
            boxes_pc = boxes_pc.reshape(-1, num_classes, 4)

            flat_scores = probs.reshape(-1)
            flat_boxes = boxes_pc.reshape(-1, 4)
            flat_cls = torch.arange(len(flat_scores)) % num_classes
            ok = (flat_scores > c.model.roi_heads.score_thresh_test) & torch.isfinite(flat_boxes).all(1)
            fb, fs, fc = flat_boxes[ok], flat_scores[ok], flat_cls[ok]
            h, w = float(image_hw_i[0]), float(image_hw_i[1])
            fb = clip_boxes_t(fb, h, w)
            # batched (class-wise) NMS via per-class offsets
            offs = fc.to(fb.dtype)[:, None] * (max(h, w) + 2.0)
            keep = nms_t(fb + offs, fs, c.model.roi_heads.nms_thresh_test)
            keep = keep[: c.shapes.max_detections]
            return fb[keep], fs[keep], fc[keep], bumped

    def cubes_image(self, feats_i_chw, det_boxes, det_classes, K_scaled, v2r,
                    fit_window=None):
        """Cube branch on final detections (roi_heads.py:2237+ inference)."""
        c = self.cfg
        ch = c.model.roi_cube_head
        sampling = max(ch.pooler_sampling_ratio, 2)
        boxes = det_boxes
        if ch.scale_roi_boxes > 0:
            ctr = (boxes[:, :2] + boxes[:, 2:]) * 0.5
            half = (boxes[:, 2:] - boxes[:, :2]) * 0.5 * ch.scale_roi_boxes
            boxes = torch.cat([ctr - half, ctr + half], dim=1)
        with torch.no_grad():
            pooled, bumped = multilevel_roi_align_t(
                feats_i_chw, boxes, ch.pooler_resolution, sampling,
                fit_window=fit_window,
            )
            out = _torch_transform_chain(
                self.roi_heads, c, pooled.flatten(start_dim=1),
                det_boxes, det_classes, K_scaled,
                torch.full((len(det_boxes),), float(v2r)),
            )
            return out, bumped
