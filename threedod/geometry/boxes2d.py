"""2D box operations: IoU/IoA matrices, deltas, GIoU (batched, jit-safe).

Parity targets: cubercnn/util/math_util.py:1001-1117 (iou/intersect),
detectron2 Box2BoxTransform / pairwise_iou / pairwise_ioa as used throughout
the reference RPN and ROI heads.

Boxes are (..., 4) in XYXY format unless noted.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

# Clamp for dw/dh in delta application (detectron2's _DEFAULT_SCALE_CLAMP).
SCALE_CLAMP = math.log(1000.0 / 16)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(boxes[..., 2] - boxes[..., 0], 0) * jnp.clip(boxes[..., 3] - boxes[..., 1], 0)


def pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) -> (N, M) intersection areas.

    Component-wise on purpose: a stacked (N, M, 2) lt/rb/wh intermediate
    materializes as its own fusion output on TPU (xplane trace showed
    f32[8,2000,2000,2] buffers around the NMS/matcher at ~2.4 ms/step);
    four (N, M) planes fuse into the consumer instead. Same arithmetic per
    element (max, min, sub, clip, mul) — bit-identical results."""
    x1 = jnp.maximum(boxes1[:, None, 0], boxes2[None, :, 0])
    y1 = jnp.maximum(boxes1[:, None, 1], boxes2[None, :, 1])
    x2 = jnp.minimum(boxes1[:, None, 2], boxes2[None, :, 2])
    y2 = jnp.minimum(boxes1[:, None, 3], boxes2[None, :, 3])
    return jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) -> (N, M) IoU."""
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = box_area(boxes1)[:, None]
    a2 = box_area(boxes2)[None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def pairwise_ioa(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) -> (N, M) intersection-over-area-of-boxes2."""
    inter = pairwise_intersection(boxes1, boxes2)
    a2 = box_area(boxes2)[None, :]
    return jnp.where(a2 > 0, inter / jnp.maximum(a2, 1e-12), 0.0)


def matched_pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of matched boxes, (..., 4) x (..., 4) -> (...,)."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes1) + box_area(boxes2) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def matched_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise generalized IoU of matched boxes (..., 4) -> (...,)."""
    iou = matched_pairwise_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    hull = wh[..., 0] * wh[..., 1]
    inter = matched_pairwise_iou(boxes1, boxes2) * (
        box_area(boxes1) + box_area(boxes2)
    ) / jnp.maximum(1.0 + matched_pairwise_iou(boxes1, boxes2), 1e-12)
    union = box_area(boxes1) + box_area(boxes2) - inter
    return iou - jnp.where(hull > 0, (hull - union) / jnp.maximum(hull, 1e-12), 0.0)


def giou_loss(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """1 - GIoU, elementwise (fvcore giou_loss parity)."""
    return 1.0 - matched_giou(boxes1, boxes2)


def clip_boxes(boxes: jnp.ndarray, h, w) -> jnp.ndarray:
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def box_centers(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [(boxes[..., 0] + boxes[..., 2]) * 0.5, (boxes[..., 1] + boxes[..., 3]) * 0.5],
        axis=-1,
    )


class Box2BoxTransform:
    """Parameterises box regression as (dx, dy, dw, dh) deltas.

    detectron2-compatible (weights default (1, 1, 1, 1), log-space w/h,
    dw/dh clamped at apply time).
    """

    def __init__(self, weights=(1.0, 1.0, 1.0, 1.0)):
        self.weights = weights

    def get_deltas(self, src_boxes: jnp.ndarray, target_boxes: jnp.ndarray) -> jnp.ndarray:
        sw = jnp.maximum(src_boxes[..., 2] - src_boxes[..., 0], 1e-6)
        sh = jnp.maximum(src_boxes[..., 3] - src_boxes[..., 1], 1e-6)
        sx = src_boxes[..., 0] + 0.5 * sw
        sy = src_boxes[..., 1] + 0.5 * sh
        tw = jnp.maximum(target_boxes[..., 2] - target_boxes[..., 0], 1e-6)
        th = jnp.maximum(target_boxes[..., 3] - target_boxes[..., 1], 1e-6)
        tx = target_boxes[..., 0] + 0.5 * tw
        ty = target_boxes[..., 1] + 0.5 * th
        wx, wy, ww, wh = self.weights
        dx = wx * (tx - sx) / sw
        dy = wy * (ty - sy) / sh
        dw = ww * jnp.log(tw / sw)
        dh = wh * jnp.log(th / sh)
        return jnp.stack([dx, dy, dw, dh], axis=-1)

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """deltas (..., k*4), boxes (..., 4) -> boxes (..., k*4)."""
        w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0)
        h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)
        cx = boxes[..., 0] + 0.5 * w
        cy = boxes[..., 1] + 0.5 * h
        wx, wy, ww, wh = self.weights
        shp = deltas.shape[:-1] + (-1, 4)
        d = deltas.reshape(shp)
        dx = d[..., 0] / wx
        dy = d[..., 1] / wy
        dw = jnp.minimum(d[..., 2] / ww, SCALE_CLAMP)
        dh = jnp.minimum(d[..., 3] / wh, SCALE_CLAMP)
        pcx = dx * w[..., None] + cx[..., None]
        pcy = dy * h[..., None] + cy[..., None]
        pw = jnp.exp(dw) * w[..., None]
        ph = jnp.exp(dh) * h[..., None]
        out = jnp.stack(
            [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1
        )
        return out.reshape(deltas.shape)
