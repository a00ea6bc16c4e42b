"""Region Proposal Network with ignore-region handling and IoUness loss.

Parity target: cubercnn/modeling/proposal_generator/rpn.py (RPNWithIgnore):
  * anchor labelling with ignore regions via pairwise_ioa >= thresh (:93-105)
  * IoU-weighted anchor subsampling (:317-324) — Gumbel top-k here
  * best-anchor-per-GT force-kept (:75-84) via allow_low_quality matching
  * IoUness objectness: BCE(logits, matched IoU) weighted by IoU (:206-273)
  * per-level pre-NMS top-k, per-level NMS (batched_nms keyed by level —
    d2 semantics), global post-NMS top-k.

TPU re-design: one batched jit program; every image processes a static
anchor set derived from the fixed canvas; proposals are a padded
(B, post_nms_topk, 4) tensor with a validity mask.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..geometry.boxes2d import Box2BoxTransform, clip_boxes
from ..ops.losses import binary_cross_entropy_with_logits, smooth_l1_loss
from .backbones.layers import ConvWithBiasParams
from ..ops.matcher import match_and_ignore, subsample_fg_bg
from ..ops import fused_conv
from ..ops.nms import nms_mask, nms_sorted


def generate_anchors(
    feature_shapes: Dict[str, Tuple[int, int]],
    strides: Dict[str, int],
    sizes: Dict[str, Tuple[int, ...]],
    aspect_ratios: Tuple[float, ...],
) -> Dict[str, np.ndarray]:
    """Dense anchors per level: (H*W*A, 4) XYXY, centers at stride*(i+0.5)...

    Detectron2 DefaultAnchorGenerator parity: cell anchors centered at
    (stride/2 + stride*i) offsets... d2 uses offset 0: centers at
    stride * (i + 0.5)? d2 grid offsets are `stride * i + stride * 0.5`
    with offset=0.5 by default (config ANCHOR_GENERATOR.OFFSET=0.0 gives
    stride * i). The reference uses the default offset 0.0, so centers sit
    at stride * i exactly; we match that.
    """
    out = {}
    for name, (h, w) in feature_shapes.items():
        stride = strides[name]
        cell = []
        for size in sizes[name]:
            area = float(size) ** 2
            for ar in aspect_ratios:
                cw = np.sqrt(area / ar)
                ch = ar * cw
                cell.append([-cw / 2.0, -ch / 2.0, cw / 2.0, ch / 2.0])
        cell = np.asarray(cell, np.float32)  # (A, 4)
        xs = np.arange(w, dtype=np.float32) * stride
        ys = np.arange(h, dtype=np.float32) * stride
        gx, gy = np.meshgrid(xs, ys)
        shifts = np.stack([gx, gy, gx, gy], axis=-1).reshape(-1, 1, 4)
        anchors = (shifts + cell[None]).reshape(-1, 4)  # (H*W*A, 4)
        out[name] = anchors
    return out


class RPNHead(nn.Module):
    """Shared 3x3 conv + objectness/delta predictors (StandardRPNHead)."""

    num_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray], train: bool = False):
        a = self.num_anchors
        cin = next(iter(features.values())).shape[-1]
        tiles = {
            name: fused_conv.fuse_tile("rpn", f.shape[1], f.shape[2], 256, a * 5)
            for name, f in features.items()
        }
        logits, regs = {}, {}
        if not train and fused_conv.fused_conv_available() and any(
            t is not None for t in tiles.values()
        ):
            # Eval fast path (ops/fused_conv.py): conv+relu and the packed
            # 1x1 predictor heads in one kernel per level — the 256-ch
            # activation never round-trips HBM. Levels whose shape is not a
            # measured hardware winner compute the same packed program
            # through stock XLA (identical parameter tree either way).
            wc, bc = ConvWithBiasParams((3, 3, cin, 256), name="conv")()
            ko, bo = ConvWithBiasParams((1, 1, 256, a), name="objectness_logits")()
            kd, bd = ConvWithBiasParams((1, 1, 256, a * 4), name="anchor_deltas")()
            wh = jnp.concatenate([ko.reshape(256, a), kd.reshape(256, a * 4)], axis=-1)
            bh = jnp.concatenate([bo, bd])
            for name, f in features.items():
                b, h, w, _ = f.shape
                if tiles[name] is not None:
                    out = fused_conv.fused_conv_relu_head(
                        f.astype(self.dtype), wc, bc, wh, bh,
                        ht=tiles[name], interpret=fused_conv.kernel_interpret(),
                    )
                else:
                    out = fused_conv.conv_relu_head_reference(
                        f.astype(self.dtype), wc, bc, wh, bh
                    )
                # emit at the head's compute dtype: values are dtype-born,
                # so the f32 cast adds no information but doubles the
                # (B, HWA, 4) layout-copy traffic; consumers cast the few
                # thousand post-top-k rows (predict_proposals) or fold the
                # cast into the loss elementwise fusion (losses).
                logits[name] = out[..., :a].reshape(b, h * w * a)
                regs[name] = out[..., a:].reshape(b, h * w * a, 4)
            return logits, regs
        conv = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype, name="conv")
        obj = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="objectness_logits")
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="anchor_deltas")
        for name, f in features.items():
            t = nn.relu(conv(f))
            b, h, w, _ = t.shape
            logits[name] = obj(t).reshape(b, h * w * self.num_anchors)
            regs[name] = deltas(t).reshape(b, h * w * self.num_anchors, 4)
        return logits, regs


class Proposals(NamedTuple):
    boxes: jnp.ndarray  # (B, K, 4)
    scores: jnp.ndarray  # (B, K) objectness logits
    valid: jnp.ndarray  # (B, K) bool


class RPN:
    """Functional RPN logic around an RPNHead (stateless; params via flax)."""

    def __init__(self, cfg, feature_shapes: Dict[str, Tuple[int, int]]):
        r = cfg.model.rpn
        self.cfg_rpn = r
        self.strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
        self.in_features = list(r.in_features)
        sizes = {f: r.anchor_sizes[i] for i, f in enumerate(self.in_features)}
        self.num_anchors = len(r.aspect_ratios) * len(r.anchor_sizes[0])
        anchors_np = generate_anchors(
            {f: feature_shapes[f] for f in self.in_features}, self.strides, sizes, r.aspect_ratios
        )
        self.anchors = {f: jnp.asarray(a) for f, a in anchors_np.items()}
        self.anchors_cat = jnp.concatenate([self.anchors[f] for f in self.in_features], axis=0)
        self.level_sizes = [int(self.anchors[f].shape[0]) for f in self.in_features]
        self.transform = Box2BoxTransform()

    # ---------------- label assignment + losses (train) -------------------
    def losses_and_proposals(
        self,
        key,
        logits: Dict[str, jnp.ndarray],
        regs: Dict[str, jnp.ndarray],
        gt_boxes,  # (B, M, 4)
        gt_classes,  # (B, M)
        gt_valid,  # (B, M)
        image_hw,  # (B, 2)
        train: bool = True,
    ):
        r = self.cfg_rpn
        logits_cat = jnp.concatenate(
            [logits[f] for f in self.in_features], axis=1
        ).astype(jnp.float32)
        regs_cat = jnp.concatenate(
            [regs[f] for f in self.in_features], axis=1
        ).astype(jnp.float32)
        b = logits_cat.shape[0]

        def per_image(key_i, gtb, gtc, gtv):
            valid_gt = gtv & (gtc >= 0)
            ign_gt = gtv & (gtc < 0)
            m, in_ignore = match_and_ignore(
                gtb, valid_gt, ign_gt, self.anchors_cat,
                bg_thresh=r.iou_thresholds[0], fg_thresh=r.iou_thresholds[1],
                ignore_thresh=r.ignore_threshold,
                allow_low_quality=True,
            )
            labels = m.matched_labels
            # IoU-weighted subsample (fills labels to -1 outside the sample)
            idx, _, sel_valid = subsample_fg_bg(
                key_i, labels, m.matched_ious, r.batch_size_per_image, r.positive_fraction
            )
            sampled = jnp.zeros_like(labels, dtype=bool).at[idx].set(sel_valid)
            lab = jnp.full_like(labels, -1)
            lab = jnp.where(sampled & (labels == 1), 1, lab)
            lab = jnp.where(sampled & (labels == 0), 0, lab)
            # force-keep best anchors per gt even if the sampler dropped them
            # (reference rpn.py:81-84); the matcher already computed the
            # argmax-anchor mask (allow_low_quality) — reuse it instead of
            # a second (M, R) IoU matrix
            lab = jnp.where(m.forced, 1, lab)
            # ignore regions (mask precomputed by the fused matcher —
            # applied after sampling, reference order rpn.py:93-105)
            lab = jnp.where(in_ignore & (lab == 0), -1, lab)

            # matched gt boxes via one-hot matmul, not an (R,)-indexed
            # gather (advanced-index gathers lower to per-element scalar
            # fetches on TPU — CLAUDE.md rule); exact: one nonzero per row
            onehot = (
                m.matched_idxs[:, None] == jnp.arange(gtb.shape[0])[None, :]
            ).astype(gtb.dtype)
            matched_gt = jax.lax.dot(
                onehot, gtb, precision=jax.lax.Precision.HIGHEST
            )
            return lab, matched_gt, m.matched_ious

        keys = jax.random.split(key, b)
        labels, matched_gt, matched_ious = jax.vmap(per_image)(
            keys, gt_boxes, gt_classes, gt_valid
        )

        fg = labels == 1
        valid_lbl = labels >= 0
        normalizer = r.batch_size_per_image * b

        if r.objectness_uncertainty.lower() != "none":
            # IoUness: BCE against matched IoU, weighted by IoU, FG only
            tgt = jax.lax.stop_gradient(matched_ious)
            conf = binary_cross_entropy_with_logits(logits_cat, tgt)
            objectness_loss = jnp.sum(conf * tgt * fg)
            gt_deltas = self.transform.get_deltas(
                jnp.broadcast_to(self.anchors_cat, matched_gt.shape), matched_gt
            )
            reg = smooth_l1_loss(regs_cat, jax.lax.stop_gradient(gt_deltas)).sum(-1)
            localization_loss = jnp.sum(reg * tgt * fg)
        else:
            objectness_loss = jnp.sum(
                binary_cross_entropy_with_logits(logits_cat, fg.astype(jnp.float32)) * valid_lbl
            )
            gt_deltas = self.transform.get_deltas(
                jnp.broadcast_to(self.anchors_cat, matched_gt.shape), matched_gt
            )
            localization_loss = jnp.sum(
                smooth_l1_loss(regs_cat, jax.lax.stop_gradient(gt_deltas)).sum(-1) * fg
            )

        losses = {
            "rpn/cls": objectness_loss / normalizer * r.loss_weight_cls,
            "rpn/loc": localization_loss / normalizer * r.loss_weight_loc,
        }
        metrics = {
            "rpn/num_pos_anchors": jnp.sum(fg) / b,
            "rpn/num_neg_anchors": jnp.sum(labels == 0) / b,
        }
        # proposals are training CONSTANTS for the ROI heads (detectron2
        # semantics) — cutting the gradient here also keeps the NMS/topk
        # machinery out of the backward graph entirely.
        proposals = jax.lax.stop_gradient(
            self.predict_proposals(logits, regs, image_hw, train=train)
        )
        return proposals, losses, metrics

    # ---------------- proposal selection ---------------------------------
    def predict_proposals(self, logits, regs, image_hw, train: bool) -> Proposals:
        r = self.cfg_rpn
        pre_k = r.pre_nms_topk_train if train else r.pre_nms_topk_test
        post_k = r.post_nms_topk_train if train else r.post_nms_topk_test

        # one NMS instance per (image, level), run as a SINGLE vmapped call:
        # five separate per-level while-loops cost ~5x the fixpoint's fixed
        # per-round overhead; merged lanes share rounds (extra rounds on an
        # already-converged lane are no-ops, so keeps are bit-identical).
        # Short levels are padded to the longest level's candidate count
        # with score=-inf/valid=False rows, which sort last and can neither
        # keep nor suppress; pads only shift absolute concat indices, never
        # the relative order of real entries, so the post-NMS top-k
        # tie-break (stable, index-ordered) selects the same proposals.
        k_max = max(min(pre_k, logits[f].shape[1]) for f in self.in_features)

        def per_image(lg_levels, rg_levels, hw):
            all_boxes, all_scores, all_valid = [], [], []
            for f, lg, rg in zip(self.in_features, lg_levels, rg_levels):
                k = min(pre_k, lg.shape[0])
                scores, idx = jax.lax.top_k(lg, k)
                scores = scores.astype(jnp.float32)
                boxes = self.transform.apply_deltas(
                    rg[idx].astype(jnp.float32), self.anchors[f][idx]
                )
                boxes = clip_boxes(boxes, hw[0].astype(boxes.dtype), hw[1].astype(boxes.dtype))
                wh_valid = (boxes[:, 2] - boxes[:, 0] > r.min_box_size) & (
                    boxes[:, 3] - boxes[:, 1] > r.min_box_size
                )
                finite = jnp.isfinite(boxes).all(-1) & jnp.isfinite(scores)
                if k < k_max:
                    boxes = jnp.pad(boxes, ((0, k_max - k), (0, 0)))
                    scores = jnp.pad(scores, (0, k_max - k), constant_values=-jnp.inf)
                    finite = jnp.pad(wh_valid & finite, (0, k_max - k))
                else:
                    finite = wh_valid & finite
                all_boxes.append(boxes)
                all_scores.append(scores)
                all_valid.append(finite)
            return (
                jnp.stack(all_boxes, 0),
                jnp.stack(all_scores, 0),
                jnp.stack(all_valid, 0),
            )

        lg_stack = [logits[f] for f in self.in_features]
        rg_stack = [regs[f] for f in self.in_features]
        # (B, L, K, 4) / (B, L, K)
        boxes, scores, valid = jax.vmap(per_image)(lg_stack, rg_stack, image_hw)
        b = boxes.shape[0]
        lk = boxes.shape[1] * boxes.shape[2]
        # select in per-level score-sorted space (nms_sorted): among equal
        # scores the stable sort preserves original-index order within a
        # level and the concat preserves level order, so the global top-k's
        # index tie-break picks the same proposals in the same order as the
        # original-order formulation — without the keep-scatter
        sboxes, skey, keep = jax.vmap(
            lambda bx, sc, vd: nms_sorted(bx, sc, r.nms_thresh, valid=vd)
        )(
            boxes.reshape(-1, k_max, 4),
            scores.reshape(-1, k_max),
            valid.reshape(-1, k_max),
        )
        sboxes = sboxes.reshape(b, lk, 4)
        masked = jnp.where(keep.reshape(b, lk), skey.reshape(b, lk), -jnp.inf)
        top_scores, top_idx = jax.lax.top_k(masked, post_k)
        top_boxes = jnp.take_along_axis(sboxes, top_idx[..., None], axis=1)
        return Proposals(
            boxes=top_boxes, scores=top_scores, valid=jnp.isfinite(top_scores)
        )
