"""RCNN3DCombined: weak Cube R-CNN meta-architecture.

Parity target: cubercnn/modeling/meta_arch/rcnn3d.py:265-592
(RCNN3D_combined_features): same skeleton as RCNN3D but depth maps and
ground maps are batched through to the weak ROI head at train time; at
inference the weak model behaves exactly like RCNN3D (no maps,
rcnn3d.py:427-428).

(The reference's optional depth-feature concat onto FPN levels is dead code
behind `if False` at rcnn3d.py:288 and is intentionally not reproduced.)
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.batch import Batch, normalize_image
from ..utils import debug
from .backbones import build_backbone
from .rpn import RPN, RPNHead
from .weak_heads import ROIHeads3DScore


class RCNN3DCombined(nn.Module):
    cfg: Any
    priors: Optional[dict] = None

    def setup(self):
        c = self.cfg
        dtype = jnp.bfloat16 if c.model.dtype == "bfloat16" else jnp.float32
        self.backbone = build_backbone(c.model.backbone, c.model.fpn_out_channels, dtype=dtype)
        num_anchors = len(c.model.rpn.aspect_ratios) * len(c.model.rpn.anchor_sizes[0])
        self.rpn_head = RPNHead(num_anchors=num_anchors, dtype=dtype)
        self.roi_heads = ROIHeads3DScore(cfg=c, priors=self.priors)

    def __call__(self, batch: Batch, train: bool = False):
        c = self.cfg
        feats = self.backbone(normalize_image(batch.image, c.model, batch.image_hw), train=train)
        feats = debug.sg("trunk", feats)  # profiling seam (identity in prod)
        # features stay in the backbone compute dtype (bf16): the RPN head
        # computes in bf16 and emits f32 logits, and the ROI pooler casts
        # to its own pool dtype — an eager f32 cast here only adds ~0.5 GB/s
        # of HBM round-trips per step.
        rpn_feats = {f: feats[f] for f in c.model.rpn.in_features}
        shapes = {f: (rpn_feats[f].shape[1], rpn_feats[f].shape[2]) for f in rpn_feats}
        rpn = RPN(c, shapes)
        logits, regs = self.rpn_head(rpn_feats, train=train)
        roi_feats = {f: feats[f] for f in c.model.roi_heads.in_features}

        if train:
            key = self.make_rng("sampling")
            proposals, rpn_losses, rpn_metrics = rpn.losses_and_proposals(
                key, logits, regs, batch.gt.boxes2d, batch.gt.classes,
                batch.gt.valid, batch.image_hw, train=True,
            )
            h, w = batch.image.shape[1:3]
            depth = (
                batch.depth_map.astype(jnp.float32)
                if batch.depth_map is not None
                else jnp.full((batch.batch_size, h, w), 3.0)
            )
            losses, metrics = self.roi_heads(
                roi_feats, proposals, batch.K, batch.im_scale_ratio, batch.image_hw,
                gt=batch.gt, train=True, depth_maps=depth,
                ground_maps=None if batch.ground_map is None else batch.ground_map.astype(jnp.float32),
            )
            losses.update(rpn_losses)
            metrics.update(rpn_metrics)
            return losses, metrics

        proposals = rpn.predict_proposals(logits, regs, batch.image_hw, train=False)
        det, _ = self.roi_heads(
            roi_feats, proposals, batch.K, batch.im_scale_ratio, batch.image_hw, train=False
        )
        det = det._replace(boxes=det.boxes * batch.im_scale_ratio[:, None, None])
        return det
