"""Meta-architectures: RCNN3D (supervised Cube R-CNN), built TPU-first.

Parity target: cubercnn/modeling/meta_arch/rcnn3d.py:34-263 (RCNN3D):
preprocess -> backbone(FPN) -> RPN -> ROIHeads3D, threading per-image K and
scale ratios into the 3D heads. The whole forward (train or inference) is
one jit program over the static-shape Batch contract; there is no
per-image python loop anywhere.

RCNN3DCombined (weak Cube R-CNN) and BoxNet (proposal method) are built on
the same skeleton in weak_arch.py / boxnet.py.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.batch import Batch, normalize_image
from ..utils import debug
from .backbones import build_backbone
from .roi_heads3d import ROIHeads3D
from .rpn import RPN, RPNHead


class RCNN3D(nn.Module):
    cfg: Any
    priors: Optional[dict] = None

    def setup(self):
        c = self.cfg
        dtype = jnp.bfloat16 if c.model.dtype == "bfloat16" else jnp.float32
        self.backbone = build_backbone(c.model.backbone, c.model.fpn_out_channels, dtype=dtype)
        num_anchors = len(c.model.rpn.aspect_ratios) * len(c.model.rpn.anchor_sizes[0])
        self.rpn_head = RPNHead(num_anchors=num_anchors, dtype=dtype)
        self.roi_heads = ROIHeads3D(cfg=c, priors=self.priors)

    def __call__(self, batch: Batch, train: bool = False, oracle: bool = False):
        c = self.cfg
        feats = self.backbone(normalize_image(batch.image, c.model, batch.image_hw), train=train)
        feats = debug.sg("trunk", feats)  # profiling seam (identity in prod)
        # features stay in the backbone compute dtype (bf16): the RPN head
        # computes in bf16 and emits f32 logits, and the ROI pooler casts
        # to its own pool dtype — an eager f32 cast here only adds ~0.5 GB/s
        # of HBM round-trips per step.
        rpn_feats = {f: feats[f] for f in c.model.rpn.in_features}

        # RPN logic object: anchors derived from the (static) traced shapes
        feature_shapes = {f: (rpn_feats[f].shape[1], rpn_feats[f].shape[2]) for f in rpn_feats}
        rpn = RPN(c, feature_shapes)
        logits, regs = self.rpn_head(rpn_feats, train=train)
        logits, regs = debug.sg("rpnhead", (logits, regs))  # profiling seam

        roi_feats = {f: feats[f] for f in c.model.roi_heads.in_features}

        if train:
            key = self.make_rng("sampling")
            proposals, rpn_losses, rpn_metrics = rpn.losses_and_proposals(
                key,
                logits,
                regs,
                batch.gt.boxes2d,
                batch.gt.classes,
                batch.gt.valid,
                batch.image_hw,
                train=True,
            )
            losses, metrics = self.roi_heads(
                roi_feats, proposals, batch.K, batch.im_scale_ratio, batch.image_hw,
                gt=batch.gt, train=True,
            )
            losses.update(rpn_losses)
            metrics.update(rpn_metrics)
            return losses, metrics

        proposals = rpn.predict_proposals(logits, regs, batch.image_hw, train=False)
        det, _ = self.roi_heads(
            roi_feats, proposals, batch.K, batch.im_scale_ratio, batch.image_hw,
            gt=batch.gt if oracle else None, train=False,
        )
        # rescale 2D boxes to original image resolution (GeneralizedRCNN
        # _postprocess parity, rcnn3d.py:122)
        det = det._replace(boxes=det.boxes * batch.im_scale_ratio[:, None, None])
        return det


def build_model(cfg, priors=None) -> nn.Module:
    """Registry-style constructor (parity: rcnn3d.py:894-918)."""
    arch = cfg.model.meta_architecture
    if arch == "RCNN3D":
        return RCNN3D(cfg=cfg, priors=priors)
    if arch == "RCNN3DCombined":
        from .weak_arch import RCNN3DCombined

        return RCNN3DCombined(cfg=cfg, priors=priors)
    if arch == "BoxNet":
        from .boxnet import BoxNet

        return BoxNet(cfg=cfg, priors=priors)
    raise ValueError(f"unknown meta architecture '{arch}'")
