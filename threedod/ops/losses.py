"""Loss primitives: CE, BCE, focal, dice, smooth-L1 — masked variants.

Replaces torchvision CUDA ops (sigmoid_focal_loss, generalized_box_iou_loss
at reference roi_heads.py:12,40) and torch.nn.functional losses with
mask-aware JAX versions (padding slots contribute zero).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean softmax CE over masked entries. labels int (N,), logits (N, C)."""
    labels_safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels_safe[..., None], axis=-1)[..., 0]
    if mask is None:
        return nll.mean()
    mask = mask.astype(nll.dtype)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def binary_cross_entropy_with_logits(logits, targets, weight=None, reduction="none"):
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weight is not None:
        loss = loss * weight
    if reduction == "sum":
        return loss.sum()
    if reduction == "mean":
        return loss.mean()
    return loss


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0, reduction="none"):
    """torchvision sigmoid_focal_loss parity."""
    p = jax.nn.sigmoid(logits)
    ce = binary_cross_entropy_with_logits(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    if reduction == "sum":
        return loss.sum()
    if reduction == "mean":
        return loss.mean()
    return loss


def dice_loss(pred_mask, gt_mask, eps: float = 1.0):
    """Dice loss over (..., H, W) masks (reference roi_heads.py:1013-1028)."""
    num = 2.0 * jnp.sum(pred_mask * gt_mask, axis=(-2, -1))
    den = jnp.sum(pred_mask**2, axis=(-2, -1)) + jnp.sum(gt_mask**2, axis=(-2, -1))
    return 1.0 - (num + eps) / (den + eps)


def smooth_l1_loss(pred, target, beta: float = 0.0):
    diff = jnp.abs(pred - target)
    if beta <= 0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def safely_reduce_losses(loss: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean over finite (and masked) entries; 0 if none.

    Parity: ROIHeads3D.safely_reduce_losses (roi_heads.py:2843-2851).
    """
    loss = jnp.asarray(loss)  # tolerate a python-float 0.0 (empty loss menu)
    if loss.ndim == 0 and mask is not None:
        loss = jnp.broadcast_to(loss, mask.shape)
    finite = jnp.isfinite(loss)
    if mask is not None:
        finite = finite & mask
    w = finite.astype(loss.dtype)
    safe = jnp.where(finite, loss, 0.0)
    return jnp.sum(safe * w) / jnp.maximum(jnp.sum(w), 1.0)
