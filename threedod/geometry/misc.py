"""Small shared numerics: virtual depth scaling, scaled sigmoid, smooth L1.

Parity targets: cubercnn/util/math_util.py:732-744 (virtual depth),
:1120-1129 (scaled_sigmoid); fvcore smooth_l1_loss.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_virtual_scale_from_focal_spaces(f, H, f0, H0):
    """Scaling factor of depth from real (f0, H0) to virtual (f, H) space."""
    return (H0 * f) / (f0 * H)


def scaled_sigmoid(vals, min=0.0, max=1.0):
    """Sigmoid rescaled to (min, max)."""
    return min + (max - min) * jax.nn.sigmoid(vals)


def smooth_l1(x: jnp.ndarray, y: jnp.ndarray, beta: float = 0.0) -> jnp.ndarray:
    """Elementwise smooth-L1 (beta=0 -> plain L1, matching reference usage)."""
    diff = jnp.abs(x - y)
    if beta <= 0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def chamfer_corner_loss(pred_corners: jnp.ndarray, gt_corners: jnp.ndarray) -> jnp.ndarray:
    """Symmetric chamfer L1 over 8 box corners, (..., 8, 3) -> (...,).

    Parity: ROIHeads3D.chamfer_loss (roi_heads.py:2209-2215).
    """
    xx = pred_corners[..., :, None, :]
    yy = gt_corners[..., None, :, :]
    l1 = jnp.abs(xx - yy).sum(-1)  # (..., 8, 8)
    return l1.min(-2).mean(-1) + l1.min(-1).mean(-1)
