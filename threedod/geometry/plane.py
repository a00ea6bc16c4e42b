"""Vectorised RANSAC plane fitting (ground-plane estimation).

Parity target: ProposalNetwork/utils/plane.py:79-134 (``Plane.fit_parallel``)
— all hypotheses are scored at once; on TPU this is a single fused program
(sample -> plane-from-3-points -> point-plane distances -> inlier count ->
argmax), no python loop and no pyransac3d.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def fit_plane_ransac(
    points: jnp.ndarray,
    key: jax.Array,
    thresh: float = 0.05,
    num_hypotheses: int = 1000,
    valid_mask: jnp.ndarray | None = None,
):
    """Fit a plane to (N, 3) points with vectorised RANSAC.

    Args:
      points: (N, 3) point cloud (may contain padded rows).
      key: PRNG key.
      thresh: inlier distance threshold (meters).
      num_hypotheses: number of 3-point hypotheses, all evaluated at once.
      valid_mask: optional (N,) bool; padded rows never count as inliers.

    Returns:
      (eq (4,), inlier_frac scalar): plane [a, b, c, d] with unit normal and
      a*x + b*y + c*z + d = 0, and the fraction of valid points within thresh.
    """
    n = points.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((n,), bool)

    # Sample 3 distinct-ish indices per hypothesis (collisions merely waste a
    # hypothesis — same behaviour as the reference's random sampling).
    idx = jax.random.randint(key, (num_hypotheses, 3), 0, n)
    tri = points[idx]  # (H, 3, 3)

    vecA = tri[:, 1] - tri[:, 0]
    vecB = tri[:, 2] - tri[:, 0]
    normal = jnp.cross(vecA, vecB)
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(norm, 1e-12)
    k = -jnp.sum(normal * tri[:, 0], axis=-1)  # (H,)

    # distances of all points to all hypothesis planes: (H, N)
    dist = jnp.abs(jnp.matmul(points, normal.T, precision="highest") + k[None, :]).T
    inlier = (dist <= thresh) & valid_mask[None, :]
    counts = inlier.sum(axis=1)
    # degenerate hypotheses (collinear sample) get zero votes
    counts = jnp.where(norm[:, 0] < 1e-9, 0, counts)

    best = jnp.argmax(counts)
    eq = jnp.concatenate([normal[best], k[best][None]])
    frac = counts[best] / jnp.maximum(valid_mask.sum(), 1)
    return eq, frac


fit_plane_ransac_jit = jax.jit(fit_plane_ransac, static_argnames=("num_hypotheses",))


def orient_ground_normal(eq: jnp.ndarray) -> jnp.ndarray:
    """Make the plane normal point 'up' in camera coords (negative Y).

    Mirrors the reference's normal disambiguation (roi_heads.py:401-428):
    camera Y points down, so a ground normal should have n_y < 0.
    """
    n = eq[:3]
    flip = jnp.where(n[1] > 0, -1.0, 1.0)
    return jnp.concatenate([n * flip, eq[3:] * flip])


def point_cloud_from_depth(
    depth: jnp.ndarray, K: jnp.ndarray, stride: int = 5
) -> jnp.ndarray:
    """Unproject a depth map (H, W) to camera-space points, subsampled.

    Parity: ROIHeads_Boxer point-cloud construction (roi_heads.py:345-368),
    every `stride`-th pixel. Returns (H//stride * W//stride, 3).
    """
    h, w = depth.shape
    ys = jnp.arange(0, h - (h % stride), stride)
    xs = jnp.arange(0, w - (w % stride), stride)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    z = depth[yy, xx]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x3 = z * (xx - cx) / fx
    y3 = z * (yy - cy) / fy
    return jnp.stack([x3.ravel(), y3.ravel(), z.ravel()], axis=-1)
