"""Differentiable convex hull mask fill, static-shape (TPU-friendly).

Parity target: ProposalNetwork/utils/utils.py:424-507 (Jarvis march +
soft half-plane polygon fill). The reference runs a data-dependent Jarvis
march; here the hull of the (always 8) projected cuboid corners is computed
with a fixed-size angular sort — static shapes, fully vmappable — and the
soft fill is the same product-of-half-plane-indicators, which stays
differentiable w.r.t. the corner coordinates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def convex_hull_order(points: jnp.ndarray) -> jnp.ndarray:
    """Return the 2D points ordered counter-clockwise around their hull.

    points: (P, 2). Returns (P, 2): hull vertices first in CCW order,
    interior points repeated onto their nearest predecessor (harmless for the
    half-plane fill since a repeated vertex yields a degenerate edge whose
    half-plane constraint is vacuous when handled by the eps guard).

    Strategy: order all P points by angle around the centroid (valid CCW
    ordering of the hull for convex positions), then walk the ordered cycle
    and snap points that form a right turn (concave) onto the previous kept
    point. For the 8 projected corners of a 3D box this yields exactly the
    hull polygon with duplicates for interior points.
    """
    p = points.shape[0]
    centroid = points.mean(axis=0)
    ang = jnp.arctan2(points[:, 1] - centroid[1], points[:, 0] - centroid[0])
    order = jnp.argsort(ang)
    pts = points[order]  # (P, 2) CCW by angle

    # iteratively snap concave points to predecessor; P passes guarantee
    # convergence for P points.
    def body(_, cur):
        prev = jnp.roll(cur, 1, axis=0)
        nxt = jnp.roll(cur, -1, axis=0)
        cross = (cur[:, 0] - prev[:, 0]) * (nxt[:, 1] - prev[:, 1]) - (
            cur[:, 1] - prev[:, 1]
        ) * (nxt[:, 0] - prev[:, 0])
        concave = cross < -1e-9  # right turn in CCW order -> interior point
        return jnp.where(concave[:, None], prev, cur)

    pts = jax.lax.fori_loop(0, p, body, pts)
    return pts


def fill_polygon_soft(polygon: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Soft rasterisation of a CCW convex polygon -> (H, W) mask in [0, 1].

    Differentiable product of clamped half-plane indicators — the same
    construction as the reference fill_polygon (utils.py:470-502): for each
    edge, a pixel contributes min(max(signed_dist, 0), 1); the mask is the
    product over edges. Degenerate (repeated-vertex) edges are skipped.
    """
    ys = jnp.arange(height, dtype=polygon.dtype)
    xs = jnp.arange(width, dtype=polygon.dtype)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")

    v1 = polygon
    v2 = jnp.roll(polygon, -1, axis=0)
    edge = v2 - v1  # (P, 2)

    # signed "left of edge" value per pixel per edge; for the increasing-angle
    # ordering produced by convex_hull_order the interior satisfies
    # cross2(edge, p - v1) >= 0.
    def edge_mask(v1e, edge_e):
        s = edge_e[0] * (yy - v1e[1]) - edge_e[1] * (xx - v1e[0])
        degenerate = jnp.sum(edge_e * edge_e) < 1e-12
        return jnp.where(degenerate, 1.0, jnp.clip(s, 0.0, 1.0))

    masks = jax.vmap(edge_mask)(v1, edge)  # (P, H, W)
    return jnp.prod(masks, axis=0)


def convex_hull_mask(points: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Differentiable convex-hull mask of 2D points (P, 2) -> (H, W)."""
    hull = convex_hull_order(points)
    return fill_polygon_soft(hull, height, width)
