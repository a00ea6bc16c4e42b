"""Differentiable convex hull mask fill, static-shape (TPU-friendly).

Parity target: ProposalNetwork/utils/utils.py:424-507 (Jarvis march +
soft half-plane polygon fill). The reference runs a data-dependent Jarvis
march; here the hull of the (always 8) projected cuboid corners is computed
with a fixed-size angular sort — static shapes, fully vmappable — and the
soft fill is the same product-of-half-plane-indicators, which stays
differentiable w.r.t. the corner coordinates.
"""
from __future__ import annotations

import functools

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


def _edge_planes(polygon, height, width):
    """Per-edge clamped half-plane values. Returns (s, cl, degen):
    s (P, H, W) signed cross products, cl = clip(s, 0, 1) with degenerate
    edges forced to 1, degen (P,) repeated-vertex flags."""
    ys = jnp.arange(height, dtype=polygon.dtype)
    xs = jnp.arange(width, dtype=polygon.dtype)
    v1 = polygon
    v2 = jnp.roll(polygon, -1, axis=0)
    edge = v2 - v1  # (P, 2)
    degen = jnp.sum(edge * edge, axis=1) < 1e-12
    # s(y, x) = e0*(y - v1y) - e1*(x - v1x): separable in y and x, so build
    # it from two rank-1 terms instead of a per-edge 2D expression
    ay = edge[:, 0:1] * (ys[None, :] - v1[:, 1:2])  # (P, H)
    bx = -edge[:, 1:2] * (xs[None, :] - v1[:, 0:1])  # (P, W)
    s = ay[:, :, None] + bx[:, None, :]  # (P, H, W)
    cl = jnp.where(degen[:, None, None], 1.0, jnp.clip(s, 0.0, 1.0))
    return s, cl, degen


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fill_polygon_soft(polygon: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Soft rasterisation of a CCW convex polygon -> (H, W) mask in [0, 1].

    Differentiable product of clamped half-plane indicators — the same
    construction as the reference fill_polygon (utils.py:470-502): for each
    edge, a pixel contributes min(max(signed_dist, 0), 1); the mask is the
    product over edges. Degenerate (repeated-vertex) edges are skipped.

    custom_vjp: autodiff of the (P, H, W) clip-product chain saves the
    per-edge planes as residuals — at weak-train shapes (1024 ROIs x
    128x168 mask cells x 8 edges, f32) that is ~700 MB written in the
    forward and re-read in the backward, which made the hull backward the
    dominant cost of the segmentation loss (~10 ms/step on v5e). The
    backward here keeps only the (P, 2) polygon and recomputes the planes,
    applying the closed-form product-rule partials (zero-factor counting,
    identical to autodiff's prod gradient) and reducing straight to the
    per-vertex gradient — everything stays elementwise+reduce, nothing
    (P, H, W)-sized is ever materialised across the fwd/bwd boundary.
    """
    _, cl, _ = _edge_planes(polygon, height, width)
    return jnp.prod(cl, axis=0)


def _fill_fwd(polygon, height, width):
    return fill_polygon_soft(polygon, height, width), polygon


def _fill_bwd(height, width, polygon, g):
    ys = jnp.arange(height, dtype=polygon.dtype)
    xs = jnp.arange(width, dtype=polygon.dtype)
    s, cl, degen = _edge_planes(polygon, height, width)
    z = cl == 0.0
    nz = jnp.sum(z, axis=0)  # (H, W) zero-factor count
    prod_nz = jnp.prod(jnp.where(z, 1.0, cl), axis=0)
    # d(prod)/d(cl_e): all factors nonzero -> prod/cl_e; exactly one zero
    # factor -> product of the others at that edge only; else 0
    part = jnp.where(
        nz[None] == 0,
        prod_nz[None] / jnp.where(z, 1.0, cl),
        jnp.where((nz[None] == 1) & z, prod_nz[None], 0.0),
    )
    # clip boundary convention matches autodiff exactly: gradient 1 strictly
    # inside (0, 1), 0.5 AT 0 or 1 (JAX max/min ties split), 0 outside —
    # integer-lattice vertices land s exactly on the boundaries, so this is
    # not just a measure-zero nicety
    ind = jnp.where(
        (s > 0.0) & (s < 1.0), 1.0,
        jnp.where((s == 0.0) | (s == 1.0), 0.5, 0.0),
    ) * (~degen[:, None, None])
    ds = g[None] * part * ind  # (P, H, W) cotangent of s
    s0 = jnp.sum(ds, axis=(1, 2))  # (P,)
    sy = jnp.sum(ds * ys[None, :, None], axis=(1, 2))
    sx = jnp.sum(ds * xs[None, None, :], axis=(1, 2))
    v1 = polygon
    v2 = jnp.roll(polygon, -1, axis=0)
    # s = (v2x-v1x)(y-v1y) - (v2y-v1y)(x-v1x):
    #   ds/dv1x = v2y - y ; ds/dv1y = x - v2x
    #   ds/dv2x = y - v1y ; ds/dv2y = v1x - x
    dv1 = jnp.stack([v2[:, 1] * s0 - sy, sx - v2[:, 0] * s0], axis=1)
    dv2 = jnp.stack([sy - v1[:, 1] * s0, v1[:, 0] * s0 - sx], axis=1)
    return (dv1 + jnp.roll(dv2, 1, axis=0),)


fill_polygon_soft.defvjp(_fill_fwd, _fill_bwd)


def convex_hull_mask(points: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Differentiable convex-hull mask of 2D points (P, 2) -> (H, W)."""
    hull = convex_hull_order(points)
    return fill_polygon_soft(hull, height, width)
