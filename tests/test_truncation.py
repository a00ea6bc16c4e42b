"""Truncation-estimate equivalence (VERDICT round-1 item 8).

The reference's estimate_truncation (math_util.py:896-909) is
projection-based: 1 - IoU(projected AABB, image box, ignoring the image
area). Two checks here:
  1. exact parity of geometry.estimate_truncation with that formula
     recomputed independently in numpy on randomized front-of-camera
     cuboids (incl. partially out-of-image ones);
  2. a documented bound of the AABB-based metric against a host-side
     rasterized silhouette ground truth (the fraction of the projected
     cuboid's convex hull outside the image) — this quantifies the metric's
     own bias, which both the reference and this framework share.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from threedod.geometry import estimate_truncation
from threedod.geometry.cuboids import cuboid_verts


def _cross2(a, b):
    """2-D cross product (np.cross on 2-vectors is deprecated in numpy 2)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _random_boxes(rng, n, spread=4.0):
    xyz = np.stack(
        [rng.uniform(-spread, spread, n), rng.uniform(-spread / 2, spread / 2, n),
         rng.uniform(3.0, 10.0, n)], -1)
    whl = rng.uniform(0.4, 2.5, (n, 3))
    # random rotations via QR
    q, _ = np.linalg.qr(rng.randn(n, 3, 3))
    det = np.linalg.det(q)
    q[:, :, 0] *= np.sign(det)[:, None]
    return np.concatenate([xyz, whl], -1).astype(np.float32), q.astype(np.float32)


W, H = 640, 480
K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]], np.float32)


def _project(box6, R):
    corners = np.asarray(cuboid_verts(jnp.asarray(box6[None]), jnp.asarray(R[None])))[0]
    z = corners[:, 2]
    u = K[0, 0] * corners[:, 0] / z + K[0, 2]
    v = K[1, 1] * corners[:, 1] / z + K[1, 2]
    return u, v, z


def _ref_truncation(box6, R):
    """The reference formula, independently: AABB of projected corners,
    1 - intersection/area vs the image box [0, 0, W-1, H-1]."""
    u, v, z = _project(box6, R)
    if (z <= 0.2).all():
        return 1.0
    x1, y1, x2, y2 = u.min(), v.min(), u.max(), v.max()
    ix1, iy1 = max(x1, 0.0), max(y1, 0.0)
    ix2, iy2 = min(x2, W - 1.0), min(y2, H - 1.0)
    inter = max(ix2 - ix1, 0.0) * max(iy2 - iy1, 0.0)
    area = max(x2 - x1, 0.0) * max(y2 - y1, 0.0)
    return 1.0 - inter / max(area, 1e-8)


def _silhouette_truncation(box6, R, res=160):
    """Rasterized ground truth: fraction of the projected cuboid's convex
    hull area falling outside the image."""
    u, v, z = _project(box6, R)
    pts = np.stack([u, v], -1)
    # grid over the hull's bounding box
    x1, y1 = pts.min(0)
    x2, y2 = pts.max(0)
    xs = np.linspace(x1, x2, res)
    ys = np.linspace(y1, y2, res)
    gx, gy = np.meshgrid(xs, ys)
    g = np.stack([gx.ravel(), gy.ravel()], -1)
    # build hull via monotone chain on 8 points (tiny) — independent impl
    def hull(points):
        pts_ = sorted(map(tuple, points))
        def half(pp):
            out = []
            for p in pp:
                while len(out) >= 2 and _cross2(
                    np.subtract(out[-1], out[-2]), np.subtract(p, out[-2])
                ) <= 0:
                    out.pop()
                out.append(p)
            return out
        lower = half(pts_)
        upper = half(reversed(pts_))
        return np.asarray(lower[:-1] + upper[:-1])

    hp = hull(pts)
    inside = np.ones(len(g), bool)
    for i in range(len(hp)):
        a, b2 = hp[i], hp[(i + 1) % len(hp)]
        inside &= _cross2(b2 - a, g - a) >= 0
    in_img = (g[:, 0] >= 0) & (g[:, 0] <= W - 1) & (g[:, 1] >= 0) & (g[:, 1] <= H - 1)
    total = inside.sum()
    if total == 0:
        return 0.0
    return 1.0 - (inside & in_img).sum() / total


class TestTruncation:
    def test_matches_reference_formula(self):
        rng = np.random.RandomState(0)
        boxes, Rs = _random_boxes(rng, 200, spread=5.0)
        got = np.asarray(
            estimate_truncation(jnp.asarray(K), jnp.asarray(boxes), jnp.asarray(Rs), W, H)
        )
        want = np.array([_ref_truncation(b, r) for b, r in zip(boxes, Rs)])
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_bounded_vs_silhouette(self):
        """The AABB metric over-counts truncation for diagonal boxes whose
        hull is thinner than its AABB; measured max deviation on this
        distribution is ~0.35 (documented metric bias, shared with the
        reference) and mean deviation is small."""
        rng = np.random.RandomState(1)
        boxes, Rs = _random_boxes(rng, 60, spread=5.0)
        got = np.asarray(
            estimate_truncation(jnp.asarray(K), jnp.asarray(boxes), jnp.asarray(Rs), W, H)
        )
        sil = np.array([_silhouette_truncation(b, r) for b, r in zip(boxes, Rs)])
        dev = np.abs(got - sil)
        assert dev.max() < 0.5, dev.max()
        assert dev.mean() < 0.08, dev.mean()
