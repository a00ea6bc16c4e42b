"""Tests: differentiable hull fill, RANSAC plane, Cubes container."""
import numpy as np
import jax
import jax.numpy as jnp

from threedod.geometry import (
    convex_hull_mask,
    cuboid_verts,
    euler_to_matrix,
    fit_plane_ransac,
    orient_ground_normal,
    point_cloud_from_depth,
)
from threedod.structures import Cubes


def reference_hull_mask(points, h, w):
    """Hard rasterisation using scipy's hull for validation."""
    from scipy.spatial import ConvexHull

    hull = ConvexHull(points)
    eqs = hull.equations  # (F, 3): a, b, c with a*x + b*y + c <= 0 inside
    yy, xx = np.mgrid[0:h, 0:w]
    pts = np.stack([xx.ravel(), yy.ravel()], axis=1)
    inside = np.all(pts @ eqs[:, :2].T + eqs[:, 2][None, :] <= 1e-9, axis=1)
    return inside.reshape(h, w).astype(np.float32)


class TestHull:
    def test_square(self):
        pts = jnp.asarray([[10.0, 10], [40, 10], [40, 40], [10, 40]])
        mask = np.asarray(convex_hull_mask(pts, 50, 50))
        assert mask[25, 25] > 0.99
        assert mask[5, 5] < 0.01
        # area close to 30*30
        assert abs(mask.sum() - 900) < 80

    def test_matches_scipy_hull(self):
        rng = np.random.RandomState(1)
        for _ in range(4):
            pts = rng.uniform(5, 60, (8, 2)).astype(np.float32)
            soft = np.asarray(convex_hull_mask(jnp.asarray(pts), 64, 64))
            hard = reference_hull_mask(pts, 64, 64)
            # compare binarised interior
            inter = np.logical_and(soft > 0.5, hard > 0.5).sum()
            union = np.logical_or(soft > 0.5, hard > 0.5).sum()
            assert inter / max(union, 1) > 0.93

    def test_differentiable(self):
        pts = jnp.asarray([[10.0, 10], [40, 10], [40, 40], [10, 40], [25, 25], [26, 25], [25, 26], [24, 24]])

        def area(p):
            return convex_hull_mask(p, 50, 50).sum()

        g = jax.grad(area)(pts)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


class TestPlane:
    def test_recovers_ground_plane(self):
        rng = np.random.RandomState(0)
        n = 2000
        xz = rng.uniform(-5, 5, (n, 2))
        y = np.full((n,), 1.5) + rng.normal(0, 0.01, n)  # floor at y=1.5 (cam 1.5m up)
        pts = np.stack([xz[:, 0], y, xz[:, 1]], axis=1).astype(np.float32)
        # add outliers
        pts[: n // 4] = rng.uniform(-5, 5, (n // 4, 3))
        eq, frac = fit_plane_ransac(jnp.asarray(pts), jax.random.PRNGKey(0), thresh=0.05)
        eq = np.asarray(orient_ground_normal(eq))
        # normal should be (0, -1, 0)-ish after orientation, d ≈ 1.5
        assert abs(abs(eq[1]) - 1.0) < 0.02, eq
        assert eq[1] < 0
        np.testing.assert_allclose(abs(eq[3]), 1.5, atol=0.05)
        assert float(frac) > 0.5

    def test_point_cloud_from_depth(self):
        K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
        depth = jnp.full((64, 64), 2.0)
        pc = np.asarray(point_cloud_from_depth(depth, K, stride=4))
        assert pc.shape == (16 * 16, 3)
        np.testing.assert_allclose(pc[:, 2], 2.0)
        # central pixel maps near (0, 0)
        assert np.min(np.abs(pc[:, 0])) < 0.1


class TestCubes:
    def test_shapes_and_views(self):
        t = np.zeros((2, 5, 15), np.float32)
        t[..., 6:] = np.eye(3).ravel()
        c = Cubes(jnp.asarray(t))
        assert c.num_instances == 2 and c.num_proposals == 5
        assert c.rotations.shape == (2, 5, 3, 3)
        assert c.get_all_corners().shape == (2, 5, 8, 3)

    def test_corners_match_cuboid_verts(self):
        box = np.array([0.5, -0.2, 3.0, 1.0, 2.0, 0.7], np.float32)
        R = np.asarray(euler_to_matrix(jnp.asarray([0.1, 0.2, 0.3])))
        tensor = np.concatenate([box, R.ravel()]).astype(np.float32)
        c = Cubes(jnp.asarray(tensor))
        direct = cuboid_verts(jnp.asarray(box), jnp.asarray(R))
        np.testing.assert_allclose(
            np.asarray(c.get_all_corners())[0, 0], np.asarray(direct), atol=1e-5
        )

    def test_projection_boxes(self):
        box = np.array([0.0, 0.0, 5.0, 1.0, 1.0, 1.0], np.float32)
        tensor = np.concatenate([box, np.eye(3).ravel()]).astype(np.float32)
        c = Cubes(jnp.asarray(tensor))
        K = jnp.asarray([[100.0, 0, 50], [0, 100, 50], [0, 0, 1]])
        boxes = np.asarray(c.to_boxes2d(K))
        assert boxes.shape == (1, 1, 4)
        x1, y1, x2, y2 = boxes[0, 0]
        assert x1 < 50 < x2 and y1 < 50 < y2

    def test_pytree(self):
        tensor = np.concatenate(
            [np.array([0, 0, 5, 1, 1, 1], np.float32), np.eye(3, dtype=np.float32).ravel()]
        )
        c = Cubes(jnp.asarray(tensor))

        @jax.jit
        def vol(cubes):
            return cubes.get_volumes().sum()

        np.testing.assert_allclose(float(vol(c)), 1.0, atol=1e-6)
