"""Proposal sampler + scoring function tests."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from threedod.geometry import cuboid_verts, euler_to_matrix
from threedod.proposals import PROPOSAL_FUNCS, propose_batch, statistics
from threedod.scoring import (
    combined_score,
    min_area_rect,
    score_corners,
    score_dimensions,
    score_iou,
    score_mod_segmentation,
    score_point_cloud,
    score_segmentation,
)
from threedod.structures import Cubes

H, W = 96, 128
K = jnp.asarray([[100.0, 0, 64], [0, 100, 48], [0, 0, 1]])


def setup_scene():
    """A flat 3m depth image and one reference box."""
    depth = jnp.full((H, W), 3.0)
    boxes = jnp.asarray([[40.0, 30.0, 90.0, 70.0], [10.0, 10.0, 50.0, 40.0]])
    prior_means = jnp.asarray([[0.6, 0.9, 0.6], [1.0, 0.7, 1.5]])
    prior_stds = jnp.asarray([[0.2, 0.2, 0.2], [0.3, 0.2, 0.4]])
    return depth, boxes, prior_means, prior_stds


class TestProposals:
    def test_all_samplers_shapes(self):
        depth, boxes, pm, ps = setup_scene()
        for name in PROPOSAL_FUNCS:
            cubes = propose_batch(
                jax.random.PRNGKey(0), name, boxes, depth, pm, ps, (W, H), K, 64
            )
            assert cubes.tensor.shape == (2, 64, 15), name
            t = np.asarray(cubes.tensor)
            assert np.isfinite(t).all(), name
            # rotations are orthonormal
            R = np.asarray(cubes.rotations).reshape(-1, 3, 3)
            np.testing.assert_allclose(
                R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (len(R), 1, 1)), atol=1e-4
            )

    def test_propose_respects_priors(self):
        depth, boxes, pm, ps = setup_scene()
        cubes = propose_batch(
            jax.random.PRNGKey(1), "propose", boxes, depth, pm, ps, (W, H), K, 512
        )
        dims = np.asarray(cubes.dimensions)
        # dims truncated to [0.05, mu + ~2 sigma]
        assert dims.min() >= 0.05 - 1e-5
        assert (dims[0, :, 0] <= pm[0, 0] + 2 * ps[0, 0] + 1e-4).all()
        # mean depth near 0.85*3 + 0.35 = 2.9
        z = np.asarray(cubes.centers[..., 2])
        assert 2.0 < z.mean() < 4.0

    def test_propose_ground_normal(self):
        depth, boxes, pm, ps = setup_scene()
        n = jnp.asarray([0.0, -1.0, 0.0])
        cubes = propose_batch(
            jax.random.PRNGKey(2), "propose", boxes, depth, pm, ps, (W, H), K, 64,
            ground_normal=n,
        )
        R = np.asarray(cubes.rotations).reshape(-1, 3, 3)
        # middle column is the normal (up direction constrained)
        np.testing.assert_allclose(R[:, :, 1], np.tile([0, -1, 0], (len(R), 1)), atol=1e-4)

    def test_statistics_gt_inside_range(self):
        depth, boxes, pm, ps = setup_scene()
        cubes = propose_batch(jax.random.PRNGKey(3), "random", boxes, depth, pm, ps, (W, H), K, 256)
        gt = Cubes(
            jnp.concatenate(
                [jnp.asarray([[0.0, 0.0, 3.0, 1.0, 1.0, 1.0], [0.1, 0.1, 2.0, 0.5, 0.5, 0.5]]),
                 jnp.tile(jnp.eye(3).reshape(1, 9), (2, 1))], axis=1
            )[:, None, :].repeat(1, axis=1)
        )
        # reshape to (N, 1, 15)
        stats = np.asarray(statistics(gt, cubes))
        assert stats.shape == (2, 9)
        # gt z=3 is inside the random sampler's z range [1, 5] -> stat in (0, 1)
        assert 0.0 < stats[0, 2] < 1.0


class TestScoring:
    def make_cubes(self, n_prop=32, seed=0):
        rng = np.random.RandomState(seed)
        centers = np.concatenate(
            [rng.uniform(-0.5, 0.5, (1, n_prop, 2)), rng.uniform(2, 4, (1, n_prop, 1))], -1
        )
        dims = rng.uniform(0.3, 1.2, (1, n_prop, 3))
        R = np.tile(np.eye(3).reshape(1, 1, 9), (1, n_prop, 1))
        return Cubes(jnp.asarray(np.concatenate([centers, dims, R], -1), jnp.float32))

    def test_point_cloud_scoring(self):
        cubes = Cubes(
            jnp.asarray(
                np.concatenate([[[0, 0, 3, 1, 1, 1]], np.eye(3).reshape(1, 9)], axis=1,
                               dtype=np.float32)[None]
            )
        )
        pts = jnp.asarray([[0.0, 0, 3], [0.2, 0.2, 3.1], [5.0, 5, 5]])
        s = np.asarray(score_point_cloud(pts, cubes))
        assert s.shape == (1, 1)
        assert s[0, 0] == 2

    def test_score_iou(self):
        gt = jnp.asarray([10.0, 10, 50, 50])
        props = jnp.asarray([[10.0, 10, 50, 50], [30.0, 30, 70, 70]])
        s = np.asarray(score_iou(gt, props))
        assert abs(s[0] - 1.0) < 1e-6 and 0 < s[1] < 1

    def test_min_area_rect_axis_aligned(self):
        mask = jnp.zeros((64, 64)).at[10:30, 20:50].set(1.0)
        rect = np.asarray(min_area_rect(mask))
        xs, ys = sorted(rect[:, 0]), sorted(rect[:, 1])
        assert abs(xs[0] - 20) < 1.5 and abs(xs[-1] - 49) < 1.5
        assert abs(ys[0] - 10) < 1.5 and abs(ys[-1] - 29) < 1.5

    def test_min_area_rect_rotated(self):
        # diagonal strip: rotated rect should be much smaller than AABB
        yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
        mask = jnp.asarray((np.abs(yy - xx) < 3) & (xx > 10) & (xx < 50), jnp.float32)
        rect = np.asarray(min_area_rect(mask))
        e1 = np.linalg.norm(rect[1] - rect[0])
        e2 = np.linalg.norm(rect[2] - rect[1])
        assert min(e1, e2) < 12  # narrow side, vs AABB side ~40

    def test_score_segmentation(self):
        mask = jnp.zeros((H, W)).at[30:70, 40:90].set(1.0)
        # corners of a projected box matching the mask region vs far away
        good = jnp.asarray([[40, 30], [90, 30], [90, 70], [40, 70], [50, 40], [80, 40], [80, 60], [50, 60]], jnp.float32)
        bad = good + 100.0
        s = np.asarray(score_segmentation(mask, jnp.stack([good, bad])))
        assert s[0] > 0.7 and s[1] < 0.1
        sm = np.asarray(score_mod_segmentation(mask, jnp.stack([good, bad])))
        assert sm[0] > sm[1]
        # the shared-fill pair path must agree exactly with the individual fns
        from threedod.scoring import score_segmentation_pair

        ps, pm = score_segmentation_pair(mask, jnp.stack([good, bad]))
        assert np.array_equal(np.asarray(ps), s)
        assert np.array_equal(np.asarray(pm), sm)

    def test_score_corners_prefers_matching(self):
        mask = jnp.zeros((H, W)).at[30:70, 40:90].set(1.0)
        good = jnp.asarray([[40, 30], [90, 30], [90, 70], [40, 70], [50, 40], [80, 40], [80, 60], [50, 60]], jnp.float32)
        bad = good + 60.0
        s = np.asarray(score_corners(mask, jnp.stack([good, bad])))
        assert s[0] > s[1]

    def test_score_dimensions(self):
        pm = jnp.asarray([0.6, 0.9, 0.6])
        ps = jnp.asarray([0.1, 0.1, 0.1])
        dims = jnp.asarray([[0.6, 0.9, 0.6], [2.0, 2.0, 2.0]])
        gt_box = jnp.asarray([0.0, 0, 40, 40])
        pred = jnp.asarray([[0.0, 0, 40, 40], [0.0, 0, 80, 20]])
        s = np.asarray(score_dimensions(pm, ps, dims, gt_box, pred))
        assert s[0] > s[1]

    def test_combined(self):
        a = jnp.asarray([0.9, 0.1])
        s = np.asarray(combined_score(a, a, a))
        assert abs(s[0] - 0.729) < 1e-6


class TestHullRowIntervals:
    """The interval rasterisation must match a brute-force hard half-plane
    fill exactly (same inequality on pixel centers)."""

    def _oracle_counts(self, mask, corners, sub):
        from threedod.geometry.hull import convex_hull_order

        h, w = mask.shape
        hs, ws = h // sub, w // sub
        seg = np.asarray(mask)[::sub, ::sub] > 0.5
        hull = np.asarray(convex_hull_order(jnp.asarray(corners) / sub))
        e = np.roll(hull, -1, axis=0) - hull
        yy, xx = np.meshgrid(np.arange(hs), np.arange(ws), indexing="ij")
        inside = np.ones((hs, ws), bool)
        for (v1, ee) in zip(hull, e):
            if (ee * ee).sum() < 1e-12:
                continue
            s = ee[0] * (yy - v1[1]) - ee[1] * (xx - v1[0])
            inside &= s >= 0
        return (seg & inside).sum(), (seg | inside).sum(), inside.sum() == 0

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_bruteforce(self, seed):
        from threedod.scoring.scorefunction import _seg_inter_union

        rng = np.random.RandomState(seed)
        mask = jnp.asarray((rng.rand(96, 128) > 0.6).astype(np.float32))
        corners = jnp.asarray(
            rng.uniform(-30, 150, (16, 8, 2)).astype(np.float32)
        )
        inter, union, empty = _seg_inter_union(mask, corners, 4)
        for i in range(corners.shape[0]):
            oi, ou, oe = self._oracle_counts(mask, np.asarray(corners[i]), 4)
            assert int(inter[i]) == int(oi), i
            assert int(union[i]) == int(ou), i
            assert bool(empty[i]) == bool(oe), i


def test_min_area_rect_matches_fullgrid_sweep():
    """The row-extreme candidate sweep must give the same extents as the
    full-grid rotation for every angle (directional extremes lie on row
    min/max pixels)."""
    from threedod.scoring.scorefunction import min_area_rect

    rng = np.random.RandomState(7)
    for _ in range(3):
        mask = np.zeros((48, 64), np.float32)
        cy, cx = rng.randint(10, 38), rng.randint(10, 54)
        yy, xx = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
        th = rng.rand() * np.pi
        u = (xx - cx) * np.cos(th) + (yy - cy) * np.sin(th)
        v = -(xx - cx) * np.sin(th) + (yy - cy) * np.cos(th)
        mask[(np.abs(u) < rng.randint(4, 18)) & (np.abs(v) < rng.randint(2, 8))] = 1
        if mask.sum() == 0:
            continue
        got = np.asarray(min_area_rect(jnp.asarray(mask)))
        # full-grid oracle
        m = mask > 0.5
        thetas = np.linspace(0, np.pi / 2, 90, endpoint=False)
        best = None
        for t in thetas:
            uu = xx[m] * np.cos(t) + yy[m] * np.sin(t)
            vv = -xx[m] * np.sin(t) + yy[m] * np.cos(t)
            area = (uu.max() - uu.min()) * (vv.max() - vv.min())
            if best is None or area < best[0]:
                best = (area, t, uu.min(), uu.max(), vv.min(), vv.max())
        _, t, umin, umax, vmin, vmax = best
        ref = np.array(
            [[umin, vmin], [umax, vmin], [umax, vmax], [umin, vmax]]
        )
        ref = np.stack(
            [ref[:, 0] * np.cos(t) - ref[:, 1] * np.sin(t),
             ref[:, 0] * np.sin(t) + ref[:, 1] * np.cos(t)], axis=1
        )
        np.testing.assert_allclose(got, ref, atol=1e-3)
