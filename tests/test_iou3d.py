"""IoU3D kernel tests: golden value, axis-aligned analytic cases, Monte Carlo."""
import numpy as np
import jax.numpy as jnp

from threedod.geometry import (
    box3d_overlap,
    box_volume,
    cuboid_verts,
    euler_to_matrix,
    iou3d_pairs,
)

# Golden case from the reference (ProposalNetwork/utils/tests/test_iou.py):
# pytorch3d box3d_overlap gives IoU 0.9944.
CORNERS1 = np.array(
    [
        [0.2411, -0.1752, 1.2247],
        [0.1951, -0.4194, 1.7741],
        [0.2036, 0.4826, 2.1757],
        [0.2495, 0.7267, 1.6263],
        [-0.2920, -0.1549, 1.1903],
        [-0.3380, -0.3991, 1.7396],
        [-0.3295, 0.5029, 2.1412],
        [-0.2835, 0.7471, 1.5919],
    ],
    np.float32,
)
CORNERS2 = np.array(
    [
        [0.2390, -0.1764, 1.2246],
        [0.1930, -0.4205, 1.7740],
        [0.2055, 0.4813, 2.1759],
        [0.2515, 0.7254, 1.6265],
        [-0.2940, -0.1536, 1.1901],
        [-0.3400, -0.3978, 1.7395],
        [-0.3274, 0.5040, 2.1414],
        [-0.2815, 0.7482, 1.5920],
    ],
    np.float32,
)


def mc_iou(corners1, corners2, n=400_000, seed=0):
    """Monte-Carlo IoU reference: sample the joint AABB, test both boxes."""
    rng = np.random.RandomState(seed)
    allc = np.concatenate([corners1, corners2], axis=0)
    lo, hi = allc.min(0), allc.max(0)
    pts = rng.uniform(lo, hi, (n, 3)).astype(np.float64)

    def inside(c, p):
        # box frame: origin v0, edges e1=v1-v0, e2=v3-v0, e3=v4-v0
        e = np.stack([c[1] - c[0], c[3] - c[0], c[4] - c[0]], axis=1)
        local = np.linalg.solve(e, (p - c[0]).T).T
        return np.all((local >= 0) & (local <= 1), axis=1)

    in1 = inside(corners1.astype(np.float64), pts)
    in2 = inside(corners2.astype(np.float64), pts)
    inter = np.count_nonzero(in1 & in2)
    union = np.count_nonzero(in1 | in2)
    return inter / max(union, 1)


class TestIoU3D:
    def test_golden_0_9944(self):
        vol, iou = box3d_overlap(jnp.asarray(CORNERS1)[None], jnp.asarray(CORNERS2)[None])
        assert abs(float(iou[0, 0]) - 0.9944) < 2e-3, float(iou[0, 0])

    def test_identical_boxes(self):
        c = cuboid_verts(jnp.asarray([0.5, -0.2, 3.0, 1.0, 2.0, 0.7]))
        _, iou = iou3d_pairs(c[None], c[None])
        np.testing.assert_allclose(float(iou[0]), 1.0, atol=1e-4)

    def test_disjoint(self):
        c1 = cuboid_verts(jnp.asarray([0.0, 0, 0, 1, 1, 1]))
        c2 = cuboid_verts(jnp.asarray([10.0, 0, 0, 1, 1, 1]))
        vol, iou = iou3d_pairs(c1[None], c2[None])
        np.testing.assert_allclose(float(iou[0]), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(vol[0]), 0.0, atol=1e-6)

    def test_axis_aligned_half_overlap(self):
        # unit cubes offset by 0.5 in x: inter = 0.5, union = 1.5
        c1 = cuboid_verts(jnp.asarray([0.0, 0, 0, 1, 1, 1]))
        c2 = cuboid_verts(jnp.asarray([0.5, 0, 0, 1, 1, 1]))
        vol, iou = iou3d_pairs(c1[None], c2[None])
        np.testing.assert_allclose(float(vol[0]), 0.5, atol=1e-5)
        np.testing.assert_allclose(float(iou[0]), 1.0 / 3.0, atol=1e-5)

    def test_contained_box(self):
        c1 = cuboid_verts(jnp.asarray([0.0, 0, 0, 2, 2, 2]))
        c2 = cuboid_verts(jnp.asarray([0.0, 0, 0, 1, 1, 1]))
        vol, iou = iou3d_pairs(c1[None], c2[None])
        np.testing.assert_allclose(float(vol[0]), 1.0, atol=1e-4)
        np.testing.assert_allclose(float(iou[0]), 1.0 / 8.0, atol=1e-4)

    def test_rotated_45_analytic(self):
        # Two unit square prisms, one rotated 45° about Z (shared axis):
        # 2D intersection of unit square with its 45° rotation is the
        # regular octagon with area 2*(sqrt(2)-1) ≈ 0.8284.
        c1 = cuboid_verts(jnp.asarray([0.0, 0, 0, 1, 1, 1]))
        R = euler_to_matrix(jnp.asarray([0.0, 0.0, np.pi / 4]))
        c2 = cuboid_verts(jnp.asarray([0.0, 0, 0, 1, 1, 1]), R)
        vol, iou = iou3d_pairs(c1[None], c2[None])
        inter = 2 * (np.sqrt(2) - 1)
        np.testing.assert_allclose(float(vol[0]), inter, atol=1e-4)
        np.testing.assert_allclose(float(iou[0]), inter / (2 - inter), atol=1e-4)

    def test_box_volume(self):
        c = cuboid_verts(jnp.asarray([1.0, 2, 3, 2.0, 3.0, 4.0]))
        np.testing.assert_allclose(float(box_volume(c[None])[0]), 24.0, atol=1e-4)
        # volume is rotation-invariant
        R = euler_to_matrix(jnp.asarray([0.4, -0.3, 1.0]))
        cr = cuboid_verts(jnp.asarray([1.0, 2, 3, 2.0, 3.0, 4.0]), R)
        np.testing.assert_allclose(float(box_volume(cr[None])[0]), 24.0, atol=1e-3)

    def test_monte_carlo_random_pairs(self):
        rng = np.random.RandomState(3)
        for trial in range(6):
            b1 = np.array([*rng.uniform(-0.5, 0.5, 3), *rng.uniform(0.5, 2.0, 3)], np.float32)
            b2 = b1 + np.array([*rng.uniform(-0.5, 0.5, 3), *rng.uniform(-0.2, 0.2, 3)], np.float32)
            e1 = rng.uniform(-np.pi, np.pi, 3).astype(np.float32)
            e2 = e1 + rng.uniform(-0.4, 0.4, 3).astype(np.float32)
            c1 = np.asarray(cuboid_verts(jnp.asarray(b1), euler_to_matrix(jnp.asarray(e1))))
            c2 = np.asarray(cuboid_verts(jnp.asarray(b2), euler_to_matrix(jnp.asarray(e2))))
            _, iou = iou3d_pairs(jnp.asarray(c1)[None], jnp.asarray(c2)[None])
            ref = mc_iou(c1, c2, seed=trial)
            assert abs(float(iou[0]) - ref) < 0.015, (trial, float(iou[0]), ref)

    def test_cross_shape(self):
        c1 = jnp.asarray(np.stack([CORNERS1, CORNERS2, CORNERS1]))
        c2 = jnp.asarray(np.stack([CORNERS2, CORNERS1]))
        vol, iou = box3d_overlap(c1, c2)
        assert vol.shape == (3, 2) and iou.shape == (3, 2)
        assert float(iou[0, 0]) > 0.99

    def test_degenerate_zero_volume(self):
        flat = cuboid_verts(jnp.asarray([0.0, 0, 0, 0.0, 1, 1]))  # zero width
        c = cuboid_verts(jnp.asarray([0.0, 0, 0, 1, 1, 1]))
        _, iou = iou3d_pairs(flat[None], c[None])
        np.testing.assert_allclose(float(iou[0]), 0.0, atol=1e-6)


class TestLanesParity:
    def test_lanes_matches_per_pair_vmap(self):
        """The batch-minor (SoA) implementation must reproduce the per-pair
        vmapped clip exactly (same taps, same stable compaction order) on
        random rotated pairs, including reflected bases and disjoint
        boxes."""
        import jax

        from threedod.geometry.cuboids import cuboid_verts
        from threedod.geometry.iou3d import (
            _pair_intersect_volume,
            _pairs_intersect_volume_lanes,
        )

        rng = np.random.RandomState(11)
        n = 64
        def rot(a, b, c):
            Rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
            Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]])
            Rx = np.array([[1, 0, 0], [0, np.cos(c), -np.sin(c)], [0, 0, 1]])
            Rx[2, 1:] = [np.sin(c), np.cos(c)]
            return (Rz @ Ry @ Rx).astype(np.float32)

        def boxes(k):
            b6 = np.concatenate(
                [rng.uniform(-1, 1, (k, 3)), np.exp(rng.uniform(-0.7, 0.7, (k, 3)))],
                -1,
            ).astype(np.float32)
            R = np.stack([rot(*rng.uniform(0, np.pi, 3)) for _ in range(k)])
            # a few reflected bases (det -1), like the ground-normal orthobases
            R[:: 7, :, 0] *= -1
            return np.array(cuboid_verts(jnp.asarray(b6), jnp.asarray(R)))

        c1, c2 = boxes(n), boxes(n)
        c2[: n // 4] += 10.0  # guaranteed-disjoint block
        want = np.asarray(jax.vmap(_pair_intersect_volume)(jnp.asarray(c1), jnp.asarray(c2)))
        got = np.asarray(_pairs_intersect_volume_lanes(jnp.asarray(c1), jnp.asarray(c2)))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
