"""Unit tests for the geometry core (rotations, cuboids, 2D boxes)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threedod.geometry import (
    Box2BoxTransform,
    R_from_allocentric,
    R_to_allocentric,
    axis_angle_to_matrix,
    backproject,
    convert_3d_box_to_2d,
    cuboid_verts,
    cuboid_verts_project,
    euler_to_matrix,
    matched_pairwise_iou,
    matrix_to_euler,
    matrix_to_rotation_6d,
    pairwise_ioa,
    pairwise_iou,
    quaternion_to_matrix,
    rotation_6d_to_matrix,
    so3_relative_angle,
    so3_relative_angle_pairwise,
)

RNG = np.random.RandomState(0)


def random_rotations(n):
    """Random rotation matrices via QR of gaussian matrices."""
    a = RNG.randn(n, 3, 3)
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[:, None, :]
    det = np.linalg.det(q)
    q[det < 0, :, 0] *= -1
    return q.astype(np.float32)


class TestRotations:
    def test_euler_roundtrip(self):
        euler = np.array([[0.3, -0.4, 1.2], [0.0, 0.0, 0.0], [-1.0, 0.5, 2.0]], np.float32)
        R = euler_to_matrix(jnp.asarray(euler))
        back = matrix_to_euler(R)
        R2 = euler_to_matrix(back)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)

    def test_euler_matches_scalar_formula(self):
        # reference euler2mat: R = Rz @ Ry @ Rx
        e = np.array([0.3, -0.7, 1.1])
        cx, sx = np.cos(e[0]), np.sin(e[0])
        cy, sy = np.cos(e[1]), np.sin(e[1])
        cz, sz = np.cos(e[2]), np.sin(e[2])
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        expected = Rz @ Ry @ Rx
        got = np.asarray(euler_to_matrix(jnp.asarray(e, jnp.float32)))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_6d_roundtrip(self):
        R = random_rotations(16)
        d6 = matrix_to_rotation_6d(jnp.asarray(R))
        R2 = rotation_6d_to_matrix(d6)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_6d_is_rotation(self):
        d6 = jnp.asarray(RNG.randn(32, 6), jnp.float32)
        R = np.asarray(rotation_6d_to_matrix(d6))
        should_eye = R @ R.transpose(0, 2, 1)
        np.testing.assert_allclose(should_eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_quaternion_identity(self):
        q = jnp.asarray([[1.0, 0, 0, 0]])
        np.testing.assert_allclose(np.asarray(quaternion_to_matrix(q))[0], np.eye(3), atol=1e-6)

    def test_axis_angle(self):
        aa = jnp.asarray([[0.0, 0.0, np.pi / 2]], jnp.float32)
        R = np.asarray(axis_angle_to_matrix(aa))[0]
        np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)
        # zero angle -> identity
        R0 = np.asarray(axis_angle_to_matrix(jnp.zeros((1, 3))))[0]
        np.testing.assert_allclose(R0, np.eye(3), atol=1e-6)

    def test_allocentric_roundtrip(self):
        n = 8
        K = np.tile(np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32), (n, 1, 1))
        R = random_rotations(n)
        u = jnp.asarray(RNG.uniform(0, 640, n), jnp.float32)
        v = jnp.asarray(RNG.uniform(0, 480, n), jnp.float32)
        allo = R_to_allocentric(jnp.asarray(K), jnp.asarray(R), u, v)
        back = R_from_allocentric(jnp.asarray(K), allo, u, v)
        np.testing.assert_allclose(np.asarray(back), R, atol=1e-4)

    def test_allocentric_at_principal_point(self):
        # at the principal point the viewing ray is the optical axis: identity
        K = jnp.asarray([[[500.0, 0, 320], [0, 500, 240], [0, 0, 1]]])
        R = jnp.asarray(random_rotations(1))
        allo = R_to_allocentric(K, R, jnp.asarray([320.0]), jnp.asarray([240.0]))
        np.testing.assert_allclose(np.asarray(allo), np.asarray(R), atol=1e-5)

    def test_so3_relative_angle(self):
        R1 = jnp.asarray(random_rotations(4))
        aa = jnp.asarray([[0.0, 0.3, 0.0]] * 4, jnp.float32)
        R2 = axis_angle_to_matrix(aa) @ R1
        ang = np.asarray(so3_relative_angle(R2, R1))
        np.testing.assert_allclose(ang, 0.3, atol=1e-4)

    def test_so3_pairwise_count(self):
        R = jnp.asarray(random_rotations(5))
        angles = so3_relative_angle_pairwise(R)
        assert angles.shape == (10,)
        same = so3_relative_angle_pairwise(jnp.tile(jnp.eye(3)[None], (4, 1, 1)))
        np.testing.assert_allclose(np.asarray(same), 0.0, atol=2e-2)  # acos extrapolation region


class TestCuboids:
    def test_unit_cube_extents(self):
        box = jnp.asarray([0.0, 0, 0, 2.0, 3.0, 4.0])  # w=2 (Z), h=3 (Y), l=4 (X)
        v = np.asarray(cuboid_verts(box))
        assert v.shape == (8, 3)
        np.testing.assert_allclose(v[:, 0].max() - v[:, 0].min(), 4.0)  # X <- l
        np.testing.assert_allclose(v[:, 1].max() - v[:, 1].min(), 3.0)  # Y <- h
        np.testing.assert_allclose(v[:, 2].max() - v[:, 2].min(), 2.0)  # Z <- w

    def test_vert_layout_signs(self):
        v = np.asarray(cuboid_verts(jnp.asarray([0.0, 0, 0, 1, 1, 1])))
        # v0 = (-,-,-), v6 = (+,+,+) per the reference diagram
        np.testing.assert_allclose(v[0], [-0.5, -0.5, -0.5])
        np.testing.assert_allclose(v[6], [0.5, 0.5, 0.5])

    def test_translation_and_rotation(self):
        box = jnp.asarray([1.0, 2, 10, 1, 1, 1])
        R = euler_to_matrix(jnp.asarray([0.0, np.pi / 2, 0.0]))
        v = np.asarray(cuboid_verts(box, R))
        np.testing.assert_allclose(v.mean(0), [1, 2, 10], atol=1e-5)

    def test_projection(self):
        K = jnp.asarray([[100.0, 0, 50], [0, 100, 50], [0, 0, 1]])
        box = jnp.asarray([0.0, 0, 10, 1, 1, 1])
        corners2d, corners3d = cuboid_verts_project(K, box)
        c2 = np.asarray(corners2d)
        # center of projections should be near principal point
        assert abs(c2[:, 0].mean() - 50) < 1.0
        assert np.all(c2[:, 2] > 0)

    def test_convert_3d_box_to_2d(self):
        K = jnp.asarray([[100.0, 0, 50], [0, 100, 50], [0, 0, 1]])
        box = jnp.asarray([0.0, 0, 10, 1, 1, 1])
        box2d, behind, fully = convert_3d_box_to_2d(K, box, None, 100, 100)
        assert not bool(behind)
        assert not bool(fully)
        b = np.asarray(box2d)
        # box of extent 1 at z=10 with f=100 is ~10px wide (a bit more at near face)
        assert 8 < b[2] < 14 and 8 < b[3] < 14

    def test_fully_behind(self):
        K = jnp.asarray([[100.0, 0, 50], [0, 100, 50], [0, 0, 1]])
        box = jnp.asarray([0.0, 0, -10.0, 1, 1, 1])
        _, behind, fully = convert_3d_box_to_2d(K, box, None, 100, 100)
        assert bool(behind) and bool(fully)

    def test_backproject_roundtrip(self):
        K = jnp.asarray([[100.0, 0, 50], [0, 100, 50], [0, 0, 1]])
        pt = jnp.asarray([[1.5, -0.5, 8.0]])
        from threedod.geometry import project_points

        proj = project_points(K, pt)
        back = backproject(K, proj[0, :2], proj[0, 2])
        np.testing.assert_allclose(np.asarray(back), [1.5, -0.5, 8.0], atol=1e-5)


class TestBoxes2D:
    def test_pairwise_iou_known(self):
        a = jnp.asarray([[0.0, 0, 10, 10]])
        b = jnp.asarray([[0.0, 0, 10, 10], [5.0, 5, 15, 15], [20.0, 20, 30, 30]])
        iou = np.asarray(pairwise_iou(a, b))[0]
        np.testing.assert_allclose(iou, [1.0, 25.0 / 175.0, 0.0], atol=1e-6)

    def test_pairwise_ioa(self):
        a = jnp.asarray([[0.0, 0, 10, 10]])
        b = jnp.asarray([[0.0, 0, 5, 5]])
        ioa = np.asarray(pairwise_ioa(a, b))
        np.testing.assert_allclose(ioa, [[1.0]])  # b fully inside a

    def test_matched_iou(self):
        a = jnp.asarray([[0.0, 0, 10, 10], [0.0, 0, 10, 10]])
        b = jnp.asarray([[0.0, 0, 10, 10], [10.0, 10, 20, 20]])
        np.testing.assert_allclose(np.asarray(matched_pairwise_iou(a, b)), [1.0, 0.0], atol=1e-6)

    def test_box_transform_roundtrip(self):
        t = Box2BoxTransform()
        src = jnp.asarray(RNG.uniform(0, 100, (16, 2)).astype(np.float32))
        src = jnp.concatenate([src, src + RNG.uniform(5, 50, (16, 2)).astype(np.float32)], axis=1)
        tgt = jnp.asarray(RNG.uniform(0, 100, (16, 2)).astype(np.float32))
        tgt = jnp.concatenate([tgt, tgt + RNG.uniform(5, 50, (16, 2)).astype(np.float32)], axis=1)
        deltas = t.get_deltas(src, tgt)
        back = t.apply_deltas(deltas, src)
        np.testing.assert_allclose(np.asarray(back), np.asarray(tgt), rtol=1e-4, atol=1e-3)
