"""Rotation representations and conversions (batched, jit/vmap friendly).

Functional parity targets (reference, for capability mapping only):
  cubercnn/util/math_util.py:71-130  (euler <-> matrix)
  cubercnn/util/math_util.py:746-857 (allocentric <-> egocentric)
  cubercnn/util/math_util.py:1132-1236 (SO3 angles)
  pytorch3d rotation_6d_to_matrix / quaternion_to_matrix / axis_angle_to_matrix
    as used by cubercnn/modeling/roi_heads/cube_head.py:180-190.

All functions accept arbitrary leading batch dims and are differentiable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def euler_to_matrix(euler: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (..., 3) [x, y, z] -> rotation matrices (..., 3, 3).

    Convention R = Rz @ Ry @ Rx (matches reference euler2mat).
    """
    x, y, z = euler[..., 0], euler[..., 1], euler[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    # Row-wise expansion of Rz @ Ry @ Rx.
    r00 = cz * cy
    r01 = cz * sy * sx - sz * cx
    r02 = cz * sy * cx + sz * sx
    r10 = sz * cy
    r11 = sz * sy * sx + cz * cx
    r12 = sz * sy * cx - cz * sx
    r20 = -sy
    r21 = cy * sx
    r22 = cy * cx
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def euler_xyz_to_matrix(euler: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (..., 3) -> rotation matrices, pytorch3d 'XYZ'
    convention R = Rx @ Ry @ Rz (extrinsic z-y-x).

    This is the convention the reference CUBE HEAD uses
    (cube_head.py:189 `euler_angles_to_matrix(box_pose.view(-1, 3),
    'XYZ')`) — distinct from `euler_to_matrix` above, which matches the
    reference's own euler2mat (math_util.py:85, R = Rz @ Ry @ Rx).
    """
    x, y, z = euler[..., 0], euler[..., 1], euler[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    # Row-wise expansion of Rx @ Ry @ Rz.
    r00 = cy * cz
    r01 = -cy * sz
    r02 = sy
    r10 = cx * sz + sx * sy * cz
    r11 = cx * cz - sx * sy * sz
    r12 = -sx * cy
    r20 = sx * sz - cx * sy * cz
    r21 = sx * cz + cx * sy * sz
    r22 = cx * cy
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_euler(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> euler angles (..., 3) [x, y, z]."""
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    x = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    y = jnp.arctan2(-R[..., 2, 0], sy)
    z = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([x, y, z], axis=-1)


def _normalize(v: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation (..., 6) -> matrices (..., 3, 3).

    Zhou et al. continuous 6D parameterisation; rows are the basis vectors
    (same convention as pytorch3d, used by the reference cube head).
    """
    a1 = d6[..., 0:3]
    a2 = d6[..., 3:6]
    b1 = _normalize(a1)
    b2 = _normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(R: jnp.ndarray) -> jnp.ndarray:
    """Matrices (..., 3, 3) -> 6D representation (first two rows)."""
    return jnp.concatenate([R[..., 0, :], R[..., 1, :]], axis=-1)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternions (..., 4) in (w, x, y, z) order -> matrices."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.maximum(jnp.sum(q * q, axis=-1), 1e-12)
    r00 = 1 - two_s * (y * y + z * z)
    r01 = two_s * (x * y - z * w)
    r02 = two_s * (x * z + y * w)
    r10 = two_s * (x * y + z * w)
    r11 = 1 - two_s * (x * x + z * z)
    r12 = two_s * (y * z - x * w)
    r20 = two_s * (x * z - y * w)
    r21 = two_s * (y * z + x * w)
    r22 = 1 - two_s * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def normalize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize with sign fixed by the real part (pytorch3d _copysign trick)."""
    norm = jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), 1e-12))
    sign = jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return q / (norm * sign)


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vectors (..., 3) (direction * radians) -> matrices.

    Rodrigues formula, safe at angle -> 0.
    """
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    safe = jnp.maximum(angle, 1e-8)
    axis = axis_angle / safe
    a = angle[..., 0]
    c = jnp.cos(a)
    s = jnp.sin(a)
    t = 1.0 - c
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    return jnp.stack(
        [
            jnp.stack([t * x * x + c, t * x * y - s * z, t * x * z + s * y], axis=-1),
            jnp.stack([t * x * y + s * z, t * y * y + c, t * y * z - s * x], axis=-1),
            jnp.stack([t * x * z - s * y, t * y * z + s * x, t * z * z + c], axis=-1),
        ],
        axis=-2,
    )


def _viewing_ray_matrix(K: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotation M aligning the optical axis with the viewing ray of (u, v).

    K: (..., 3, 3) intrinsics; u, v: (...,) pixel coords.
    Returns (..., 3, 3).
    """
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    sx = K[..., 0, 2]
    sy = K[..., 1, 2]
    oray = jnp.stack([(u - sx) / fx, (v - sy) / fy, jnp.ones_like(u)], axis=-1)
    oray = _normalize(oray)
    angle = jnp.arccos(jnp.clip(oray[..., 2], -1.0 + 1e-7, 1.0 - 1e-7))
    axis = jnp.stack([-oray[..., 1], oray[..., 0], jnp.zeros_like(u)], axis=-1)
    axis = _normalize(axis)
    M = axis_angle_to_matrix(angle[..., None] * axis)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=M.dtype), M.shape)
    valid = (angle > 1e-7)[..., None, None]
    return jnp.where(valid, M, eye)


def R_to_allocentric(K: jnp.ndarray, R: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Egocentric -> allocentric rotation given pixel location (u, v).

    R_view = M^T @ R (reference math_util.py:746-799).
    """
    M = _viewing_ray_matrix(K, u, v)
    return jnp.matmul(jnp.swapaxes(M, -1, -2), R, precision="highest")


def R_from_allocentric(K: jnp.ndarray, R_view: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Allocentric -> egocentric rotation. R = M @ R_view."""
    M = _viewing_ray_matrix(K, u, v)
    return jnp.matmul(M, R_view, precision="highest")


def acos_linear_extrapolation(x: jnp.ndarray, bounds=(-0.9999, 0.9999)) -> jnp.ndarray:
    """acos with linear extrapolation outside `bounds` for stable gradients."""
    lower, upper = bounds
    x_clip = jnp.clip(x, lower, upper)
    acos_clip = jnp.arccos(x_clip)

    def dacos(b):
        return -1.0 / jnp.sqrt(1.0 - b * b)

    above = acos_clip + (x - upper) * dacos(upper)
    below = acos_clip + (x - lower) * dacos(lower)
    out = jnp.where(x > upper, above, jnp.where(x < lower, below, acos_clip))
    return out


def so3_rotation_angle(R: jnp.ndarray, cos_angle: bool = False, cos_bound: float = 1e-4) -> jnp.ndarray:
    """Rotation angles of matrices (..., 3, 3): acos(0.5 * (tr(R) - 1))."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    phi_cos = (tr - 1.0) * 0.5
    if cos_angle:
        return phi_cos
    bound = 1.0 - cos_bound
    return acos_linear_extrapolation(phi_cos, (-bound, bound))


def so3_relative_angle(R1: jnp.ndarray, R2: jnp.ndarray, cos_angle: bool = False, cos_bound: float = 1e-4) -> jnp.ndarray:
    """Relative geodesic angle between matched rotation matrices."""
    R12 = jnp.matmul(R1, jnp.swapaxes(R2, -1, -2), precision="highest")
    return so3_rotation_angle(R12, cos_angle=cos_angle, cos_bound=cos_bound)


def so3_relative_angle_pairwise(R: jnp.ndarray, cos_angle: bool = False, cos_bound: float = 1e-4) -> jnp.ndarray:
    """All-pairs relative angles for a batch (N, 3, 3) -> (N*(N-1)//2,).

    Mirrors the reference's batched pose-consistency op
    (math_util.py:1132-1181) without the python pair loop: the full N x N
    angle matrix is computed on-device and the upper triangle is gathered
    with a static index set.
    """
    n = R.shape[0]
    R12 = jnp.einsum("nij,mkj->nmik", R, R, precision="highest")  # R[n] @ R[m]^T
    angles = so3_rotation_angle(R12.reshape(n * n, 3, 3), cos_angle=cos_angle, cos_bound=cos_bound)
    angles = angles.reshape(n, n)
    iu, ju = jnp.triu_indices(n, k=1)
    # reference orders pairs as (i, j) for i in 1..N-1, j < i — same multiset.
    return angles[ju, iu]


def rotate_vector_axis_angle(v: jnp.ndarray, k: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation of vectors v (..., 3) around unit axes k by theta."""
    theta = theta[..., None]
    c, s = jnp.cos(theta), jnp.sin(theta)
    return v * c + jnp.cross(k, v) * s + k * jnp.sum(k * v, axis=-1, keepdims=True) * (1.0 - c)


def orthobasis_from_normal(normal: jnp.ndarray, yaw_angles: jnp.ndarray) -> jnp.ndarray:
    """Rotation bases whose middle column is `normal`, swept by yaw.

    normal: (3,) unit vector; yaw_angles: (A,). Returns (A, 3, 3) with columns
    [x, normal, y] (reference ProposalNetwork/utils/utils.py:120-132).
    """
    a, b = normal[0], normal[1]
    perp_generic = _normalize(jnp.stack([b, -a, jnp.zeros_like(a)]))
    perp_dege = jnp.stack([jnp.zeros_like(a), normal[2], -normal[1]])
    perp = jnp.where(jnp.abs(a) < 1e-8, perp_dege, perp_generic)
    x = rotate_vector_axis_angle(perp[None, :], normal[None, :], yaw_angles)
    x = _normalize(x)
    y = jnp.cross(jnp.broadcast_to(normal, x.shape), x)
    cols = jnp.stack([x, jnp.broadcast_to(normal, x.shape), y], axis=-1)
    return cols
