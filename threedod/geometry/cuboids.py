"""Cuboid vertex/face construction and camera projection (batched).

Parity targets: cubercnn/util/math_util.py:142-285 (get_cuboid_verts_faces /
get_cuboid_verts) and :649-728 (convert_3d_box_to_2d). The vertex layout is
identical to the reference so downstream IoU3D / corner losses agree:

                v4_____________________v5
                /|                    /|
               / |                   / |
              /  |                  /  |
             /___|_________________/   |
          v0|    |                 |v1 |
            |    |                 |   |
            |    |                 |   |
            |    |                 |   |
            |    |_________________|___|
            |   / v7               |   /v6
            |  /                   |  /
            | /                    | /
            |/_____________________|/
            v3                     v2

box3d = [x, y, z, w, h, l]; X extent = l, Y extent = h, Z extent = w.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Signs of the 8 canonical vertices along (X, Y, Z); row i is vertex i.
_VERT_SIGNS = np.array(
    [
        [-1, -1, -1],  # v0
        [+1, -1, -1],  # v1
        [+1, +1, -1],  # v2
        [-1, +1, -1],  # v3
        [-1, -1, +1],  # v4
        [+1, -1, +1],  # v5
        [+1, +1, +1],  # v6
        [-1, +1, +1],  # v7
    ],
    dtype=np.float32,
)

UNIT_CUBE = 0.5 * _VERT_SIGNS

# Triangle faces (12, 3) identical to the reference (math_util.py:221-239).
TRI_FACES = np.array(
    [
        [0, 1, 2], [2, 3, 0],      # front
        [1, 5, 6], [6, 2, 1],      # right
        [4, 0, 3], [3, 7, 4],      # left
        [5, 4, 7], [7, 6, 5],      # back
        [4, 5, 1], [1, 0, 4],      # top
        [3, 2, 6], [6, 7, 3],      # bottom
    ],
    dtype=np.int32,
)

# Quad faces with OUTWARD winding (right-hand rule points away from center).
QUAD_FACES = np.array(
    [
        [0, 3, 2, 1],  # Z- face
        [4, 5, 6, 7],  # Z+ face
        [1, 2, 6, 5],  # X+ face
        [0, 4, 7, 3],  # X- face
        [2, 3, 7, 6],  # Y+ face
        [0, 1, 5, 4],  # Y- face
    ],
    dtype=np.int32,
)

# Edges of the box (12, 2) — used by visualisation and truncation estimates.
EDGES = np.array(
    [
        [0, 1], [1, 2], [2, 3], [3, 0],
        [4, 5], [5, 6], [6, 7], [7, 4],
        [0, 4], [1, 5], [2, 6], [3, 7],
    ],
    dtype=np.int32,
)


def cuboid_verts(box3d: jnp.ndarray, R: jnp.ndarray | None = None) -> jnp.ndarray:
    """Vertices of cuboids. box3d (..., 6) = [x, y, z, w, h, l]; R (..., 3, 3).

    Returns verts (..., 8, 3) in camera space.
    """
    center = box3d[..., :3]
    w = box3d[..., 3:4]
    h = box3d[..., 4:5]
    l = box3d[..., 5:6]
    # local extents: X <- l, Y <- h, Z <- w (reference layout).
    half = jnp.stack([l[..., 0], h[..., 0], w[..., 0]], axis=-1) * 0.5  # (..., 3)
    signs = jnp.asarray(_VERT_SIGNS, dtype=box3d.dtype)
    verts = signs * half[..., None, :]  # (..., 8, 3)
    if R is not None:
        verts = jnp.einsum("...ij,...nj->...ni", R, verts, precision="highest")
    return verts + center[..., None, :]


def cuboid_verts_faces(box3d: jnp.ndarray, R: jnp.ndarray | None = None):
    """Vertices and (static) triangle faces — mirrors get_cuboid_verts_faces."""
    return cuboid_verts(box3d, R), jnp.asarray(TRI_FACES)


def project_points(K: jnp.ndarray, pts3d: jnp.ndarray, min_z: float = 1e-6) -> jnp.ndarray:
    """Project camera-space points (..., N, 3) by intrinsics K (..., 3, 3).

    Returns (..., N, 3): (u, v, z) with u, v divided by clamped z.
    """
    proj = jnp.einsum("...ij,...nj->...ni", K, pts3d, precision="highest")
    z = proj[..., 2:3]
    z_safe = jnp.where(jnp.abs(z) < min_z, jnp.where(z < 0, -min_z, min_z), z)
    uv = proj[..., :2] / z_safe
    return jnp.concatenate([uv, proj[..., 2:3]], axis=-1)


def cuboid_verts_project(K: jnp.ndarray, box3d: jnp.ndarray, R: jnp.ndarray | None = None):
    """Project cuboid corners; returns (corners_2d (...,8,3), corners_3d (...,8,3))."""
    corners_3d = cuboid_verts(box3d, R)
    corners_2d = project_points(K, corners_3d)
    return corners_2d, corners_3d


def cuboids_to_boxes2d(
    K: jnp.ndarray,
    box3d: jnp.ndarray,
    R: jnp.ndarray | None = None,
    clamp_wh: tuple | None = None,
) -> jnp.ndarray:
    """Axis-aligned 2D bounding boxes (x1, y1, x2, y2) of projected cuboids.

    With `clamp_wh=(w, h)` the projected corners are clamped to the gradient-
    safe range used by the reference Cubes.get_bube_corners
    (ProposalNetwork/utils/spaces.py:224-245).
    """
    corners_2d, _ = cuboid_verts_project(K, box3d, R)
    x = corners_2d[..., 0]
    y = corners_2d[..., 1]
    if clamp_wh is not None:
        w, h = clamp_wh
        x = jnp.clip(x, int(-w / 2 + 1), int(w - 1 + w))
        y = jnp.clip(y, int(-h / 2 + 1), int(h - 1 + h))
    return jnp.stack([x.min(-1), y.min(-1), x.max(-1), y.max(-1)], axis=-1)


def convert_3d_box_to_2d(
    K: jnp.ndarray,
    box3d: jnp.ndarray,
    R: jnp.ndarray | None = None,
    clipw: float = 0.0,
    cliph: float = 0.0,
    xywh: bool = True,
    min_z: float = 0.20,
):
    """3D box -> projected 2D box with behind-camera handling.

    Vectorised version of math_util.py:649-728. Vertices behind the camera
    plane (z <= min_z) are snapped to the image corner on their side before
    the min/max reduction.

    Returns (box2d (..., 4), behind_camera (...,), fully_behind (...,)).
    """
    corners_2d, corners_3d = cuboid_verts_project(K, box3d, R)
    verts_behind = corners_2d[..., 2] <= min_z  # (..., 8)
    behind_camera = jnp.any(verts_behind, axis=-1)
    fully_behind = jnp.all(verts_behind, axis=-1)

    sx = jnp.sign(corners_3d[..., 0])
    sy = jnp.sign(corners_3d[..., 1])
    # bound coordinates for invalid points (per reference: corner of image).
    bx = jnp.where(sx < 0, 0.0, clipw - 1.0)
    by = jnp.where(sy < 0, 0.0, cliph - 1.0)
    x = jnp.where(verts_behind, bx, corners_2d[..., 0])
    y = jnp.where(verts_behind, by, corners_2d[..., 1])

    x1 = x.min(-1)
    y1 = y.min(-1)
    x2 = x.max(-1)
    y2 = y.max(-1)
    if xywh:
        box2d = jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)
    else:
        box2d = jnp.stack([x1, y1, x2, y2], axis=-1)
    return box2d, behind_camera, fully_behind


def backproject(K: jnp.ndarray, uv: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Backproject pixels (..., 2) at depth z (...,) -> camera points (..., 3)."""
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    x3d = z * (uv[..., 0] - cx) / fx
    y3d = z * (uv[..., 1] - cy) / fy
    return jnp.stack([x3d, y3d, z], axis=-1)


def estimate_truncation(K, box3d, R, im_w, im_h) -> jnp.ndarray:
    """Fraction of the projected box outside the image.

    Analytic (2D-clipping) replacement for the reference's renderer-based
    estimate (math_util.py:896-909): 1 - area(box ∩ image)/area(box).
    """
    box2d, _, fully_behind = convert_3d_box_to_2d(K, box3d, R, im_w, im_h, xywh=False)
    x1 = jnp.maximum(box2d[..., 0], 0.0)
    y1 = jnp.maximum(box2d[..., 1], 0.0)
    x2 = jnp.minimum(box2d[..., 2], im_w - 1.0)
    y2 = jnp.minimum(box2d[..., 3], im_h - 1.0)
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area = jnp.clip(box2d[..., 2] - box2d[..., 0], 0) * jnp.clip(box2d[..., 3] - box2d[..., 1], 0)
    trunc = 1.0 - inter / jnp.maximum(area, 1e-8)
    return jnp.where(fully_behind, 1.0, trunc)
