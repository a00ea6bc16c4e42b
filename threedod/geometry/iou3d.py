"""Exact oriented-3D-box IoU on TPU via static-shape polyhedral clipping.

Replaces PyTorch3D's CUDA/C++ ``_C.iou_box3d`` (used by the reference at
cubercnn/evaluation/omni3d_evaluation.py:37,155, ProposalNetwork/utils/
utils.py:194-210 and roi_heads.py) with a pure-JAX, vmappable routine:

Algorithm
---------
The intersection of two convex boxes A, B is a convex polyhedron whose
boundary is exactly the union of (faces of A clipped by B's half-spaces) and
(faces of B clipped by A's half-spaces). Each quad face is clipped by 6
half-planes with Sutherland–Hodgman; a convex polygon clipped by k planes has
at most 4 + k vertices, so every buffer is static: (MAX_VERTS=10, 3). The
enclosed volume follows from the divergence theorem over outward-wound fan
triangles. Everything is branch-free and vmaps over arbitrary numbers of box
pairs — on TPU this turns the reference's per-pair CUDA kernel into one big
fused vector program.

Boxes are given as 8 corners in the canonical vertex layout of
``threedod.geometry.cuboids`` (identical to the reference layout, so golden
values like the 0.9944 test case at ProposalNetwork/utils/tests/test_iou.py
carry over).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .cuboids import QUAD_FACES

MAX_VERTS = 10  # 4 initial quad verts + up to 6 clip planes


def box_volume(corners: jnp.ndarray) -> jnp.ndarray:
    """Volume of boxes from corners (..., 8, 3) = |det[e1 e2 e3]|."""
    e1 = corners[..., 1, :] - corners[..., 0, :]
    e2 = corners[..., 3, :] - corners[..., 0, :]
    e3 = corners[..., 4, :] - corners[..., 0, :]
    return jnp.abs(jnp.sum(e1 * jnp.cross(e2, e3), axis=-1))


def _face_planes(corners: jnp.ndarray):
    """Outward unit normals and offsets of the 6 faces of a box (8, 3).

    Returns (normals (6, 3), offsets (6,)) with half-space {p : n.p <= d}.
    Orientation is fixed outward with a centroid test so any consistent
    (possibly reflected) corner ordering works.
    """
    quads = corners[jnp.asarray(QUAD_FACES)]  # (6, 4, 3)
    center = corners.mean(axis=0)
    e1 = quads[:, 1] - quads[:, 0]
    e2 = quads[:, 2] - quads[:, 1]
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    face_centers = quads.mean(axis=1)
    outward = jnp.sign(jnp.sum(n * (face_centers - center), axis=-1, keepdims=True))
    outward = jnp.where(outward == 0, 1.0, outward)
    n = n * outward
    d = jnp.sum(n * face_centers, axis=-1)
    return n, d


def _clip_polygon(verts: jnp.ndarray, count: jnp.ndarray, n: jnp.ndarray, d: jnp.ndarray, eps: float):
    """Sutherland–Hodgman clip of a convex polygon by half-space n.p <= d.

    verts: (MAX_VERTS, 3) padded; count: scalar int32 number of valid verts.
    Returns (verts', count'). Static shapes throughout.
    """
    m = MAX_VERTS
    idx = jnp.arange(m)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    dist = jnp.matmul(verts, n, precision="highest") - d  # (m,)
    inside = dist <= eps
    v_next = verts[nxt]
    d_next = dist[nxt]
    in_next = inside[nxt]
    denom = dist - d_next
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = dist / denom
    v_int = verts + t[:, None] * (v_next - verts)

    valid = idx < count
    emit_int = (inside != in_next) & valid
    emit_next = in_next & valid

    # interleave: per edge emit [intersection, next-vertex]
    cand = jnp.stack([v_int, v_next], axis=1).reshape(2 * m, 3)
    flags = jnp.stack([emit_int, emit_next], axis=1).reshape(2 * m)
    # stable compaction of the flagged candidates. Four bit-identical
    # variants measured on v5e at 8000 pairs (r3, one process): stable
    # argsort 212-270 ms, one-hot matmul 226 ms, scatter-with-drop 744 ms,
    # searchsorted gather 493 ms (the r2 variant — its claimed compile-time
    # win no longer reproduces: every variant compiles in ~20-26 s today).
    # The argsort runs ~2x faster than the searchsorted it replaces and is
    # what the r2 kernel used before f1111ae.
    order = jnp.argsort(~flags, stable=True)
    packed = cand[order[:m]]
    new_count = flags.sum().astype(jnp.int32)
    return packed, new_count


def _clipped_faces_volume(face_verts: jnp.ndarray, planes_n: jnp.ndarray, planes_d: jnp.ndarray, eps: float):
    """Clip 6 quad faces by 6 half-spaces; return summed signed fan volume.

    face_verts: (6, 4, 3) outward-wound quads. planes: (6, 3) / (6,).
    """
    def one_face(quad):
        verts = jnp.zeros((MAX_VERTS, 3), quad.dtype).at[:4].set(quad)
        count = jnp.asarray(4, jnp.int32)

        # keep the clip loop rolled: unrolling the 6 iterations makes
        # XLA:TPU fusion blow compile time up 4x for identical numerics
        def body(i, carry):
            v, c = carry
            return _clip_polygon(v, c, planes_n[i], planes_d[i], eps)

        verts, count = jax.lax.fori_loop(0, 6, body, (verts, count))
        # signed fan volume wrt origin: (1/6) sum_i p0 . (p_i x p_{i+1})
        i = jnp.arange(MAX_VERTS)
        valid_tri = (i >= 1) & (i <= count - 2)
        p0 = verts[0]
        pi = verts
        pj = verts[jnp.minimum(i + 1, MAX_VERTS - 1)]
        tri = jnp.sum(p0 * jnp.cross(pi, pj), axis=-1) / 6.0
        return jnp.sum(jnp.where(valid_tri, tri, 0.0))

    return jnp.sum(jax.vmap(one_face)(face_verts))


def _winding_sign(corners: jnp.ndarray) -> jnp.ndarray:
    """+1 if QUAD_FACES winds outward for this corner set, -1 if inward.

    Corner sets produced by reflected bases (det R = -1 — which the
    reference's ground-normal orthobases genuinely produce,
    ProposalNetwork/utils/utils.py:120-132) invert the canonical winding;
    the fan-volume formula needs the sign to stay correct.
    """
    e1 = corners[1] - corners[0]
    e2 = corners[3] - corners[0]
    e3 = corners[4] - corners[0]
    s = jnp.sign(jnp.sum(e1 * jnp.cross(e2, e3), axis=-1))
    return jnp.where(s == 0, 1.0, s)


def _pair_intersect_volume(c1: jnp.ndarray, c2: jnp.ndarray, eps_rel: float = 1e-6) -> jnp.ndarray:
    """Intersection volume of two boxes given corners (8, 3) each."""
    # center for numerical conditioning
    shift = (c1.mean(axis=0) + c2.mean(axis=0)) * 0.5
    a = c1 - shift
    b = c2 - shift
    scale = jnp.maximum(jnp.max(jnp.abs(a)), jnp.max(jnp.abs(b)))
    eps = eps_rel * jnp.maximum(scale, 1e-6)

    na, da = _face_planes(a)
    nb, db = _face_planes(b)
    quads_a = a[jnp.asarray(QUAD_FACES)]
    quads_b = b[jnp.asarray(QUAD_FACES)]
    # Asymmetric epsilon: boundary patches on *coincident* face planes are
    # kept in A's pass (<= +eps) and discarded in B's pass (<= -eps), so the
    # shared surface is counted exactly once.
    vol = _winding_sign(a) * _clipped_faces_volume(quads_a, nb, db, eps) + _winding_sign(
        b
    ) * _clipped_faces_volume(quads_b, na, da, -eps)
    return jnp.maximum(vol, 0.0)


def iou3d_pairs(corners1: jnp.ndarray, corners2: jnp.ndarray):
    """Matched-pair IoU3D. corners* (N, 8, 3) -> (vol (N,), iou (N,))."""
    inter = jax.vmap(_pair_intersect_volume)(corners1, corners2)
    v1 = box_volume(corners1)
    v2 = box_volume(corners2)
    inter = jnp.minimum(inter, jnp.minimum(v1, v2))
    union = v1 + v2 - inter
    degenerate = (v1 < 1e-9) | (v2 < 1e-9)
    iou = jnp.where(degenerate | (union <= 0), 0.0, inter / jnp.maximum(union, 1e-12))
    return inter, iou


def box3d_overlap(corners1: jnp.ndarray, corners2: jnp.ndarray):
    """Cross-product IoU3D (pytorch3d.ops.box3d_overlap parity).

    corners1 (N, 8, 3), corners2 (M, 8, 3) -> (vol (N, M), iou (N, M)).
    """
    n, m = corners1.shape[0], corners2.shape[0]
    c1 = jnp.repeat(corners1, m, axis=0)
    c2 = jnp.tile(corners2, (n, 1, 1))
    vol, iou = iou3d_pairs(c1, c2)
    return vol.reshape(n, m), iou.reshape(n, m)


# jitted convenience entry points (shapes polymorphic via re-trace)
iou3d_pairs_jit = jax.jit(iou3d_pairs)
box3d_overlap_jit = jax.jit(box3d_overlap)


def iou3d_boxes(box3d_1: jnp.ndarray, R1: jnp.ndarray, box3d_2: jnp.ndarray, R2: jnp.ndarray):
    """Cross IoU3D from parametric boxes [x,y,z,w,h,l] + rotations."""
    from .cuboids import cuboid_verts

    return box3d_overlap(cuboid_verts(box3d_1, R1), cuboid_verts(box3d_2, R2))


def aabb_iou3d_upper_bound(corners1: jnp.ndarray, corners2: jnp.ndarray) -> jnp.ndarray:
    """Cheap AABB-overlap screen: zero here implies exact IoU3D is zero.

    (N, 8, 3) x (M, 8, 3) -> (N, M) bool. Used to skip exact clipping work on
    host-side evaluation batching.
    """
    lo1, hi1 = corners1.min(axis=1), corners1.max(axis=1)
    lo2, hi2 = corners2.min(axis=1), corners2.max(axis=1)
    lo = jnp.maximum(lo1[:, None], lo2[None, :])
    hi = jnp.minimum(hi1[:, None], hi2[None, :])
    return jnp.all(hi > lo, axis=-1)
