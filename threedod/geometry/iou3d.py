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


def _pairs_intersect_volume_lanes(corners1: jnp.ndarray, corners2: jnp.ndarray, eps_rel: float = 1e-6):
    """Batch-minor (SoA) intersection volumes for N box pairs at once.

    Identical math and candidate ordering to `_pair_intersect_volume`, laid
    out for the VPU: every array keeps the JOB axis minor (J = 12*N clip
    jobs — 6 faces of A against B's planes and vice versa), so each op runs
    lane-dense instead of over the (…, verts, 3) 3-wide minors of the
    vmapped form. Measured on v5e at 8000 pairs this is the difference
    between 270 ms (the whole propose+score budget, r4 attribution) and
    single-digit ms: same taps, same Sutherland–Hodgman sweep, the stable
    compaction realized as an exclusive-prefix-sum destination select
    (exactly the stable-argsort packing order, one candidate per slot).
    """
    n = corners1.shape[0]
    shift = (corners1.mean(axis=1) + corners2.mean(axis=1)) * 0.5  # (N, 3)
    a = corners1 - shift[:, None]
    b = corners2 - shift[:, None]
    scale = jnp.maximum(
        jnp.max(jnp.abs(a), axis=(1, 2)), jnp.max(jnp.abs(b), axis=(1, 2))
    )
    eps = eps_rel * jnp.maximum(scale, 1e-6)                       # (N,)

    na, da = jax.vmap(_face_planes)(a)                             # (N,6,3)/(N,6)
    nb, db = jax.vmap(_face_planes)(b)
    quads_a = a[:, jnp.asarray(QUAD_FACES)]                        # (N,6,4,3)
    quads_b = b[:, jnp.asarray(QUAD_FACES)]
    sign_a = jax.vmap(_winding_sign)(a)                            # (N,)
    sign_b = jax.vmap(_winding_sign)(b)

    # assemble the 12N jobs: (quad, clip planes, eps sign, volume sign).
    # Asymmetric epsilon exactly as in _pair_intersect_volume: A's faces
    # keep coincident-plane patches (+eps), B's discard them (-eps).
    quads = jnp.concatenate([quads_a, quads_b], axis=1)            # (N,12,4,3)
    pn = jnp.concatenate(
        [jnp.broadcast_to(nb[:, None], (n, 6, 6, 3)),
         jnp.broadcast_to(na[:, None], (n, 6, 6, 3))], axis=1,
    )                                                              # (N,12,6,3)
    pd = jnp.concatenate(
        [jnp.broadcast_to(db[:, None], (n, 6, 6)),
         jnp.broadcast_to(da[:, None], (n, 6, 6))], axis=1,
    )                                                              # (N,12,6)
    eps_j = jnp.concatenate(
        [jnp.broadcast_to(eps[:, None], (n, 6)),
         jnp.broadcast_to(-eps[:, None], (n, 6))], axis=1,
    )                                                              # (N,12)
    sign_j = jnp.concatenate(
        [jnp.broadcast_to(sign_a[:, None], (n, 6)),
         jnp.broadcast_to(sign_b[:, None], (n, 6))], axis=1,
    )                                                              # (N,12)

    j = n * 12
    m = MAX_VERTS
    # job-minor layouts: verts (m, 3, J), planes (6, 3, J) / (6, J)
    verts = jnp.zeros((m, 3, j), quads.dtype).at[:4].set(
        quads.reshape(j, 4, 3).transpose(1, 2, 0)
    )
    count = jnp.full((j,), 4, jnp.int32)
    pn_t = pn.reshape(j, 6, 3).transpose(1, 2, 0)
    pd_t = pd.reshape(j, 6).T
    eps_t = eps_j.reshape(j)

    idx = jnp.arange(m)

    def clip(i, carry):
        v, c = carry                                # (m, 3, J), (J,)
        nrm = pn_t[i]                               # (3, J)
        off = pd_t[i]                               # (J,)
        # explicit mul+reduce over the 3-wide coord axis: an einsum here
        # lowers as J-batched tiny dots (the layout trap this rewrite kills)
        dist = (v * nrm[None]).sum(axis=1) - off     # (m, J)
        inside = dist <= eps_t
        # next vertex: roll(-1) everywhere except the wrap row
        # (i == count-1), which closes back to vertex 0
        wrap = (idx[:, None] + 1) == c               # (m, J)
        v_next = jnp.where(
            wrap[:, None], v[0][None], jnp.roll(v, -1, axis=0)
        )
        d_next = jnp.where(wrap, dist[0][None], jnp.roll(dist, -1, axis=0))
        in_next = d_next <= eps_t
        denom = dist - d_next
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        t = (dist / denom)[:, None]                  # (m, 1, J)
        v_int = v + t * (v_next - v)

        valid = idx[:, None] < c                     # (m, J)
        emit_int = (inside != in_next) & valid
        emit_next = in_next & valid
        # interleave per edge: [intersection, next] -> (2m, J)
        cand = jnp.stack([v_int, v_next], axis=1).reshape(2 * m, 3, j)
        flags = jnp.stack([emit_int, emit_next], axis=1).reshape(2 * m, j)
        # stable compaction: destination slot = exclusive prefix count
        dest = jnp.cumsum(flags, axis=0) - flags.astype(jnp.int32)
        sel = (dest[None] == idx[:, None, None]) & flags[None]     # (m, 2m, J)
        # one candidate per (slot, job) at most: broadcast-multiply-reduce
        # (lane-dense; XLA fuses the select into the reduction)
        new_v = (cand[None] * sel[:, :, None].astype(cand.dtype)).sum(axis=1)
        new_c = flags.sum(axis=0).astype(jnp.int32)
        return new_v, new_c

    verts, count = jax.lax.fori_loop(0, 6, clip, (verts, count))

    # signed fan volume wrt origin per job
    valid_tri = (idx >= 1)[:, None] & (idx[:, None] <= count - 2)  # (m, J)
    p0 = verts[0]                                                  # (3, J)
    pi = verts                                                     # (m, 3, J)
    pj = jnp.roll(verts, -1, axis=0).at[m - 1].set(verts[m - 1])
    cross = jnp.stack(
        [
            pi[:, 1] * pj[:, 2] - pi[:, 2] * pj[:, 1],
            pi[:, 2] * pj[:, 0] - pi[:, 0] * pj[:, 2],
            pi[:, 0] * pj[:, 1] - pi[:, 1] * pj[:, 0],
        ],
        axis=1,
    )                                                              # (m, 3, J)
    tri = (p0[None] * cross).sum(axis=1) / 6.0
    vol_j = jnp.sum(jnp.where(valid_tri, tri, 0.0), axis=0)        # (J,)
    vol = jnp.sum((vol_j * sign_j.reshape(j)).reshape(n, 12), axis=1)
    return jnp.maximum(vol, 0.0)


def iou3d_pairs(corners1: jnp.ndarray, corners2: jnp.ndarray):
    """Matched-pair IoU3D. corners* (N, 8, 3) -> (vol (N,), iou (N,))."""
    inter = _pairs_intersect_volume_lanes(corners1, corners2)
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
