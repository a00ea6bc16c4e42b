"""Detection visualisation: rendered front + novel scene views, BEV,
wireframes, and eval-time instance dumps.

Parity target: cubercnn/vis/vis.py — `draw_scene_view` (:210-546) renders
the detected cuboids as shaded meshes over the RGB (front view) and from a
novel camera (default pitch pi/3) above an auto-estimated ground grid,
then overlays z-plane-clipped wireframe edges and per-box text;
`visualize_from_instances` (:76-198) writes eval-sample dumps and
accumulates xy/z/whl/pose error statistics; drawing primitives at
:547-749.  The reference rasterises with PyTorch3D's CUDA renderer; here
rendering is host-side numpy (`render.py`) with the same camera model and
compositing rules — no GPU renderer dependency, TPU untouched.
"""
from __future__ import annotations

import os
import zlib
from typing import Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw

from ..geometry.cuboids import EDGES, QUAD_FACES
from .render import render_cuboids

# 10k-color palette seed (util.py:269-300 contract: stable distinct colors)
def get_color(index: int):
    rng = np.random.RandomState(index * 9781 + 3)
    c = rng.randint(60, 255, 3)
    return tuple(int(x) for x in c)


def _project(K: np.ndarray, pts: np.ndarray) -> np.ndarray:
    p = pts @ K.T
    return p[:, :2] / np.maximum(p[:, 2:3], 1e-6)


def euler2mat(euler):
    """XYZ-intrinsic euler to rotation matrix (util.euler2mat contract used
    for the default novel view, vis.py:236) — host-side wrapper over the
    one shared implementation in geometry.rotations."""
    from ..geometry.rotations import euler_to_matrix

    return np.asarray(euler_to_matrix(np.asarray(euler, np.float64))).astype(np.float64)


def draw_text(img: Image.Image, text: str, pos, color=(0, 255, 255)):
    """Text with a blended background strip (vis.py:664-693)."""
    draw = ImageDraw.Draw(img, "RGBA")
    x, y = float(pos[0]), float(pos[1])
    x = min(max(x, 0.0), img.width - 1)
    y = min(max(y, 0.0), img.height - 1)
    tw = max(7 * len(str(text)), 10)
    fg = (0, 0, 0) if (sum(color[:3]) / 3 > 127.5) else (255, 255, 255)
    draw.rectangle([x, y - 11, x + tw, y + 1], fill=tuple(color[:3]) + (170,))
    draw.text((x + 2, y - 11), str(text), fill=fg)
    return img


def draw_boxes_2d(img: Image.Image, boxes, labels=None, scores=None, color=(0, 255, 80)):
    draw = ImageDraw.Draw(img)
    for i, b in enumerate(np.asarray(boxes)):
        draw.rectangle([b[0], b[1], b[2], b[3]], outline=color, width=2)
        txt = []
        if labels is not None:
            txt.append(str(labels[i]))
        if scores is not None:
            txt.append(f"{scores[i]:.2f}")
        if txt:
            draw.text((b[0] + 2, b[1] + 2), " ".join(txt), fill=color)
    return img


def draw_3d_box_from_verts(
    img: Image.Image,
    K: np.ndarray,
    verts3d: np.ndarray,
    color=(255, 120, 40),
    width: int = 2,
    zplane: float = 0.05,
):
    """Wireframe edges with per-edge z-plane clipping (vis.py:577-633):
    an edge with one endpoint behind the camera plane is intersected with
    z = zplane and the visible half is drawn."""
    verts3d = np.asarray(verts3d, np.float64)
    K = np.asarray(K, np.float64)
    draw = ImageDraw.Draw(img, "RGBA")
    eps = 1e-4

    def proj(v):
        z = max(v[2], eps)
        return (K[0, 0] * v[0] / z + K[0, 2], K[1, 1] * v[1] / z + K[1, 2])

    for a, b in EDGES:
        v0, v1 = verts3d[a].copy(), verts3d[b].copy()
        z0, z1 = v0[2], v1[2]
        if z0 < zplane and z1 < zplane:
            continue
        s = (zplane - z0) / max(z1 - z0, eps) if z1 != z0 else 0.0
        new_v = v0 + s * (v1 - v0)
        if z0 < zplane <= z1:
            v0 = new_v
        elif z1 < zplane <= z0:
            v1 = new_v
        draw.line([proj(v0), proj(v1)], fill=tuple(color[:3]) + (255,), width=width)
    return img


def draw_box_3d(img: Image.Image, corners3d: np.ndarray, K: np.ndarray, color=(255, 120, 40), width: int = 2, fill_faces: bool = False):
    """Wireframe (optionally face-filled) projected cuboid."""
    corners3d = np.asarray(corners3d)
    if np.all(corners3d[:, 2] <= 0.05):
        return img
    if fill_faces and np.all(corners3d[:, 2] > 0.05):
        uv = _project(np.asarray(K), corners3d)
        draw = ImageDraw.Draw(img, "RGBA")
        order = np.argsort([-corners3d[QUAD_FACES[f]].mean(0)[2] for f in range(6)])
        for f in order:
            poly = [tuple(uv[i]) for i in QUAD_FACES[f]]
            draw.polygon(poly, fill=tuple(color[:3]) + (40,))
    draw_3d_box_from_verts(img, np.asarray(K), corners3d, color=color, width=width)
    return img


def draw_bev(corners3d_list: Sequence[np.ndarray], colors=None, size: int = 400, max_range: float = 12.0):
    """Bird's-eye-view canvas (vis.py:26 contract): X right, Z up."""
    img = Image.new("RGB", (size, size), (245, 245, 245))
    draw = ImageDraw.Draw(img)
    scale = size / (2 * max_range)

    def to_px(x, z):
        return (size / 2 + x * scale, size - z * scale)

    draw.line([to_px(0, 0), to_px(-2, 3)], fill=(150, 150, 150))
    draw.line([to_px(0, 0), to_px(2, 3)], fill=(150, 150, 150))
    for i, corners in enumerate(corners3d_list):
        color = colors[i] if colors else get_color(i)
        footprint = corners[[0, 1, 5, 4], :][:, [0, 2]]  # x, z of one face loop
        pts = [to_px(x, z) for x, z in footprint]
        draw.polygon(pts, outline=color)
    return img


def _auto_zoom(verts_rot: np.ndarray, center_z: float, K_novel: np.ndarray, scale: int):
    """The reference's zoom-out search (vis.py:348-377): start far out and
    pull in by 5% steps until any vertex leaves the margins or comes too
    close; keep the last fully-visible zoom."""
    margin = 0.01
    zoom = 100.0
    zoom_in = zoom
    for _ in range(10000):
        zoom_in = zoom_in * 0.95
        z = verts_rot[:, 2] + center_z * zoom_in
        if (z < 0.25).any():
            break
        u = K_novel[0, 0] * verts_rot[:, 0] / z + K_novel[0, 2]
        v = K_novel[1, 1] * verts_rot[:, 1] / z + K_novel[1, 2]
        if (u < scale * margin).any() or (v < scale * margin).any():
            break
        if (u > scale * (1 - margin)).any() or (v > scale * (1 - margin)).any():
            break
        zoom = zoom_in
    return zoom


def _ground_grid_canvas(
    all_verts: np.ndarray,
    center: np.ndarray,
    view_R: np.ndarray,
    K_novel: np.ndarray,
    scale: int,
    z_shift: float,
    ground_bounds=None,
):
    """Novel-view background: a 1 m ground grid at the scene's max-Y plane,
    bounds auto-estimated by the reference's two-pass projection
    (vis.py:393-497). Returns a PIL canvas or None for an invalid scene."""
    if ground_bounds is None:
        min_x3d, _, min_z3d = all_verts.min(0)
        max_x3d, max_y3d, max_z3d = all_verts.max(0)
        # pass 1: absurdly wide bounds, then trim to what lands near the canvas
        x3d_start = np.round(min_x3d - (max_x3d - min_x3d) * 50)
        x3d_end = np.round(max_x3d + (max_x3d - min_x3d) * 50)
        z3d_start = np.round(min_z3d - (max_z3d - min_z3d) * 50)
        z3d_end = np.round(max_z3d + (max_z3d - min_z3d) * 50)
        gx = np.arange(x3d_start, x3d_end)
        gz = np.arange(z3d_start, z3d_end)
        if len(gx) == 0 or len(gz) == 0:
            return None
        xs, zs = np.meshgrid(gx, gz)
        pts = np.stack([xs, np.full_like(xs, max_y3d), zs], -1).reshape(-1, 3)
        cam = (view_R @ (pts - center).T).T
        cam[:, 2] = np.maximum(cam[:, 2] + z_shift, 0.25)
        uv = np.stack(
            [
                K_novel[0, 0] * cam[:, 0] / cam[:, 2] + K_novel[0, 2],
                K_novel[1, 1] * cam[:, 1] / cam[:, 2] + K_novel[1, 2],
            ],
            -1,
        )
        near = cam[:, 2] > 0
        maskx = (uv[:, 0] >= -50) & (uv[:, 0] < scale + 50) & near
        maskz = (uv[:, 1] >= -50) & (uv[:, 1] < scale + 50) & near
        if not maskx.any() or not maskz.any():
            return None
        x3d_start = np.round(cam[maskx, 0].min() - 10)
        x3d_end = np.round(cam[maskx, 0].max() + 10)
        z3d_start = np.round(pts[maskz, 2].min() - 10)
        z3d_end = np.round(pts[maskz, 2].max() + 10)
    else:
        max_y3d, x3d_start, x3d_end, z3d_start, z3d_end = ground_bounds

    gx = np.arange(x3d_start, x3d_end)
    gz = np.arange(z3d_start, z3d_end)
    if len(gx) < 2 or len(gz) < 2:
        return None
    xs, zs = np.meshgrid(gx, gz)
    pts = np.stack([xs, np.full_like(xs, float(all_verts[:, 1].max()) if ground_bounds is None else max_y3d), zs], -1)
    shape = pts.shape
    cam = (view_R @ (pts.reshape(-1, 3) - center).T).T
    cam[:, 2] = np.maximum(cam[:, 2] + z_shift, 0.25)
    uv = np.stack(
        [
            K_novel[0, 0] * cam[:, 0] / cam[:, 2] + K_novel[0, 2],
            K_novel[1, 1] * cam[:, 1] / cam[:, 2] + K_novel[1, 2],
            cam[:, 2],
        ],
        -1,
    ).reshape(shape)

    canvas = Image.new("RGB", (scale, scale), (225, 225, 225))
    draw = ImageDraw.Draw(canvas)
    lw = max(1, int(np.round(3 * scale / 1250)))
    valid = uv[:, :, 2] > 0
    for r in range(1, shape[0]):
        for c in range(1, shape[1]):
            p = uv[r - 1, c - 1]
            if valid[r - 1, c - 1] and valid[r - 1, c]:
                q = uv[r - 1, c]
                draw.line([(p[0], p[1]), (q[0], q[1])], fill=(175, 175, 175), width=lw)
            if valid[r - 1, c - 1] and valid[r, c - 1]:
                q = uv[r, c - 1]
                draw.line([(p[0], p[1]), (q[0], q[1])], fill=(175, 175, 175), width=lw)
    return canvas


def render_scene_views(
    image: np.ndarray,
    K: np.ndarray,
    corners3d: np.ndarray,  # (N, 8, 3)
    text=None,
    colors=None,
    mode: str = "front_and_novel",
    R: Optional[np.ndarray] = None,
    T: Optional[np.ndarray] = None,
    scale: Optional[int] = None,
    zoom_factor: float = 1.0,
    blend_weight: float = 0.80,
    blend_weight_overlay: float = 1.0,
    ground_bounds=None,
    zplane: float = 0.05,
):
    """Reference draw_scene_view semantics (vis.py:210-546) on corner sets.

    Returns numpy uint8 images: front for 'front'/'2D_only', novel for
    'novel', (front, novel) for 'front_and_novel'.
    """
    image = np.asarray(image, np.uint8)
    K = np.asarray(K, np.float64)
    corners3d = np.asarray(corners3d, np.float64)
    h, w = image.shape[:2]
    n = len(corners3d)
    if scale is None:
        scale = h
    if colors is None:
        colors = [get_color(i) for i in range(n)]
    colors01 = np.asarray([[c / 255.0 for c in col[:3]] for col in colors]) if n else np.zeros((0, 3))
    if R is None:
        R = euler2mat([np.pi / 3, 0, 0])
    lw = max(2, int(np.round(3 * h / 1250)))

    # painter order: reverse mean-Y (vis.py:247, 292) — highest boxes last
    order = list(reversed(np.argsort(corners3d[:, :, 1].mean(1)))) if n else []

    if mode == "2D_only":
        img = Image.fromarray(image.copy())
        for i in order:
            uv = _project(K, corners3d[i])
            x1, y1 = uv[:, 0].min(), uv[:, 1].min()
            x2, y2 = uv[:, 0].max(), uv[:, 1].max()
            ImageDraw.Draw(img).rectangle([x1, y1, x2, y2], outline=tuple(colors[i][:3]), width=lw)
            if text is not None:
                draw_text(img, text[i], (x1, y1), color=colors[i])
        return np.asarray(img)

    front = None
    if mode in ("front", "front_and_novel"):
        front_np = image.astype(np.float64).copy()
        if blend_weight > 0 and n:
            rgb, sil, _ = render_cuboids(corners3d, colors01, K, w, h, znear=zplane)
            front_np[sil] = rgb[sil] * 255.0 * blend_weight + front_np[sil] * (1 - blend_weight)
        img = Image.fromarray(front_np.astype(np.uint8))
        for i in order:
            draw_3d_box_from_verts(img, K, corners3d[i], color=colors[i], width=lw, zplane=zplane)
            if text is not None:
                uv = _project(K, corners3d[i])
                draw_text(img, text[i], (uv[:, 0].min(), uv[:, 1].min()), color=colors[i])
        front = np.asarray(img).astype(np.float64)
        if 0.0 < blend_weight_overlay < 1.0:
            front = front * blend_weight_overlay + image.astype(np.float64) * (1 - blend_weight_overlay)
        front = front.astype(np.uint8)
        if mode == "front":
            return front

    if mode in ("novel", "front_and_novel"):
        if n == 0:
            novel = np.full((scale, scale, 3), 225, np.uint8)
            return (front, novel) if mode == "front_and_novel" else novel
        all_verts = corners3d.reshape(-1, 3)
        if T is None:
            center = (all_verts.min(0) + all_verts.max(0)) / 2.0
        else:
            center = np.asarray(T, np.float64).reshape(3)
        verts_rot = (R @ (all_verts - center).T).T

        K_novel = K.copy()
        K_novel[0, 2] *= scale / w
        K_novel[1, 2] *= scale / h

        if T is None:
            zoom_factor = _auto_zoom(verts_rot, center[2], K_novel, scale)
            zoom_out_bias = center[2]
        else:
            zoom_out_bias = 1.0
        z_shift = zoom_out_bias * zoom_factor
        verts_novel = verts_rot.copy()
        verts_novel[:, 2] += z_shift
        corners_novel = verts_novel.reshape(n, 8, 3)

        rgb, sil, _ = render_cuboids(corners_novel, colors01, K_novel, scale, scale, znear=zplane)
        canvas = _ground_grid_canvas(
            all_verts, center, R, K_novel, scale, z_shift, ground_bounds
        )
        if canvas is None:
            canvas = Image.new("RGB", (scale, scale), (225, 225, 225))
        novel_np = np.asarray(canvas, np.float64).copy()
        novel_np[sil] = rgb[sil] * 255.0
        img = Image.fromarray(novel_np.astype(np.uint8))
        lwn = max(2, int(np.round(3 * scale / 1250)))
        for i in order:
            draw_3d_box_from_verts(img, K_novel, corners_novel[i], color=colors[i], width=lwn, zplane=zplane)
            if text is not None:
                uv = _project(K_novel, corners_novel[i])
                draw_text(img, text[i], (uv[:, 0].min(), uv[:, 1].min()), color=colors[i])
        novel = np.asarray(img)
        return (front, novel) if mode == "front_and_novel" else novel

    raise ValueError(f"unknown mode {mode}")


def draw_scene_view(
    image: np.ndarray,
    K: np.ndarray,
    corners3d: np.ndarray,  # (N, 8, 3)
    labels=None,
    scores=None,
    colors=None,
    novel_view: bool = True,
    **kwargs,
):
    """Convenience wrapper: rendered front view plus novel view side by
    side as one PIL image (reference three-panel contract; demo.py:135
    writes the two panels separately — tools/demo.py does both)."""
    corners3d = np.asarray(corners3d, np.float64)
    n = len(corners3d)
    text = None
    if labels is not None:
        text = [
            str(labels[i]) + (f" {scores[i]:.2f}" if scores is not None else "")
            for i in range(n)
        ]
    def _color_idx(i):
        if labels is None:
            return i
        try:
            return int(labels[i])
        except (TypeError, ValueError):
            # stable across processes (hash() is PYTHONHASHSEED-randomized,
            # which would recolor categories on every invocation)
            return zlib.crc32(str(labels[i]).encode()) % 10000

    if colors is None:
        colors = [get_color(_color_idx(i)) for i in range(n)]
    if not novel_view:
        front = render_scene_views(
            image, K, corners3d, text=text, colors=colors, mode="front", **kwargs
        )
        return Image.fromarray(front)
    front, novel = render_scene_views(
        image, K, corners3d, text=text, colors=colors, mode="front_and_novel", **kwargs
    )
    fimg, nimg = Image.fromarray(front), Image.fromarray(novel)
    if nimg.height != fimg.height:
        nimg = nimg.resize(
            (max(1, int(nimg.width * fimg.height / nimg.height)), fimg.height)
        )
    canvas = Image.new("RGB", (fimg.width + nimg.width, fimg.height), (0, 0, 0))
    canvas.paste(fimg, (0, 0))
    canvas.paste(nimg, (fimg.width, 0))
    return canvas


def _iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Plain pairwise IoU on xyxy boxes (util.iou contract, vis.py:142)."""
    ix1 = np.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = np.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = np.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.maximum(ix2 - ix1, 0) * np.maximum(iy2 - iy1, 0)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def so3_relative_angle(R1: np.ndarray, R2: np.ndarray) -> float:
    """Geodesic angle between two rotations, cos clamped to [-1, 1]
    (pytorch3d so3_relative_angle with cos_bound, vis.py:169)."""
    cos = (np.trace(R1 @ R2.T) - 1.0) / 2.0
    return float(np.arccos(np.clip(cos, -1.0, 1.0)))


def visualize_from_instances(
    detections,
    dataset_dicts,
    dataset_name: str,
    min_size_test: int,
    output_folder: str,
    category_names_official,
    iteration="",
    visualize_every: int = 50,
    score_thres: Optional[float] = None,
):
    """Eval-time dumps + error statistics (vis.py:76-198).

    Args:
        detections: per-image dicts with 'image_id', 'K', 'width', 'height',
            'instances' (each: category_id, score, bbox xywh, center_2D,
            center_cam, dimensions, pose) — the eval-dump format produced by
            `threedod.evaluation.inference`.
        dataset_dicts: matching list of dataset records with 'annotations'
            (bbox xywh, category_id, center_cam, dimensions, pose) and
            'file_name'.
    Returns the reference's one-line error log string.
    """
    vis_folder = os.path.join(output_folder, "vis")
    os.makedirs(vis_folder, exist_ok=True)

    xy_errors, z_errors = [], []
    w3d_errors, h3d_errors, l3d_errors, dim_errors, ry_errors = [], [], [], [], []
    n_cats = len(category_names_official)
    thres = np.sqrt(1.0 / max(n_cats, 1)) if score_thres is None else score_thres

    for imind, im_obj in enumerate(detections):
        write_sample = (imind % visualize_every) == 0
        annos = dataset_dicts[imind].get("annotations", [])
        if len(annos) == 0:
            continue
        gt_boxes_2d = np.array([a["bbox"] for a in annos], np.float64)
        gt_boxes_2d[:, 2] += gt_boxes_2d[:, 0]
        gt_boxes_2d[:, 3] += gt_boxes_2d[:, 1]
        gt_cats = np.array([a["category_id"] for a in annos])

        K = np.array(im_obj["K"], np.float64)
        K_inv = np.linalg.inv(K)
        img = None
        if write_sample:
            fn = dataset_dicts[imind].get("file_name")
            if fn and os.path.exists(fn):
                img = Image.open(fn).convert("RGB")
            else:
                img = Image.new(
                    "RGB",
                    (int(im_obj.get("width", 640)), int(im_obj.get("height", 480))),
                    (40, 40, 40),
                )

        for inst in im_obj.get("instances", []):
            cat_id = inst["category_id"]
            score = inst["score"]
            x1, y1, bw, bh = inst["bbox"]
            w3d, h3d, l3d = inst["dimensions"]
            cen_2d = np.array(list(inst["center_2D"]) + [1.0])
            z3d = inst["center_cam"][2]
            ry3d = np.array(inst["pose"], np.float64)

            valid_gt = np.flatnonzero(cat_id == gt_cats)
            valid_match = False
            if len(valid_gt) > 0:
                q = _iou_xyxy(
                    np.array([[x1, y1, x1 + bw, y1 + bh]]), gt_boxes_2d[valid_gt]
                )
                nearest = int(q.argmax(axis=1)[0])
                valid_match = float(q.max(axis=1)[0]) >= 0.5
            if valid_match:
                g = annos[valid_gt[nearest]]
                gt_x3d, gt_y3d, gt_z3d = g["center_cam"]
                gt_w3d, gt_h3d, gt_l3d = g["dimensions"]
                gt_cen = K @ np.array([gt_x3d, gt_y3d, gt_z3d])
                gt_cen = gt_cen / gt_cen[2]
                xy_errors.append(float(np.linalg.norm(cen_2d[:2] - gt_cen[:2])))
                z_errors.append(abs(z3d - gt_z3d))
                w3d_errors.append(abs(w3d - gt_w3d))
                h3d_errors.append(abs(h3d - gt_h3d))
                l3d_errors.append(abs(l3d - gt_l3d))
                dim_errors.append(
                    float(
                        np.sqrt(
                            (w3d - gt_w3d) ** 2 + (h3d - gt_h3d) ** 2 + (l3d - gt_l3d) ** 2
                        )
                    )
                )
                ry_errors.append(so3_relative_angle(ry3d, np.array(g["pose"], np.float64)))

            if write_sample and img is not None and score > thres:
                from ..geometry.cuboids import cuboid_verts
                import jax.numpy as jnp

                x3d, y3d, z3d_u = K_inv @ (z3d * cen_2d)
                corners = np.asarray(
                    cuboid_verts(
                        jnp.asarray([[x3d, y3d, z3d_u, w3d, h3d, l3d]], jnp.float32),
                        jnp.asarray(ry3d[None], jnp.float32),
                    )
                )[0]
                color = get_color(int(cat_id))
                draw_box_3d(img, corners, K, color=color, width=max(2, int(np.round(3 * img.height / 500))))
                cat = (
                    category_names_official[cat_id]
                    if cat_id < len(category_names_official)
                    else str(cat_id)
                )
                draw_text(img, f"{cat}, z={z3d:.1f}, s={score:.2f}", (x1, y1), color=color)

        if write_sample and img is not None:
            img.save(os.path.join(vis_folder, f"{imind:06d}.jpg"))

    if len(ry_errors) == 0:
        ry_errors = [1000, 1000]
    log_str = (
        "{}iter={}, xy({:.2f}), z({:.2f}), whl({:.2f}, {:.2f}, {:.2f}), ry({:.2f})\n".format(
            dataset_name,
            iteration,
            np.mean(xy_errors) if xy_errors else float("nan"),
            np.mean(z_errors) if z_errors else float("nan"),
            np.mean(w3d_errors) if w3d_errors else float("nan"),
            np.mean(h3d_errors) if h3d_errors else float("nan"),
            np.mean(l3d_errors) if l3d_errors else float("nan"),
            np.mean(ry_errors),
        )
    )
    return log_str
