"""Detection visualisation: 3D box wireframes, front + novel view, BEV.

Parity target: cubercnn/vis/vis.py — `draw_scene_view` (:210-546) front and
novel-view renderings and the 2D/3D drawing primitives (:547-749). The
reference rasterises shaded meshes with PyTorch3D's CUDA renderer; the
TPU-native framework keeps visualisation host-side and draws painter's-
algorithm wireframes/filled faces with PIL — no GPU renderer dependency.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw

from ..geometry.cuboids import EDGES, QUAD_FACES

# 10k-color palette seed (util.py:269-300 contract: stable distinct colors)
def get_color(index: int):
    rng = np.random.RandomState(index * 9781 + 3)
    c = rng.randint(60, 255, 3)
    return tuple(int(x) for x in c)


def _project(K: np.ndarray, pts: np.ndarray) -> np.ndarray:
    p = pts @ K.T
    return p[:, :2] / np.maximum(p[:, 2:3], 1e-6)


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


def draw_box_3d(img: Image.Image, corners3d: np.ndarray, K: np.ndarray, color=(255, 120, 40), width: int = 2, fill_faces: bool = False):
    """Wireframe (optionally face-filled) projected cuboid."""
    if np.any(corners3d[:, 2] <= 0.05):
        return img
    uv = _project(K, corners3d)
    draw = ImageDraw.Draw(img, "RGBA")
    if fill_faces:
        order = np.argsort([-corners3d[QUAD_FACES[f]].mean(0)[2] for f in range(6)])
        for f in order:
            poly = [tuple(uv[i]) for i in QUAD_FACES[f]]
            draw.polygon(poly, fill=color + (40,))
    for a, b in EDGES:
        draw.line([tuple(uv[a]), tuple(uv[b])], fill=color + (255,), width=width)
    # front face (z- in local coords = first quad) drawn thicker
    for a, b in ((0, 1), (1, 2), (2, 3), (3, 0)):
        draw.line([tuple(uv[a]), tuple(uv[b])], fill=color + (255,), width=width + 1)
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


def draw_scene_view(
    image: np.ndarray,
    K: np.ndarray,
    corners3d: np.ndarray,  # (N, 8, 3)
    labels=None,
    scores=None,
    colors=None,
    novel_view: bool = True,
):
    """Front view with 3D boxes + optional novel (top-ish) view + BEV.

    Returns a PIL image: [front | BEV] side by side (the reference returns
    front + rendered novel view; the BEV replaces the mesh-rendered novel
    view host-side).
    """
    img = Image.fromarray(np.asarray(image, np.uint8))
    n = len(corners3d)
    order = np.argsort([-c[:, 2].mean() for c in corners3d])
    for i in order:
        color = colors[i] if colors else get_color(int(labels[i]) if labels is not None else i)
        draw_box_3d(img, np.asarray(corners3d[i]), np.asarray(K), color=color, fill_faces=True)
        if labels is not None:
            uv = _project(np.asarray(K), np.asarray(corners3d[i]))
            txt = str(labels[i]) + (f" {scores[i]:.2f}" if scores is not None else "")
            ImageDraw.Draw(img).text((uv[:, 0].min(), uv[:, 1].min() - 10), txt, fill=color)
    if not novel_view:
        return img
    bev = draw_bev(
        [np.asarray(c) for c in corners3d],
        colors=[colors[i] if colors else get_color(int(labels[i]) if labels is not None else i) for i in range(n)],
        size=img.height,
    )
    canvas = Image.new("RGB", (img.width + bev.width, img.height), (0, 0, 0))
    canvas.paste(img, (0, 0))
    canvas.paste(bev, (img.width, 0))
    return canvas
